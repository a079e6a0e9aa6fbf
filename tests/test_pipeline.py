"""Data pipeline tests: synthetic dataset -> load -> split -> pack -> iterate."""

import numpy as np
import pytest

from scann_tpu.data.pipeline import (
    BatchIterator,
    choose_buckets,
    load_dataset,
    pack_dataset,
    split_data,
    subset_buckets,
)
from scann_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth_paths(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(str(out), n_structures=40, min_atoms=4,
                                  max_atoms=14, seed=1, with_ring=True)


class TestLoadDataset:
    def test_load(self, synth_paths):
        e, n = synth_paths
        records, neighbors = load_dataset(e, n, target="homo")
        assert len(records) == len(neighbors) == 40
        assert records[0]["atomic"].dtype == np.int32
        assert isinstance(records[0]["target"], float)

    def test_use_ref(self, synth_paths):
        e, n = synth_paths
        r1, _ = load_dataset(e, n, target="homo", use_ref=False)
        r2, _ = load_dataset(e, n, target="homo", use_ref=True)
        assert r2[0]["target"] == pytest.approx(r1[0]["target"] - 0.01)

    def test_use_ring(self, synth_paths):
        e, n = synth_paths
        r, _ = load_dataset(e, n, target="homo", use_ring=True)
        assert r[0]["ring"].shape == (len(r[0]["atomic"]), 2)


class TestSplit:
    def test_exact_sizes(self):
        tr, va, te = split_data(100, train_size=70, test_size=20, seed=0)
        assert len(tr) == 70 and len(te) == 20 and len(va) == 10
        all_idx = np.sort(np.concatenate([tr, va, te]))
        np.testing.assert_array_equal(all_idx, np.arange(100))

    def test_percent(self):
        tr, va, te = split_data(100, test_percent=0.1, seed=0)
        assert len(tr) == 80 and len(te) == 10 and len(va) == 10

    def test_oversize_raises(self):
        with pytest.raises(ValueError):
            split_data(10, train_size=9, test_size=5)

    def test_train_size_without_test_size_uses_percent(self):
        """Reference-style config: train_size set, test_size empty. The
        reference crashes here (int(None)); we derive from test_percent."""
        tr, va, te = split_data(100, test_percent=0.1, train_size=70,
                                test_size=None, seed=0)
        assert len(tr) == 70 and len(te) == 10 and len(va) == 20

    def test_train_size_zero_is_honored(self):
        tr, va, te = split_data(10, train_size=0, test_size=5, seed=0)
        assert len(tr) == 0 and len(te) == 5 and len(va) == 5


class TestPack:
    def test_choose_buckets_covers_all(self):
        sizes = [(5, 3), (12, 6), (20, 9), (29, 12)]
        buckets = choose_buckets(sizes, 8, 4, max_buckets=3)
        for m, n in sizes:
            assert any(m <= bm and n <= bn for bm, bn in buckets), (m, n, buckets)

    def test_pack_shapes_and_masks(self, synth_paths):
        e, n = synth_paths
        records, neighbors = load_dataset(e, n, target="homo")
        buckets = pack_dataset(records, neighbors, g_update=True, max_buckets=2)
        total = sum(b.num_structures for b in buckets)
        assert total == 40
        for b in buckets:
            M, N = b.shape
            assert M % 8 == 0 and N % 4 == 0
            am = b.inputs["atom_mask"]
            assert set(np.unique(am)) <= {0.0, 1.0}
            # atoms outside mask are 0
            assert np.all(b.inputs["atomic"][am[..., 0] == 0] == 0)
            # neighbor indices point inside the structure's atoms
            na = am[..., 0].sum(1)
            nm = b.inputs["neighbor_mask"]
            idx = b.inputs["neighbors"]
            for s in range(b.num_structures):
                valid = nm[s] > 0
                assert idx[s][valid].max(initial=0) < na[s]

    def test_weight_index_semantics(self, synth_paths):
        e, n = synth_paths
        records, neighbors = load_dataset(e, n, target="homo")
        b_plus = pack_dataset(records, neighbors, g_update=True, max_buckets=1)[0]
        b_base = pack_dataset(records, neighbors, g_update=False, max_buckets=1)[0]
        # SCANN (normalized weights) are <= 1; SCANN+ raw solid angles exceed 1
        nm = b_base.inputs["neighbor_mask"] > 0
        assert b_base.inputs["neighbor_weight"][nm].max() <= 1.0 + 1e-6
        assert b_plus.inputs["neighbor_weight"][nm].max() > 1.0

    def test_subset_buckets(self, synth_paths):
        e, n = synth_paths
        records, neighbors = load_dataset(e, n, target="homo")
        buckets = pack_dataset(records, neighbors, max_buckets=2)
        tr, va, te = split_data(40, train_size=30, test_size=5, seed=0)
        sub = subset_buckets(buckets, tr)
        got = np.sort(np.concatenate([b.indices for b in sub]))
        np.testing.assert_array_equal(got, np.sort(tr))

    def test_cgcnn_packing(self, synth_paths):
        e, n = synth_paths
        records, neighbors = load_dataset(e, n, target="homo")
        b = pack_dataset(records, neighbors, feature="cgcnn", max_buckets=1)[0]
        assert b.inputs["atomic"].shape[-1] == 92
        # masked rows are all-zero features
        am = b.inputs["atom_mask"][..., 0]
        assert np.all(b.inputs["atomic"][am == 0] == 0)


class TestBatchIterator:
    def _buckets(self, synth_paths):
        e, n = synth_paths
        records, neighbors = load_dataset(e, n, target="homo")
        return pack_dataset(records, neighbors, max_buckets=2)

    def test_eval_covers_each_exactly_once(self, synth_paths):
        buckets = self._buckets(synth_paths)
        it = BatchIterator(buckets, batch_size=16, shuffle=False)
        seen = []
        for bi, idx, mask in it.plans():
            orig = buckets[bi].indices[idx]
            seen.extend(orig[mask > 0].tolist())
        assert sorted(seen) == list(range(40))

    def test_train_batches_always_full(self, synth_paths):
        buckets = self._buckets(synth_paths)
        it = BatchIterator(buckets, batch_size=16, shuffle=True, seed=3)
        for bi, idx, mask in it.plans():
            assert len(idx) == 16
            assert mask.sum() == 16

    def test_shuffle_changes_order_between_epochs(self, synth_paths):
        buckets = self._buckets(synth_paths)
        it = BatchIterator(buckets, batch_size=8, shuffle=True, seed=0)
        e1 = [idx.tolist() for _, idx, _ in it.plans()]
        e2 = [idx.tolist() for _, idx, _ in it.plans()]
        assert e1 != e2

    def test_tiny_bucket_wrap_fill_is_full(self, synth_paths):
        """A train bucket smaller than half the batch must still emit a FULL
        batch (modular wrap) — a short index vector desyncs from the
        full-size sample mask and breaks/recompiles downstream."""
        buckets = self._buckets(synth_paths)
        tiny = [type(buckets[0])(
            inputs={k: v[:5] for k, v in buckets[0].inputs.items()},
            targets=buckets[0].targets[:5],
            indices=buckets[0].indices[:5])]
        it = BatchIterator(tiny, batch_size=16, shuffle=True, seed=0)
        plans = it.plans()
        assert len(plans) == 1
        _, idx, mask = plans[0]
        assert len(idx) == 16 and mask.shape == (16,)
        assert set(idx.tolist()) == set(range(5))  # every structure present

    def test_len_matches_plans_in_all_modes(self, synth_paths):
        buckets = self._buckets(synth_paths)
        for shuffle in (False, True):
            for drop in (False, True):
                it = BatchIterator(buckets, batch_size=16, shuffle=shuffle,
                                   drop_remainder=drop, seed=1)
                assert len(it) == len(it.plans()), (shuffle, drop)


class TestBatchIteratorMaterialized:
    def test_iter_yields_host_batches(self, synth_paths):
        e, n = synth_paths
        records, neighbors = load_dataset(e, n, target="homo")
        buckets = pack_dataset(records, neighbors, max_buckets=1)
        it = BatchIterator(buckets, batch_size=8, shuffle=False)
        count = 0
        for bi, inputs, targets, mask in it:
            assert inputs["atomic"].shape[0] == 8
            assert targets.shape == (8,)
            count += 1
        assert count == len(it)


class TestCsrCache:
    def test_cache_roundtrip(self, synth_paths, tmp_path):
        from scann_tpu.data.pipeline import CsrDataset, build_csr

        e, n = synth_paths
        records, neighbors = load_dataset(e, n, target="homo")
        cache = str(tmp_path / "csr.npz")
        c1 = build_csr(records, neighbors, cache)
        import os
        assert os.path.exists(cache)
        c2 = build_csr(records, neighbors, cache)  # from cache
        np.testing.assert_array_equal(c1.nbr_index, c2.nbr_index)
        np.testing.assert_array_equal(c1.atom_offsets, c2.atom_offsets)
        np.testing.assert_array_equal(c1.targets, c2.targets)

    def test_cache_targets_follow_records(self, synth_paths, tmp_path):
        from scann_tpu.data.pipeline import build_csr

        e, n = synth_paths
        records, neighbors = load_dataset(e, n, target="homo")
        cache = str(tmp_path / "csr2.npz")
        build_csr(records, neighbors, cache)
        for r in records:
            r["target"] = r["target"] * 2.0
        c = build_csr(records, neighbors, cache)
        assert c.targets[0] == pytest.approx(records[0]["target"])

    def test_stale_cache_rejected(self, synth_paths, tmp_path):
        from scann_tpu.data.pipeline import build_csr

        e, n = synth_paths
        records, neighbors = load_dataset(e, n, target="homo")
        cache = str(tmp_path / "csr3.npz")
        build_csr(records, neighbors, cache)
        # different dataset size -> cache must be rebuilt, not misused
        c = build_csr(records[:10], neighbors[:10], cache)
        assert len(c.targets) == 10
        assert len(c.atom_offsets) == 11

    def test_refeaturized_source_invalidates_cache(self, synth_paths,
                                                   tmp_path):
        """Re-featurizing the SAME path with the SAME structure count (e.g.
        different Voronoi d_t/w_t) must invalidate the cache — the (mtime,
        size) of the source neighbor file is recorded at save and checked
        at load."""
        import os

        from scann_tpu.data.pipeline import build_csr

        e, n = synth_paths
        records, neighbors = load_dataset(e, n, target="homo")
        src = str(tmp_path / "neighbors.npy")
        with open(src, "w") as f:
            f.write("v1")
        cache = str(tmp_path / "csr4.npz")
        c1 = build_csr(records, neighbors, cache, source_path=src)

        # same source file -> served from cache
        c2 = build_csr(records, neighbors, cache, source_path=src)
        np.testing.assert_array_equal(c1.weight_raw, c2.weight_raw)

        # "re-featurize": rewrite the source and perturb the neighbor data
        with open(src, "w") as f:
            f.write("v2-bigger")
        new_neighbors = [
            [[[r[0], r[1], r[2] + 1.0, r[3], r[4]] for r in atom]
             for atom in per_struct] for per_struct in neighbors]
        c4 = build_csr(records, new_neighbors, cache, source_path=src)
        np.testing.assert_allclose(c4.weight_raw, c1.weight_raw + 1.0,
                                   rtol=1e-6)

    def test_cache_without_ring_rebuilt_when_ring_needed(self, synth_paths,
                                                         tmp_path):
        from scann_tpu.data.pipeline import build_csr

        e, n = synth_paths
        plain, neighbors = load_dataset(e, n, target="homo", use_ring=False)
        cache = str(tmp_path / "csr5.npz")
        build_csr(plain, neighbors, cache)  # cache has no ring array
        ringed, _ = load_dataset(e, n, target="homo", use_ring=True)
        c = build_csr(ringed, neighbors, cache)
        assert c.ring is not None and len(c.ring) == c.atom_offsets[-1]
