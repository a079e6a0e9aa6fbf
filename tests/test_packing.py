"""Structure packing (scann_tpu/data/packing.py + segment-aware readout).

Exactness contract: packing several structures into one padded slot must
not change any structure's prediction, GA scores, or loss gradients — the
segment-aware GlobalAttention makes every cross-structure reduction
per-segment (ops/attention.py:_segmented_global_attention).
"""

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
import pytest

from scann_tpu.config import ModelConfig
from scann_tpu.data.packing import (
    PackedSlots,
    pack_dataset_slots,
    plan_slots,
    unpack_predictions,
)
from scann_tpu.data.pipeline import load_dataset, pack_dataset
from scann_tpu.data.synthetic import make_synthetic_dataset
from scann_tpu.models import ScannModel
from conftest import jit_apply, jit_init


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("packing_data")
    e, n = make_synthetic_dataset(str(root), n_structures=40, min_atoms=4,
                                  max_atoms=14, seed=3)
    return load_dataset(e, n, target="homo")


def test_plan_slots_invariants():
    rng = np.random.default_rng(0)
    counts = rng.integers(3, 30, size=500)
    slot_of, offset_of, segment_of, n_slots, max_seg = plan_slots(
        counts, capacity=32, max_segments=4)

    rows = np.zeros(n_slots, np.int64)
    segs = np.zeros(n_slots, np.int64)
    for i, c in enumerate(counts):
        rows[slot_of[i]] += c
        segs[slot_of[i]] += 1
    assert (rows <= 32).all()
    assert (segs <= 4).all()
    assert max_seg == segs.max()
    # offsets partition each slot contiguously from 0
    for s in range(n_slots):
        members = np.nonzero(slot_of == s)[0]
        spans = sorted((offset_of[i], offset_of[i] + counts[i]) for i in members)
        assert spans[0][0] == 0
        for (a0, a1), (b0, _) in zip(spans, spans[1:]):
            assert a1 == b0  # contiguous, no overlap
    # segment ids are 0..k-1 per slot
    for s in range(n_slots):
        members = np.nonzero(slot_of == s)[0]
        assert sorted(segment_of[i] for i in members) == list(range(len(members)))
    # decent occupancy on a random mix
    assert rows.sum() / (n_slots * 32) > 0.9
    # deterministic
    again = plan_slots(counts, capacity=32, max_segments=4)
    assert all(np.array_equal(a, b) for a, b in zip(again[:3], (slot_of, offset_of, segment_of)))


def test_plan_slots_rejects_oversize():
    with pytest.raises(ValueError, match="capacity"):
        plan_slots(np.array([4, 40]), capacity=32)


def test_packed_slot_batch_rounding():
    from scann_tpu.data.packing import packed_slot_batch

    # ~batch_size structures per step: 128 structures over 80 slots at
    # packing factor 1.6 -> 80 slots/step, rounded to a multiple of 16
    assert packed_slot_batch(128, 1000, 1600) == 80
    # odd raw value rounds DOWN to the tile multiple (82 -> 80)
    assert packed_slot_batch(131, 1000, 1600) == 80
    # too small for the 16 tile: falls back to a multiple of 4
    assert packed_slot_batch(8, 1000, 1600) == 4
    # never below one slot / the device multiple
    assert packed_slot_batch(1, 100, 800) == 1
    # the multiple must cover the mesh data axis
    assert packed_slot_batch(131, 1000, 1600, n_devices=8) % 8 == 0
    assert packed_slot_batch(131, 1000, 1600, n_devices=8) == 80  # lcm(16,8)=16
    assert packed_slot_batch(6, 1000, 1600, n_devices=8) == 8


def test_pack_dataset_slots_layout(dataset):
    records, neighbors = dataset
    packed = pack_dataset_slots(records, neighbors, g_update=True,
                                capacity=16, max_segments=4)
    assert isinstance(packed, PackedSlots)
    assert packed.num_structures == len(records)
    M, N = packed.shape
    assert M == 16
    seg = packed.inputs["segment_onehot"]
    am = packed.inputs["atom_mask"]
    # one-hot rows match the atom mask exactly
    np.testing.assert_array_equal(seg.sum(-1), am[..., 0])
    # neighbor indices stay within their own segment's rows
    nbr = packed.inputs["neighbors"]
    nmask = packed.inputs["neighbor_mask"]
    seg_id = seg.argmax(-1)
    for s in range(packed.num_slots):
        for m in range(M):
            if am[s, m, 0] == 0:
                continue
            own = seg_id[s, m]
            for k in np.nonzero(nmask[s, m])[0]:
                j = nbr[s, m, k]
                assert am[s, j, 0] == 1
                assert seg_id[s, j] == own
    # targets land at their (slot, segment)
    valid = packed.indices >= 0
    got = packed.targets[valid]
    want = np.array([records[i]["target"] for i in packed.indices[valid]],
                    np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def _forward(params, model, inputs):
    return jit_apply(model)({"params": params},
                            {k: jnp.asarray(v) for k, v in inputs.items()})


@pytest.mark.parametrize("g_update,use_ga_norm", [(True, True), (False, False)])
def test_packed_forward_matches_unpacked(dataset, g_update, use_ga_norm):
    records, neighbors = dataset
    cfg = ModelConfig(n_atoms=12, embedding_dim=16, n_attention=2,
                      local_dim=16, num_head=4, global_dim=16, dense_out=16,
                      g_update=g_update, use_ga_norm=use_ga_norm)
    model = ScannModel(cfg)

    buckets = pack_dataset(records, neighbors, g_update=g_update)
    packed = pack_dataset_slots(records, neighbors, g_update=g_update,
                                capacity=16, max_segments=4)

    params = jit_init(model, jax.random.PRNGKey(0), buckets[0].inputs)

    per_structure = np.zeros(len(records), np.float32)
    for b in buckets:
        out = _forward(params, model, b.inputs)
        per_structure[b.indices] = np.asarray(out["property"][:, 0])

    out_packed = _forward(params, model, packed.inputs)
    assert out_packed["property"].shape == (packed.num_slots, packed.num_segments)
    packed_per_structure = unpack_predictions(packed, np.asarray(out_packed["property"]))

    np.testing.assert_allclose(packed_per_structure, per_structure,
                               rtol=2e-5, atol=2e-6)


def test_packed_ga_scores_match(dataset):
    records, neighbors = dataset
    cfg = ModelConfig(n_atoms=12, embedding_dim=16, n_attention=2,
                      local_dim=16, num_head=4, global_dim=16, dense_out=16,
                      g_update=True, use_ga_norm=True)
    model = ScannModel(cfg)
    buckets = pack_dataset(records, neighbors, g_update=True)
    packed = pack_dataset_slots(records, neighbors, g_update=True,
                                capacity=16, max_segments=4)
    params = jit_init(model, jax.random.PRNGKey(1), buckets[0].inputs)

    # reference GA per structure, keyed by original index
    ga_by_struct = {}
    for b in buckets:
        ga = np.asarray(_forward(params, model, b.inputs)["ga_score"])
        for r, orig in enumerate(b.indices):
            na = int(b.inputs["atom_mask"][r].sum())
            ga_by_struct[int(orig)] = ga[r, :na, 0]

    ga_packed = np.asarray(_forward(params, model, packed.inputs)["ga_score"])
    seg = packed.inputs["segment_onehot"]
    for s in range(packed.num_slots):
        for g in range(packed.num_segments):
            orig = packed.indices[s, g]
            if orig < 0:
                continue
            rows = np.nonzero(seg[s, :, g] > 0)[0]
            np.testing.assert_allclose(ga_packed[s, rows, 0],
                                       ga_by_struct[int(orig)],
                                       rtol=2e-5, atol=2e-6)


def test_packed_fused_forward_matches_xla(dataset):
    """The fused forward kernel's segmented readout (interpret mode) matches
    the XLA packed path, and predictions stay exact per structure."""
    from scann_tpu.kernels.scann_forward import fused_scann_forward

    records, neighbors = dataset
    cfg = ModelConfig(n_atoms=12, embedding_dim=16, n_attention=2,
                      local_dim=16, num_head=4, global_dim=16, dense_out=16,
                      g_update=True, use_ga_norm=True)
    model = ScannModel(cfg)
    packed = pack_dataset_slots(records, neighbors, g_update=True,
                                capacity=16, max_segments=4)
    inp = {k: jnp.asarray(v) for k, v in packed.inputs.items()}
    params = jit_init(model, jax.random.PRNGKey(3), packed.inputs)

    out_xla = jit_apply(model)({"params": params}, inp)
    B = packed.num_slots
    bt = 2 if B % 2 == 0 else 1
    pred_f, ga_f = fused_scann_forward(params, inp, cfg, interpret=True,
                                       batch_tile=bt)
    assert pred_f.shape == (B, packed.num_segments)
    np.testing.assert_allclose(np.asarray(pred_f),
                               np.asarray(out_xla["property"]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ga_f),
                               np.asarray(out_xla["ga_score"]),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.slow  # interpret-mode fused backward; the XLA-level packed
# gradient contract stays in the fast suite (test_packed_gradients_match_unpacked)
def test_packed_fused_train_grads_match_xla(dataset):
    """One-kernel-per-step training on a packed batch (interpret mode):
    in-kernel residual * valid-segment mask + XLA 1/(n*rmse) scale equals
    jax.grad of the masked-RMSE XLA loss."""
    import jax.flatten_util
    from scann_tpu.kernels.scann_backward import fused_scann_train_grads

    records, neighbors = dataset
    cfg = ModelConfig(n_atoms=12, embedding_dim=16, n_attention=2,
                      local_dim=16, num_head=4, global_dim=16, dense_out=16,
                      g_update=True, use_ga_norm=True)
    model = ScannModel(cfg)
    packed = pack_dataset_slots(records, neighbors, g_update=True,
                                capacity=16, max_segments=4)
    inp = {k: jnp.asarray(v) for k, v in packed.inputs.items()}
    params = jit_init(model, jax.random.PRNGKey(4), packed.inputs)
    y = jnp.asarray(packed.targets)
    smask = jnp.asarray(packed.inputs["segment_mask"])
    nvalid = smask.sum()

    def loss_xla(p):
        out = model.apply({"params": p}, inp)
        err = (out["property"] - y) * smask
        return jnp.sqrt(jnp.sum(jnp.square(err)) / nvalid)

    g_ref = jax.jit(jax.grad(loss_xla))(params)

    B = packed.num_slots
    bt = 2 if B % 2 == 0 else 1
    pred, raw = fused_scann_train_grads(params, inp, y, cfg,
                                        interpret=True, batch_tile=bt)
    err = (np.asarray(pred) - np.asarray(y)) * np.asarray(smask)
    rmse = np.sqrt((err ** 2).sum() / float(nvalid))
    scale = 1.0 / (float(nvalid) * rmse)
    g_fused = jax.tree.map(lambda r: r * scale, raw)

    f1, _ = jax.flatten_util.ravel_pytree(g_ref)
    f2, _ = jax.flatten_util.ravel_pytree(g_fused)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=5e-4, atol=1e-6)


def test_packed_training_end_to_end(tmp_path):
    """Scann API with tpu.structure_packing: all three splits pack, training
    on the XLA packed path (CPU) converges, packed eval works, and
    predict_data over the packed splits EXACTLY matches the bucketed
    pipeline's predictions structure for structure."""
    from scann_tpu.api import Scann
    from scann_tpu.config import ScannConfig
    from scann_tpu.data.synthetic import make_synthetic_dataset

    e, n = make_synthetic_dataset(str(tmp_path), n_structures=60,
                                  min_atoms=4, max_atoms=14, seed=7)
    cfg = ScannConfig.from_dict({
        "model": {"n_atoms": 16, "embedding_dim": 16, "n_attention": 1,
                  "local_dim": 16, "num_head": 4, "global_dim": 16,
                  "dense_out": 16},
        "hyper": {"batch_size": 8, "epochs": 4, "save_path":
                  str(tmp_path / "out"), "target": "homo",
                  "data_energy_path": e, "data_nei_path": n},
        "tpu": {"structure_packing": True, "pack_max_segments": 4},
    })
    sc = Scann(cfg)
    sc.prepare_dataset()
    packed = sc.train_buckets[0]
    assert packed.inputs["segment_onehot"].shape[-1] <= 4
    assert packed.occupancy > 0.85
    rep = sc.train()
    assert rep["loss"][-1] < rep["loss"][0]
    # pack_preserve_batch (default): the slot batch shrank by the packing
    # factor so each step still sees ~batch_size STRUCTURES, via the one
    # shared rounding helper (also used by bench.py / capture_trace.py)
    from scann_tpu.data.packing import packed_slot_batch
    expect = packed_slot_batch(8, packed.num_slots, packed.num_structures,
                               len(sc.trainer.mesh.devices.flat))
    assert sc.trainer._slot_batch == expect
    # valid/test are packed too; evaluate rides the segment-aware eval path
    assert "segment_mask" in sc.test_buckets[0].inputs
    res = sc.evaluate()
    assert np.isfinite(res["test_mae"])

    # predict_data over the union of packed splits == the bucketed pipeline
    # run with the SAME trained params, in the same (original) order
    preds_packed, gas = sc.predict_data(with_ga=True)
    assert preds_packed.shape == (60,)
    records, neighbors = load_dataset(e, n, target="homo")
    bucketed = pack_dataset(records, neighbors,
                            g_update=sc.config.model.g_update)
    preds_bucketed = sc.trainer.predict(bucketed)
    np.testing.assert_allclose(preds_packed, preds_bucketed,
                               rtol=2e-5, atol=2e-6)
    # per-atom GA lengths follow each structure's true atom count
    assert all(len(g) == len(r["atomic"]) for g, r in zip(gas, records))


@pytest.mark.slow
def test_sharded_packed_train_grads(dataset):
    """make_sharded_scann_train over the 8-device CPU mesh (interpret mode)
    on a PACKED batch == the unsharded fused train grads."""
    from scann_tpu.kernels.scann_backward import (
        fused_scann_train_grads,
        make_sharded_scann_train,
    )
    from scann_tpu.parallel import make_mesh

    records, neighbors = dataset
    cfg = ModelConfig(n_atoms=12, embedding_dim=16, n_attention=1,
                      local_dim=16, num_head=4, global_dim=16, dense_out=16,
                      g_update=True, use_ga_norm=True)
    model = ScannModel(cfg)
    packed = pack_dataset_slots(records, neighbors, g_update=True,
                                capacity=16, max_segments=4)
    # 8-way sharding needs slots % 8 == 0: wrap-pad slots
    idx = np.arange(16) % packed.num_slots
    inp = {k: jnp.asarray(v[idx]) for k, v in packed.inputs.items()}
    y = jnp.asarray(packed.targets[idx])
    params = jit_init(model, jax.random.PRNGKey(5), inp)

    pred1, raw1 = fused_scann_train_grads(params, inp, y, cfg,
                                          interpret=True, batch_tile=1)
    sharded = make_sharded_scann_train(make_mesh(n_devices=8), cfg,
                                       interpret=True, dropout_rate=0.0)
    pred8, raw8 = sharded(params, inp, y, None)
    np.testing.assert_allclose(np.asarray(pred8), np.asarray(pred1),
                               rtol=1e-5, atol=1e-6)
    f1, _ = jax.flatten_util.ravel_pytree(raw1)
    f8, _ = jax.flatten_util.ravel_pytree(raw8)
    np.testing.assert_allclose(np.asarray(f8), np.asarray(f1),
                               rtol=1e-5, atol=1e-6)


def test_packed_gradients_match_unpacked(dataset):
    """RMSE-loss gradients over the same set of structures are identical
    whether the batch is packed or not (slot arrangement is not observable)."""
    records, neighbors = dataset
    cfg = ModelConfig(n_atoms=12, embedding_dim=16, n_attention=2,
                      local_dim=16, num_head=4, global_dim=16, dense_out=16,
                      g_update=True, use_ga_norm=True)
    model = ScannModel(cfg)
    # single bucket so one unpacked batch covers every structure
    buckets = pack_dataset(records, neighbors, g_update=True, max_buckets=1)
    assert len(buckets) == 1
    b = buckets[0]
    packed = pack_dataset_slots(records, neighbors, g_update=True,
                                capacity=16, max_segments=4)
    params = jit_init(model, jax.random.PRNGKey(2), b.inputs)

    def loss_unpacked(p):
        out = model.apply({"params": p},
                          {k: jnp.asarray(v) for k, v in b.inputs.items()})
        # order by original index so both losses sum identically
        pred = out["property"][jnp.argsort(jnp.asarray(b.indices)), 0]
        y = jnp.asarray(b.targets)[jnp.argsort(jnp.asarray(b.indices))]
        return jnp.sqrt(jnp.mean(jnp.square(pred - y)))

    def loss_packed(p):
        out = model.apply({"params": p},
                          {k: jnp.asarray(v) for k, v in packed.inputs.items()})
        m = jnp.asarray(packed.inputs["segment_mask"])
        err = (out["property"] - jnp.asarray(packed.targets)) * m
        return jnp.sqrt(jnp.sum(jnp.square(err)) / jnp.sum(m))

    g1 = jax.jit(jax.grad(loss_unpacked))(params)
    g2 = jax.jit(jax.grad(loss_packed))(params)
    flat1, _ = jax.flatten_util.ravel_pytree(g1)
    flat2, _ = jax.flatten_util.ravel_pytree(g2)
    np.testing.assert_allclose(np.asarray(flat2), np.asarray(flat1),
                               rtol=5e-4, atol=1e-6)


def test_synthetic_packed_slots_invariants():
    """The bench's synthetic PackedSlots generator (__graft_entry__) obeys
    the packed-layout invariants: every structure lands in exactly one
    segment, and neighbor indices stay within the owning segment's rows."""
    from __graft_entry__ import _synthetic_packed_slots

    p = _synthetic_packed_slots(n_structs=80, capacity=16, N=8,
                                max_segments=4, seed=3,
                                min_atoms=4, max_atoms=14)
    assert p.num_structures == 80
    assert p.occupancy > 0.85
    am = p.inputs["atom_mask"][..., 0]
    oh = p.inputs["segment_onehot"]
    # each valid atom carries exactly one segment id; padding rows none
    np.testing.assert_array_equal(oh.sum(-1), am)
    # targets/indices only where segment_mask says so
    assert ((p.indices >= 0) == (p.inputs["segment_mask"] > 0)).all()
    # vectorized neighbor containment: every valid (atom, j) points at a
    # valid atom of the SAME segment
    seg = oh.argmax(-1)  # [S, M] (0 for padding; masked below)
    nb, nm = p.inputs["neighbors"], p.inputs["neighbor_mask"]
    S, M, N = nb.shape
    slot_ix = np.arange(S)[:, None, None]
    tgt_seg = seg[slot_ix, nb]      # [S, M, N]: segment of each neighbor
    own_seg = np.broadcast_to(seg[:, :, None], (S, M, N))
    valid = nm > 0
    assert (tgt_seg[valid] == own_seg[valid]).all()
    assert (am[slot_ix, nb][valid] == 1.0).all()


@pytest.mark.slow  # variant coverage; the default-feature parity is fast
@pytest.mark.parametrize("variant", ["ring", "cgcnn"])
def test_packed_forward_feature_variants(tmp_path, variant):
    """Packing stays exact for the ring/aromatic extra embedding and the
    cgcnn 92-dim descriptor feature (pack_dataset_slots mirrors
    pipeline.pack_dataset's feature semantics for both)."""
    e, n = make_synthetic_dataset(str(tmp_path), n_structures=24,
                                  min_atoms=4, max_atoms=12, seed=11,
                                  with_ring=(variant == "ring"))
    records, neighbors = load_dataset(e, n, target="homo",
                                      use_ring=(variant == "ring"))
    cfg = ModelConfig(n_atoms=12, embedding_dim=16, n_attention=2,
                      local_dim=16, num_head=4, global_dim=16, dense_out=16,
                      g_update=True, use_ga_norm=True,
                      use_ring=(variant == "ring"),
                      feature="cgcnn" if variant == "cgcnn" else "atomic")
    model = ScannModel(cfg)
    kw = dict(g_update=True, use_ring=cfg.use_ring, feature=cfg.feature)
    buckets = pack_dataset(records, neighbors, **kw)
    packed = pack_dataset_slots(records, neighbors, capacity=16,
                                max_segments=4, **kw)
    if variant == "ring":
        assert packed.inputs["ring_aromatic"].shape[-1] == 2
    else:
        assert packed.inputs["atomic"].shape[-1] == 92

    params = jit_init(model, jax.random.PRNGKey(4), buckets[0].inputs)
    per_structure = np.zeros(len(records), np.float32)
    for b in buckets:
        out = _forward(params, model, b.inputs)
        per_structure[b.indices] = np.asarray(out["property"][:, 0])
    out_packed = _forward(params, model, packed.inputs)
    np.testing.assert_allclose(
        unpack_predictions(packed, np.asarray(out_packed["property"])),
        per_structure, rtol=2e-5, atol=2e-6)


def test_csr_subset_matches_rebuild(dataset):
    """CsrDataset.subset (vectorized carve) == CsrDataset built from the
    subset's raw lists, field for field."""
    from scann_tpu.data.pipeline import CsrDataset

    records, neighbors = dataset
    full = CsrDataset(records, neighbors)
    sub = np.array([7, 0, 19, 3, 11])
    carved = full.subset(sub)
    rebuilt = CsrDataset([records[i] for i in sub],
                         [neighbors[i] for i in sub])
    for f in ("atom_offsets", "nbr_offsets", "atomic", "nbr_index",
              "weight_raw", "weight_norm", "nbr_dist", "targets"):
        np.testing.assert_array_equal(getattr(carved, f), getattr(rebuilt, f),
                                      err_msg=f)


def test_pack_capacity_pinning(dataset):
    """neighbors_capacity / segments_capacity pin the N / SEG dims (shared
    compiled shape across splits) and reject impossible values."""
    records, neighbors = dataset
    p = pack_dataset_slots(records, neighbors, g_update=True, capacity=16,
                           max_segments=4, neighbors_capacity=24,
                           segments_capacity=4)
    assert p.inputs["neighbors"].shape[-1] == 24
    assert p.num_segments == 4
    with pytest.raises(ValueError, match="neighbors_capacity"):
        pack_dataset_slots(records, neighbors, g_update=True, capacity=16,
                           neighbors_capacity=1)
    with pytest.raises(ValueError, match="segments_capacity"):
        pack_dataset_slots(records, neighbors, g_update=True, capacity=16,
                           max_segments=4, segments_capacity=1)


def test_pack_padded_inputs_requires_prefix_mask():
    from scann_tpu.data.packing import pack_padded_inputs

    from __graft_entry__ import _synthetic_inputs

    inputs = _synthetic_inputs(B=4, M=8, N=4, seed=0)
    bad = {k: v.copy() for k, v in inputs.items()}
    bad["atom_mask"][0, 0, 0] = 0.0  # hole in the prefix
    with pytest.raises(ValueError, match="prefix"):
        pack_padded_inputs(bad)
    p = pack_padded_inputs(inputs, max_segments=4)
    assert p.num_structures == 4
    np.testing.assert_array_equal(p.inputs["segment_onehot"].sum(-1),
                                  p.inputs["atom_mask"][..., 0])


def test_packed_bulk_inference_split_false(tmp_path):
    """prepare_dataset(split=False) with structure_packing packs the whole
    dataset; predict_data (the predict_model CLI path) == the bucketed
    pipeline, in dataset order."""
    from scann_tpu.api import Scann
    from scann_tpu.config import ScannConfig

    e, n = make_synthetic_dataset(str(tmp_path), n_structures=30,
                                  min_atoms=4, max_atoms=14, seed=13)
    base = {
        "model": {"n_atoms": 16, "embedding_dim": 16, "n_attention": 1,
                  "local_dim": 16, "num_head": 4, "global_dim": 16,
                  "dense_out": 16},
        "hyper": {"batch_size": 8, "target": "homo", "scaler": False,
                  "data_energy_path": e, "data_nei_path": n,
                  "save_path": str(tmp_path / "out")},
    }
    sc = Scann(ScannConfig.from_dict(
        {**base, "tpu": {"structure_packing": True}}))
    sc.prepare_dataset(split=False)
    assert "segment_mask" in sc._buckets[0].inputs
    sc.trainer.init_state({k: v[:1] for k, v in
                           sc._buckets[0].inputs.items()}, seed=0)
    preds = sc.predict_data()

    sc2 = Scann(ScannConfig.from_dict(base))
    sc2.prepare_dataset(split=False)
    sc2.trainer.state = sc.trainer.state  # same params
    preds2 = sc2.predict_data()
    np.testing.assert_allclose(preds, preds2, rtol=2e-5, atol=2e-6)


def test_packing_capacity_override(tmp_path):
    """tpu.packing_capacity raises the slot capacity above the derived
    minimum (denser packing, round-5 sweep: capacity 40 at the flagship
    shape measured +2.2% over 32); sub-minimum values raise; predictions
    stay equal to the default-capacity packing."""
    from scann_tpu.api import Scann
    from scann_tpu.config import ScannConfig

    e, n = make_synthetic_dataset(str(tmp_path), n_structures=30,
                                  min_atoms=4, max_atoms=14, seed=13)
    base = {
        "model": {"n_atoms": 16, "embedding_dim": 16, "n_attention": 1,
                  "local_dim": 16, "num_head": 4, "global_dim": 16,
                  "dense_out": 16},
        "hyper": {"batch_size": 8, "target": "homo", "scaler": False,
                  "data_energy_path": e, "data_nei_path": n,
                  "save_path": str(tmp_path / "out")},
    }
    sc = Scann(ScannConfig.from_dict(
        {**base, "tpu": {"structure_packing": True, "packing_capacity": 24}}))
    sc.prepare_dataset(split=False)
    p = sc._buckets[0]
    assert p.inputs["atomic"].shape[1] == 24
    sc.trainer.init_state({k: v[:1] for k, v in p.inputs.items()}, seed=0)
    preds = sc.predict_data()

    sc2 = Scann(ScannConfig.from_dict(
        {**base, "tpu": {"structure_packing": True}}))
    sc2.prepare_dataset(split=False)
    assert sc2._buckets[0].inputs["atomic"].shape[1] == 16  # derived (14->16)
    # denser slots: fewer of them
    assert p.inputs["atomic"].shape[0] < sc2._buckets[0].inputs["atomic"].shape[0]
    sc2.trainer.state = sc.trainer.state
    np.testing.assert_allclose(preds, sc2.predict_data(), rtol=2e-5, atol=2e-6)

    bad = Scann(ScannConfig.from_dict(
        {**base, "tpu": {"structure_packing": True, "packing_capacity": 8}}))
    with pytest.raises(ValueError, match="below the dataset's largest"):
        bad.prepare_dataset(split=False)


def test_plan_slots_fuzz_invariants():
    """Property test over random size distributions: every structure gets
    exactly one non-overlapping row range, slots never exceed capacity or
    max_segments, the plan is deterministic, and the slot count is sane
    (between the volume lower bound and one slot per structure)."""
    rng = np.random.default_rng(0)
    for trial in range(60):
        cap = int(rng.integers(8, 128))
        max_seg = int(rng.integers(1, 12))
        n = int(rng.integers(1, 200))
        # mix of distributions: uniform, heavy-small, near-capacity
        kind = trial % 3
        if kind == 0:
            counts = rng.integers(1, cap + 1, n)
        elif kind == 1:
            counts = np.minimum(cap, 1 + rng.poisson(max(1, cap // 6), n))
        else:
            counts = np.maximum(1, cap - rng.integers(0, 3, n))
        slot_of, offset_of, segment_of, n_slots, max_used = plan_slots(
            counts, cap, max_segments=max_seg)

        assert max_used <= max_seg
        assert n_slots <= len(counts)
        assert n_slots >= -(-int(counts.sum()) // cap)  # volume lower bound
        # per-slot invariants: within capacity, segment ids dense and
        # ordered by offset, row ranges disjoint
        for s in range(n_slots):
            idx = np.where(slot_of == s)[0]
            assert len(idx) >= 1
            assert counts[idx].sum() <= cap
            order = np.argsort(offset_of[idx])
            idx = idx[order]
            assert list(segment_of[idx]) == list(range(len(idx)))
            end = 0
            for i in idx:
                assert offset_of[i] == end  # contiguous, no overlap/gap
                end += counts[i]
        # deterministic across calls
        again = plan_slots(counts, cap, max_segments=max_seg)
        for a, b in zip((slot_of, offset_of, segment_of), again[:3]):
            np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_packed_sgdr_resume_matches_uninterrupted(tmp_path):
    """Packing composes with checkpoint/resume: an SGDR training over
    PACKED slots interrupted at epoch 3 and resumed reproduces the
    uninterrupted run's lr AND loss trajectories exactly (the packed data
    layout is deterministic, so the resumed epochs see identical batches)."""
    from scann_tpu.api import Scann
    from scann_tpu.config import ScannConfig
    from scann_tpu.data.synthetic import make_synthetic_dataset

    e, n = make_synthetic_dataset(str(tmp_path / "data"), n_structures=60,
                                  min_atoms=4, max_atoms=14, seed=7)

    def cfg(path):
        return ScannConfig.from_dict({
            "model": {"n_atoms": 16, "embedding_dim": 8, "n_attention": 1,
                      "local_dim": 16, "num_head": 2, "global_dim": 16,
                      "dense_out": 8},
            "hyper": {"batch_size": 8, "scheduler": "sgdr", "target": "homo",
                      "save_path": str(tmp_path / path),
                      "data_energy_path": e, "data_nei_path": n},
            "tpu": {"structure_packing": True, "pack_max_segments": 4},
        })

    full = Scann(cfg("full"))
    full.prepare_dataset()
    h_full = full.train(epochs=6)

    part = Scann(cfg("resumed"))
    part.prepare_dataset()
    part.train(epochs=3)
    res = Scann(cfg("resumed"))
    res.prepare_dataset()
    h_res = res.train(epochs=6, resume=True)

    assert h_res["lr"] == pytest.approx(h_full["lr"][3:], rel=1e-6)
    assert h_res["loss"] == pytest.approx(h_full["loss"][3:], rel=1e-4)
