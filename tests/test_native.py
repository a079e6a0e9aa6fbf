"""Native C++ packer: build, correctness vs numpy fallback, speed sanity."""

import numpy as np
import pytest

from scann_tpu.data import native
from scann_tpu.data.pipeline import CsrDataset, pack_dataset
from scann_tpu.data.synthetic import make_synthetic_dataset
from scann_tpu.data.pipeline import load_dataset


def test_native_library_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ is available in this image; build must succeed"


@pytest.fixture(scope="module")
def csr(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_native")
    e, n = make_synthetic_dataset(str(out), n_structures=30, min_atoms=4,
                                  max_atoms=12, seed=5)
    records, neighbors = load_dataset(e, n, target="homo")
    return CsrDataset(records, neighbors), records, neighbors


def test_native_matches_numpy_fallback(csr, monkeypatch):
    c, _, _ = csr
    rows = np.arange(len(c.targets), dtype=np.int32)
    M, N = 16, 8
    args = (rows, c.atom_offsets, c.nbr_offsets, c.atomic, c.nbr_index,
            c.weight_raw, c.nbr_dist, M, N)
    out_native = native.pack_bucket_native(*args)
    # force the numpy fallback
    monkeypatch.setattr(native, "get_lib", lambda: None)
    out_numpy = native.pack_bucket_native(*args)
    for k in out_native:
        np.testing.assert_array_equal(out_native[k], out_numpy[k], err_msg=k)


def test_structure_sizes(csr):
    c, records, neighbors = csr
    n_atoms, max_nbrs = native.structure_sizes_native(c.atom_offsets, c.nbr_offsets)
    for i, (rec, nbr) in enumerate(zip(records, neighbors)):
        assert n_atoms[i] == len(rec["atomic"])
        assert max_nbrs[i] == max(len(a) for a in nbr)


def test_csr_roundtrip_against_records(csr):
    c, records, neighbors = csr
    i = 7
    a0, a1 = c.atom_offsets[i], c.atom_offsets[i + 1]
    np.testing.assert_array_equal(c.atomic[a0:a1], records[i]["atomic"])
    # neighbor record [species, idx, sa, wn, dist]
    n0 = c.nbr_offsets[a0]
    first = neighbors[i][0][0]
    assert c.nbr_index[n0] == first[1]
    assert c.weight_raw[n0] == pytest.approx(first[2])
    assert c.weight_norm[n0] == pytest.approx(first[3])
    assert c.nbr_dist[n0] == pytest.approx(first[4])


def test_corrupt_cached_library_degrades_to_rebuild(tmp_path, monkeypatch):
    """A truncated .so at the cached path (interrupted build, killed g++)
    must not crash every later run: get_lib rebuilds once, and if that
    fails too it falls back to numpy (None)."""
    import scann_tpu.data.native as native

    build = tmp_path / "build"
    build.mkdir()
    bad = build / "libscannpacker.so"
    bad.write_bytes(b"not an ELF file")
    # make the corrupt file look fresh relative to the source
    import os
    src_m = os.path.getmtime(native._SRC)
    os.utime(bad, (src_m + 10, src_m + 10))

    monkeypatch.setattr(native, "_BUILD_DIR", str(build))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_tried", False)
    lib = native.get_lib()  # must not raise on the corrupt cache
    # this image ships g++, so the forced rebuild must succeed and work
    assert lib is not None
    ao = np.array([0, 2], np.int64)
    no = np.array([0, 1, 2], np.int64)
    n_at, mx = native.structure_sizes_native(ao, no)
    assert n_at.tolist() == [2] and mx.tolist() == [1]
