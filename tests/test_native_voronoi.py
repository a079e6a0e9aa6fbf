"""Native C++ cell-clipping featurizer vs the scipy/Qhull path.

``native/voronoi_cell.cc`` must produce the SAME facet sets — neighbor
identities, solid angles, distances — as the global tessellation in
``data/voronoi.py``, to floating-point noise, across molecules, crystals,
triclinic cells and exactly degenerate lattices (FCC's rhombic dodecahedron
has four planes meeting at every cell vertex). The public record layout is
the reference featurizer's (reference scann/utils/voronoi_neighbor.py:39-51).
"""

import ctypes

import numpy as np
import pytest

from scann_tpu.data import native_voronoi
from scann_tpu.data.structure import Structure
from scann_tpu.data.synthetic import _random_crystal, _random_molecule
from scann_tpu.data.voronoi import _image_cloud, _voronoi_facets, compute_voronoi_neighbors


def _canon(facets, ndigits=8):
    return [sorted((j, round(sa, ndigits), round(d, ndigits)) for j, sa, d in f)
            for f in facets]


def _assert_paths_agree(struct: Structure):
    s = struct.as_periodic()
    fn = _voronoi_facets(s.coords, s.lattice, len(s), 7.0, force="native")
    fs = _voronoi_facets(s.coords, s.lattice, len(s), 7.0, force="scipy")
    assert fn is not None, "native path unexpectedly unavailable"
    assert _canon(fn) == _canon(fs)


pytestmark = pytest.mark.skipif(
    native_voronoi.get_lib() is None, reason="no C++ compiler available")


class TestParityWithScipy:
    def test_random_molecules(self):
        rng = np.random.default_rng(11)
        for _ in range(6):
            _assert_paths_agree(Structure(*_random_molecule(rng, int(rng.integers(6, 26)))))

    def test_random_crystals(self):
        rng = np.random.default_rng(12)
        for _ in range(4):
            _assert_paths_agree(Structure(*_random_crystal(rng, int(rng.integers(20, 60)))))

    def test_triclinic(self):
        lattice = np.array([[4.0, 0.0, 0.0], [1.2, 3.8, 0.0], [0.7, 1.1, 3.5]])
        fr = np.random.default_rng(13).uniform(0.05, 0.95, (5, 3))
        _assert_paths_agree(Structure.from_frac(["Si", "O", "O", "Al", "Mg"], fr, lattice))

    def test_degenerate_lattices(self):
        # exact lattice symmetry: Voronoi vertices where >3 bisectors meet
        # (FCC rhombic dodecahedron, BCC truncated octahedron). The clipping
        # tolerance must neither split facets nor emit tangent-plane slivers.
        fcc = Structure.from_frac(
            ["Cu"] * 4,
            [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
            np.eye(3) * 4.0)
        _assert_paths_agree(fcc)
        facets = _voronoi_facets(fcc.coords, fcc.lattice, 4, 7.0, force="native")
        assert [len(f) for f in facets] == [12] * 4  # rhombic dodecahedron
        for f in facets:
            assert sum(x[1] for x in f) == pytest.approx(4 * np.pi, rel=1e-9)
        bcc = Structure.from_frac(
            ["Fe", "Fe"], [[0, 0, 0], [0.5, 0.5, 0.5]], np.eye(3) * 2.9)
        _assert_paths_agree(bcc)
        facets = _voronoi_facets(bcc.coords, bcc.lattice, 2, 7.0, force="native")
        assert [len(f) for f in facets] == [14] * 2  # truncated octahedron

    def test_end_to_end_records_identical(self):
        rng = np.random.default_rng(14)
        s = Structure(*_random_molecule(rng, 18))
        import os

        rec_native = compute_voronoi_neighbors(s)
        env = os.environ.copy()
        os.environ["SCANN_TPU_NATIVE_VORONOI"] = "0"
        try:
            rec_scipy = compute_voronoi_neighbors(s)
        finally:
            os.environ.clear()
            os.environ.update(env)
        assert len(rec_native) == len(rec_scipy)
        for a, b in zip(rec_native, rec_scipy):
            assert len(a) == len(b)
            for ra, rb in zip(a, b):
                assert ra[0] == rb[0] and ra[1] == rb[1]
                np.testing.assert_allclose(ra[2:], rb[2:], rtol=0, atol=1e-8)


@pytest.mark.slow
class TestLargeScaleFuzz:
    def test_large_sheared_crystal_and_fuzz(self):
        # trajectory/ptgp-scale shapes, where the per-atom construction's
        # advantage is largest (measured 17x at 240 sites), plus a fuzz
        # sweep across assorted sizes — all must match scipy exactly
        rng = np.random.default_rng(42)
        g, pitch = 7, 2.5
        sites = np.stack(np.meshgrid(*[np.arange(g)] * 3, indexing="ij"),
                         -1).reshape(-1, 3)
        pick = rng.choice(len(sites), size=240, replace=False)
        coords = (sites[pick] + 0.5 + rng.uniform(-0.2, 0.2, (240, 3))) * pitch
        L = np.array([[g * pitch, 0, 0], [3.0, g * pitch, 0],
                      [1.5, 2.0, g * pitch]])
        _assert_paths_agree(Structure(["Si"] * 240, coords, L))
        for i in range(12):
            if i % 2 == 0:
                st = Structure(*_random_molecule(rng, int(rng.integers(4, 40))))
            else:
                st = Structure(*_random_crystal(rng, int(rng.integers(10, 100))))
            _assert_paths_agree(st)


class TestRobustness:
    def test_fallback_on_none(self, monkeypatch):
        # native returning None (geometric failure) must fall through to scipy
        monkeypatch.setattr(native_voronoi, "voronoi_facets_native",
                            lambda *a, **k: None)
        s = Structure(["C", "O"], [[0, 0, 0], [1.2, 0, 0]]).as_periodic()
        facets = _voronoi_facets(s.coords, s.lattice, 2, 7.0)
        assert facets is not None and len(facets) == 2

    def test_env_kill_switch(self, monkeypatch):
        called = []

        def boom(*a, **k):
            called.append(1)
            return None

        monkeypatch.setattr(native_voronoi, "voronoi_facets_native", boom)
        monkeypatch.setenv("SCANN_TPU_NATIVE_VORONOI", "0")
        s = Structure(["C", "O"], [[0, 0, 0], [1.2, 0, 0]]).as_periodic()
        _voronoi_facets(s.coords, s.lattice, 2, 7.0)
        assert not called

    def test_overflow_returns_retry_code(self):
        # drive the raw C ABI with a tiny facet budget: must flag overflow
        # (rc=1, counts=-2), which the wrapper turns into a bigger retry
        lib = native_voronoi.get_lib()
        s = Structure(["Na"], [[0.0, 0.0, 0.0]], np.eye(3) * 3.0)
        pts, _ = _image_cloud(s.coords, s.lattice, 1, 7.0)
        pts = np.ascontiguousarray(pts, np.float64)
        counts = np.zeros(1, np.int32)
        nbr = np.zeros(2, np.int64)
        sa = np.zeros(2, np.float64)
        dist = np.zeros(2, np.float64)
        rc = lib.scann_voronoi_facets(pts, len(pts), 1, 2, counts, nbr, sa, dist)
        assert rc == 1 and counts[0] == -2
        # and the wrapper's retry gets the full 6-facet simple-cubic cell
        out = native_voronoi.voronoi_facets_native(pts, 1, np.zeros(len(pts), np.int64))
        assert out is not None and len(out[0]) == 6

    def test_wall_bounded_cells_drop_unclosed_facets(self):
        # a lone atom in a huge box: every "cell" face would touch the
        # walls only through its images — with a 10 A box and cutoff 7 the
        # single shell closes the cell, so all 6 facets are real
        s = Structure(["Ar"], [[5.0, 5.0, 5.0]], np.eye(3) * 10.0)
        facets = _voronoi_facets(s.coords, s.lattice, 1, 7.0, force="native")
        assert len(facets[0]) == 6
        for _, sa_, d in facets[0]:
            assert sa_ == pytest.approx(4 * np.pi / 6, rel=1e-9)
            assert d == pytest.approx(10.0, rel=1e-12)
