"""Featurizer tests against exact geometric oracles."""

import numpy as np
import pytest

from scann_tpu.data.structure import Structure
from scann_tpu.data.voronoi import (
    _voronoi_facets,
    compute_voronoi_neighbors,
    solid_angle,
)


class TestSolidAngle:
    def test_cube_face(self):
        # face of a unit cube centered at origin: subtends 4pi/6
        z = 0.5
        poly = np.array([[z, z, z], [z, -z, z], [-z, -z, z], [-z, z, z]])
        assert solid_angle(np.zeros(3), poly) == pytest.approx(4 * np.pi / 6, rel=1e-10)

    def test_vertex_order_invariance(self, rng):
        z = 0.5
        poly = np.array([[z, z, z], [z, -z, z], [-z, -z, z], [-z, z, z]])
        for _ in range(5):
            perm = rng.permutation(4)
            assert solid_angle(np.zeros(3), poly[perm]) == pytest.approx(
                4 * np.pi / 6, rel=1e-10
            )

    def test_degenerate_polygon(self):
        poly = np.array([[1, 0, 0], [2, 0, 0], [3, 0, 0]], dtype=float)
        assert solid_angle(np.zeros(3), poly) == 0.0


class TestVoronoiNeighbors:
    def test_simple_cubic(self):
        s = Structure(["Na"], [[0.0, 0.0, 0.0]], np.eye(3) * 3.0)
        nbrs = compute_voronoi_neighbors(s, d_thresh=4.0, w_thresh=0.4)
        assert len(nbrs[0]) == 6
        for sym, idx, sa, wn, d in nbrs[0]:
            assert sym == "Na" and idx == 0
            assert sa == pytest.approx(4 * np.pi / 6, rel=1e-8)
            assert wn == pytest.approx(1.0)
            assert d == pytest.approx(3.0)

    def test_fcc_twelve_neighbors(self):
        fr = [[0, 0, 0], [0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]
        s = Structure.from_frac(["Cu"] * 4, fr, np.eye(3) * 4.0)
        nbrs = compute_voronoi_neighbors(s, d_thresh=4.0, w_thresh=0.0)
        for atom_nbrs in nbrs:
            assert len(atom_nbrs) == 12
            for _, _, sa, wn, d in atom_nbrs:
                assert sa == pytest.approx(4 * np.pi / 12, rel=1e-6)
                assert d == pytest.approx(4.0 / np.sqrt(2), rel=1e-8)

    def test_facet_solid_angles_sum_to_4pi(self):
        # truncated-octahedron cell (BCC) — mixed facet sizes
        s = Structure.from_frac(["Fe", "Fe"], [[0, 0, 0], [0.5, 0.5, 0.5]], np.eye(3) * 2.9)
        facets = _voronoi_facets(s.coords, s.lattice, 2, 7.0)
        for f in facets:
            assert sum(x[1] for x in f) == pytest.approx(4 * np.pi, rel=1e-8)

    def test_distance_filter(self):
        s = Structure(["Na"], [[0.0, 0.0, 0.0]], np.eye(3) * 3.0)
        nbrs = compute_voronoi_neighbors(s, d_thresh=2.0, w_thresh=0.0)
        assert len(nbrs[0]) == 0  # all neighbors at 3.0 > 2.0

    def test_weight_filter(self):
        # BCC: 8 near hexagonal facets (large angle) + 6 far square facets
        s = Structure.from_frac(["Fe", "Fe"], [[0, 0, 0], [0.5, 0.5, 0.5]], np.eye(3) * 2.9)
        all_n = compute_voronoi_neighbors(s, d_thresh=10.0, w_thresh=0.0)
        assert len(all_n[0]) == 14
        # raise w_thresh above the square-facet angle -> only 8 hex facets kept
        sas = sorted(n[2] for n in all_n[0])
        cut = (sas[5] + sas[6]) / 2  # between 6 small and 8 large
        big = compute_voronoi_neighbors(s, d_thresh=10.0, w_thresh=cut)
        assert len(big[0]) == 8

    def test_molecule_boxed(self):
        # H2O-like: O at origin, two H at ~0.96 A
        coords = [[0, 0, 0], [0.9572, 0, 0], [-0.2399, 0.9266, 0]]
        mol = Structure(["O", "H", "H"], coords)
        nbrs = compute_voronoi_neighbors(mol, d_thresh=4.0, w_thresh=0.4)
        assert len(nbrs) == 3
        # O sees both H; each H sees O (and maybe the other H)
        o_nbr_idx = sorted(n[1] for n in nbrs[0])
        assert o_nbr_idx[:2] == [1, 2]
        assert any(n[1] == 0 for n in nbrs[1])
        assert any(n[1] == 0 for n in nbrs[2])
        # distances must be the raw molecule distances (boxing preserves geometry)
        d_oh = [n[4] for n in nbrs[0] if n[1] == 1][0]
        assert d_oh == pytest.approx(0.9572, rel=1e-6)

    def test_record_layout(self):
        s = Structure(["Na"], [[0.0, 0.0, 0.0]], np.eye(3) * 3.0)
        rec = compute_voronoi_neighbors(s)[0][0]
        # [species, index, solid_angle, normalized_weight, distance]
        assert isinstance(rec[0], str)
        assert isinstance(rec[1], int)
        assert all(isinstance(x, float) for x in rec[2:])

    def test_canonical_neighbor_order(self):
        # per-atom records are sorted strongest-facet-first (then nearest,
        # then index) — independent of qhull's arbitrary ridge enumeration
        rng = np.random.default_rng(3)
        lat = np.diag(rng.uniform(7, 11, 3))
        s = Structure(["Si"] * 20 + ["O"] * 20,
                      rng.uniform(0, 1, (40, 3)) @ lat, lattice=lat)
        for recs in compute_voronoi_neighbors(s, d_thresh=4.0, w_thresh=0.4):
            keys = [(-r[2], r[4], r[1]) for r in recs]
            assert keys == sorted(keys)


class TestStructure:
    def test_xyz_roundtrip(self, tmp_path):
        s = Structure(["C", "O"], [[0, 0, 0], [1.2, 0, 0]])
        p = str(tmp_path / "co.xyz")
        s.to_xyz(p)
        s2 = Structure.from_xyz(p)
        assert s2.species == ["C", "O"]
        np.testing.assert_allclose(s2.coords, s.coords, atol=1e-6)

    def test_xyz_with_lattice(self, tmp_path):
        s = Structure(["Si", "Si"], [[0, 0, 0], [1.3, 1.3, 1.3]], np.eye(3) * 5.4)
        p = str(tmp_path / "si.xyz")
        s.to_xyz(p)
        s2 = Structure.from_xyz(p)
        assert s2.is_periodic
        np.testing.assert_allclose(s2.lattice, s.lattice, atol=1e-6)

    def test_poscar(self, tmp_path):
        content = """Si2
1.0
  5.4 0.0 0.0
  0.0 5.4 0.0
  0.0 0.0 5.4
Si
2
Direct
  0.0 0.0 0.0
  0.25 0.25 0.25
"""
        p = tmp_path / "POSCAR"
        p.write_text(content)
        s = Structure.from_poscar(str(p))
        assert s.species == ["Si", "Si"]
        np.testing.assert_allclose(s.coords[1], [1.35, 1.35, 1.35])

    def test_from_file_cif(self, tmp_path):
        # reference load_file accepts CIF via pymatgen (general.py:178-203)
        cif = """data_NaCl
_cell_length_a 5.64
_cell_length_b 5.64
_cell_length_c 5.64
_cell_angle_alpha 90.0
_cell_angle_beta 90.0
_cell_angle_gamma 90.0
loop_
 _atom_site_type_symbol
 _atom_site_label
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 Na Na1 0.0 0.0 0.0
 Cl Cl1 0.5 0.5 0.5
"""
        p = tmp_path / "nacl.cif"
        p.write_text(cif)
        s = Structure.from_file(str(p))
        assert s.is_periodic
        assert sorted(s.species) == ["Cl", "Na"]
        np.testing.assert_allclose(np.abs(np.linalg.det(s.lattice)),
                                   5.64 ** 3, rtol=1e-6)

    def test_from_file_mol(self, tmp_path):
        # MDL molfile (V2000) — a molecule format the reference gets from
        # pymatgen; mol=True boxes it like load_file does
        molfile = """water
  test

  3  2  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 O   0  0
    0.9600    0.0000    0.0000 H   0  0
   -0.2400    0.9300    0.0000 H   0  0
  1  2  1  0
  1  3  1  0
M  END
"""
        p = tmp_path / "water.mol"
        p.write_text(molfile)
        s = Structure.from_file(str(p))
        assert not s.is_periodic
        assert s.species == ["O", "H", "H"]
        boxed = Structure.from_file(str(p), mol=True)
        assert boxed.is_periodic

    def test_from_file_rejects_unknown(self, tmp_path):
        p = tmp_path / "thing.pdf"
        p.write_text("x")
        with pytest.raises(ValueError, match="unsupported"):
            Structure.from_file(str(p))

    def test_boxed_centers_center_of_mass(self):
        mol = Structure(["O", "H", "H"], [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
        boxed = mol.boxed(box=10.0)
        assert boxed.is_periodic
        np.testing.assert_allclose(boxed.lattice, np.eye(3) * 10.0)
        np.testing.assert_allclose(boxed.center_of_mass, [5.0, 5.0, 5.0], atol=1e-9)
        # relative geometry preserved
        d1 = np.linalg.norm(mol.coords[1] - mol.coords[0])
        d2 = np.linalg.norm(boxed.coords[1] - boxed.coords[0])
        assert d1 == pytest.approx(d2)


class TestStructureValidation:
    """Construction-time validation: Structure is the boundary where user
    input (serve requests, CLI files) enters the framework, so invalid
    structures must fail here with a clear ValueError instead of a
    KeyError/qhull crash deep inside featurization."""

    def test_unknown_element_rejected(self):
        with pytest.raises(ValueError, match="unknown element.*Xx"):
            Structure(["C", "Xx"], [[0, 0, 0], [1, 0, 0]])

    def test_species_coords_mismatch_rejected(self):
        with pytest.raises(ValueError, match="2 species.*3 sites"):
            Structure(["C", "O"], [[0, 0, 0], [1, 0, 0], [2, 0, 0]])

    def test_non_finite_coords_rejected(self):
        with pytest.raises(ValueError, match="non-finite"):
            Structure(["C", "O"], [[0, 0, 0], [np.nan, 0, 0]])

    def test_empty_structure_rejected(self):
        with pytest.raises(ValueError, match="no atoms"):
            Structure([], np.zeros((0, 3)))

    def test_singular_lattice_rejected(self):
        lat = np.array([[5, 0, 0], [0, 5, 0], [5, 5, 0]], dtype=float)
        with pytest.raises(ValueError, match="singular lattice"):
            Structure(["Si"], [[0, 0, 0]], lat)

    def test_non_finite_lattice_rejected(self):
        lat = np.eye(3) * 5.0
        lat[2, 2] = np.inf
        with pytest.raises(ValueError, match="non-finite lattice"):
            Structure(["Si"], [[0, 0, 0]], lat)

    def test_atomic_numbers_accepted_as_species(self):
        s = Structure([8, 1, 1], [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
        assert s.species == ["O", "H", "H"]
        with pytest.raises(ValueError, match="out of range"):
            Structure([0], [[0, 0, 0]])
        with pytest.raises(ValueError, match="out of range"):
            Structure([200], [[0, 0, 0]])

    def test_truncated_xyz_rejected(self):
        lines = ["3", "water", "O 0 0 0", "H 0.96 0 0"]
        with pytest.raises(ValueError, match="declares 3 atoms.*2 site"):
            Structure.from_xyz_lines(lines)

    def test_bad_xyz_header_rejected(self):
        with pytest.raises(ValueError, match="atom count"):
            Structure.from_xyz_lines(["water", "comment", "O 0 0 0"])
        with pytest.raises(ValueError, match="empty xyz"):
            Structure.from_xyz_lines([])

    def test_malformed_xyz_site_line_rejected(self):
        with pytest.raises(ValueError, match="site line 4"):
            Structure.from_xyz_lines(["2", "", "O 0 0 0", "H 0.96 zero 0"])
        with pytest.raises(ValueError, match="site line 3"):
            Structure.from_xyz_lines(["1", "", "O 0 0"])

    def test_truncated_poscar_rejected(self, tmp_path):
        p = tmp_path / "POSCAR"
        p.write_text("Si2\n1.0\n5.4 0 0\n0 5.4 0\n0 0 5.4\nSi\n2\nDirect\n"
                     "0.0 0.0 0.0\n")
        with pytest.raises(ValueError, match="declares 2 sites.*1 coord"):
            Structure.from_poscar(str(p))
        p.write_text("Si2\n1.0\n")
        with pytest.raises(ValueError, match="too short"):
            Structure.from_poscar(str(p))
        p.write_text("Si2\nnot-a-scale\n5.4 0 0\n0 5.4 0\n0 0 5.4\nSi\n2\n"
                     "Direct\n0 0 0\n0.25 0.25 0.25\n")
        with pytest.raises(ValueError, match="malformed POSCAR"):
            Structure.from_poscar(str(p))

    def test_malformed_cif_row_rejected(self, tmp_path):
        from scann_tpu.data.builders.cif import parse_cif
        cif = """data_x
_cell_length_a 5.0
_cell_length_b 5.0
_cell_length_c 5.0
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
_atom_site_type_symbol
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
Si 0.0 0.0
"""
        with pytest.raises(ValueError, match="malformed CIF atom_site row"):
            parse_cif(cif)

    def test_truncated_molfile_rejected(self, tmp_path):
        p = tmp_path / "bad.mol"
        p.write_text("m\n\n\n  3  2  0  0  0  0  0  0  0  0999 V2000\n"
                     "    0.0 0.0 0.0 O   0  0\n")
        with pytest.raises(ValueError, match="declares 3 atoms"):
            Structure.from_molfile(str(p))
        p.write_text("too short\n")
        with pytest.raises(ValueError, match="too short"):
            Structure.from_molfile(str(p))


class TestNonOrthorhombicLattices:
    def test_hexagonal_lattice_facets_sum_to_4pi(self):
        # hcp-like hexagonal cell (graphite-ish lattice vectors)
        a, c = 2.46, 6.7
        lattice = np.array([[a, 0, 0],
                            [-a / 2, a * np.sqrt(3) / 2, 0],
                            [0, 0, c]])
        s = Structure.from_frac(["C", "C"], [[0, 0, 0], [1/3, 2/3, 0.5]], lattice)
        facets = _voronoi_facets(s.coords, s.lattice, 2, 7.0)
        for f in facets:
            assert sum(x[1] for x in f) == pytest.approx(4 * np.pi, rel=1e-8)

    def test_triclinic_lattice(self):
        lattice = np.array([[4.0, 0.0, 0.0],
                            [1.2, 3.8, 0.0],
                            [0.7, 1.1, 3.5]])
        fr = np.array([[0.1, 0.2, 0.3], [0.6, 0.7, 0.8], [0.3, 0.9, 0.1]])
        s = Structure.from_frac(["Si", "O", "O"], fr, lattice)
        facets = _voronoi_facets(s.coords, s.lattice, 2 + 1, 7.0)
        for f in facets:
            assert sum(x[1] for x in f) == pytest.approx(4 * np.pi, rel=1e-6)
        nbrs = compute_voronoi_neighbors(s, d_thresh=4.0, w_thresh=0.2)
        assert all(len(a) > 0 for a in nbrs)

    def test_hexagonal_graphite_in_plane_neighbors(self):
        # in-plane C-C distance a/sqrt(3) = 1.42 A: each C has 3 nearest
        a, c = 2.46, 6.7
        lattice = np.array([[a, 0, 0],
                            [-a / 2, a * np.sqrt(3) / 2, 0],
                            [0, 0, c]])
        s = Structure.from_frac(["C", "C"], [[0, 0, 0], [1/3, 2/3, 0.0]], lattice)
        nbrs = compute_voronoi_neighbors(s, d_thresh=1.6, w_thresh=0.0)
        for atom_nbrs in nbrs:
            dists = [n[4] for n in atom_nbrs]
            assert len(dists) == 3
            for d in dists:
                assert d == pytest.approx(a / np.sqrt(3), rel=1e-6)


class TestCellParameterLattice:
    def test_cif_lattice_volume(self):
        from scann_tpu.data.builders.cif import _lattice_from_parameters

        a, b, c = 5.0, 6.0, 7.0
        al, be, ga = 80.0, 95.0, 103.0
        lat = _lattice_from_parameters(a, b, c, al, be, ga)
        ca, cb, cg = (np.cos(np.radians(x)) for x in (al, be, ga))
        vol_expect = a * b * c * np.sqrt(
            1 - ca**2 - cb**2 - cg**2 + 2 * ca * cb * cg)
        assert abs(np.linalg.det(lat)) == pytest.approx(vol_expect, rel=1e-9)
        # vector lengths and angles round-trip
        assert np.linalg.norm(lat[0]) == pytest.approx(a)
        assert np.linalg.norm(lat[1]) == pytest.approx(b)
        assert np.linalg.norm(lat[2]) == pytest.approx(c)
        cos_al = lat[1] @ lat[2] / (b * c)
        assert cos_al == pytest.approx(ca, abs=1e-9)


class TestShearedLattice:
    def test_image_ranges_use_true_slab_heights(self):
        from scann_tpu.data.voronoi import _image_ranges

        L = np.array([[4, 0, 0], [10, 4, 0], [0, 0, 4]], float)
        # slab heights are V/|a_i x a_j| = [1.486, 4, 4]: the FIRST axis is
        # the thin one (its planes are squeezed by the shear of a_1)
        assert _image_ranges(L, 7.0) == [5, 2, 2]

    def test_sheared_cell_matches_converged_shell(self, monkeypatch):
        """Featurization of a monoclinic (sheared) cell must agree with a
        generously converged image shell — the old row-based heights
        under-counted the squeezed axis and silently corrupted kept solid
        angles (mp2018/smfe contain non-orthogonal cells)."""
        import scann_tpu.data.voronoi as V

        rng = np.random.default_rng(4)
        L = np.array([[4, 0, 0], [10, 4, 0], [0, 0, 4]], float)
        frac = rng.uniform(0.05, 0.95, size=(6, 3))
        s = Structure(["Si"] * 6, frac @ L, lattice=L)

        fast = V.compute_voronoi_neighbors(s)
        real_ranges = V._image_ranges
        monkeypatch.setattr(V, "_image_ranges",
                            lambda lat, cut: [r + 3 for r in
                                              real_ranges(lat, cut)])
        converged = V.compute_voronoi_neighbors(s)

        assert len(fast) == len(converged)
        for a, (r0, r1) in enumerate(zip(fast, converged)):
            s0 = sorted(r0, key=lambda r: (r[1], r[4]))
            s1 = sorted(r1, key=lambda r: (r[1], r[4]))
            assert [(r[0], r[1]) for r in s0] == [(r[0], r[1]) for r in s1], \
                f"atom {a}: record sets differ from converged shell"
            np.testing.assert_allclose(
                np.asarray([r[2:] for r in s0], np.float64),
                np.asarray([r[2:] for r in s1], np.float64),
                rtol=1e-9, atol=1e-12, err_msg=f"atom {a}")


class TestXyzLatticeHeuristic:
    def test_numeric_property_comment_stays_molecule(self):
        """A molecular xyz whose comment carries numeric properties (MD
        frames, QM9-style rows) must NOT be misread as a periodic cell."""
        lines = ["3", "1.0 2.0 3.0 4.0 5.0 6.0 7.0 8.0 9.0 10.0",
                 "O 0 0 0", "H 0.96 0 0", "H -0.24 0.93 0"]
        s = Structure.from_xyz_lines(lines)
        assert not s.is_periodic  # 10 tokens: not a bare lattice

        # exactly 9 floats forming a SINGULAR matrix is not a lattice either
        lines[1] = "1 2 3 2 4 6 3 6 9"
        assert not Structure.from_xyz_lines(lines).is_periodic

        # exactly 9 floats, non-singular: accepted as a lattice (POSCAR-ish
        # exports), matching previous behavior for real crystal files
        lines[1] = "8.5 0 0 0 8.5 0 0 0 4.8"
        s = Structure.from_xyz_lines(lines)
        assert s.is_periodic and s.lattice[0, 0] == 8.5
