"""Generate reference-featurizer parity fixtures (run where pymatgen/openbabel exist).

This environment has neither pymatgen nor openbabel, so record-for-record
parity of the from-scratch featurizer (``scann_tpu/data/voronoi.py``) against
pymatgen's ``VoronoiNN`` (reference ``voronoi_neighbor.py:26-60``), and of
``scann_tpu/data/builders/bonds.py`` against OpenBabel's ring/aromatic
perception (reference ``qm9.py:126-135``), cannot be asserted here. This
script closes that gap the portable way: run it on ANY machine that has
``pymatgen`` (and optionally ``openbabel``), commit the JSON files it writes
into ``tests/fixtures/parity/``, and ``tests/test_voronoi_parity.py`` /
``tests/test_bonds_parity.py`` activate automatically (they skip while no
fixtures exist).

Usage (on a machine with the deps):

    python tools/make_parity_fixtures.py \
        --molecules /path/to/scann--material/experiments/molecules \
        --out tests/fixtures/parity

It reproduces the reference recipe EXACTLY:

- molecules: pymatgen ``Molecule.get_boxed_structure`` with the >=10 A box
  of ``compute_voronoi_neighbor_wrapper`` (``voronoi_neighbor.py:82-88``),
- ``VoronoiNN(weight="solid_angle", cutoff=7, allow_pathological=True,
  compute_adj_neighbors=False)`` then the w >= w_t AND w/max >= 0.2 AND
  d <= d_t filter (``voronoi_neighbor.py:26-51``),
- ring/aromatic: pybel xyz parse + ``OBAtom.IsInRing`` / ``IsAromatic``
  (``qm9.py:126-135``).

Each fixture JSON embeds the structure itself (species/coords/lattice), so
the parity tests have no dependency on the reference checkout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# A few deterministic crystals so the periodic path is covered too. Species /
# lattices picked to exercise: high-symmetry (rocksalt), low-symmetry
# (distorted perovskite), and a 2-species hexagonal cell.
CRYSTALS = {
    "rocksalt_NaCl": {
        "lattice": (np.eye(3) * 5.64).tolist(),
        "species": ["Na", "Cl", "Na", "Cl", "Na", "Cl", "Na", "Cl"],
        "frac": [
            [0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [0.0, 0.5, 0.0], [0.5, 0.5, 0.0],
            [0.0, 0.0, 0.5], [0.5, 0.0, 0.5], [0.0, 0.5, 0.5], [0.5, 0.5, 0.5],
        ],
    },
    "perovskite_CaTiO3_distorted": {
        "lattice": [[3.9, 0.05, 0.0], [0.0, 3.85, 0.03], [0.02, 0.0, 3.92]],
        "species": ["Ca", "Ti", "O", "O", "O"],
        "frac": [
            [0.0, 0.0, 0.0], [0.5, 0.5, 0.5],
            [0.5, 0.5, 0.02], [0.5, 0.0, 0.5], [0.0, 0.5, 0.48],
        ],
    },
    "wurtzite_ZnO": {
        "lattice": [[3.25, 0.0, 0.0], [-1.625, 2.8146, 0.0], [0.0, 0.0, 5.2]],
        "species": ["Zn", "Zn", "O", "O"],
        "frac": [
            [1 / 3, 2 / 3, 0.0], [2 / 3, 1 / 3, 0.5],
            [1 / 3, 2 / 3, 0.3825], [2 / 3, 1 / 3, 0.8825],
        ],
    },
}


def read_xyz(path):
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f]
    n = int(lines[0].split()[0])
    species, coords = [], []
    for ln in lines[2:2 + n]:
        t = ln.replace("*^", "e").split()
        species.append(t[0])
        coords.append([float(t[1]), float(t[2]), float(t[3])])
    return species, np.array(coords, dtype=np.float64)


def reference_voronoi_molecule(species, coords, d_t, w_t):
    """compute_voronoi_neighbor_wrapper for a molecule (voronoi_neighbor.py:82-90)."""
    from pymatgen.core import Molecule

    from_ref = _import_reference_featurizer()
    mol = Molecule(species, coords)
    a = max(10, coords[:, 0].max() - coords[:, 0].min() + 0.1)
    b = max(10, coords[:, 1].max() - coords[:, 1].min() + 0.1)
    c = max(10, coords[:, 2].max() - coords[:, 2].min() + 0.1)
    boxed = mol.get_boxed_structure(a, b, c, reorder=False)
    return from_ref(boxed, 7, d_t, w_t)


def reference_voronoi_crystal(species, frac, lattice, d_t, w_t):
    from pymatgen.core import Structure

    from_ref = _import_reference_featurizer()
    struct = Structure(lattice=lattice, coords=frac, species=species,
                       coords_are_cartesian=False)
    return from_ref(struct, 7, d_t, w_t)


def _import_reference_featurizer():
    """Prefer the actual reference function if the repo is importable;
    otherwise use the inline re-statement below (same code path)."""
    try:
        from scann.utils.voronoi_neighbor import compute_voronoi_neighbor
        return compute_voronoi_neighbor
    except ImportError:
        return _compute_voronoi_neighbor_inline


def _compute_voronoi_neighbor_inline(struct, cutoff=7, d_thresh=4.0,
                                     w_thresh=0.4, max_cutoff=30):
    """Verbatim semantics of reference voronoi_neighbor.py:11-61."""
    from pymatgen.analysis.local_env import VoronoiNN

    voronoi = VoronoiNN(weight="solid_angle", cutoff=cutoff,
                        allow_pathological=True, compute_adj_neighbors=False)
    local_xyz = []
    for i in range(len(struct)):
        while True:
            try:
                nns = voronoi.get_voronoi_polyhedra(struct, i).values()
                max_weight = max(nn["solid_angle"] for nn in nns)
                local_xyz.append([
                    [nn["site"].species_string, nn["site"].index,
                     nn["solid_angle"], nn["solid_angle"] / max_weight,
                     float(np.linalg.norm(struct[i].coords - nn["site"].coords))]
                    for nn in nns
                    if nn["solid_angle"] >= w_thresh
                    and nn["solid_angle"] / max_weight >= 0.2
                    and np.linalg.norm(struct[i].coords - nn["site"].coords) <= d_thresh
                ])
                break
            except Exception:
                cutoff += 5.0
                if cutoff > max_cutoff:
                    raise
                voronoi = VoronoiNN(weight="solid_angle", cutoff=cutoff,
                                    allow_pathological=True)
    return local_xyz


def openbabel_flags(xyz_path):
    """Reference qm9.py:126-135: pybel parse + per-atom ring/aromatic."""
    try:
        from openbabel import pybel
    except ImportError:
        try:
            import pybel
        except ImportError:
            return None
    mol = next(pybel.readfile("xyz", xyz_path))
    atoms = [x.OBAtom for x in mol.atoms]
    return {
        "ring": [1 if at.IsInRing() else 0 for at in atoms],
        "aromatic": [1 if at.IsAromatic() else 0 for at in atoms],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--molecules", default=None,
                    help="dir of .xyz files (e.g. reference experiments/molecules)")
    ap.add_argument("--out", default="tests/fixtures/parity")
    ap.add_argument("--d_t", type=float, default=4.0)
    ap.add_argument("--w_t", type=float, default=0.4)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    wrote = 0

    if args.molecules:
        for fname in sorted(os.listdir(args.molecules)):
            if not fname.endswith(".xyz"):
                continue
            path = os.path.join(args.molecules, fname)
            species, coords = read_xyz(path)
            fixture = {
                "kind": "molecule",
                "species": species,
                "coords": coords.tolist(),
                "d_t": args.d_t,
                "w_t": args.w_t,
                "voronoi": reference_voronoi_molecule(
                    species, coords, args.d_t, args.w_t),
            }
            flags = openbabel_flags(path)
            if flags is not None:
                fixture["flags"] = flags
            name = os.path.splitext(fname)[0]
            with open(os.path.join(args.out, f"mol_{name}.json"), "w") as f:
                json.dump(fixture, f)
            wrote += 1
            print(f"wrote mol_{name}.json")

    for name, c in CRYSTALS.items():
        fixture = {
            "kind": "crystal",
            "species": c["species"],
            "frac": c["frac"],
            "lattice": c["lattice"],
            "d_t": args.d_t,
            "w_t": args.w_t,
            "voronoi": reference_voronoi_crystal(
                c["species"], c["frac"], c["lattice"], args.d_t, args.w_t),
        }
        with open(os.path.join(args.out, f"xtal_{name}.json"), "w") as f:
            json.dump(fixture, f)
        wrote += 1
        print(f"wrote xtal_{name}.json")

    print(f"{wrote} fixtures in {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
