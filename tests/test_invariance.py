"""Physics-invariance properties the stack must satisfy.

The reference never tests these, but they are load-bearing for the model
family (npj Comput. Mater. 9:215 §2): the featurizer consumes only
distances and Voronoi solid angles, and the attention stack is symmetric
over atoms, so relabeling atoms must permute GA scores and leave the
property prediction unchanged. A regression in masking, gather indexing,
padding, or the Voronoi geometry pipeline typically breaks one of these
before it breaks a golden-file test.

Frame-dependence caveat (measured, and inherited from the reference):
molecules are boxed into an AXIS-ALIGNED padded cell before tessellation
(reference voronoi_neighbor.py:83-87; our structure.as_periodic). The box
images bound the Voronoi cells of surface atoms, so a GENERIC rotation of
the coordinates moves the box relative to the molecule and perturbs kept
solid angles (measured up to ~10% relative on Thymine) and can flip
borderline filter decisions — only distances are frame-exact. Exact
invariance therefore holds for the box-congruent motions (signed axis
permutations + translations), which is what we pin here; the generic-
rotation sensitivity is a documented property of the reference's boxed
construction, not a bug in this port."""

import numpy as np
import pytest

from conftest import jit_apply, jit_init_vars

from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig, TpuConfig
from scann_tpu.data.structure import Structure
from scann_tpu.data.voronoi import compute_voronoi_neighbors

THYMINE = "/root/reference/experiments/molecules/Thymine.xyz"

# a box-congruent rigid motion: signed axis permutation (det +1) + shift
SIGNED_PERM = np.array([[0, 1, 0], [0, 0, -1], [-1, 0, 0]], np.float64)


def _by_index(per_atom):
    """Sort each atom's records by neighbor index so comparisons don't
    depend on the strongest-first emission order."""
    return [sorted(recs, key=lambda r: (r[1], -r[2])) for recs in per_atom]


def test_featurizer_box_congruent_motion_invariance():
    """A signed axis permutation + translation keeps the padded box
    congruent with the molecule, so every neighbor record — (species,
    index) sets, solid angles, normalized weights, distances — must
    reproduce to fp noise."""
    mol = Structure.from_file(THYMINE, mol=True)
    moved = Structure(list(mol.species), mol.coords @ SIGNED_PERM.T + 3.25)

    base = _by_index(compute_voronoi_neighbors(mol))
    rot = _by_index(compute_voronoi_neighbors(moved))
    assert len(base) == len(rot) == len(mol)
    for a, (r0, r1) in enumerate(zip(base, rot)):
        assert [(r[0], r[1]) for r in r0] == [(r[0], r[1]) for r in r1], \
            f"atom {a}: neighbor (species, index) sets differ"
        np.testing.assert_allclose(
            np.asarray([r[2:] for r in r0], np.float64),
            np.asarray([r[2:] for r in r1], np.float64),
            rtol=1e-9, atol=1e-12, err_msg=f"atom {a} records drifted")


def test_featurizer_generic_rotation_distances_exact():
    """Under a GENERIC rotation the boxed construction may flip borderline
    filter decisions and perturb solid angles (module docstring) — but the
    distances of every commonly-kept record are a pure function of the
    internal geometry and must stay exact, and the drift must stay bounded
    well below the filter scale for the vast majority of records."""
    rng = np.random.default_rng(7)
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    mol = Structure.from_file(THYMINE, mol=True)
    moved = Structure(list(mol.species),
                      mol.coords @ q.T + rng.normal(size=3) * 5.0)

    base = _by_index(compute_voronoi_neighbors(mol))
    rot = _by_index(compute_voronoi_neighbors(moved))
    n_common = n_total = 0
    for r0, r1 in zip(base, rot):
        d0 = {r[1]: r for r in r0}
        d1 = {r[1]: r for r in r1}
        common = set(d0) & set(d1)
        n_common += len(common)
        n_total += max(len(d0), len(d1))
        for idx in common:
            assert d0[idx][0] == d1[idx][0]
            assert abs(d0[idx][4] - d1[idx][4]) < 1e-9   # distance exact
            assert abs(d0[idx][2] - d1[idx][2]) < 0.15 * d0[idx][2]
    # borderline filter flips must stay rare
    assert n_common >= 0.9 * n_total, (n_common, n_total)


def _random_rotation(rng):
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_canonical_frame_removes_rotation_dependence():
    """With canonical_frame (Structure.canonicalized — the opt-in fix for
    the boxed-construction frame sensitivity), a GENERIC rotation +
    translation must reproduce every neighbor record to fp noise: both
    copies land in the same principal-axes frame before boxing."""
    rng = np.random.default_rng(13)
    mol = Structure.from_file(THYMINE, mol=True)
    for t in range(3):
        moved = Structure(
            list(mol.species),
            mol.coords @ _random_rotation(rng).T + rng.normal(size=3) * 4.0)
        base = _by_index(compute_voronoi_neighbors(
            mol.canonicalized().as_periodic()))
        rot = _by_index(compute_voronoi_neighbors(
            moved.canonicalized().as_periodic()))
        for a, (r0, r1) in enumerate(zip(base, rot)):
            assert [(r[0], r[1]) for r in r0] == [(r[0], r[1]) for r in r1]
            np.testing.assert_allclose(
                np.asarray([r[2:] for r in r0], np.float64),
                np.asarray([r[2:] for r in r1], np.float64),
                rtol=1e-7, atol=1e-9,
                err_msg=f"trial {t} atom {a} records drifted")


def test_canonicalized_periodic_is_identity():
    """Crystals keep their lattice frame — canonicalized() is a no-op."""
    s = Structure(["Na", "Cl"], [[0, 0, 0], [1.5, 1.5, 1.5]],
                  lattice=np.eye(3) * 3.0)
    assert s.canonicalized() is s


def test_model_atom_permutation_equivariance():
    """Relabeling atoms (rows permuted, neighbor indices remapped) must
    leave the property prediction unchanged and permute the GA scores —
    the attention stack has no positional channel to break this."""
    import jax

    rng = np.random.default_rng(3)
    M, N = 8, 5
    inputs = {
        "atomic": rng.integers(1, 10, size=(1, M)).astype(np.int32),
        "atom_mask": np.ones((1, M, 1), np.float32),
        "neighbors": rng.integers(0, M, size=(1, M, N)).astype(np.int32),
        "neighbor_mask": np.ones((1, M, N), np.float32),
        "neighbor_weight": rng.uniform(0.5, 3.0, (1, M, N)).astype(np.float32),
        "neighbor_distance": rng.uniform(0.8, 4.0, (1, M, N)).astype(np.float32),
    }
    perm = rng.permutation(M)          # old index i -> new index perm[i]
    inv = np.argsort(perm)             # new row j holds old row inv[j]
    permuted = {k: v[:, inv] for k, v in inputs.items()}
    permuted["neighbors"] = perm[inputs["neighbors"]][:, inv].astype(np.int32)

    from scann_tpu.models import ScannModel

    for g_update in (False, True):
        cfm = ModelConfig(n_atoms=10, embedding_dim=16, n_attention=2,
                          local_dim=32, num_head=4, global_dim=32,
                          dense_out=16, g_update=g_update, use_ga_norm=True)
        model = ScannModel(config=cfm)
        params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
        out0 = jit_apply(model)(params, inputs)
        out1 = jit_apply(model)(params, permuted)
        np.testing.assert_allclose(np.asarray(out1["property"]),
                                   np.asarray(out0["property"]),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out1["ga_score"])[:, :, 0],
                                   np.asarray(out0["ga_score"])[:, inv, 0],
                                   rtol=0, atol=1e-5)


@pytest.mark.slow  # full Scann lifecycle + two featurizations + jit
def test_end_to_end_box_congruent_invariance():
    """xyz -> featurize -> model: a box-congruently moved copy in the same
    request must come back with the identical prediction and GA scores."""
    cfg = ScannConfig(
        model=ModelConfig(n_atoms=95, embedding_dim=16, n_attention=2,
                          local_dim=32, num_head=4, global_dim=32,
                          dense_out=16, g_update=True),
        hyper=HyperConfig(batch_size=4, target="homo", save_path="/tmp/inv"),
        tpu=TpuConfig(use_pallas=False))

    from scann_tpu.api import Scann

    s = Scann(cfg)
    s.trainer.init_state(s._example_inputs())
    mol = Structure.from_file(THYMINE, mol=True)
    # canonical_frame=False: the reference-compatible raw-frame path is
    # still invariant under BOX-CONGRUENT motions (its guaranteed class)
    moved = Structure(list(mol.species), mol.coords @ SIGNED_PERM.T - 2.5)
    (v0, ga0), (v1, ga1) = s.predict_structures([mol, moved],
                                                canonical_frame=False)
    assert abs(v1 - v0) < 1e-5, (v0, v1)
    np.testing.assert_allclose(ga1, ga0, rtol=0, atol=1e-5)

    # the DEFAULT serving path (canonical_frame on since round 4 — measured
    # exact rotation invariance at no accuracy cost,
    # benchmarks/canonical_frame_study.json): a GENERIC rotation +
    # translation predicts identically with no opt-in
    rng = np.random.default_rng(5)
    spun = Structure(list(mol.species),
                     mol.coords @ _random_rotation(rng).T + 1.75)
    (c0, cg0), (c1, cg1) = s.predict_structures([mol, spun])
    assert abs(c1 - c0) < 1e-5, (c0, c1)
    np.testing.assert_allclose(cg1, cg0, rtol=0, atol=1e-5)
    # single-structure API: same default
    d0, _ = s.predict_structure(mol)
    d1, _ = s.predict_structure(spun)
    assert abs(d1 - d0) < 1e-5, (d0, d1)
