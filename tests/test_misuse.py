"""Negative-path / misuse-guard tests (round-2 VERDICT weak #7, next #8).

Fast: nothing here trains or runs a forward pass.
"""

import numpy as np
import pytest

from scann_tpu.api import Scann, _ladder
from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig
from scann_tpu.data.structure import Structure

WATER = Structure(["O", "H", "H"],
                  [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])


def _bare_scann():
    cfg = ScannConfig(
        model=ModelConfig(n_atoms=12, embedding_dim=8, n_attention=1,
                          local_dim=16, num_head=2, global_dim=16,
                          dense_out=8, g_update=True),
        hyper=HyperConfig(batch_size=4, target="homo"),
    )
    return Scann(cfg)  # no init_state / checkpoint / pretrained


def test_predict_structure_without_state_raises_actionable():
    s = _bare_scann()
    with pytest.raises(RuntimeError, match="train\\(\\) first|load_model_infer"):
        s.predict_structure(WATER)


def test_predict_structures_without_state_raises_actionable():
    s = _bare_scann()
    with pytest.raises(RuntimeError, match="no.* are loaded|none are loaded"):
        s.predict_structures([WATER])


def test_predict_data_without_buckets_raises():
    s = _bare_scann()
    with pytest.raises(RuntimeError, match="prepare_dataset"):
        s.predict_data()


def test_predict_data_without_state_raises(tmp_path):
    s = _bare_scann()
    # hand it buckets but no state: must hit the state guard, not an
    # AttributeError deep inside the trainer
    with pytest.raises(RuntimeError, match="none are loaded"):
        s.predict_data(buckets=[])


def test_ladder_is_monotone_bounded_and_aligned():
    base = 8
    prev = 0
    seen = set()
    for x in range(1, 2000):
        q = _ladder(x, base)
        assert q >= x and q % base == 0
        assert q >= prev  # monotone in x
        prev = q
        seen.add(q)
        assert q <= max(2 * x, base)  # never more than 2x padding waste
    # bounded shape set: 2000 distinct sizes collapse to a handful of levels
    assert len(seen) <= 16


def test_evaluate_without_data_raises_actionable(tmp_path):
    """evaluate() with no prepared data must raise the same actionable
    RuntimeError style as predict_data, not a TypeError on None."""
    s = _bare_scann()
    s.config.hyper.save_path = str(tmp_path / "ev")
    s.trainer.workdir = str(tmp_path / "ev_homo")
    s.trainer.init_state(s._example_inputs())
    s.trainer.save_checkpoint("best")  # parameters exist, data doesn't
    with pytest.raises(RuntimeError, match="prepare_dataset"):
        s.evaluate()


def test_predict_structure_accepts_file_path():
    """predict_structure / predict_structures take a file path as well as a
    Structure, mirroring the reference's path-based load_file workflow
    (general.py:178-203)."""
    s = _bare_scann()
    s.trainer.init_state(s._example_inputs())
    # smallest fixture (15 atoms) keeps featurization quick
    path = "/root/reference/experiments/molecules/Thymine.xyz"
    v1, ga1 = s.predict_structure(path)
    from scann_tpu.data.structure import Structure

    v2, ga2 = s.predict_structure(Structure.from_file(path))
    assert v1 == v2
    np.testing.assert_array_equal(ga1, ga2)
    (v3, ga3), = s.predict_structures([path])
    assert np.isfinite(v3)


def test_out_of_vocab_atomic_number_raises_actionable():
    """Serving a structure whose atomic number exceeds model.n_atoms must
    raise, not predict NaN: jnp.take's fill mode turns an out-of-range
    embedding lookup into silent NaNs (found with Cl Z=17 vs n_atoms=12)."""
    s = _bare_scann()  # n_atoms=12
    s.trainer.init_state(s._example_inputs())
    nacl = Structure(["Na", "Cl"], [[0, 0, 0], [2.85, 2.85, 2.85]],
                     lattice=np.eye(3) * 5.7)
    with pytest.raises(ValueError, match="Cl.*n_atoms=12|n_atoms=12.*Cl"):
        s.predict_structure(nacl)
    with pytest.raises(ValueError, match="n_atoms=12"):
        s.predict_structures([WATER, nacl])
    # in-vocab structures still serve
    v, ga = s.predict_structure(WATER)
    assert np.isfinite(v) and ga.shape == (3,)


def test_out_of_vocab_dataset_raises_at_prepare(tmp_path):
    """Training data with out-of-vocab Z fails at prepare_dataset with an
    actionable message instead of training on NaN embeddings."""
    from scann_tpu.config import TpuConfig
    from scann_tpu.data.synthetic import make_synthetic_dataset

    # synthetic crystals use Si/O/Al/Fe/Mg -> Z up to 26
    e, n = make_synthetic_dataset(str(tmp_path), n_structures=8,
                                  min_atoms=4, max_atoms=8, periodic=True)
    cfg = ScannConfig(
        model=ModelConfig(n_atoms=12, embedding_dim=8, n_attention=1,
                          local_dim=16, num_head=2, global_dim=16,
                          dense_out=8, g_update=True),
        hyper=HyperConfig(batch_size=4, target="homo",
                          save_path=str(tmp_path / "run"),
                          data_energy_path=e, data_nei_path=n,
                          train_size=4, test_size=2),
        tpu=TpuConfig(use_pallas=False),
    )
    s = Scann(cfg)
    with pytest.raises(ValueError, match="n_atoms=12"):
        s.prepare_dataset()
