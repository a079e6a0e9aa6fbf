"""The shipped experiment configs must load and build working models."""

import glob
import os

import jax
import numpy as np
import pytest

from scann_tpu.config import load_config
from scann_tpu.models import ScannModel

from conftest import make_synthetic_batch

CONFIGS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                        "configs", "*.yaml")))


def test_configs_exist():
    names = {os.path.basename(p) for p in CONFIGS}
    # the six reference experiments (reference configs/ directory)
    assert {"model_qm9.yaml", "model_qm9_std.yaml", "model_mp2018.yaml",
            "model_fullerene.yaml", "model_ptgp.yaml",
            "model_smfe.yaml"} <= names


@pytest.mark.parametrize("path", CONFIGS, ids=os.path.basename)
def test_config_builds_and_runs(path, rng):
    cfg = load_config(path)
    # shrink for test speed but keep the structural flags
    cfg.model.n_attention = 1
    cfg.model.local_dim = 16
    cfg.model.num_head = 2
    cfg.model.global_dim = 16
    cfg.model.dense_out = 8
    cfg.model.embedding_dim = 8
    inputs = make_synthetic_batch(rng, B=2, M=8, N=4,
                                  use_ring=cfg.model.use_ring,
                                  cgcnn=cfg.model.feature == "cgcnn",
                                  n_atoms=min(cfg.model.n_atoms, 10))
    model = ScannModel(config=cfg.model)
    params = model.init(jax.random.PRNGKey(0), inputs, deterministic=True)
    out = model.apply(params, inputs, deterministic=True)
    assert np.all(np.isfinite(np.asarray(out["property"])))
    assert cfg.hyper.lr > cfg.hyper.min_lr > 0
    assert cfg.hyper.scheduler in ("cosine", "sgdr")


def test_unknown_config_key_warns(tmp_path):
    """A typo'd hyperparameter must not silently train on the default."""
    import warnings

    from scann_tpu.config import ScannConfig

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = ScannConfig.from_dict(
            {"model": {}, "hyper": {"bach_size": 256}})
    assert any("bach_size" in str(x.message) for x in w)
    assert cfg.hyper.batch_size != 256  # default kept, but loudly
