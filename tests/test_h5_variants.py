"""Published-H5 surface hardening (round-2 VERDICT #6).

The published figshare checkpoints were written by Keras-2.10-era
``model.save``. Beyond the plain layout round-2's golden fixtures cover,
real artifacts can carry:

- ``optimizer_weights`` groups (model saved after compile+fit),
- shifted global name counters (``local_attention_7``, ``dense_14``,
  ``global_attention_1``, ...) when the saved model was the SECOND one
  built in a session (transfer-learning runs, notebooks),
- ``layer_names`` / ``weight_names`` HDF5 attrs (written by model.save).

Each variant is generated here through the real legacy-Keras ``model.save``
and must load through ``load_h5_params`` with prediction parity against the
TF model that wrote it.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # builds/saves real Keras models

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

tf = pytest.importorskip("tensorflow")

import compare_training_dynamics as dyn  # noqa: E402  reference-dep stubs

from conftest import make_synthetic_batch  # noqa: E402

MODEL_CFG = dict(n_atoms=12, embedding_dim=8, n_attention=2, local_dim=16,
                 num_head=4, global_dim=16, dense_out=8, scale=0.5,
                 use_attn_norm=True, use_ga_norm=True, use_ring=False,
                 g_update=True, gaussian_d=4.0, feature="atomic",
                 use_drop=False)


def _jax_config():
    from scann_tpu.config import ModelConfig

    return ModelConfig(**{k: v for k, v in MODEL_CFG.items()
                          if k in ModelConfig.__dataclass_fields__})


def _assert_h5_matches_tf(h5_path, tf_model, rng):
    import jax

    from scann_tpu.compat import load_h5_params
    from scann_tpu.models import ScannModel

    cfm = _jax_config()
    params = load_h5_params(h5_path, cfm)
    model = ScannModel(config=cfm)
    batch = make_synthetic_batch(rng, B=4, M=10, N=6, n_atoms=cfm.n_atoms)
    jax_pred = np.asarray(
        model.apply(params, batch, deterministic=True)["property"])[:, 0]
    tf_pred = tf_model({k: tf.constant(v) for k, v in batch.items()},
                       training=False).numpy()[:, 0]
    np.testing.assert_allclose(jax_pred, tf_pred, atol=2e-5)


@pytest.fixture(scope="module")
def two_models_one_session(tmp_path_factory):
    """Build TWO models in one session; compile+train the first.

    Returns (h5_with_optimizer, h5_second_build, tf_model_1, tf_model_2)."""
    from scann.models.scann_model import create_model, root_mean_squared_error

    out = tmp_path_factory.mktemp("h5variants")
    tf.keras.backend.clear_session()
    tf.keras.utils.set_random_seed(0)

    m1 = create_model({"model": MODEL_CFG, "hyper": {"target": "homo"}})
    m1.compile(loss=root_mean_squared_error,
               optimizer=tf.keras.optimizers.legacy.Adam(1e-3, decay=1e-5),
               metrics=["mae"])
    rng = np.random.default_rng(3)
    batch = make_synthetic_batch(rng, B=8, M=10, N=6, n_atoms=12)
    y = rng.normal(size=8).astype(np.float32)
    m1.train_on_batch(batch, y)  # optimizer slots now exist
    p1 = str(out / "with_optimizer.h5")
    m1.save(p1)  # full-model H5 incl. optimizer_weights groups

    # second build, SAME session: global name counters are now shifted
    # (local_attention_2.., layer_normalization_6.., dense_4..,
    #  global_attention_1)
    m2 = create_model({"model": MODEL_CFG, "hyper": {"target": "homo"}})
    p2 = str(out / "second_build.h5")
    m2.save(p2)
    return p1, p2, m1, m2


def test_h5_with_optimizer_weights_loads(two_models_one_session, rng):
    p1, _, m1, _ = two_models_one_session
    import h5py

    with h5py.File(p1) as f:
        assert "optimizer_weights" in f  # variant is real
        assert "layer_names" in f["model_weights"].attrs
    _assert_h5_matches_tf(p1, m1, rng)


def test_h5_second_build_shifted_counters_loads(two_models_one_session, rng):
    _, p2, _, m2 = two_models_one_session
    import h5py

    with h5py.File(p2) as f:
        names = [n.decode() if isinstance(n, bytes) else str(n)
                 for n in f["model_weights"].attrs["layer_names"]]
    # variant is real: counters continue from the first build
    assert any(n.startswith("local_attention_") and
               int(n.rsplit("_", 1)[1]) >= MODEL_CFG["n_attention"]
               for n in names), names
    assert "global_attention_1" in names
    _assert_h5_matches_tf(p2, m2, rng)


def test_h5_wrong_depth_gives_actionable_error(two_models_one_session):
    from scann_tpu.compat import load_h5_params
    from scann_tpu.config import ModelConfig

    _, p2, _, _ = two_models_one_session
    bad = ModelConfig(**{**{k: v for k, v in MODEL_CFG.items()
                            if k in ModelConfig.__dataclass_fields__},
                         "n_attention": 5})
    with pytest.raises(ValueError, match="n_attention"):
        load_h5_params(p2, bad)
