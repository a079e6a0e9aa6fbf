"""Mid-training migration from a reference full-model H5 checkpoint.

The reference's ModelCheckpoint saves the WHOLE model — weights AND Adam
state (scann_model.py:165-177). ``load_h5_params`` + ``load_h5_optimizer``
must therefore let a run move over mid-flight: train the real TF/Keras
reference K steps, save, import here, and the CONTINUATION must track the
TF continuation step for step. A single misrouted m/v slot (e.g. swapped
ResidualNorm inner denses) desyncs the very first post-migration update,
so this pins the whole slot-variable mapping.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # builds + trains a real Keras model

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

tf = pytest.importorskip("tensorflow")

import compare_training_dynamics as dyn  # noqa: E402  reference-dep stubs
from compare_step_parity import LR, DECAY, L2, loss_and_grads_tf  # noqa: E402

MODEL_CFG = dict(n_atoms=12, embedding_dim=8, n_attention=2, local_dim=16,
                 num_head=4, global_dim=16, dense_out=8, scale=0.5,
                 use_attn_norm=True, use_ga_norm=True, use_ring=False,
                 g_update=True, gaussian_d=4.0, feature="atomic",
                 use_drop=False)

K_PRE, K_POST = 4, 4


def test_optimizer_migration_continues_tf_trajectory(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from scann_tpu.compat import load_h5_optimizer, load_h5_params
    from scann_tpu.config import (HyperConfig, ModelConfig, ScannConfig)
    from scann_tpu.models.scann import l2_penalty
    from scann_tpu.train import Trainer

    # --- reference side: build, train K_PRE steps, save full H5 ----------
    from scann.models.scann_model import create_model, root_mean_squared_error

    tf.keras.backend.clear_session()
    tf.keras.utils.set_random_seed(0)
    tf_model = create_model({"model": MODEL_CFG, "hyper": {"target": "homo"}})
    opt = tf.keras.optimizers.legacy.Adam(LR, decay=DECAY, epsilon=1e-7)
    tf_model.compile(loss=root_mean_squared_error, optimizer=opt)

    buckets, tr_idx, _ = dyn.make_data(str(tmp_path / "data"), 96)
    batches = dyn.bucket_to_tf_batches(buckets[0], tr_idx, 16)

    for t in range(K_PRE):
        binp, by = batches[t % len(batches)]
        _, grads = loss_and_grads_tf(tf_model, binp, by)
        opt.apply_gradients(zip(
            [grads[v.name] for v in tf_model.trainable_variables],
            tf_model.trainable_variables))

    h5 = str(tmp_path / "midtrain.h5")
    tf_model.save(h5)

    # --- migrate: weights + Adam state into the Trainer ------------------
    cfm = ModelConfig(**{k: v for k, v in MODEL_CFG.items()
                         if k in ModelConfig.__dataclass_fields__})
    cfg = ScannConfig(model=cfm, hyper=HyperConfig(
        batch_size=16, lr=LR, min_lr=1e-4, target="homo",
        save_path=str(tmp_path / "run")))
    trainer = Trainer(cfg)
    trainer.load_params(load_h5_params(h5, cfm))
    count, mu, nu = load_h5_optimizer(h5, cfm)
    assert count == K_PRE
    # slot pytrees must mirror the param pytree exactly
    assert (jax.tree.structure(mu) ==
            jax.tree.structure(trainer.state.params))
    trainer.load_optimizer(count, mu, nu)
    assert int(trainer.state.step) == K_PRE
    assert int(trainer.state.opt_state.count) == K_PRE

    # --- continue K_POST steps on BOTH sides, same batches ---------------
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-7)
    params, opt_state = trainer.state.params, trainer.state.opt_state
    model = trainer.model

    @jax.jit
    def jstep(params, opt_state, step, inp, y):
        def loss_fn(p):
            out = model.apply({"params": p}, inp, deterministic=True)
            pred = out["property"][:, 0]
            return (jnp.sqrt(jnp.mean(jnp.square(pred - y)))
                    + l2_penalty(p, L2))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        lr = LR / (1.0 + DECAY * step)  # legacy Keras Adam decay semantics
        params = optax.apply_updates(
            params, jax.tree.map(lambda u: -lr * u, updates))
        return params, opt_state, loss

    tf_losses, jax_losses = [], []
    for t in range(K_PRE, K_PRE + K_POST):
        binp, by = batches[t % len(batches)]
        ltf, grads = loss_and_grads_tf(tf_model, binp, by)
        opt.apply_gradients(zip(
            [grads[v.name] for v in tf_model.trainable_variables],
            tf_model.trainable_variables))
        params, opt_state, lj = jstep(params, opt_state, float(t), binp, by)
        tf_losses.append(float(ltf))
        jax_losses.append(float(lj))

    d = np.max(np.abs(np.asarray(tf_losses) - np.asarray(jax_losses)))
    assert d <= 5e-5, (
        f"post-migration loss trajectories diverged: {d:.2e}\n"
        f"tf={tf_losses}\njax={jax_losses}")

    # post-continuation predictions must also agree (pins every slot: a
    # misrouted m/v shifts some parameter and therefore the output)
    binp, _ = batches[0]
    tf_pred = tf_model({k: tf.constant(v) for k, v in binp.items()},
                       training=False).numpy()[:, 0]
    jax_pred = np.asarray(model.apply({"params": params}, binp,
                                      deterministic=True)["property"])[:, 0]
    np.testing.assert_allclose(jax_pred, tf_pred, atol=5e-5)


def test_weights_only_h5_gives_actionable_error(tmp_path):
    from scann_tpu.compat import load_h5_optimizer, save_h5_weights
    from scann_tpu.config import ModelConfig

    cfm = ModelConfig(**{k: v for k, v in MODEL_CFG.items()
                         if k in ModelConfig.__dataclass_fields__})
    from scann_tpu.models import ScannModel
    import jax
    import numpy as np_

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import make_synthetic_batch

    model = ScannModel(config=cfm)
    rng = np_.random.default_rng(0)
    batch = make_synthetic_batch(rng, B=2, M=8, N=4, n_atoms=12)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    p = str(tmp_path / "weights_only.h5")
    save_h5_weights(params["params"], cfm, p)
    with pytest.raises(ValueError, match="optimizer_weights"):
        load_h5_optimizer(p, cfm)


def test_publisher_layout_fixture_loads():
    """The committed qm9full fixture carries the OTHER optimizer layout
    ("Adam/m/<var path>", Keras-2.10-era publisher style) — both layouts
    must map onto the same pytree."""
    import json

    import jax

    from scann_tpu.compat import load_h5_optimizer, load_h5_params
    from scann_tpu.config import ModelConfig

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    with open(os.path.join(fixdir, "scann_plus_qm9full.json")) as f:
        config = json.load(f)
    cfm = ModelConfig(**{k: v for k, v in config["model"].items()
                         if k in ModelConfig.__dataclass_fields__})
    h5 = os.path.join(fixdir, "scann_plus_qm9full.h5")
    params = load_h5_params(h5, cfm)["params"]
    count, mu, nu = load_h5_optimizer(h5, cfm)
    assert count >= 1  # fixture was saved after real train steps
    assert jax.tree.structure(mu) == jax.tree.structure(params)
    for (pa, pv), (ma, mv) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(mu),
                   key=lambda kv: str(kv[0]))):
        assert pv.shape == mv.shape, f"{pa}: {pv.shape} vs {mv.shape}"
