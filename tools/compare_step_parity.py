"""Identical-weights, step-level TF-vs-JAX training parity (round-2 VERDICT #1).

The training-dynamics comparison (``compare_training_dynamics.py``) seeds the
two frameworks independently, so its convergence ratios are confounded by
init. This tool removes that confound: ONE set of initial parameters (drawn
by the JAX model, exported through the repo's H5 converter) is installed in
BOTH frameworks, both are fed the SAME batches, and we assert:

  A. forward outputs identical (<= 1e-5) — converter + graph parity,
  B. first-step loss AND per-variable gradients identical (<= 1e-5),
     with dropout disabled so no RNG enters (loss = RMSE + l2(1e-4)
     penalties, the full reference objective, scann_model.py:210-214),
  C. K optimizer steps track: Adam(eps=1e-7) + decay=1e-5 inverse-time lr
     (legacy Keras Adam semantics) applied to identical gradients keeps the
     parameter trajectories within tight tolerance,
  D. (report) full-recipe trajectories (dropout ON, per-framework RNG) from
     the identical init — the residual divergence is then attributable to
     RNG streams/batch order, not to the recipe.

Run (CPU, ~2 min):  python tools/compare_step_parity.py
"""

import json
import os
import sys

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")  # determinism for 1e-5 tolerances

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# module-level side effects: reference-dep stubs + sys.path for /root/reference
import compare_training_dynamics as dyn  # noqa: E402  (same tools/ dir)

import numpy as np  # noqa: E402

LR, DECAY, L2 = 1e-3, 1e-5, 1e-4


def build_pair(model_cfg: dict, seed: int = 0):
    """Build (tf_model, jax_trainer) sharing one set of initial parameters.

    The JAX init is exported with ``save_h5_weights`` and every dataset is
    assigned onto the matching TF variable — by the exact variable path, so
    any layout drift in the converter fails loudly here."""
    import tempfile

    import h5py
    import jax
    import tensorflow as tf

    jax.config.update("jax_platforms", "cpu")
    from scann.models.scann_model import create_model

    from scann_tpu.compat import save_h5_weights
    from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig, TpuConfig
    from scann_tpu.train import Trainer

    # reset Keras's global layer-name counters: a second create_model in one
    # session would otherwise yield 'global_attention_1', 'dense_4', ... and
    # break the name-keyed weight transfer
    tf.keras.backend.clear_session()
    tf.keras.utils.set_random_seed(seed)
    tf_model = create_model({"model": model_cfg, "hyper": {"target": "homo"}})

    cfg = ScannConfig(
        model=ModelConfig(**{k: v for k, v in model_cfg.items()
                             if k in ModelConfig.__dataclass_fields__}),
        hyper=HyperConfig(batch_size=dyn.BATCH, lr=LR, min_lr=1e-4,
                          target="homo", scheduler="sgdr", seed=seed,
                          save_path=tempfile.mkdtemp("parity")),
        tpu=TpuConfig(use_pallas=False),
    )
    trainer = Trainer(cfg)
    example = {
        "atomic": (np.zeros((1, 8, 92), np.float32)
                   if model_cfg.get("feature") == "cgcnn"
                   else np.zeros((1, 8), np.int32)),
        "atom_mask": np.ones((1, 8, 1), np.float32),
        "neighbors": np.zeros((1, 8, 4), np.int32),
        "neighbor_mask": np.ones((1, 8, 4), np.float32),
        "neighbor_weight": np.ones((1, 8, 4), np.float32),
        "neighbor_distance": np.ones((1, 8, 4), np.float32),
    }
    if model_cfg.get("use_ring"):
        example["ring_aromatic"] = np.zeros((1, 8, 2), np.float32)
    trainer.init_state(example, seed)

    with tempfile.TemporaryDirectory() as td:
        h5_path = os.path.join(td, "init.h5")
        save_h5_weights(trainer.state.params, cfg.model, h5_path)
        flat = {}
        with h5py.File(h5_path, "r") as f:
            def rec(g, prefix):
                for k, v in g.items():
                    if isinstance(v, h5py.Dataset):
                        flat[prefix + k] = np.array(v)
                    else:
                        rec(v, prefix + k + "/")
            rec(f["model_weights"], "")

    tf_vars = {v.name: v for v in tf_model.weights}
    assigned = set()
    for key, arr in flat.items():
        # dataset path "<layer>/<variable path>:0" -> variable name
        var_name = key.split("/", 1)[1]
        if var_name not in tf_vars:
            raise KeyError(
                f"H5 converter wrote '{var_name}' but the reference graph has "
                f"no such variable; graph has e.g. "
                f"{sorted(tf_vars)[:5]} ...")
        if tf_vars[var_name].shape != arr.shape:
            raise ValueError(f"{var_name}: shape {arr.shape} vs "
                             f"{tf_vars[var_name].shape}")
        tf_vars[var_name].assign(arr)
        assigned.add(var_name)
    missing = set(tf_vars) - assigned
    if missing:
        raise KeyError(f"TF variables not covered by the converter: {missing}")
    return tf_model, trainer


def tf_name_to_jax_path(var_name: str):
    """Map a TF variable name to the JAX param pytree path."""
    parts = var_name[:-2].split("/")  # strip ':0'
    if parts[0] == "embed_atom" and parts[-1] == "embeddings":
        return ("embed_atom", "embedding")
    rename = {"gamma": "scale", "beta": "bias"}
    leaf = rename.get(parts[-1], parts[-1])
    if parts[0].startswith("local_attention"):
        i = _suffix_idx(parts[0], "local_attention")
        block = f"local_attention_{i}"
        if parts[1].startswith("layer_normalization"):
            # creation order: layer_norm then (g_update) layer_norm_g; the
            # global LN counter makes per-layer order = numeric order
            return (block, None, leaf, parts[1])  # resolved by caller
        return (block, parts[1], leaf)
    if parts[0].startswith("residual_norm"):
        i = _suffix_idx(parts[0], "residual_norm")
        block = f"residual_norm_{i}"
        if parts[1].startswith("layer_normalization"):
            return (block, "layer_norm", leaf)
        return (block, None, leaf, parts[1])  # dense_k -> dense_1/dense_2
    if parts[0] == "global_attention":
        return ("global_attention", parts[1], leaf)
    if parts[0].startswith("dense") and parts[0] != "dense_embed":
        # ResidualNorm's inner Denses carry bare global 'dense_k' names
        # (no parent prefix): the 2j-th/2j+1-th unnamed dense in creation
        # order are residual_norm_j's dense_1/dense_2. Every other Dense in
        # the reference graph is explicitly named (scann_model.py:362-447).
        j, slot = divmod(_suffix_idx(parts[0], "dense"), 2)
        return (f"residual_norm_{j}", f"dense_{slot + 1}", leaf)
    return (parts[0], leaf)


def _suffix_idx(name: str, base: str) -> int:
    rest = name[len(base):]
    return int(rest[1:]) if rest else 0


def loss_and_grads_tf(tf_model, inp, y, training=False):
    import tensorflow as tf

    tf_inp = {k: tf.constant(v) for k, v in inp.items()}
    with tf.GradientTape() as tape:
        pred = tf_model(tf_inp, training=training)
        rmse = tf.sqrt(tf.reduce_mean(tf.square(pred[:, 0] - y)))
        loss = rmse + tf.add_n(tf_model.losses)
    grads = tape.gradient(loss, tf_model.trainable_variables)
    return (float(loss),
            {v.name: tf.convert_to_tensor(g).numpy() for v, g in
             zip(tf_model.trainable_variables, grads)})


def loss_and_grads_jax(trainer, inp, y):
    import jax
    import jax.numpy as jnp

    from scann_tpu.models.scann import l2_penalty

    def loss_fn(params):
        out = trainer.model.apply({"params": params}, inp, deterministic=True)
        pred = out["property"][:, 0]
        rmse = jnp.sqrt(jnp.mean(jnp.square(pred - y)))
        return rmse + l2_penalty(params, L2)

    loss, grads = jax.value_and_grad(loss_fn)(trainer.state.params)
    return float(loss), grads


def match_grads(tf_grads, jax_grads, model_cfg, atol):
    """Compare every TF gradient against the mapped JAX pytree leaf."""
    import jax

    flat = {"/".join(str(getattr(p, "key", p)) for p in path): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(
                jax_grads, is_leaf=lambda x: hasattr(x, "shape"))}
    # rebuild with simple keys
    flat = {k.replace("DictKey(key='", "").replace("')", ""): v
            for k, v in flat.items()}

    worst = (0.0, None)
    # tf_grads preserves tf_model.trainable_variables order == creation
    # order, which is what resolves numbered layer_normalization_k/dense_k
    # names onto block-local slots (layer_norm before layer_norm_g,
    # dense_1 before dense_2)
    ln_order = {}
    for name, g in tf_grads.items():
        path = tf_name_to_jax_path(name)
        if path[1] is None and len(path) == 4:
            # resolve numbered layer_normalization_k / dense_k within block
            block, _, leaf, keras_name = path
            jkeys = [k for k in flat
                     if k.startswith(block + "/")
                     and k.endswith("/" + leaf)]
            if keras_name.startswith("layer_normalization"):
                # block-local order: layer_norm before layer_norm_g;
                # residual_norm has a single layer_norm
                cands = sorted(k for k in jkeys
                               if "layer_norm" in k)
                pos = ln_order.setdefault(block + leaf, [])
                k = cands[len(pos)] if len(pos) < len(cands) else cands[-1]
                pos.append(keras_name)
            else:  # dense_k inside residual_norm: creation order dense_1, dense_2
                cands = sorted(k for k in jkeys if "/dense_" in k)
                pos = ln_order.setdefault(block + "dense" + leaf, [])
                k = cands[len(pos)]
                pos.append(keras_name)
            jg = flat[k]
        else:
            key = "/".join(path)
            matches = [k for k in flat if k == key]
            if not matches:
                raise KeyError(f"no JAX grad for TF var {name} (tried {key}); "
                               f"available: {sorted(flat)[:8]}...")
            jg = flat[key]
        d = float(np.max(np.abs(jg - g)))
        scale = float(np.max(np.abs(g))) + 1e-12
        if d > worst[0]:
            worst = (d, name)
        if d > atol * max(1.0, scale):
            raise AssertionError(
                f"gradient mismatch at {name}: max|diff|={d:.3e} "
                f"(grad scale {scale:.3e})")
    return worst


def run_parity(model_cfg=None, n_structures=128, k_steps=20, atol=1e-5,
               verbose=True):
    """Sections A-C. Returns a result dict; raises on any parity failure."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import optax
    import tensorflow as tf

    from scann_tpu.models.scann import l2_penalty

    model_cfg = dict(model_cfg or dyn.MODEL_CFG)
    out_dir = tempfile.mkdtemp("stepparity")
    buckets, tr, va = dyn.make_data(out_dir, n_structures,
                                    use_ring=model_cfg.get("use_ring", False),
                                    feature=model_cfg.get("feature", "atomic"))
    batches = dyn.bucket_to_tf_batches(buckets[0], tr, dyn.BATCH)

    tf_model, trainer = build_pair(model_cfg, seed=0)
    inp, y = batches[0]
    result = {}

    # A: forward parity on identical weights
    tf_pred = tf_model({k: tf.constant(v) for k, v in inp.items()},
                       training=False).numpy()[:, 0]
    out = trainer.model.apply({"params": trainer.state.params}, inp,
                              deterministic=True)
    jax_pred = np.asarray(out["property"])[:, 0]
    d_fwd = float(np.max(np.abs(tf_pred - jax_pred)))
    result["forward_max_abs_diff"] = d_fwd
    assert d_fwd <= atol, f"forward mismatch {d_fwd:.3e}"
    if verbose:
        print(f"A. forward parity: max|diff| = {d_fwd:.2e}  (<= {atol:g})")

    # B: first-step loss + gradient parity (no dropout => no RNG)
    tf_loss, tf_grads = loss_and_grads_tf(tf_model, inp, y)
    jax_loss, jax_grads = loss_and_grads_jax(trainer, inp, y)
    d_loss = abs(tf_loss - jax_loss)
    result["loss_tf"], result["loss_jax"] = tf_loss, jax_loss
    assert d_loss <= atol * max(1.0, abs(tf_loss)), (
        f"loss mismatch: TF {tf_loss:.8f} vs JAX {jax_loss:.8f}")
    worst = match_grads(tf_grads, jax_grads, model_cfg, atol)
    result["grad_worst_abs_diff"], result["grad_worst_var"] = worst
    if verbose:
        print(f"B. loss parity: TF {tf_loss:.8f}  JAX {jax_loss:.8f} "
              f"(diff {d_loss:.2e})")
        print(f"   gradient parity over {len(tf_grads)} variables: "
              f"worst max|diff| = {worst[0]:.2e} at {worst[1]}")

    # C: K optimizer steps on the same batch sequence (no dropout).
    # Both sides: Adam(b1=.9, b2=.999, eps=1e-7), lr = LR/(1+DECAY*t) —
    # the legacy Keras Adam 'decay' semantics the reference compiles with.
    opt = tf.keras.optimizers.legacy.Adam(LR, decay=DECAY, epsilon=1e-7)
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-7)
    opt_state = tx.init(trainer.state.params)
    params = trainer.state.params

    @jax.jit
    def jstep(params, opt_state, step, inp, y):
        def loss_fn(p):
            out = trainer.model.apply({"params": p}, inp, deterministic=True)
            pred = out["property"][:, 0]
            return (jnp.sqrt(jnp.mean(jnp.square(pred - y)))
                    + l2_penalty(p, L2))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        lr = LR / (1.0 + DECAY * step)
        params = optax.apply_updates(
            params, jax.tree.map(lambda u: -lr * u, updates))
        return params, opt_state, loss

    tf_losses, jax_losses = [], []
    for t in range(k_steps):
        binp, by = batches[t % len(batches)]
        ltf, grads = loss_and_grads_tf(tf_model, binp, by)
        opt.apply_gradients(zip([grads[v.name] for v in
                                 tf_model.trainable_variables],
                                tf_model.trainable_variables))
        params, opt_state, lj = jstep(params, opt_state, float(t), binp, by)
        tf_losses.append(ltf)
        jax_losses.append(float(lj))
    d_traj = float(np.max(np.abs(np.array(tf_losses) - np.array(jax_losses))))
    result["k_steps"] = k_steps
    result["step_loss_tf"] = tf_losses
    result["step_loss_jax"] = jax_losses
    result["step_loss_max_diff"] = d_traj
    # float32 divergence compounds over steps; 20 steps stays ~1e-5..1e-4
    step_tol = 50 * atol
    assert d_traj <= step_tol, (
        f"{k_steps}-step loss trajectories diverged: max|diff| {d_traj:.3e}")
    if verbose:
        print(f"C. {k_steps} Adam(decay) steps: per-step loss max|diff| = "
              f"{d_traj:.2e}  (<= {step_tol:g})")
        print(f"   loss {tf_losses[0]:.6f} -> TF {tf_losses[-1]:.6f} / "
              f"JAX {jax_losses[-1]:.6f}")
    return result


def run_trajectory(model_cfg=None, n_structures=256, epochs=30, verbose=True):
    """Section D: full recipe (dropout ON), identical init, both frameworks.

    Residual divergence here is RNG streams + batch order only — the
    recipe itself is pinned exact by sections A-C."""
    import tempfile

    model_cfg = dict(model_cfg or dyn.MODEL_CFG)
    out_dir = tempfile.mkdtemp("trajparity")
    buckets, tr, va = dyn.make_data(out_dir, n_structures)
    tf_train = dyn.bucket_to_tf_batches(buckets[0], tr, dyn.BATCH)
    tf_val = dyn.bucket_to_tf_batches(buckets[0], va, dyn.BATCH)

    tf_model, trainer = build_pair(model_cfg, seed=0)
    init_params = trainer.state.params

    import tensorflow as tf

    from scann.models.scann_model import root_mean_squared_error

    steps = len(tf_train) * epochs
    lr = tf.keras.optimizers.schedules.CosineDecay(
        dyn.LR, 0.5 * steps, alpha=dyn.MIN_LR / dyn.LR)
    tf_model.compile(loss=root_mean_squared_error,
                     optimizer=tf.keras.optimizers.legacy.Adam(lr, decay=1e-5),
                     metrics=["mae"])
    # flatten the fixed batches back to rows so the TF loop can do a true
    # per-epoch sample-level reshuffle, like the real reference DataIterator
    # (datagenerator.py:61-64) and our Trainer's on-device permutation — the
    # round-2 dynamics comparison trained TF in a FIXED batch order, which
    # measurably slows its convergence and confounded the comparison
    rows = {k: np.concatenate([i[k] for i, _ in tf_train])
            for k in tf_train[0][0]}
    row_y = np.concatenate([y for _, y in tf_train])
    n_rows = len(row_y)
    B = dyn.BATCH
    ref = {"loss": [], "val_mae": []}
    shuffle_rng = np.random.default_rng(0)
    for ep in range(epochs):
        perm = shuffle_rng.permutation(n_rows)
        losses = []
        for s in range(0, n_rows - B + 1, B):
            sel = perm[s:s + B]
            losses.append(tf_model.train_on_batch(
                {k: v[sel] for k, v in rows.items()}, row_y[sel],
                return_dict=True)["loss"])
        maes = [float(np.mean(np.abs(tf_model.predict_on_batch(i)[:, 0] - y)))
                for i, y in tf_val]
        ref["loss"].append(float(np.mean(losses)))
        ref["val_mae"].append(float(np.mean(maes)))

    # ours: same init via load_params, cosine schedule, dropout on
    from scann_tpu.data.pipeline import subset_buckets

    trainer.config.hyper.scheduler = "cosine"
    trainer.config.hyper.epochs = epochs
    trainer.load_params(init_params)
    ours = trainer.fit(subset_buckets(buckets, tr), subset_buckets(buckets, va),
                       epochs=epochs, log_fn=lambda s: None)

    r_best, o_best = min(ref["val_mae"]), min(ours["val_mae"])
    ratio = o_best / r_best
    d0 = abs(ref["loss"][0] - ours["loss"][0]) / ref["loss"][0]
    corr = float(np.corrcoef(ref["loss"], ours["loss"])[0, 1])
    if verbose:
        print(f"D. full-recipe trajectories from IDENTICAL init "
              f"({epochs} epochs):")
        step = max(1, epochs // 10)
        print("   epoch |  ref loss |  jax loss |  ref val_mae |  jax val_mae")
        for e in list(range(0, epochs, step)) + [epochs - 1]:
            print(f"   {e:5d} | {ref['loss'][e]:9.4f} | {ours['loss'][e]:9.4f}"
                  f" | {ref['val_mae'][e]:12.4f} | {ours['val_mae'][e]:12.4f}")
        print(f"   best val MAE: TF {r_best:.4f}  JAX {o_best:.4f} "
              f"(ratio {ratio:.3f}); epoch-0 loss rel diff {d0:.3f}; "
              f"loss corr {corr:.4f}")
    # With the recipe pinned exact (A-C) and identical init, the residual
    # spread is dropout/shuffle RNG only: symmetric band, no "favorable
    # gap" escape hatch (the round-2 harness's ratio<=1.2-only criterion).
    assert d0 <= 0.05, f"epoch-0 loss differs {d0:.1%} from identical init"
    assert 0.8 <= ratio <= 1.25, f"best-val ratio {ratio:.3f} outside band"
    assert corr > 0.9, f"loss-curve correlation {corr:.3f} too low"
    return {"reference": ref, "scann_tpu": ours, "best_ratio": ratio,
            "epoch0_rel_diff": d0, "loss_corr": corr}


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--k-steps", type=int, default=20)
    p.add_argument("--n-structures", type=int, default=256)
    p.add_argument("--skip-trajectory", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    result = run_parity(n_structures=args.n_structures, k_steps=args.k_steps)
    if not args.skip_trajectory:
        result["trajectory"] = run_trajectory(
            n_structures=args.n_structures, epochs=args.epochs)
    path = args.out or os.path.join(os.path.dirname(__file__), "..",
                                    "results", "step_parity.json")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {path}")
    print("STEP PARITY: PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
