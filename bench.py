"""Training-throughput benchmark on the flagship QM9 SCANN+ config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "secondary": {...mp2018-shaped metric...}}

Measures the production training path — the whole-epoch ``lax.scan`` step
(forward + backward + Adam, RMSE + L2 loss, on-device shuffling/batching) —
at two shapes:

- headline: QM9, batch 128, bucket (M=32 atoms, N=16 neighbors), reference
  configs/model_qm9.yaml architecture (7 layers, dim 128, 8 heads, g_update),
- secondary: MP2018 large-crystal bucket, batch 64, (M=96, N=32), reference
  configs/model_mp2018.yaml architecture (9 layers) — crystals of ~100 sites
  are the second accuracy target (BASELINE.md) and stress a completely
  different padding/VMEM regime.

Best of 3 epochs per shape (the shared TPU's load varies).

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6).
The QM9 denominator 1500 structures/sec is our documented estimate of the
TF 2.10 single-GPU reference (batch 128, ~90 s/epoch over 110k QM9
structures on a paper-era V100-class card). The MP2018 denominator scales
that estimate by the per-structure attention cost ratio — (M*N)
32*16 -> 96*32, x6 — and layer count 7 -> 9 (x1.29): 1500 / 7.7 ~= 195/s.
BASELINE.md targets >= 5x.
"""

import json
import time

import numpy as np

BASELINE_STRUCTURES_PER_SEC = 1500.0  # documented TF-GPU reference estimate
BASELINE_MP2018_PER_SEC = 195.0  # scaled by FLOP ratio (docstring)


def _ensure_backend():
    """The axon TPU plugin occasionally fails to register while
    JAX_PLATFORMS=axon is set; fall back to auto-selection."""
    import jax

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        jax.devices()


def run_case(cfg, S, M, N):
    """Best-of-3 whole-epoch training throughput (structures/s/chip)."""
    import jax
    import jax.numpy as jnp

    from scann_tpu.data.pipeline import PackedBucket
    from scann_tpu.train import Trainer
    from scann_tpu.train.schedules import make_cosine_lr

    from __graft_entry__ import _synthetic_inputs

    B = cfg.hyper.batch_size
    inputs = _synthetic_inputs(B=S, M=M, N=N, seed=0)
    targets = np.random.default_rng(0).normal(size=S).astype(np.float32)
    bucket = PackedBucket(inputs=inputs, targets=targets, indices=np.arange(S))

    trainer = Trainer(cfg)
    trainer._lr_fn = make_cosine_lr(cfg.hyper.lr, cfg.hyper.min_lr, S // B, 100)
    trainer._make_steps()
    trainer.init_state({k: v[:1] for k, v in inputs.items()}, seed=0)
    (binputs, btargets), = trainer._put_buckets([bucket], "bench")

    rng = jax.random.PRNGKey(0)
    state = trainer.state

    # compile + warmup epoch. NOTE: sync via float(), not block_until_ready —
    # the axon platform's block_until_ready returns before execution finishes.
    state, m = trainer._train_epoch(state, binputs, btargets, rng,
                                    jnp.float32(0.0))
    float(m["loss"])

    best = 0.0
    for e in range(3):
        t0 = time.perf_counter()
        state, m = trainer._train_epoch(state, binputs, btargets,
                                        jax.random.fold_in(rng, e),
                                        jnp.float32(0.0))
        float(m["loss"])
        best = max(best, S / (time.perf_counter() - t0))
    return best / len(jax.devices())


def main():
    _ensure_backend()

    from __graft_entry__ import _flagship_config

    # headline: QM9 flagship
    cfg = _flagship_config(batch_size=128)
    cfg.hyper.save_path = "/tmp/scann_tpu_bench"
    cfg.hyper.scheduler = "cosine"
    qm9 = run_case(cfg, S=16384, M=32, N=16)

    # secondary: MP2018 large-crystal bucket (reference model_mp2018.yaml:
    # 9 layers, batch 64, gaussian_d 6.0; crystals ~100 sites)
    from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig

    mp_cfg = ScannConfig(
        model=ModelConfig(n_atoms=95, embedding_dim=128, n_attention=9,
                          local_dim=128, num_head=8, global_dim=128,
                          dense_out=128, g_update=True, use_ga_norm=True,
                          gaussian_d=6.0),
        hyper=HyperConfig(batch_size=64, lr=1e-4, min_lr=5e-5, target="e_f",
                          save_path="/tmp/scann_tpu_bench_mp"),
    )
    mp_cfg.hyper.scheduler = "cosine"
    mp = run_case(mp_cfg, S=2048, M=96, N=32)

    print(json.dumps({
        "metric": "train_structures_per_sec_per_chip_qm9_scann_plus",
        "value": round(qm9, 1),
        "unit": "structures/s/chip",
        "vs_baseline": round(qm9 / BASELINE_STRUCTURES_PER_SEC, 3),
        "secondary": {
            "metric": "train_structures_per_sec_per_chip_mp2018_M96_scann_plus",
            "value": round(mp, 1),
            "unit": "structures/s/chip",
            "vs_baseline": round(mp / BASELINE_MP2018_PER_SEC, 3),
        },
    }))


if __name__ == "__main__":
    main()
