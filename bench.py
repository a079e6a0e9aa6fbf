"""Training-throughput benchmark on the flagship QM9 SCANN+ config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the production training path — the whole-epoch ``lax.scan`` step
(forward + backward + Adam, RMSE + L2 loss, on-device shuffling/batching) —
on QM9-shaped data: batch 128, bucket (M=32 atoms, N=16 neighbors), the
reference architecture from configs/model_qm9.yaml (7 local-attention
layers, dim 128, 8 heads, g_update). Best of 3 epochs is reported (the
shared TPU's load varies).

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6).
The denominator 1500 structures/sec is our documented estimate of the
TF 2.10 single-GPU reference (batch 128, ~90 s/epoch over 110k QM9
structures on a paper-era V100-class card). BASELINE.md targets >= 5x.
"""

import json
import time

import numpy as np

BASELINE_STRUCTURES_PER_SEC = 1500.0  # documented TF-GPU reference estimate


def _ensure_backend():
    """The axon TPU plugin occasionally fails to register while
    JAX_PLATFORMS=axon is set; fall back to auto-selection."""
    import jax

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        jax.devices()


def main():
    import jax
    import jax.numpy as jnp

    _ensure_backend()

    from __graft_entry__ import _flagship_config, _synthetic_inputs
    from scann_tpu.data.pipeline import PackedBucket
    from scann_tpu.train import Trainer
    from scann_tpu.train.schedules import make_cosine_lr

    B, S, M, N = 128, 16384, 32, 16

    cfg = _flagship_config(batch_size=B)
    cfg.hyper.save_path = "/tmp/scann_tpu_bench"
    cfg.hyper.scheduler = "cosine"

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

    n_chips = len(jax.devices())
    per_chip = best / n_chips

    print(json.dumps({
        "metric": "train_structures_per_sec_per_chip_qm9_scann_plus",
        "value": round(per_chip, 1),
        "unit": "structures/s/chip",
        "vs_baseline": round(per_chip / BASELINE_STRUCTURES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
