"""Training-throughput benchmark on the flagship QM9 SCANN+ config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures end-to-end training throughput (structures/sec/chip) of the full
train step (forward + backward + Adam update, RMSE + L2 loss) on QM9-shaped
data: batch 128, bucket (M=32 atoms, N=16 neighbors), the reference
architecture from configs/model_qm9.yaml (7 local-attention layers, 128 dims,
8 heads, g_update) — the exact workload of reference ``train.py`` per step.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6).
The denominator 1500 structures/sec is our documented estimate of the
TF 2.10 single-GPU reference (batch 128, ~90 s/epoch over 110 k QM9
structures on a paper-era V100-class card). BASELINE.md's target is
vs_baseline >= 5.
"""

import json
import time

import numpy as np

BASELINE_STRUCTURES_PER_SEC = 1500.0  # documented TF-GPU reference estimate


def main():
    import jax

    from __graft_entry__ import _flagship_config, _synthetic_inputs
    from scann_tpu.data.pipeline import PackedBucket
    from scann_tpu.train import Trainer

    B = 128
    S = 4096  # device-resident structures to sample batches from
    M, N = 32, 16

    cfg = _flagship_config(batch_size=B)
    cfg.hyper.save_path = "/tmp/scann_tpu_bench"

    inputs = _synthetic_inputs(B=S, M=M, N=N, seed=0)
    targets = np.random.default_rng(0).normal(size=S).astype(np.float32)
    bucket = PackedBucket(inputs=inputs, targets=targets, indices=np.arange(S))

    trainer = Trainer(cfg)
    trainer._make_steps()
    trainer.init_state({k: v[:1] for k, v in inputs.items()}, seed=0)
    (binputs, btargets), = trainer._put_buckets([bucket], "bench")

    rng = jax.random.PRNGKey(0)
    lr = np.float32(5e-4)
    idx_rng = np.random.default_rng(1)

    def step(state, i):
        idx = jax.device_put(
            idx_rng.integers(0, S, size=B).astype(np.int32), trainer._bsh)
        r = jax.random.fold_in(rng, i)
        return trainer._train_step(state, binputs, btargets, idx, lr, r)

    # warmup (compile + stabilize)
    state = trainer.state
    for i in range(20):
        state, m = step(state, i)
    jax.block_until_ready(m["loss"])

    n_steps = 200
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, m = step(state, 1000 + i)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    structures_per_sec = B * n_steps / dt
    per_chip = structures_per_sec / n_chips

    print(json.dumps({
        "metric": "train_structures_per_sec_per_chip_qm9_scann_plus",
        "value": round(per_chip, 1),
        "unit": "structures/s/chip",
        "vs_baseline": round(per_chip / BASELINE_STRUCTURES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
