"""A/B: bf16 loop stash vs full recompute at the ptgp-like ring-crystal
shape (11L, use_ring, M=128, N=32) — the shape whose f32 selective stash
overflows VMEM (fits_loop_stash False), which round 4 left on the exact
full-recompute schedule. SCANN_TPU_LOOP_STASH_BF16=1 halves the stash and
re-admits the +15-24% schedule at bf16-rounded gradient rebuilds
(parity-bounded in tests/test_loop_kernels.py).

Usage: python benchmarks/ptgp_stash_bench.py [recompute|bf16]
Appends a JSON line to benchmarks/ptgp_stash_bench.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1]
if mode == "bf16":
    os.environ["SCANN_TPU_LOOP_STASH_BF16"] = "1"

import jax

try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")

import jax.numpy as jnp

from __graft_entry__ import _synthetic_inputs
from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig
from scann_tpu.data.pipeline import PackedBucket
from scann_tpu.kernels.scann_loop import loop_stash_mode
from scann_tpu.train import Trainer
from scann_tpu.train.schedules import make_cosine_lr

cfg = ScannConfig(
    model=ModelConfig(n_atoms=95, embedding_dim=128, n_attention=11,
                      local_dim=128, num_head=8, global_dim=128,
                      dense_out=128, g_update=True, use_ga_norm=True,
                      use_ring=True, gaussian_d=6.0),
    hyper=HyperConfig(batch_size=32, lr=1e-4, min_lr=5e-5, target="e_f",
                      save_path=f"/tmp/scann_ptgp_{mode}",
                      scheduler="cosine"),
)
M, N, S = 128, 32, 1024
inputs = _synthetic_inputs(B=S, M=M, N=N, seed=0)
rng0 = np.random.default_rng(0)
inputs["ring_aromatic"] = rng0.integers(0, 2, (S, M, 2)).astype(np.float32)
inputs["ring_aromatic"] *= inputs["atom_mask"]
targets = rng0.normal(size=S).astype(np.float32)
bucket = PackedBucket(inputs=inputs, targets=targets, indices=np.arange(S))

stash = loop_stash_mode(cfg.model, M, N)
trainer = Trainer(cfg)
trainer._lr_fn = make_cosine_lr(cfg.hyper.lr, cfg.hyper.min_lr, S // 32, 100)
trainer._make_steps()
trainer.init_state({k: v[:1] for k, v in inputs.items()}, seed=0)
(binputs, btargets), = trainer._put_buckets([bucket], "bench")

rng = jax.random.PRNGKey(0)
state = trainer.state
t0 = time.perf_counter()
state, m = trainer._train_epoch(state, binputs, btargets, rng,
                                jnp.float32(0.0))
loss0 = float(m["loss"])
compile_s = time.perf_counter() - t0
best = 0.0
for e in range(3):
    t0 = time.perf_counter()
    state, m = trainer._train_epoch(state, binputs, btargets,
                                    jax.random.fold_in(rng, e),
                                    jnp.float32(0.0))
    float(m["loss"])
    best = max(best, S / (time.perf_counter() - t0))
out = {"mode": mode, "stash_mode": stash, "structs_per_sec": round(best, 1),
       "first_loss": round(loss0, 5), "compile_s": round(compile_s, 1),
       "backend": jax.default_backend(), "M": M, "N": N, "L": 11, "B": 32}
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ptgp_stash_bench.jsonl"), "a") as f:
    f.write(json.dumps(out) + "\n")
print(json.dumps(out))
