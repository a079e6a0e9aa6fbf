"""Measure packed crystal training: segmented loop kernels vs the unpacked
loop kernels at an MP2018-like shape (9 layers, capacity M=96, N=32).

Run with TINY=1 JAX_PLATFORMS=cpu for a quick interpret-mode smoke.
Measured on the shared v5e (2026-08-18, heavy tenant load — the RELATIVE
number is the result, absolute times varied 10x that day):
  packed:   117.85 ms/step, 415.8 structs/s (49 structs/step, occ 89.2%)
  unpacked: 128.19 ms/step, 249.6 structs/s (B=32 slots, occ ~75%)
  -> packing = 1.67x structures/s at a crystal size spread (12-96 sites).
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from scann_tpu.config import ModelConfig
from __graft_entry__ import _synthetic_packed_slots, _synthetic_inputs

import os
TINY = bool(int(os.environ.get("TINY", "0")))
cfg = ModelConfig(n_atoms=95, embedding_dim=128, n_attention=2 if TINY else 9,
                  local_dim=16 if TINY else 128, num_head=4 if TINY else 8,
                  global_dim=16 if TINY else 128, dense_out=16 if TINY else 128, g_update=True, use_ga_norm=True,
                  gaussian_d=6.0)

from scann_tpu.kernels.scann_loop import loop_scann_train_grads
from scann_tpu.models import ScannModel

B = 4 if TINY else 32  # slots per step
# MP-like crystal size spread: uniform 12..96 sites, mean ~54
CAP, NN = (16, 8) if TINY else (96, 32)
p = _synthetic_packed_slots(n_structs=12 if TINY else 64, capacity=CAP, N=NN,
                            max_segments=8, seed=0, min_atoms=4 if TINY else 12,
                            max_atoms=CAP)
print("packed:", p.num_structures, "structs /", p.num_slots, "slots, occ",
      round(p.occupancy, 3))
idx = np.arange(B) % p.num_slots
inp = {k: jnp.asarray(v[idx]) for k, v in p.inputs.items()}
y = jnp.asarray(p.targets[idx])
structs_per_step = float(p.inputs["segment_mask"][idx].sum())

model = ScannModel(config=cfg)
params = model.init(jax.random.PRNGKey(0), inp, deterministic=True)["params"]

interp = jax.default_backend() == "cpu"
drop = 0.0 if interp else 0.1  # interpreter PRNG needs force_tpu_interpret_mode

@jax.jit
def step_packed(params, y, seed):
    pred, raw = loop_scann_train_grads(params, inp, y, cfg, False, interp,
                                       drop, seed)
    sm = inp["segment_mask"]
    n = sm.sum()
    rmse = jnp.sqrt(jnp.sum(jnp.square((pred - y) * sm)) / n)
    g = jax.tree.map(lambda r: r / (n * rmse), raw)
    return rmse, g

u = _synthetic_inputs(B=B, M=CAP, N=NN, seed=1)
uinp = {k: jnp.asarray(v) for k, v in u.items()}
uy = jnp.asarray(np.random.default_rng(1).normal(size=B).astype(np.float32))

@jax.jit
def step_unpacked(params, y, seed):
    pred, raw = loop_scann_train_grads(params, uinp, y, cfg, False, interp,
                                       drop, seed)
    rmse = jnp.sqrt(jnp.mean(jnp.square(pred[:, 0] - y)))
    g = jax.tree.map(lambda r: r / (B * rmse), raw)
    return rmse, g

def timeit(f, y, n=3 if interp else 20):
    r, g = f(params, y, jnp.int32(0)); float(r)
    t0 = time.perf_counter()
    for i in range(n):
        r, g = f(params, y + 1e-6 * i, jnp.int32(i)); float(r)
    return (time.perf_counter() - t0) / n

tp = timeit(step_packed, y)
tu = timeit(step_unpacked, uy)
print(f"packed:   {tp*1e3:.2f} ms/step, {structs_per_step/tp:.1f} structs/s "
      f"({structs_per_step:.0f} structs/step)")
print(f"unpacked: {tu*1e3:.2f} ms/step, {B/tu:.1f} structs/s (B={B})")
