"""bf16-vs-f32 convergence rehearsal (round-4 VERDICT #1).

Trains the flagship QM9 architecture (configs/model_qm9.yaml shape, SGDR,
structure packing — the production recipe) twice on the same synthetic
dataset and seeds: once with model.dtype="float32", once with "bfloat16"
(kernel dots cast operands to bf16 with f32 accumulation; LN/softmax/
reductions stay f32 — kernels/dots.py). Prints a JSON comparison of the
val-MAE/R2 trajectories and test metrics.

Context: at the flagship shape bf16 does NOT change throughput (the fused
kernel is VPU/small-matmul bound; v5e already runs f32 matmuls as
single-pass bf16 MXU ops) — this script is the CONVERGENCE half of the
story: bf16 is safe, not just fast-neutral. See DESIGN.md "Precision".

Usage: python benchmarks/bf16_convergence.py [epochs]  (default 12)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from scann_tpu.api import Scann
from scann_tpu.config import ScannConfig

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 12

t0 = time.time()
from scann_tpu.data.synthetic import make_synthetic_dataset

e, n = make_synthetic_dataset("/tmp/bf16_conv_data", n_structures=20000,
                              min_atoms=9, max_atoms=29, seed=7)
print(f"featurized 20000 structures in {time.time()-t0:.1f}s", flush=True)

results = {}
for dtype in ("float32", "bfloat16"):
    cfg = ScannConfig.from_dict({
        "model": {"n_atoms": 10, "embedding_dim": 48, "n_attention": 7,
                  "local_dim": 128, "num_head": 8, "global_dim": 128,
                  "dense_out": 128, "g_update": True, "use_ga_norm": True,
                  "gaussian_d": 4.0, "dtype": dtype},
        "hyper": {"batch_size": 128, "epochs": EPOCHS, "patience": 200,
                  "train_size": 16000, "test_size": 2000,
                  "lr": 5e-4, "min_lr": 1e-4, "scheduler": "sgdr",
                  "scaler": True,
                  "save_path": f"/tmp/bf16_conv_out_{dtype}",
                  "target": "homo", "data_energy_path": e,
                  "data_nei_path": n},
        "tpu": {"structure_packing": True},
    })
    sc = Scann(cfg)
    sc.prepare_dataset()
    t1 = time.time()
    rep = sc.train()
    t_train = time.time() - t1
    res = sc.evaluate()
    results[dtype] = {
        "epochs": len(rep["loss"]),
        "train_s": round(t_train, 1),
        "steady_structs_per_sec": round(16000 / rep["epoch_time"][-1], 1),
        "val_mae_std_units": [round(float(v), 5) for v in rep["val_mae"]],
        "final_val_mae": round(float(rep["val_mae"][-1]), 5),
        "test_mae": round(float(res["test_mae"]), 5),
        "test_r2": round(float(res["test_r2"]), 5),
    }
    print(dtype, json.dumps(results[dtype]), flush=True)

f32, bf = results["float32"], results["bfloat16"]
results["comparison"] = {
    "test_mae_ratio_bf16_over_f32": round(bf["test_mae"] / f32["test_mae"], 4),
    "test_r2_delta": round(bf["test_r2"] - f32["test_r2"], 5),
    "throughput_ratio": round(bf["steady_structs_per_sec"]
                              / f32["steady_structs_per_sec"], 3),
}
print(json.dumps(results["comparison"]))
out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "bf16_convergence.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print("wrote", out)
