"""FULL QM9-scale dress rehearsal on TPU: the exact flagship production
recipe (configs/model_qm9.yaml — 110,000 train / 10,831 test structures,
batch 128, SGDR, structure packing) on a synthetic dataset of the same
size and atom-count distribution (9-29 atoms) as the real QM9
(reference qm9.py:101-107: 130,831 molecules).

This is the largest obtainable end-to-end validation while dataset egress
is blocked: it exercises the CSR cache, slot packing, device-resident
epoch scan, per-epoch packed validation, best-val checkpointing, SGDR,
evaluation, and bulk inference at the REAL dataset scale.

Measured on the shared v5e, 2026-08-20 (round 4; round-3 numbers in
parens):
  featurize+write   130,831 structures  547 s on 1 host core (was 3517 s —
                                        the native C++ cell clipper now
                                        carries the full-scale run)
  prepare_dataset   (CSR + packing)     55.9 s — 110k train -> 70,786
                                        32-row slots, occupancy 0.923
  train 25 epochs   110k structs/epoch  413.8 s total (epoch 0 carries the
                    kernel compiles); steady state **45,351 structs/s
                    INCLUDING per-epoch 10k-structure packed validation**
                    (was 37,826 — the keep-acts backward schedule's +20%
                    shows up at full production scale, same convergence)
  evaluate          10,831 test        7.3 s (was 219.2 s: the test split
                                        now shares the training shapes'
                                        compiled executables)
  predict w/ GA     20,831 structures  366.2 s (one predict compile; the
                                        compile varies with tenant load)
  convergence       val R2 0.9982, val MAE 0.032 std-units by epoch 25;
                    test MAE 0.0997 target-units (R2 0.9988)
Artifacts: /tmp/qm9_scale_out_homo/{report.txt,metrics.jsonl},
results JSON printed at the end.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from scann_tpu.api import Scann
from scann_tpu.config import ScannConfig

E = "/tmp/qm9_scale/qm9scale_data_energy.npy"
N = "/tmp/qm9_scale/qm9scale_data_neighbor_dt4.0_wt0.4.npy"
if not (os.path.exists(E) and os.path.exists(N)):
    sys.exit("generate the dataset first: make_synthetic_dataset('/tmp/qm9_scale', "
             "name='qm9scale', n_structures=130831, min_atoms=9, max_atoms=29)")

EPOCHS = int(os.environ.get("REHEARSAL_EPOCHS", "25"))
timings = {}

cfg = ScannConfig.from_dict({
    # flagship architecture, verbatim from configs/model_qm9.yaml
    "model": {"n_atoms": 10, "embedding_dim": 48, "n_attention": 7,
              "local_dim": 128, "num_head": 8, "global_dim": 128,
              "dense_out": 128, "use_attn_norm": True, "use_ga_norm": True,
              "g_update": True, "gaussian_d": 4.0},
    "hyper": {"batch_size": 128, "epochs": EPOCHS, "patience": 200,
              "train_size": 110000, "test_size": 10831,
              "lr": 5e-4, "min_lr": 1e-4, "scheduler": "sgdr",
              "scaler": True, "save_path": "/tmp/qm9_scale_out",
              "target": "homo", "data_energy_path": E, "data_nei_path": N},
    "tpu": {"structure_packing": True},
})

t = time.time()
sc = Scann(cfg)
sc.prepare_dataset()
timings["prepare_s"] = round(time.time() - t, 1)
pk = sc.train_buckets[0]
print(f"prepare: {timings['prepare_s']}s — train packed into "
      f"{pk.num_slots} slots ({pk.num_structures} structures, "
      f"occupancy {pk.occupancy:.3f})")

t = time.time()
rep = sc.train()
timings["train_s"] = round(time.time() - t, 1)
n_ep = len(rep["loss"])
# steady state: median of the last 10 epochs (excludes the compile epoch)
steady = float(np.median([110000 / s for s in rep["epoch_time"][-10:]]))
timings["steady_structs_per_s"] = round(steady, 1)
print(f"train: {n_ep} epochs in {timings['train_s']}s; steady state "
      f"{steady:.0f} structs/s incl per-epoch 10k-structure validation")
assert rep["loss"][-1] < rep["loss"][0]
assert rep["val_mae"][-1] < rep["val_mae"][0]

t = time.time()
res = sc.evaluate()
timings["evaluate_s"] = round(time.time() - t, 1)
print(f"evaluate: {timings['evaluate_s']}s — {res}")
assert np.isfinite(res["test_mae"])

# bulk inference with GA scores over ~13k structures (test + valid unions
# are packed; full-130k inference is just more of the same shape)
t = time.time()
preds, gas = sc.predict_data(sc.test_buckets + sc.valid_buckets, with_ga=True)
timings["predict_s"] = round(time.time() - t, 1)
print(f"predict_data(with_ga): {len(preds)} structures in "
      f"{timings['predict_s']}s")
assert np.isfinite(preds).all() and len(gas) == len(preds)

out = {"epochs": n_ep, "val_mae_first": round(rep["val_mae"][0], 4),
       "val_mae_last": round(rep["val_mae"][-1], 4),
       "val_r2_last": round(rep["val_r2"][-1], 4),
       "test_mae": round(res["test_mae"], 4),
       "test_r2": round(res["test_r2"], 4),
       "packed_slots": pk.num_slots, "occupancy": round(pk.occupancy, 4),
       **timings}
print("QM9-SCALE REHEARSAL OK", json.dumps(out))
