"""Production-scale packed lifecycle rehearsal on TPU: prepare (packed all
splits) -> train w/ per-epoch packed validation -> evaluate (packed test)
-> predict_data over the split union. Flagship QM9 architecture.

Measured on the shared v5e (2026-08-19): 23,400-25,700 structs/s steady
state INCLUDING per-epoch packed validation (round-2 bucketed rehearsal:
21,700-22,300), val R2 0.89 in 5 epochs on the synthetic target, full
predict_data(with_ga) over 6,000 structures in 196 s (one pinned
(M, N, SEG) shape -> one forward compile)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from scann_tpu.api import Scann
from scann_tpu.config import ScannConfig

t0 = time.time()
from scann_tpu.data.synthetic import make_synthetic_dataset
e, n = make_synthetic_dataset("/tmp/packed_lifecycle_data", n_structures=6000,
                              min_atoms=6, max_atoms=26, seed=4)
print(f"featurized 6000 structures in {time.time()-t0:.1f}s")

cfg = ScannConfig.from_dict({
    "model": {"n_atoms": 10, "embedding_dim": 48, "n_attention": 7,
              "local_dim": 128, "num_head": 8, "global_dim": 128,
              "dense_out": 128, "g_update": True, "use_ga_norm": True,
              "gaussian_d": 4.0},
    "hyper": {"batch_size": 128, "epochs": 5, "patience": 20,
              "train_size": 4800, "test_size": 600,
              "lr": 5e-4, "min_lr": 1e-4, "scheduler": "sgdr",
              "save_path": "/tmp/packed_lifecycle_out", "target": "homo",
              "data_energy_path": e, "data_nei_path": n},
    "tpu": {"structure_packing": True},
})
sc = Scann(cfg)
sc.prepare_dataset()
t1 = time.time()
rep = sc.train()
t_train = time.time() - t1
n_epochs = len(rep["loss"])
print(f"train: {n_epochs} epochs in {t_train:.1f}s "
      f"({4800 * n_epochs / t_train:.0f} structs/s incl per-epoch packed "
      f"validation + compiles)")
print("last-epoch structs/s incl validation:",
      round(4800 / rep["epoch_time"][-1], 1))
assert rep["loss"][-1] < rep["loss"][0]
res = sc.evaluate()
print("evaluate:", res)
t2 = time.time()
preds, gas = sc.predict_data(with_ga=True)
print(f"predict_data(with_ga): {len(preds)} structures in "
      f"{time.time()-t2:.1f}s; finite={bool(np.isfinite(preds).all())}")
assert len(preds) == 6000 and np.isfinite(preds).all()
assert len(gas) == 6000
print("PACKED LIFECYCLE OK")
