"""One-command real-dataset accuracy validation vs the published baselines.

The north-star accuracy targets (BASELINE.md, reference README.md:140-153):

    QM9    HOMO MAE <= 41 meV       (SCANN) / 32 meV (SCANN+)
    MP2018 Ef   MAE <= 29 meV/atom  (SCANN) / 28 meV/atom (SCANN+)

This environment has no network egress, so the real datasets cannot be
fetched here — this script makes the validation ONE COMMAND the moment any
machine with egress (or pre-staged data) runs it:

    python tools/run_accuracy.py qm9                # HOMO, flagship config
    python tools/run_accuracy.py mp2018             # Ef, flagship config
    python tools/run_accuracy.py qm9 --target lumo --epochs 300

Per case it: (1) preprocesses the dataset (download -> featurize; skipped
if the .npy artifacts already exist at --data-root), (2) trains the
flagship recipe (configs/model_{ds}.yaml verbatim — SGDR, structure
packing, 1000 epochs / early stop 200 like reference train.py:50-59),
(3) evaluates the test split and prints MAE vs the target in a single JSON
line. Exit code 0 iff the target is met.

If the download fails (no egress) the script exits 3 with a SKIPPED line —
usable as a skip-guard from CI.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# MAE targets in the TARGET'S NATIVE UNITS (eV; reference README.md:140-153
# reports meV). Key: (dataset, target) -> (scann_mae_ev, scann_plus_mae_ev)
TARGETS_EV = {
    ("qm9", "homo"): (0.041, 0.032),
    ("qm9", "lumo"): (0.037, 0.031),
    ("qm9", "gap"): (0.061, 0.052),
    ("qm9", "alpha"): (0.141, 0.115),   # Bohr^3, not eV
    ("qm9", "Cv"): (0.050, 0.041),      # cal/(mol K)
    ("mp2018", "e_f"): (0.029, 0.028),
    ("mp2018", "e_b"): (0.260, 0.225),
}

DEFAULT_TARGET = {"qm9": "homo", "mp2018": "e_f"}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", choices=["qm9", "mp2018"])
    p.add_argument("--target", default=None,
                   help="property to train (default: homo / e_f)")
    p.add_argument("--data-root", default="processed_data",
                   help="where preprocessed .npy artifacts live / are built")
    p.add_argument("--save-path", default=None)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--pool", type=int, default=os.cpu_count() or 8,
                   help="featurization process-pool size")
    p.add_argument("--dt", type=float, default=4.0)
    p.add_argument("--wt", type=float, default=0.4)
    p.add_argument("--train-size", type=int, default=None,
                   help="override the config's split sizes (smoke tests)")
    p.add_argument("--test-size", type=int, default=None)
    args = p.parse_args(argv)

    ds = args.dataset
    target = args.target or DEFAULT_TARGET[ds]
    t_scann, t_plus = TARGETS_EV.get((ds, target), (None, None))

    # --- 1. preprocess (download-guarded) --------------------------------
    from scann_tpu.data.featurize import (
        neighbor_file_name, parallel_compute_neighbors)

    ds_dir = os.path.join(args.data_root, ds)
    energy_path = os.path.join(ds_dir, f"{ds}_data_energy.npy")
    nbr_path = os.path.join(ds_dir, neighbor_file_name(ds, args.dt, args.wt))
    if not os.path.exists(energy_path):
        from scann_tpu.data import builders

        print(f"Building dataset {ds} -> {ds_dir}", flush=True)
        try:
            builders.BUILDERS[ds](args.data_root)
        except RuntimeError as e:
            print(json.dumps({
                "status": "SKIPPED", "dataset": ds, "target": target,
                "reason": f"dataset download failed (no egress?): {e}"}))
            return 3
    if not os.path.exists(nbr_path):
        t0 = time.time()
        parallel_compute_neighbors(energy_path, nbr_path, d_t=args.dt,
                                   w_t=args.wt, pool=args.pool)
        print(f"featurized in {time.time() - t0:.0f}s", flush=True)

    # --- 2. train the flagship recipe ------------------------------------
    from scann_tpu.api import Scann
    from scann_tpu.config import load_config

    cfg = load_config(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "configs",
        f"model_{ds}.yaml"))
    cfg.hyper.target = target
    cfg.hyper.epochs = args.epochs
    cfg.hyper.data_energy_path = energy_path
    cfg.hyper.data_nei_path = nbr_path
    cfg.hyper.save_path = args.save_path or f"accuracy_runs/{ds}_{target}"
    cfg.tpu.structure_packing = True  # the production recipe
    if args.train_size is not None:
        cfg.hyper.train_size = args.train_size
    if args.test_size is not None:
        cfg.hyper.test_size = args.test_size

    sc = Scann(cfg)
    sc.prepare_dataset()
    t0 = time.time()
    sc.train()
    train_s = time.time() - t0

    # --- 3. evaluate vs the published target -----------------------------
    res = sc.evaluate()
    mae = float(res["test_mae"])
    variant_target = t_plus if cfg.model.g_update else t_scann
    out = {
        "status": "OK",
        "dataset": ds, "target": target,
        "variant": "scann_plus" if cfg.model.g_update else "scann",
        "test_mae": round(mae, 5), "test_r2": round(float(res["test_r2"]), 5),
        "published_mae_scann": t_scann, "published_mae_scann_plus": t_plus,
        "meets_published": (None if variant_target is None
                            else bool(mae <= variant_target)),
        "train_s": round(train_s, 1),
        "run_dir": sc.trainer.workdir,
    }
    print(json.dumps(out))
    return 0 if out["meets_published"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
