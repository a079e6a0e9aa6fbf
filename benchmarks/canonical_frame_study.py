"""Canonical-frame accuracy study (round-4 VERDICT #6).

The boxed-molecule featurization is weakly frame-dependent: the padded box
is axis-aligned (reference ``voronoi_neighbor.py:82-87``), so the same
molecule in two orientations gets slightly different Voronoi solid angles
(measured ~10% on boxed molecules — ``data/voronoi.py`` docstring). The
framework ships an opt-in fix (``Structure.canonicalized``: mass-weighted
principal-axes frame) at serving; this study quantifies what the frame
actually costs and whether training + serving in the canonical frame
should be the default for molecules.

Design: synthetic molecules with a ROTATION-INVARIANT target
(``_synthetic_target`` is a function of interatomic distances only), each
placed in a random orientation — exactly the "client sends an arbitrary
frame" situation. Two identical trainings:

  A: featurized as-is (the reference pipeline; random frames),
  B: every molecule canonicalized before featurization.

Metrics:
  - test MAE of A and B (does canonical training cost accuracy?),
  - rotation robustness: for held-out molecules x K random rotations,
    the prediction spread (std) under all four serve modes
    (trained-A/B x serve plain/canonical). Canonical serving should be
    ~exactly invariant; the A-plain spread IS the frame artifact in
    target units.

Writes benchmarks/canonical_frame_study.json. Run on TPU (a few minutes).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from scann_tpu.api import Scann
from scann_tpu.config import ScannConfig
from scann_tpu.data.atomic_data import atomic_numbers
from scann_tpu.data.featurize import as_object_array, featurize_record
from scann_tpu.data.structure import Structure
from scann_tpu.data.synthetic import _random_molecule, _synthetic_target

N_STRUCTURES = 8000
EPOCHS = int(os.environ.get("CANON_EPOCHS", "12"))
N_ROBUST = 32   # held-out molecules for the rotation test
K_ROT = 6       # rotations per molecule


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def build_datasets(out_dir):
    rng = np.random.default_rng(42)
    base = []  # (syms, rotated coords, target)
    for _ in range(N_STRUCTURES + N_ROBUST):
        n_atoms = int(rng.integers(8, 21))
        syms, coords = _random_molecule(rng, n_atoms)
        coords = coords - coords.mean(0)
        coords = coords @ random_rotation(rng).T  # arbitrary client frame
        base.append((syms, coords, _synthetic_target(syms, coords)))
    robust = base[N_STRUCTURES:]
    base = base[:N_STRUCTURES]
    base.sort(key=lambda t: len(t[0]))  # the pipeline's size sort

    paths = {}
    for variant in ("asis", "canonical"):
        records = []
        for i, (syms, coords, y) in enumerate(base):
            c = coords
            if variant == "canonical":
                c = Structure(list(syms), coords).canonicalized().coords
            records.append({
                "id": f"cf_{i:06d}", "Atoms": list(syms),
                "Atomic": np.array([atomic_numbers[s] for s in syms],
                                   np.int32),
                "Coords": np.asarray(c, np.float32),
                "Properties": {"homo": y},
            })
        d = os.path.join(out_dir, variant)
        os.makedirs(d, exist_ok=True)
        e_path = os.path.join(d, "cf_data_energy.npy")
        np.save(e_path, as_object_array(records))
        t0 = time.time()
        neighbors = [featurize_record(r, 4.0, 0.4) for r in records]
        n_path = os.path.join(d, "cf_data_neighbor_dt4.0_wt0.4.npy")
        np.save(n_path, as_object_array(neighbors))
        print(f"{variant}: featurized {len(records)} in {time.time()-t0:.0f}s",
              flush=True)
        paths[variant] = (e_path, n_path)
    return paths, robust


def train_variant(e_path, n_path, workdir):
    cfg = ScannConfig.from_dict({
        "model": {"n_atoms": 10, "embedding_dim": 48, "n_attention": 7,
                  "local_dim": 128, "num_head": 8, "global_dim": 128,
                  "dense_out": 128, "g_update": True, "use_ga_norm": True,
                  "gaussian_d": 4.0},
        "hyper": {"batch_size": 128, "epochs": EPOCHS, "patience": 200,
                  "train_size": N_STRUCTURES - 1200, "test_size": 600,
                  "lr": 5e-4, "min_lr": 1e-4, "scheduler": "sgdr",
                  "scaler": True, "save_path": workdir, "target": "homo",
                  "data_energy_path": e_path, "data_nei_path": n_path},
        "tpu": {"structure_packing": True},
    })
    sc = Scann(cfg)
    sc.prepare_dataset()
    sc.train()
    res = sc.evaluate()
    return sc, {"test_mae": round(float(res["test_mae"]), 5),
                "test_r2": round(float(res["test_r2"]), 5)}


def rotation_spread(sc, robust, canonical_frame, rng):
    """Per-molecule std of predictions across K_ROT random rotations,
    plus the MAE of the rotation-averaged prediction vs the true target."""
    stds, errs = [], []
    for syms, coords, y in robust:
        preds = []
        for _ in range(K_ROT):
            c = coords @ random_rotation(rng).T
            v, _ = sc.predict_structure(Structure(list(syms), c),
                                        canonical_frame=canonical_frame)
            preds.append(v)
        stds.append(float(np.std(preds)))
        errs.append(abs(float(np.mean(preds)) - y))
    return {"pred_std_mean": round(float(np.mean(stds)), 6),
            "pred_std_p95": round(float(np.percentile(stds, 95)), 6),
            "mae_vs_target": round(float(np.mean(errs)), 5)}


def main():
    out_dir = "/tmp/canonical_frame_study"
    paths, robust = build_datasets(out_dir)

    results = {"epochs": EPOCHS, "n_structures": N_STRUCTURES}
    models = {}
    for variant in ("asis", "canonical"):
        e, n = paths[variant]
        sc, metrics = train_variant(e, n, os.path.join(out_dir, f"run_{variant}"))
        models[variant] = sc
        results[f"train_{variant}"] = metrics
        print(f"train_{variant}: {metrics}", flush=True)

    rng = np.random.default_rng(123)
    for trained, serve_canon, tag in [
        ("asis", False, "A_plain"),          # the reference situation
        ("asis", True, "A_canonical"),       # train/serve frame mismatch
        ("canonical", True, "B_canonical"),  # consistent canonical
        ("canonical", False, "B_plain"),     # mismatch the other way
    ]:
        results[f"robust_{tag}"] = rotation_spread(
            models[trained], robust, serve_canon,
            np.random.default_rng(rng.integers(2**31)))
        print(f"robust_{tag}: {results[f'robust_{tag}']}", flush=True)

    target_std = float(np.std([y for _, _, y in robust]))
    results["robust_target_std"] = round(target_std, 5)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "canonical_frame_study.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
