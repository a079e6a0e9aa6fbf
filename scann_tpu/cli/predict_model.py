"""Full-dataset inference CLI.

    python -m scann_tpu.cli.predict_model <model_dir> [--out DIR]

Runs the trained model over its configured dataset and dumps
``energy_pre_{target}.pickle`` (per-structure predictions vs targets) and
``ga_scores_{target}.pickle`` (per-atom GA scores) — the artifacts of the
reference ``predict_model.py:50-92``.
"""

import argparse
import os
import pickle


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("model_dir", type=str)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args(argv)

    from scann_tpu.api import Scann

    scann = Scann.load_model_infer(args.model_dir)
    buckets = scann.prepare_dataset(split=False)
    preds, gas = scann.predict_data(buckets, with_ga=True)

    hyper = scann.config.hyper
    # restore dataset order (packed-layout handling lives in the helpers)
    import numpy as np

    from scann_tpu.train.loop import (
        bucket_structure_indices,
        bucket_structure_targets,
    )

    targets = []
    order = []
    for b in buckets:
        y = (bucket_structure_targets(b).astype(np.float64)
             * hyper.target_std + hyper.target_mean)
        targets.extend(y.tolist())
        order.extend(bucket_structure_indices(b).tolist())
    t = np.zeros(len(order), np.float64)
    t[np.asarray(order)] = targets

    out_dir = args.out or args.model_dir
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"energy_pre_{hyper.target}.pickle"), "wb") as f:
        pickle.dump({"prediction": preds, "target": t}, f)
    with open(os.path.join(out_dir, f"ga_scores_{hyper.target}.pickle"), "wb") as f:
        pickle.dump(gas, f)
    mae = float(np.mean(np.abs(preds - t)))
    print(f"{len(preds)} structures, MAE {mae:.6f} -> {out_dir}")


if __name__ == "__main__":
    main()
