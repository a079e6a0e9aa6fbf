"""Single-file inference CLI with GA-score visualization output.

    python -m scann_tpu.cli.predict_files <model_dir> <save_path> <file.xyz...> \
        [--mol] [--dt 4.0] [--wt 0.4]

For each input structure, predicts the target property and writes
``<save_path>/<name>_ga.xyz`` with per-atom GA scores as an extra column
(OVITO-loadable — the working version of the reference's broken
``predict_files.py``; its intended output format is at
``predict_files.py:47-59``), plus ``<save_path>/predictions.json``.
"""

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("model_dir", type=str,
                        help="training run dir (config.yaml + checkpoints/)")
    parser.add_argument("save_path", type=str)
    parser.add_argument("files", nargs="+", type=str)
    parser.add_argument("--mol", action="store_true",
                        help="accepted for reference-CLI compatibility; "
                             "molecule boxing happens automatically during "
                             "featurization")
    parser.add_argument("--dt", type=float, default=4.0)
    parser.add_argument("--wt", type=float, default=0.4)
    args = parser.parse_args(argv)

    from scann_tpu.api import Scann
    from scann_tpu.data.structure import Structure

    scann = Scann.load_model_infer(args.model_dir)
    os.makedirs(args.save_path, exist_ok=True)

    results = {}
    for path in args.files:
        # keep the file's own coordinates for output; prepare_input boxes
        # molecules into a periodic cell internally for the Voronoi step
        struct = Structure.from_file(path)
        value, ga = scann.predict_structure(struct, d_t=args.dt, w_t=args.wt)
        name = os.path.splitext(os.path.basename(path))[0]
        # inputs from different directories can share a basename — number
        # collisions instead of silently overwriting earlier outputs
        if name in results:
            k = 2
            while f"{name}_{k}" in results:
                k += 1
            name = f"{name}_{k}"
        out_xyz = os.path.join(args.save_path, f"{name}_ga.xyz")
        struct.to_xyz(out_xyz, extra_columns=ga)
        results[name] = {"prediction": value, "ga_scores": ga.tolist()}
        print(f"{name}: {scann.config.hyper.target} = {value:.6f} "
              f"-> {out_xyz}")

    with open(os.path.join(args.save_path, "predictions.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
