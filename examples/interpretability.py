"""GA-score interpretability walkthrough (script form of the reference's
``notebooks/qm9_pretrained.ipynb`` workflow).

Loads a trained model (an orbax run dir or a Keras H5 + config YAML), runs
single-structure inference on xyz files, and writes:

- per-atom GA scores printed next to the species,
- ``<name>_ga.xyz`` with the GA score as a 5th column (load in OVITO and
  color by the extra property to reproduce the paper's attention maps).

Offline demo (no checkpoint): trains a small model on synthetic data first.

    python examples/interpretability.py --model-dir RUN_DIR mol1.xyz ...
    python examples/interpretability.py --demo mol.xyz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def demo_model(workdir: str):
    """Train a small SCANN+ on synthetic molecules, return a Scann handle."""
    import numpy as np

    from scann_tpu.api import Scann
    from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig
    from scann_tpu.data.synthetic import make_synthetic_dataset

    data_dir = os.path.join(workdir, "data")
    e, n = make_synthetic_dataset(data_dir, n_structures=256, min_atoms=5,
                                  max_atoms=16, seed=0)
    cfg = ScannConfig(
        model=ModelConfig(n_atoms=12, embedding_dim=16, n_attention=3,
                          local_dim=64, num_head=4, global_dim=64,
                          dense_out=32, g_update=True),
        hyper=HyperConfig(batch_size=32, lr=1e-3, min_lr=1e-4, epochs=40,
                          patience=100, target="homo",
                          data_energy_path=e, data_nei_path=n,
                          save_path=os.path.join(workdir, "model")),
    )
    scann = Scann(cfg)
    scann.prepare_dataset()
    scann.train()
    scann.trainer.restore_checkpoint("best")
    return scann


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("files", nargs="+", help="xyz structure files")
    parser.add_argument("--model-dir", default=None,
                        help="trained run dir (config.yaml + checkpoints/best)")
    parser.add_argument("--demo", action="store_true",
                        help="train a quick synthetic model instead")
    parser.add_argument("--out", default="ga_out")
    args = parser.parse_args(argv)

    from scann_tpu.api import Scann
    from scann_tpu.data.structure import Structure

    if args.demo:
        scann = demo_model(os.path.join(args.out, "demo_model"))
    elif args.model_dir:
        scann = Scann.load_model_infer(args.model_dir)
    else:
        parser.error("need --model-dir or --demo")

    os.makedirs(args.out, exist_ok=True)
    for path in args.files:
        struct = Structure.from_file(path)
        value, ga = scann.predict_structure(struct)
        name = os.path.splitext(os.path.basename(path))[0]
        print(f"\n{name}: predicted {scann.config.hyper.target} = {value:.6f}")
        print("  per-atom GA scores (higher = more attended):")
        order = ga.argsort()[::-1]
        for rank, i in enumerate(order[:10]):
            print(f"    #{rank + 1}: atom {i} ({struct.species[i]})  "
                  f"GA = {ga[i]:.4f}")
        out_xyz = os.path.join(args.out, f"{name}_ga.xyz")
        struct.to_xyz(out_xyz, extra_columns=ga)
        print(f"  wrote {out_xyz} (color by column 5 in OVITO)")


if __name__ == "__main__":
    main()
