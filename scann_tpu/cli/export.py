"""Export a trained run as a reference-layout Keras H5.

    python -m scann_tpu.cli.export <model_dir> <out.h5>

Loads the run directory's best checkpoint (``config.yaml`` +
``checkpoints/best``) and writes the weights in the reference's
``model_weights`` H5 layout (reference ``scann_model.py:165-177`` is what
its ModelCheckpoint produces) so the model can be handed to
reference-ecosystem tooling. Inverse of training with ``pretrained=``.
"""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_dir", type=str,
                        help="training run directory (config.yaml + checkpoints)")
    parser.add_argument("out", type=str, help="output .h5 path")
    args = parser.parse_args(argv)

    from scann_tpu.api import Scann

    scann = Scann.load_model_infer(args.model_dir)
    scann.export_h5(args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
