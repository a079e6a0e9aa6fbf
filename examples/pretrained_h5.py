"""Load a published Keras H5 SCANN checkpoint and run inference + GA scores
(script form of the reference ``notebooks/qm9_pretrained.ipynb``).

    python examples/pretrained_h5.py CONFIG.yaml MODEL.h5 mol1.xyz [mol2.xyz ...]

The H5 is converted to a Flax pytree on the fly (``scann_tpu.compat``); no
TensorFlow needed at inference time. With a real published QM9 checkpoint the
predictions match the reference to numerical tolerance (see
tests/test_golden.py for the locked-down parity evidence).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="experiment YAML (e.g. configs/model_qm9.yaml)")
    parser.add_argument("h5", help="Keras H5 checkpoint")
    parser.add_argument("files", nargs="+", help="xyz structure files")
    parser.add_argument("--dt", type=float, default=4.0)
    parser.add_argument("--wt", type=float, default=0.4)
    args = parser.parse_args(argv)

    from scann_tpu.api import Scann
    from scann_tpu.data.structure import Structure

    scann = Scann(args.config, pretrained=args.h5, mode="infer")
    target = scann.config.hyper.target

    for path in args.files:
        struct = Structure.from_file(path)
        value, ga = scann.predict_structure(struct, d_t=args.dt, w_t=args.wt)
        name = os.path.basename(path)
        print(f"{name}: {target} = {value:.6f}")
        top = ga.argsort()[::-1][:5]
        tops = ", ".join(f"{struct.species[i]}{i}={ga[i]:.3f}" for i in top)
        print(f"  top GA: {tops}")


if __name__ == "__main__":
    main()
