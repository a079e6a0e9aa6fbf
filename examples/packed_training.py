"""Structure packing: the recommended production training recipe on TPU.

The SCANN kernels are bound by the elementwise work on the padded
``[rows, N, D]`` geometry stream, so padding density IS throughput. With
bucketed padding every structure owns one padded ``[M, N]`` block and small
molecules waste most of their rows; ``tpu.structure_packing`` instead packs
several structures into each padded slot (the LLM sequence-packing
analogue) with a segment-aware readout that keeps every per-structure
number EXACT — predictions, GA scores, gradients, and the effective batch
size all match the bucketed pipeline (see ``tests/test_packing.py`` and the
TF-golden parity case in ``tests/test_golden.py``).

This script trains the same synthetic dataset twice — bucketed, then
packed — and prints the padding occupancy, steady-state epoch time,
structures/s, and the prediction agreement between the two runs. On a v5e
the packed recipe measures ~1.5x bucketed at QM9-like size spreads
(40,019 vs 26,290 structures/s/chip, ``bench.py``); on CPU the ratio is
smaller but the mechanics are identical.

Reference context: the TF reference re-pads every batch to its own max in
Python (reference ``scann/utils/datagenerator.py:75-76``) — padding density
is not a lever it can pull, because dynamic shapes are free on GPU+TF but
hostile to XLA. Packing is how the same variable-size problem is solved
TPU-natively.

    python examples/packed_training.py            # small offline demo
    python examples/packed_training.py --epochs 8 --structures 2048
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_once(workdir: str, e: str, n: str, epochs: int, packing: bool,
             model: dict = None):
    import numpy as np

    from scann_tpu.api import Scann
    from scann_tpu.config import ScannConfig

    cfg = ScannConfig.from_dict({
        "model": model or {
            "n_atoms": 16, "embedding_dim": 16, "n_attention": 2,
            "local_dim": 32, "num_head": 4, "global_dim": 32,
            "dense_out": 16, "g_update": True},
        "hyper": {"batch_size": 32, "lr": 1e-3, "min_lr": 1e-4,
                  "epochs": epochs, "patience": 10 * epochs,
                  "target": "homo", "save_path": workdir,
                  "data_energy_path": e, "data_nei_path": n},
        "tpu": {"structure_packing": packing, "pack_max_segments": 6},
    })
    scann = Scann(cfg)
    scann.prepare_dataset()

    # padding density: fraction of padded atom rows holding real atoms
    occ = [float(b.inputs["atom_mask"].sum()
                 / (b.inputs["atom_mask"].shape[0]
                    * b.inputs["atom_mask"].shape[1]))
           for b in scann.train_buckets]
    occupancy = float(np.mean(occ))

    rep = scann.train()
    # first epoch pays the jit compile; steady state is the rest
    times = rep["epoch_time"][1:] or rep["epoch_time"]
    n_train = sum(b.num_structures for b in scann.train_buckets)
    structs_per_sec = n_train / float(np.median(times))
    preds, _ = scann.predict_data(with_ga=True)
    return {"occupancy": occupancy, "structs_per_sec": structs_per_sec,
            "epoch_s": float(np.median(times)), "preds": preds,
            "slot_batch": scann.trainer._slot_batch,
            "val_mae": rep["val_mae"][-1]}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--structures", type=int, default=512)
    ap.add_argument("--workdir", default="")
    args = ap.parse_args(argv)

    import numpy as np

    from scann_tpu.data.synthetic import make_synthetic_dataset

    workdir = args.workdir or tempfile.mkdtemp(prefix="scann_packed_demo_")
    # a QM9-like size spread: mostly small molecules, a tail of larger ones
    e, n = make_synthetic_dataset(os.path.join(workdir, "data"),
                                  n_structures=args.structures,
                                  min_atoms=4, max_atoms=24, seed=0)

    print("== bucketed (one structure per padded row block) ==")
    b = run_once(os.path.join(workdir, "bucketed"), e, n, args.epochs,
                 packing=False)
    print(f"occupancy {b['occupancy']:.3f}  epoch {b['epoch_s']:.2f}s  "
          f"{b['structs_per_sec']:.0f} structs/s  val_mae {b['val_mae']:.4f}")

    print("== packed (tpu.structure_packing) ==")
    p = run_once(os.path.join(workdir, "packed"), e, n, args.epochs,
                 packing=True)
    print(f"occupancy {p['occupancy']:.3f}  epoch {p['epoch_s']:.2f}s  "
          f"{p['structs_per_sec']:.0f} structs/s  val_mae {p['val_mae']:.4f}  "
          f"(slot batch {p['slot_batch']} -> ~32 structures/step)")

    speedup = p["structs_per_sec"] / max(b["structs_per_sec"], 1e-9)
    print(f"packing speedup: {speedup:.2f}x  "
          f"(density {b['occupancy']:.2f} -> {p['occupancy']:.2f})")
    # NOTE on agreement: the packed MATH is exact — same params in, same
    # predictions/gradients out, pinned in tests/test_packing.py and the
    # TF-golden packed case. The two TRAININGS here still visit batches in
    # different orders (slots vs structures shuffle), so their trained
    # predictions only converge together as epochs grow; at the quick-demo
    # epoch counts this correlation is well below 1 and that is expected.
    corr = float(np.corrcoef(b["preds"], p["preds"])[0, 1])
    print(f"prediction correlation bucketed vs packed: {corr:.4f} "
          f"(rises toward 1 with --epochs; see note in source)")
    return {"bucketed": b, "packed": p, "speedup": speedup, "corr": corr}


if __name__ == "__main__":
    main()
