"""Training CLI — same UX as the reference ``train.py``:

    python -m scann_tpu.cli.train <target> <config.yaml> \
        [--use_ring] [--use_ref] [--use_drop] [--feature atomic|cgcnn] \
        [--pretrained PATH] [--mode train|eval] [--epochs N]

Flags merge into the config exactly like reference ``train.py:37-43``.
"""

import argparse
import os
import random
import time

import numpy as np


def set_seed(seed: int = 0):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train a SCANN model on TPU")
    parser.add_argument("target", type=str, help="target property (e.g. homo)")
    parser.add_argument("dataset", type=str, help="path to config YAML")
    parser.add_argument("--use_ring", action="store_true",
                        help="use ring/aromatic extra embedding")
    parser.add_argument("--use_ref", action="store_true",
                        help="subtract reference energy from the target")
    parser.add_argument("--use_drop", action="store_true",
                        help="attention dropout during training")
    parser.add_argument("--feature", type=str, default="atomic",
                        choices=["atomic", "cgcnn"])
    parser.add_argument("--pretrained", type=str, default="",
                        help="H5 or orbax checkpoint to start from")
    parser.add_argument("--mode", type=str, default="train",
                        choices=["train", "eval"])
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--profile", type=str, default=None, metavar="LOGDIR",
                        help="capture a jax.profiler trace of training into "
                             "LOGDIR (TensorBoard-loadable)")
    parser.add_argument("--resume", action="store_true",
                        help="continue from the run's 'last' checkpoint")
    parser.add_argument("--structure-packing", action="store_true",
                        help="bin-pack several structures per padded slot for "
                             "training (~1.5x structures/s at QM9-like size "
                             "spreads; per-structure math exact, effective "
                             "batch preserved — data/packing.py)")
    parser.add_argument("--exec-cache", type=str, nargs="?", const="auto",
                        default=None, metavar="DIR",
                        help="persist compiled train/eval executables under "
                             "DIR (default {save_path}/exec_cache) so "
                             "restarts/resumes of the same config skip the "
                             "XLA/Pallas compiles (crystal kernels compile "
                             "for minutes on shared TPUs)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host data parallelism: initialize "
                             "jax.distributed before any device use (run "
                             "this CLI once per host; coordinator/topology "
                             "from SCANN_TPU_COORDINATOR / "
                             "SCANN_TPU_NUM_PROCESSES / SCANN_TPU_PROCESS_ID "
                             "or JAX's TPU-pod autodetection). Also engages "
                             "automatically when SCANN_TPU_DISTRIBUTED=1 or "
                             "the SCANN_TPU_COORDINATOR env is set")
    args = parser.parse_args(argv)

    # distributed init must precede EVERY jax device use (backends bake in
    # the process topology at creation) — hence before importing the api.
    # Explicit flag OVERRIDES any pre-set env (a launcher's
    # SCANN_TPU_DISTRIBUTED=0 must not silently defeat --distributed)
    if args.distributed:
        os.environ["SCANN_TPU_DISTRIBUTED"] = "1"
    from scann_tpu.parallel import initialize as distributed_initialize
    distributed_initialize()

    from scann_tpu.api import Scann
    from scann_tpu.config import load_config

    set_seed(0)
    config = load_config(args.dataset)
    config.model.feature = args.feature
    config.model.use_ring = args.use_ring
    config.model.use_drop = args.use_drop
    config.hyper.use_ref = args.use_ref
    config.hyper.target = args.target
    config.hyper.pretrained = args.pretrained
    if args.structure_packing:
        config.tpu.structure_packing = True
    if args.exec_cache:
        config.tpu.exec_cache_dir = (
            os.path.join(config.hyper.save_path, "exec_cache")
            if args.exec_cache == "auto" else args.exec_cache)

    scann = Scann(config, pretrained=args.pretrained, mode=args.mode)
    print(f"Loading dataset for target {args.target}")
    scann.prepare_dataset()

    if args.mode == "train":
        print("Training")
        t0 = time.time()
        if args.profile:
            from scann_tpu.utils import trace

            with trace(args.profile):
                scann.train(args.epochs, resume=args.resume)
        else:
            scann.train(args.epochs, resume=args.resume)
        print(f"Training time: {time.time() - t0:.1f}s")

    print("Evaluating")
    scann.evaluate()


if __name__ == "__main__":
    main()
