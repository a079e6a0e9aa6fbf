"""Subprocess worker for tests/test_distributed.py.

Runs ONE process of an N-process CPU-mesh training job (or the
single-process control when --num-processes=1 without a coordinator):
builds the same deterministic tiny dataset in every process (per-host data
loading), fits 2 epochs + evaluates through the real Trainer, and writes
the trajectory to --out as JSON for the parent test to compare.

Invoked as a script (never imported by pytest): the JAX platform/device
setup must happen before any backend initialization, which a pytest
worker process has long since done.
"""

import argparse
import json
import os
import sys


def build_dataset():
    """Deterministic tiny dataset, identical in every process (the
    per-host-data-loading contract: same files + same seed -> same
    buckets). Reuses the dryrun generator for realistic inputs."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np

    from __graft_entry__ import _flagship_config, _synthetic_inputs
    from scann_tpu.data.pipeline import PackedBucket

    cfg = _flagship_config(batch_size=16)
    cfg.model = cfg.model.__class__(**{**cfg.model.__dict__, "n_attention": 2,
                                       "local_dim": 32, "num_head": 4,
                                       "global_dim": 32, "dense_out": 16,
                                       "embedding_dim": 8})
    cfg.hyper.epochs = 2
    S = 32
    inputs = _synthetic_inputs(B=S, M=16, N=8)
    targets = np.random.default_rng(0).normal(size=S).astype(np.float32)
    bucket = PackedBucket(inputs=inputs, targets=targets,
                          indices=np.arange(S))
    return cfg, bucket


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", type=str, default="")
    ap.add_argument("--devices", type=int, required=True,
                    help="virtual CPU devices in THIS process")
    ap.add_argument("--workdir", type=str, required=True)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices}")
    import jax

    # this image's sitecustomize registers the axon TPU plugin and overrides
    # the JAX_PLATFORMS env; only the config update reliably forces CPU
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # share the test suite's persistent CPU compile cache (conftest.py):
    # each worker otherwise pays its own whole-epoch-scan compile, which
    # dominates the test's wall clock on a 1-core host
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "scann_tpu_pytest_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if args.coordinator:
        from scann_tpu.parallel import initialize

        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        assert initialize(coordinator_address=args.coordinator,
                          num_processes=args.num_processes,
                          process_id=args.process_id)
        assert jax.process_count() == args.num_processes, jax.process_count()

    cfg, bucket = build_dataset()
    cfg.hyper.save_path = args.workdir

    import numpy as np

    from scann_tpu.parallel import is_primary, make_mesh
    from scann_tpu.train import Trainer

    mesh = make_mesh()
    trainer = Trainer(cfg, mesh=mesh, workdir=args.workdir)
    hist = trainer.fit([bucket], [bucket], epochs=2, log_fn=lambda s: None)
    res = trainer.evaluate([bucket], report=True)
    if jax.process_count() > 1:
        # primary-only artifacts (report.txt) have no implicit barrier: sync
        # before the existence checks below so the non-primary process
        # doesn't race process 0's file write
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("worker-artifacts-written")
    params_sum = float(sum(
        np.abs(np.asarray(x)).sum()
        for x in jax.tree_util.tree_leaves(trainer.state.params)))

    out = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "n_global_devices": len(jax.devices()),
        "is_primary": is_primary(),
        "loss": hist["loss"],
        "mae": hist["mae"],
        "val_mae": hist["val_mae"],
        "test_mae": res["test_mae"],
        "params_abs_sum": params_sum,
        "report_exists": os.path.exists(
            os.path.join(args.workdir, "report.txt")),
        "ckpt_exists": os.path.exists(
            os.path.join(args.workdir, "checkpoints", "last")),
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print("worker done", flush=True)


if __name__ == "__main__":
    main()
