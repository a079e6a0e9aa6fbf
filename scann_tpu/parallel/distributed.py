"""Multi-process (multi-host) data parallelism.

The reference is strictly single-process/single-device (SURVEY.md §2.2: no
tf.distribute anywhere — ``scann_model.py:239-240``'s Keras multiprocessing
workers are host-side input loaders, not a distributed backend). This module
is new TPU-native surface: it lets ONE training recipe run unchanged on

- a single chip,
- a single-host multi-chip slice (one process owning all devices), and
- a multi-host pod / multi-slice job (one process per host, devices
  federated through ``jax.distributed``).

Design (matches the scaling-book recipe and the Trainer's whole-epoch-scan
architecture, ``train/loop.py``):

- **Per-host data loading, replicated buckets.** Every process runs the
  same deterministic pipeline (same dataset files, same split seed) and
  builds identical host buckets; ``put_replicated`` assembles them into
  GLOBAL arrays via ``jax.make_array_from_process_local_data`` — no process
  ever feeds another host's devices, and no single process needs global
  visibility. Bucket HBM cost per device is identical to the single-process
  design (buckets were always replicated; padded QM9 is ~100 MB). The
  per-step batch is *computed on device* (the epoch scan shards the batch
  index vector over the ``data`` axis), so batch tensors are batch-sharded
  without any host-side sharding dance, and the gradient psum spans all
  hosts over ICI/DCN exactly as on one host.
- **Replica consistency is checked, not assumed.** Replicated-from-local
  data is only correct if every process supplies the SAME bytes;
  ``put_replicated(check=True)`` cross-checks a cheap content digest over
  processes (one tiny allgather) and raises loudly on divergence instead of
  silently training on host-dependent data.
- **Primary-process side effects.** Exactly-once artifacts (metrics.jsonl,
  report.txt, config.yaml, checkpoints) are written by process 0 only;
  checkpoints are materialized to host numpy first (valid because the train
  state is fully replicated), so orbax never needs multi-host coordination.

Tested on a 2-process x 4-device CPU mesh against the single-process
8-device trajectory (tests/test_distributed.py); ``jax.distributed`` env
autodetection covers TPU pods (where ``initialize()`` discovers topology
from the metadata server) and explicit coordinator/process flags.
"""

from __future__ import annotations

import os
import zlib
from typing import Any, Optional

import jax
import numpy as np

__all__ = [
    "initialize",
    "is_multiprocess",
    "is_primary",
    "process_count",
    "process_index",
    "put_replicated",
    "fetch",
]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               **kwargs: Any) -> bool:
    """Idempotent ``jax.distributed.initialize``.

    Argument resolution order: explicit args > ``SCANN_TPU_COORDINATOR`` /
    ``SCANN_TPU_NUM_PROCESSES`` / ``SCANN_TPU_PROCESS_ID`` env vars > JAX's
    own autodetection (TPU pod metadata, cluster envs). Returns True if the
    distributed client is (now) initialized, False if nothing indicated a
    multi-process job. Safe to call twice (the second call is a no-op).
    """
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "SCANN_TPU_COORDINATOR")
    if num_processes is None and os.environ.get("SCANN_TPU_NUM_PROCESSES"):
        num_processes = int(os.environ["SCANN_TPU_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SCANN_TPU_PROCESS_ID"):
        process_id = int(os.environ["SCANN_TPU_PROCESS_ID"])
    if (coordinator_address is None and num_processes is None
            and process_id is None
            and os.environ.get("SCANN_TPU_DISTRIBUTED") != "1"):
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns exactly-once side effects (writes of
    metrics/report/config/checkpoints)."""
    return jax.process_index() == 0


def _tree_digest(tree: Any) -> int:
    """Cheap order-stable content digest of a host pytree (crc32 over raw
    bytes + shapes/dtypes). Not cryptographic — it guards against honest
    divergence (different files, nondeterministic featurization order),
    not adversaries."""
    crc = 0
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    crc = zlib.crc32(repr(treedef).encode(), crc)
    for leaf in leaves:
        a = np.asarray(leaf)
        crc = zlib.crc32(str((a.shape, a.dtype.str)).encode(), crc)
        crc = zlib.crc32(np.ascontiguousarray(a).tobytes(), crc)
    return crc


def check_replicas_match(tree: Any, what: str = "data") -> None:
    """Raise if ``tree``'s content differs across processes (see module
    docstring: replicated-from-local is only correct when identical)."""
    if not is_multiprocess():
        return
    from jax.experimental import multihost_utils

    digest = np.asarray([_tree_digest(tree)], np.uint32)
    all_digests = np.asarray(multihost_utils.process_allgather(digest))
    if not (all_digests == all_digests.ravel()[0]).all():
        raise RuntimeError(
            f"multi-process replica mismatch for {what!r}: per-process "
            f"content digests {all_digests.ravel().tolist()} differ. Every "
            "process must load identical data (same dataset files, same "
            "split seed) for the replicated-bucket layout; check that "
            "preprocessing is deterministic and the filesystems agree.")


def put_replicated(tree: Any, sharding, check: bool = False,
                   what: str = "data") -> Any:
    """Place a host pytree as fully-replicated GLOBAL device arrays.

    Single-process: plain ``jax.device_put`` (identical to the historical
    path). Multi-process: ``jax.make_array_from_process_local_data`` per
    leaf — every process contributes its full local copy, which the runtime
    maps onto its own addressable devices; ``check=True`` first verifies
    the copies agree (one tiny allgather per call).
    """
    if not is_multiprocess():
        return jax.device_put(tree, sharding)
    if check:
        check_replicas_match(tree, what=what)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def fetch(tree: Any) -> Any:
    """Host numpy copy of a pytree of device arrays.

    Works in multi-process mode for FULLY-REPLICATED arrays (every process
    reads its local shard — the Trainer keeps state and epoch outputs
    replicated); raises a clear error for sharded arrays rather than
    returning a partial view.
    """
    def _get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if not x.sharding.is_fully_replicated:
                raise ValueError(
                    "fetch() of a non-replicated multi-process array: "
                    f"sharding={x.sharding}. Constrain the computation's "
                    "output to the replicated sharding first.")
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    return jax.tree_util.tree_map(_get, tree)
