"""Device mesh + sharding layout.

The reference is single-device (SURVEY.md §2.2: no tf.distribute anywhere).
Here data parallelism is the primary strategy: a 1-D ``('data',)`` mesh over
all chips; ICI carries the gradient all-reduce that XLA inserts
automatically from the sharding annotations:

- model/optimizer state: replicated,
- packed dataset buckets: replicated (small — the whole padded QM9 is
  ~100 MB), so every device gathers its batch shard locally,
- per-step batch index vector: sharded along ``data`` — this makes every
  downstream batch tensor batch-sharded without any resharding,
- loss/grads: jit propagates the shardings and inserts the ``psum`` over ICI.

A ``model`` axis can be added to the mesh later for tensor parallelism; at
SCANN's parameter scale (<5 M) it is intentionally not used.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def hierarchical_order(devices: Sequence) -> list:
    """Order devices slice-major for multi-slice (DCN-connected) topologies.

    The ``data`` axis stays logically 1-D, but the DEVICE ORDER decides how
    XLA decomposes the gradient all-reduce: with each slice's chips
    contiguous along the axis, the reduction runs as slice-local
    reduce-scatter/all-gather over ICI plus one small cross-slice exchange
    over DCN — the hierarchical collective the scaling playbook prescribes —
    instead of striding every hop across the slow inter-slice links.

    Single-slice (or CPU/simulated) devices carry no ``slice_index``; the
    order is then untouched. Deterministic: stable sort on
    (slice_index, process_index, device id) — the process key keeps each
    HOST's devices contiguous on multi-host slices, so host-local traffic
    (e.g. XLA's hierarchical all-reduce decomposition) stays on the
    shortest links even within one slice.
    """
    keyed = []
    for i, d in enumerate(devices):
        s = getattr(d, "slice_index", None)
        p = getattr(d, "process_index", 0)
        keyed.append(((s if s is not None else 0, p, getattr(d, "id", i)), d))
    keyed.sort(key=lambda kv: kv[0])
    return [d for _, d in keyed]


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices.

    Auto-discovered devices are ordered slice-major (``hierarchical_order``)
    so that on multi-slice deployments the flat ``data`` axis keeps
    slice-local blocks contiguous and the all-reduce rides ICI within
    slices / DCN across. An explicitly passed ``devices`` sequence is
    honored VERBATIM — callers that arrange their own order (e.g. to match
    an external sharding) keep it.
    """
    if devices is None:
        devices = hierarchical_order(jax.devices())
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))
