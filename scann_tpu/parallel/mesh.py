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


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
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
