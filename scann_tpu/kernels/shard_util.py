"""Shared shard_map memoization for the fused-kernel wrappers.

Every sharded wrapper (unrolled + loop families) shards a params-replicated
function over a batch-keys dict — and the key SET varies at call time
(packed batches add ``segment_onehot``). shard_map instances must be reused
per key set or jax re-traces on every call; this helper owns that cache so
the four wrappers don't each carry a copy of it.
"""

from __future__ import annotations

from jax import shard_map
from jax.sharding import PartitionSpec as P


def lazy_sharded(fn, mesh, extra_in_specs=(), out_specs=(P("data"), P())):
    """Returns ``get(batch_keys) -> shard_map`` memoized per key tuple.

    ``fn``'s signature is (params, inputs_dict, *extras); in_specs are
    always (replicated params, batch-sharded dict, *extra_in_specs).
    """
    cache = {}

    def get(batch_keys):
        if batch_keys not in cache:
            cache[batch_keys] = shard_map(
                fn, mesh=mesh,
                in_specs=((P(), {k: P("data") for k in batch_keys})
                          + tuple(extra_in_specs)),
                out_specs=out_specs,
                check_vma=False)
        return cache[batch_keys]

    return get
