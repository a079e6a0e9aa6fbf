from scann_tpu.parallel.distributed import (  # noqa: F401
    fetch,
    initialize,
    is_multiprocess,
    is_primary,
    process_count,
    process_index,
    put_replicated,
)
from scann_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    hierarchical_order,
    make_mesh,
    replicated_sharding,
)
