from scann_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    hierarchical_order,
    make_mesh,
    replicated_sharding,
)
