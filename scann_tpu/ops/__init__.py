from scann_tpu.ops.activations import mrelu, swish  # noqa: F401
from scann_tpu.ops.rbf import gaussian_expansion  # noqa: F401
from scann_tpu.ops.attention import (  # noqa: F401
    gather_neighbor_states,
    local_attention_core,
    global_attention_core,
)
