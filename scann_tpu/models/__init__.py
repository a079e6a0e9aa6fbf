from scann_tpu.models.scann import (  # noqa: F401
    GlobalAttention,
    LocalAttention,
    ResidualNorm,
    ScannModel,
)
