from scann_tpu.kernels.local_attention import fused_local_attention  # noqa: F401
