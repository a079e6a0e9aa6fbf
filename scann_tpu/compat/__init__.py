from scann_tpu.compat.h5_loader import load_h5_params  # noqa: F401
