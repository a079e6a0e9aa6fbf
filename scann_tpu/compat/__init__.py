from scann_tpu.compat.h5_loader import load_h5_params, save_h5_weights  # noqa: F401
