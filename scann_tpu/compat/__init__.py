from scann_tpu.compat.h5_loader import (  # noqa: F401
    load_h5_optimizer,
    load_h5_params,
    save_h5_weights,
)
