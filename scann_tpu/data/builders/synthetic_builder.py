"""Offline synthetic dataset builder (no downloads) for the preprocess CLI."""

import os

from scann_tpu.data.synthetic import make_synthetic_dataset


def process_synthetic(save_path: str = "", n_structures: int = 512):
    out_dir = os.path.join(save_path, "synthetic")
    # write only the energy file here; the CLI runs featurization separately
    import numpy as np

    e, n = make_synthetic_dataset(out_dir, name="synthetic",
                                  n_structures=n_structures, seed=0,
                                  with_ring=True)
    # the CLI recomputes neighbors with the requested cutoffs; the ones made
    # by make_synthetic_dataset (default cutoffs) are already cached
    return e
