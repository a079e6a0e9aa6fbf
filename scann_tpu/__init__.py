"""SCANN-TPU: a TPU-native JAX/Flax/Pallas framework for self-consistent
attention neural networks for structure-property prediction.

Rebuilds the capabilities of the reference SCANN implementation
(sinhvt3421/scann--material, npj Comput. Mater. 9:215, 2023) with a
TPU-first design:

- ``scann_tpu.ops``      — pure-jnp reference ops (Gaussian RBF, masked
  attention, mrelu) mirroring the semantics of the reference layers
  (``scann/layers/attention.py``, ``scann/layers/custom_layers.py``).
- ``scann_tpu.kernels``  — fused Pallas TPU kernels for the hot attention ops.
- ``scann_tpu.models``   — the SCANN / SCANN+ Flax model
  (reference graph: ``scann/models/scann_model.py:329-453``).
- ``scann_tpu.data``     — Voronoi featurization (scipy/Qhull, no pymatgen
  dependency), dataset builders, bucketed static-shape batching.
- ``scann_tpu.parallel`` — mesh construction + data-parallel sharding over
  ICI via jax.sharding (the reference is single-device only).
- ``scann_tpu.train``    — optax training loop (RMSE + L2 regularization,
  cosine/SGDR schedules), orbax checkpointing, metrics.
- ``scann_tpu.compat``   — Keras H5 checkpoint -> param-pytree converter for
  loading published reference checkpoints.
"""

__version__ = "0.1.0"

from scann_tpu.config import ScannConfig, load_config, save_config  # noqa: F401
