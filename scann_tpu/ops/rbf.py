"""Gaussian radial basis expansion.

Matches the reference ``GaussianExpansion``
(``scann/layers/custom_layers.py:31-75``):

    rbf_k(x) = exp(-(x - c_k)^2 / width)   with width = 0.5**2 = 0.25

The reference uses ``centers = linspace(0, gaussian_d, 20)`` for distances and
``linspace(0, 2*pi, 20)`` for Voronoi solid angles (SCANN+), see reference
``scann/models/scann_model.py:378,384``.
"""

import jax.numpy as jnp
import numpy as np


def make_centers(stop: float, num: int = 20) -> np.ndarray:
    return np.linspace(0.0, stop, num, dtype=np.float32)


def gaussian_expansion(x: jnp.ndarray, centers: jnp.ndarray, width: float = 0.25) -> jnp.ndarray:
    """Expand ``x [...]`` to ``[..., K]`` Gaussian basis values.

    Note ``width`` here is the reference's squared width (0.5**2): the
    reference squares the constructor arg (``custom_layers.py:51``).
    """
    diff = x[..., None] - centers
    return jnp.exp(-(diff * diff) / width)
