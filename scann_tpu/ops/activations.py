"""Activation functions.

``mrelu`` mirrors the reference straight-through ReLU
(reference ``scann/layers/custom_layers.py:6-15``): forward is
``max(x, 0)`` but the backward pass is the identity.  The reference uses it
only for the band-gap head (``target == "e_b"``,
reference ``scann/models/scann_model.py:445-447``).
"""

import jax
import jax.numpy as jnp

swish = jax.nn.silu  # Keras "swish" == silu == x * sigmoid(x)


@jax.custom_vjp
def mrelu(x):
    return jnp.maximum(x, 0)


def _mrelu_fwd(x):
    return jnp.maximum(x, 0), None


def _mrelu_bwd(_, g):
    return (g,)  # straight-through: identity gradient


mrelu.defvjp(_mrelu_fwd, _mrelu_bwd)
