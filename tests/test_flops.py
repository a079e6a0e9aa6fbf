"""Validate the analytic FLOP model against XLA's cost analysis.

The MFU number bench.py reports is only as good as the FLOP model behind
it; here XLA's own ``compiled.cost_analysis()['flops']`` on the lowered
forward/training step (CPU backend, pure-XLA path — same math as the fused
TPU kernels) must agree with ``forward_flops_per_structure`` /
``train_flops_per_structure`` within a modest band. XLA fuses/rearranges
elementwise work, so exact equality is not expected; matmul FLOPs dominate
and must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scann_tpu.config import ModelConfig
from scann_tpu.models import ScannModel
from scann_tpu.utils.flops import (
    forward_flops_per_structure,
    peak_tflops,
    train_flops_per_structure,
)

from conftest import make_synthetic_batch


def _xla_flops(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    if not ca or "flops" not in ca:
        pytest.skip("cost_analysis unavailable on this backend")
    return float(ca["flops"])


QM9_CASE = (dict(n_atoms=95, embedding_dim=128, n_attention=7, local_dim=128,
                 num_head=8, global_dim=128, dense_out=128, g_update=True),
            16, 32, 16)
MP_CASE = (dict(n_atoms=95, embedding_dim=128, n_attention=9, local_dim=128,
                num_head=8, global_dim=128, dense_out=128, g_update=True,
                gaussian_d=6.0), 4, 96, 32)
SMALL_CASE = (dict(n_atoms=95, embedding_dim=64, n_attention=3, local_dim=64,
                   num_head=8, global_dim=64, dense_out=32, g_update=False),
              8, 24, 8)

# the small case runs in the fast tier; the flagship-shape compiles are
# ~10 s each on 1 CPU and run in the slow tier
CASES = [
    pytest.param(*QM9_CASE, marks=pytest.mark.slow),
    pytest.param(*MP_CASE, marks=pytest.mark.slow),
    SMALL_CASE,
]


@pytest.mark.parametrize("kw,B,M,N", CASES)
def test_forward_flops_matches_xla(rng, kw, B, M, N):
    cfm = ModelConfig(**kw)
    model = ScannModel(config=cfm)
    batch = make_synthetic_batch(rng, B=B, M=M, N=N, n_atoms=cfm.n_atoms)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)

    def fwd(params, batch):
        return model.apply(params, batch, deterministic=True)["property"]

    xla = _xla_flops(fwd, params, batch)
    ours = forward_flops_per_structure(cfm, M, N) * B
    ratio = ours / xla
    # the one-hot gather (CPU falls back to 'take' = 0 extra flops) and
    # fused elementwise noise keep this from being exact; matmuls dominate
    assert 0.8 <= ratio <= 1.25, (
        f"analytic {ours:.3e} vs XLA {xla:.3e} (ratio {ratio:.3f})")


@pytest.mark.slow  # value_and_grad of the 7-layer flagship: ~12 s compile
def test_train_flops_matches_xla(rng):
    kw, B, M, N = QM9_CASE
    cfm = ModelConfig(**kw)
    model = ScannModel(config=cfm)
    batch = make_synthetic_batch(rng, B=B, M=M, N=N, n_atoms=cfm.n_atoms)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    y = jnp.asarray(np.linspace(-1, 1, B), jnp.float32)

    def loss(params, batch, y):
        pred = model.apply(params, batch, deterministic=True)["property"][:, 0]
        return jnp.sqrt(jnp.mean(jnp.square(pred - y)))

    grad = jax.value_and_grad(loss)
    xla = _xla_flops(grad, params, batch, y)
    ours = train_flops_per_structure(cfm, M, N) * B
    ratio = ours / xla
    # 3x-forward is the standard closed form; XLA's count includes the
    # exact backward graph — require agreement within a modest band
    assert 0.7 <= ratio <= 1.4, (
        f"analytic {ours:.3e} vs XLA {xla:.3e} (ratio {ratio:.3f})")


def test_peak_tflops_table():
    assert peak_tflops("TPU v5e") == 197.0
    assert peak_tflops("TPU v5 lite") == 197.0
    assert peak_tflops("TPU v4") == 275.0
    assert peak_tflops("Tesla V100-SXM2-16GB") is None
