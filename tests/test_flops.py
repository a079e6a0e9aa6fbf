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


class TestRoofline:
    """VPU/MXU/HBM ceiling model (utils/roofline.py) — round-4 VERDICT #2:
    measured MFU must be reported against a derived ceiling."""

    def _qm9(self):
        return ModelConfig(n_atoms=10, embedding_dim=48, n_attention=7,
                           local_dim=128, num_head=8, global_dim=128,
                           dense_out=128, g_update=True, use_ga_norm=True,
                           gaussian_d=4.0)

    def _rates(self):
        # the committed v5e measurement: exercises exactly what bench.py
        # uses when the per-host cache is cold
        import json
        import os

        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "benchmarks", "roofline_rates.json")
        with open(path) as f:
            return json.load(f)

    def test_ceiling_bounds_are_ordered(self):
        from scann_tpu.utils.roofline import step_ceiling

        c = step_ceiling(self._qm9(), 32, 16, 128, rates=self._rates())
        # perfect-overlap ceiling >= serial bound, both positive/finite
        assert c["structs_per_s"] >= c["structs_per_s_serial"] > 0
        assert 0 < c["mfu_serial"] <= c["mfu_ceiling"] <= 1.0
        assert c["binding_engine"] in ("mxu", "vpu", "hbm")
        # max(t) and sum(t) consistency
        ts = [c["t_mxu_us"], c["t_vpu_us"], c["t_hbm_us"]]
        assert abs(1e6 / max(ts) - c["structs_per_s"]) < 1.0
        assert abs(1e6 / sum(ts) - c["structs_per_s_serial"]) < 1.0

    def test_stash_all_schedule_is_at_least_as_fast(self):
        from scann_tpu.utils.roofline import step_ceiling

        r = self._rates()
        keep = step_ceiling(self._qm9(), 32, 16, 128, rates=r,
                            schedule="keep_acts")
        stash = step_ceiling(self._qm9(), 32, 16, 128, rates=r,
                             schedule="stash_all")
        assert (stash["transcendentals_per_structure"]
                == keep["transcendentals_per_structure"] / 2)
        assert stash["structs_per_s"] >= keep["structs_per_s"]
        with pytest.raises(ValueError, match="unknown schedule"):
            step_ceiling(self._qm9(), 32, 16, 128, rates=r, schedule="bogus")

    def test_vpu_costs_scale_with_shape_and_layers(self):
        from scann_tpu.utils.flops import vpu_costs_per_structure

        cfm = self._qm9()
        small = vpu_costs_per_structure(cfm, 32, 16)
        big = vpu_costs_per_structure(cfm, 96, 32)
        assert big["transcendentals"] > 4 * small["transcendentals"]
        assert big["elementwise"] > 4 * small["elementwise"]
        # the [M,N,D] swish stream dominates: (L+2)*M*N*D of the forward
        fwd = vpu_costs_per_structure(cfm, 32, 16, training=False)
        stream = (cfm.n_attention + 2) * 32 * 16 * cfm.local_dim
        assert fwd["transcendentals"] > 0.8 * stream

    def test_gather_flops_counted_separately(self):
        from scann_tpu.utils.flops import (
            forward_flops_per_structure,
            gather_flops_per_structure,
        )

        cfm = self._qm9()
        g = gather_flops_per_structure(cfm, 96, 32, training=True)
        # one-hot gather: 3 * L * 2*M*N*M*d
        assert g == 3 * cfm.n_attention * 2 * 96 * 32 * 96 * cfm.local_dim
        # and it is NOT inside the useful count (docstring contract)
        assert g not in (forward_flops_per_structure(cfm, 96, 32),)

    def test_measure_device_rates_runs_on_cpu(self, tmp_path, monkeypatch):
        from scann_tpu.utils import roofline

        monkeypatch.setattr(roofline, "_CACHE_PATH",
                            str(tmp_path / "roofline.json"))
        # scale=256: seconds on CPU — plumbing check, not a real ceiling
        rates = roofline.measure_device_rates(use_cache=False, scale=256)
        assert rates["device_kind"] == "cpu"
        assert rates["exp_per_s"] > 0 and rates["mxu_tflops"] > 0
        # second call hits the cache file
        again = roofline.measure_device_rates(use_cache=True)
        assert again == rates


def test_param_count_matches_real_model(rng):
    """_param_count feeds the roofline's HBM term: it must track the real
    parameter count within ~10% (exactness not required — it skips a few
    small vectors)."""
    from scann_tpu.utils.flops import _param_count

    cfm = ModelConfig(n_atoms=10, embedding_dim=48, n_attention=7,
                      local_dim=128, num_head=8, global_dim=128,
                      dense_out=128, g_update=True, use_ga_norm=True)
    model = ScannModel(config=cfm)
    batch = make_synthetic_batch(rng, B=2, M=16, N=8, n_atoms=cfm.n_atoms)
    params = model.init(jax.random.PRNGKey(0), batch,
                        deterministic=True)["params"]
    real = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    est = _param_count(cfm)
    assert 0.9 < est / real < 1.1, (est, real)
