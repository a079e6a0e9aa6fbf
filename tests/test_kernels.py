"""Pallas kernel parity tests (interpret mode on the CPU suite).

The fused kernel must match the pure-jnp reference layer bitwise-closely for
both SCANN+ (g_update) and SCANN variants, including gradient flow through
the custom VJP.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import scann_tpu.kernels.local_attention as kla
from conftest import jit_apply, jit_init_vars
from scann_tpu.kernels.local_attention import (
    _pallas_forward,
    reference_local_attention,
)


def make_layer_inputs(rng, B=4, M=16, N=8, D=32, g_update=True, n_rbf=20):
    centers = rng.normal(size=(B, M, D)).astype(np.float32)
    idx = rng.integers(0, M, size=(B, M, N)).astype(np.int32)
    mask = (rng.uniform(size=(B, M, N)) > 0.25).astype(np.float32)
    mask[..., 0] = 1.0
    geometry = rng.normal(size=(B, M, N, D if g_update else n_rbf)).astype(np.float32)
    weight = rng.uniform(0.3, 3.0, size=(B, M, N)).astype(np.float32)

    fg_in = 3 * D if g_update else n_rbf
    params = {
        "filter_geo": {"kernel": rng.normal(size=(fg_in, D)).astype(np.float32) * 0.1,
                       "bias": rng.normal(size=(D,)).astype(np.float32) * 0.1},
        "key": {"kernel": rng.normal(size=(D, D)).astype(np.float32) * 0.1,
                "bias": rng.normal(size=(D,)).astype(np.float32) * 0.1},
        "query": {"kernel": rng.normal(size=(D, D)).astype(np.float32) * 0.1,
                  "bias": rng.normal(size=(D,)).astype(np.float32) * 0.1},
        "layer_norm": {"scale": np.ones(D, np.float32),
                       "bias": np.zeros(D, np.float32)},
    }
    if g_update:
        params["layer_norm_g"] = {"scale": np.ones(D, np.float32),
                                  "bias": np.zeros(D, np.float32)}
    return centers, idx, geometry, mask, weight, params


@pytest.mark.parametrize("g_update", [True, False])
def test_kernel_matches_reference(rng, g_update):
    centers, idx, geometry, mask, weight, params = make_layer_inputs(
        rng, g_update=g_update)
    H, scale = 4, 0.5

    out_k, geo_k, attn_k = _pallas_forward(
        jnp.asarray(centers), jnp.asarray(idx), jnp.asarray(geometry),
        jnp.asarray(mask), jnp.asarray(weight), params, H, scale, g_update,
        interpret=True)
    out_r, geo_r, attn_r = reference_local_attention(
        jnp.asarray(centers), jnp.asarray(idx), jnp.asarray(geometry),
        jnp.asarray(mask), jnp.asarray(weight), params, H, scale, g_update)

    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn_k), np.asarray(attn_r),
                               rtol=1e-4, atol=1e-6)
    if g_update:
        np.testing.assert_allclose(np.asarray(geo_k), np.asarray(geo_r),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("g_update", [
    pytest.param(True, marks=pytest.mark.slow), False])
def test_custom_vjp_matches_reference_grad(rng, g_update, monkeypatch):
    centers, idx, geometry, mask, weight, params = make_layer_inputs(
        rng, B=2, M=8, N=4, D=16, g_update=g_update)
    H, scale = 2, 0.5

    # run the fused op in interpret mode on CPU
    monkeypatch.setattr(
        kla, "_pallas_forward",
        functools.partial(kla._pallas_forward.__wrapped__, interpret=True)
        if hasattr(kla._pallas_forward, "__wrapped__")
        else functools.partial(kla._pallas_forward, interpret=True),
    )

    def loss_fused(c, g, p):
        out, geo, attn = kla.fused_local_attention(
            c, jnp.asarray(idx), g, jnp.asarray(mask), jnp.asarray(weight),
            p, H, scale, g_update)
        return jnp.sum(out ** 2) + jnp.sum(geo ** 2)

    def loss_ref(c, g, p):
        out, geo, attn = reference_local_attention(
            c, jnp.asarray(idx), g, jnp.asarray(mask), jnp.asarray(weight),
            p, H, scale, g_update)
        if geo is None:
            geo = g
        return jnp.sum(out ** 2) + jnp.sum(geo ** 2)

    args = (jnp.asarray(centers), jnp.asarray(geometry),
            jax.tree.map(jnp.asarray, params))
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(*args)

    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_model_with_pallas_matches_without(rng):
    """Full model forward: pallas path == jnp path (interpret mode)."""
    from scann_tpu.config import ModelConfig
    from scann_tpu.models import ScannModel
    from conftest import make_synthetic_batch
    import scann_tpu.kernels.local_attention as kmod

    orig = kmod._pallas_forward
    kmod_interp = functools.partial(orig, interpret=True)
    kmod._pallas_forward = kmod_interp
    try:
        cfg = ModelConfig(n_attention=2, local_dim=32, num_head=4, global_dim=32,
                          dense_out=16, embedding_dim=8, g_update=True, n_atoms=10)
        inputs = make_synthetic_batch(rng, B=3, M=8, N=4)
        m_ref = ScannModel(config=cfg, use_pallas=False)
        params = jit_init_vars(m_ref, jax.random.PRNGKey(0), inputs)
        out_ref = jit_apply(m_ref)(params, inputs)
        m_pl = ScannModel(config=cfg, use_pallas=True)
        out_pl = m_pl.apply(params, inputs, deterministic=True)
        np.testing.assert_allclose(np.asarray(out_pl["property"]),
                                   np.asarray(out_ref["property"]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_pl["ga_score"]),
                                   np.asarray(out_ref["ga_score"]),
                                   rtol=1e-4, atol=1e-5)
    finally:
        kmod._pallas_forward = orig


@pytest.mark.parametrize("g_update,ga_norm,mrelu,ring,cgcnn", [
    (True, True, False, False, False),
    (False, False, True, False, False),
    (True, False, False, False, False),
    (False, True, False, True, False),   # QM9+ring workflow (train.py:37-43)
    (True, True, False, False, True),    # cgcnn 92-dim feature mode
    (True, True, False, True, False),    # ring with SCANN+
])
def test_fused_whole_model_forward(rng, g_update, ga_norm, mrelu, ring, cgcnn):
    """The single-kernel whole-model forward == flax model (interpret mode)."""
    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_forward import fused_scann_forward, supports_config
    from scann_tpu.models import ScannModel
    from conftest import make_synthetic_batch

    cfg = ModelConfig(n_atoms=10, embedding_dim=16, n_attention=2, local_dim=32,
                      num_head=4, global_dim=32, dense_out=16,
                      g_update=g_update, use_ga_norm=ga_norm,
                      use_ring=ring, feature="cgcnn" if cgcnn else "atomic")
    assert supports_config(cfg)
    inputs = make_synthetic_batch(rng, B=3, M=12, N=6, use_ring=ring,
                                  cgcnn=cgcnn)
    model = ScannModel(config=cfg, mrelu_head=mrelu)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    ref = jit_apply(model)(params, inputs)
    pred, ga = fused_scann_forward(params, inputs, cfg, mrelu_head=mrelu,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(ref["property"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ref["ga_score"]),
                               rtol=1e-5, atol=1e-6)


def test_fused_forward_rejects_unsupported_config():
    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_forward import supports_config

    # ring, cgcnn, and use_drop are all fused now; only the unpublished
    # use_attn_norm=False configuration falls back to XLA
    assert supports_config(ModelConfig(feature="cgcnn"))
    assert supports_config(ModelConfig(use_ring=True))
    assert supports_config(ModelConfig(use_drop=True))
    assert not supports_config(ModelConfig(use_attn_norm=False))


@pytest.mark.parametrize("g_update,ga_norm,ring,cgcnn", [
    # one representative combo stays in the fast suite; the rest are
    # interpret-mode-heavy (10-25 s each on 1 CPU) and run in the slow tier
    (False, False, False, False),
    pytest.param(True, True, False, False, marks=pytest.mark.slow),
    pytest.param(False, True, True, False, marks=pytest.mark.slow),
    pytest.param(True, True, False, True, marks=pytest.mark.slow),
])
def test_fused_backward_matches_jax_grad(rng, g_update, ga_norm, ring, cgcnn):
    """The hand-written whole-model backward kernel == jax.grad of the flax
    model, for every parameter (interpret mode)."""
    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_backward import scann_apply
    from scann_tpu.models import ScannModel
    from conftest import make_synthetic_batch

    cfg = ModelConfig(n_atoms=10, embedding_dim=16, n_attention=2, local_dim=32,
                      num_head=4, global_dim=32, dense_out=16,
                      g_update=g_update, use_ga_norm=ga_norm,
                      use_ring=ring, feature="cgcnn" if cgcnn else "atomic")
    inputs = make_synthetic_batch(rng, B=3, M=12, N=6, use_ring=ring,
                                  cgcnn=cgcnn)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    y = jnp.asarray(np.linspace(-1, 1, 3, dtype=np.float32))

    def loss_ref(p):
        out = model.apply(p, inputs, deterministic=True)
        return (jnp.sqrt(jnp.mean((out["property"][:, 0] - y) ** 2))
                + 0.1 * jnp.sum(out["ga_score"] ** 2))

    def loss_fused(p):
        pred, ga = scann_apply(p, inputs, cfg, False, True)
        return (jnp.sqrt(jnp.mean((pred[:, 0] - y) ** 2))
                + 0.1 * jnp.sum(ga ** 2))

    l1, g1 = jax.jit(jax.value_and_grad(loss_ref))(params)
    l2, g2 = jax.jit(jax.value_and_grad(loss_fused))(params)
    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(g2)[0]
    assert len(flat1) == len(flat2)
    for (p1, v1), (p2, v2) in zip(flat1, flat2):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        scale_ref = np.abs(np.asarray(v1)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(v1), rtol=0, atol=2e-4 * scale_ref,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(p1)}")


@pytest.mark.slow  # two extra kernel builds in interpret mode
def test_fused_bf16_mode_tracks_f32(rng):
    """model.dtype='bfloat16' runs the unrolled kernels' dots in bf16 (f32
    accumulation); results must track the f32 kernels within bf16 mantissa
    tolerance, and raw training gradients must agree in direction."""
    import dataclasses

    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_backward import fused_scann_train_grads
    from scann_tpu.kernels.scann_forward import fused_scann_forward
    from scann_tpu.models import ScannModel
    from conftest import make_synthetic_batch

    cfg = ModelConfig(n_atoms=10, embedding_dim=16, n_attention=2, local_dim=32,
                      num_head=4, global_dim=32, dense_out=16, g_update=True)
    cfg_bf = dataclasses.replace(cfg, dtype="bfloat16")
    inputs = make_synthetic_batch(rng, B=2, M=12, N=6)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)

    p32, g32 = fused_scann_forward(params, inputs, cfg, interpret=True,
                                   batch_tile=1)
    pbf, gbf = fused_scann_forward(params, inputs, cfg_bf, interpret=True,
                                   batch_tile=1)
    np.testing.assert_allclose(np.asarray(pbf), np.asarray(p32),
                               rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(gbf), np.asarray(g32),
                               rtol=0.1, atol=0.02)

    y = jnp.asarray(np.linspace(-1, 1, 2, dtype=np.float32))
    _, d32 = fused_scann_train_grads(params, inputs, y, cfg, interpret=True,
                                     batch_tile=1)
    _, dbf = fused_scann_train_grads(params, inputs, y, cfg_bf,
                                     interpret=True, batch_tile=1)
    flat32 = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(d32)])
    flatbf = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(dbf)])
    cos = flat32 @ flatbf / (np.linalg.norm(flat32) * np.linalg.norm(flatbf))
    assert cos > 0.999, f"bf16 gradient direction diverged: cos={cos:.5f}"


@pytest.mark.parametrize("mrelu", [False, pytest.param(True, marks=pytest.mark.slow)])
def test_fused_train_grads_matches_apply_grad(rng, mrelu):
    """One-kernel-per-step training (forward + RMSE residual + backward in a
    single launch) for the unrolled kernels: raw grads scaled by 1/(B*rmse)
    must equal jax.grad of the RMSE loss through scann_apply, and the
    emitted pred must equal the forward output."""
    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_backward import (
        fused_scann_train_grads,
        scann_apply,
    )
    from scann_tpu.models import ScannModel
    from conftest import make_synthetic_batch

    cfg = ModelConfig(n_atoms=10, embedding_dim=16, n_attention=2, local_dim=32,
                      num_head=4, global_dim=32, dense_out=16, g_update=True)
    inputs = make_synthetic_batch(rng, B=3, M=12, N=6)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    y = jnp.asarray(np.linspace(-1, 1, 3, dtype=np.float32))

    pred, raw = fused_scann_train_grads(params, inputs, y, cfg,
                                        mrelu_head=mrelu, interpret=True,
                                        batch_tile=1)

    def loss(p):
        pr, _ = scann_apply(p, inputs, cfg, mrelu, True)
        return jnp.sqrt(jnp.mean((pr[:, 0] - y) ** 2)), pr

    (ref_loss, pf), ref_g = jax.value_and_grad(loss, has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pf),
                               rtol=1e-6, atol=1e-7)
    rmse = float(jnp.sqrt(jnp.mean((pred[:, 0] - y) ** 2)))
    assert rmse == pytest.approx(float(ref_loss), rel=1e-6)
    scale = 1.0 / (y.shape[0] * rmse)
    flat_ref = jax.tree_util.tree_flatten_with_path(
        ref_g.get("params", ref_g))[0]
    flat_raw = jax.tree_util.tree_flatten_with_path(raw)[0]
    assert len(flat_ref) == len(flat_raw)
    for (p1, v1), (p2, v2) in zip(flat_ref, flat_raw):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        s = np.abs(np.asarray(v1)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(v2) * scale, np.asarray(v1), rtol=0, atol=2e-5 * s,
            err_msg=f"raw-grad mismatch at {jax.tree_util.keystr(p1)}")


@pytest.mark.slow
def test_sharded_fused_train_matches_single_device(rng):
    """The shard_map one-shot training wrapper for the unrolled kernels
    (params replicated, batch + targets sharded, raw-grad psum) == the
    single-device path."""
    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_backward import (
        fused_scann_train_grads,
        make_sharded_scann_train,
    )
    from scann_tpu.models import ScannModel
    from scann_tpu.parallel import make_mesh
    from conftest import make_synthetic_batch

    cfg = ModelConfig(n_atoms=10, embedding_dim=16, n_attention=2, local_dim=32,
                      num_head=4, global_dim=32, dense_out=16, g_update=True)
    inputs = make_synthetic_batch(rng, B=16, M=12, N=6)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    y = jnp.asarray(np.linspace(-1, 1, 16, dtype=np.float32))
    mesh = make_mesh(n_devices=8)
    f8 = make_sharded_scann_train(mesh, cfg, interpret=True)

    pred8, raw8 = jax.jit(lambda p: f8(p, inputs, y, jnp.int32(0)))(params)
    pred1, raw1 = fused_scann_train_grads(params, inputs, y, cfg,
                                          interpret=True, batch_tile=1)
    np.testing.assert_allclose(np.asarray(pred8), np.asarray(pred1),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(raw1), jax.tree.leaves(raw8)):
        s = np.abs(np.asarray(a)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=5e-5 * s)


@pytest.mark.slow  # 8-device interpret-mode: ~27 s on 1 CPU
def test_sharded_fused_apply_matches_single_device(rng):
    """shard_map-wrapped fused kernels over the 8-device mesh == single
    device, including the psum'd parameter gradients (interpret mode)."""
    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_backward import (
        make_sharded_scann_apply,
        scann_apply,
    )
    from scann_tpu.models import ScannModel
    from scann_tpu.parallel import make_mesh
    from conftest import make_synthetic_batch

    cfg = ModelConfig(n_atoms=10, embedding_dim=16, n_attention=2, local_dim=32,
                      num_head=4, global_dim=32, dense_out=16, g_update=True)
    inputs = make_synthetic_batch(rng, B=16, M=12, N=6)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    y = jnp.asarray(np.linspace(-1, 1, 16, dtype=np.float32))
    mesh = make_mesh(n_devices=8)
    f8 = make_sharded_scann_apply(mesh, cfg, interpret=True)

    def loss8(p):
        pred, _ = f8(p, {k: jnp.asarray(v) for k, v in inputs.items()},
                     jnp.int32(0))
        return jnp.sqrt(jnp.mean((pred[:, 0] - y) ** 2))

    def loss1(p):
        pred, _ = scann_apply(p, inputs, cfg, False, True, 0.0, None)
        return jnp.sqrt(jnp.mean((pred[:, 0] - y) ** 2))

    l8, g8 = jax.jit(jax.value_and_grad(loss8))(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss1))(params)
    assert float(l8) == pytest.approx(float(l1), rel=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        scale = np.abs(np.asarray(a)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=5e-5 * scale)


def test_vmem_guards():
    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_forward import (
        fits_vmem,
        pick_backward_tile,
        pick_batch_tile,
    )

    qm9 = ModelConfig(n_attention=7, local_dim=128, g_update=True)
    assert fits_vmem(qm9, M=32, N=16)           # flagship shapes fit
    assert fits_vmem(qm9, M=64, N=24)           # mid-size structures fit
    assert not fits_vmem(qm9, M=512, N=48)      # huge shapes fall back to XLA
    mp = ModelConfig(n_attention=9, local_dim=128, g_update=True)
    assert fits_vmem(mp, M=48, N=24)            # small mp2018 buckets: fused
    assert not fits_vmem(mp, M=96, N=32)        # crystal buckets: XLA (the
    assert not fits_vmem(mp, M=160, N=40)       # compile-cost gate, see
                                                # fits_vmem docstring)
    bt = pick_batch_tile(qm9, B=128, M=32, N=16)
    assert bt >= 8 and 128 % bt == 0
    assert pick_batch_tile(qm9, B=128, M=128, N=32) >= 2
    bwt = pick_backward_tile(qm9, B=128, M=32, N=16)
    assert bwt >= 4 and 128 % bwt == 0
    # the backward's stash working set forces a smaller (or equal) tile
    assert bwt <= pick_batch_tile(qm9, B=128, M=32, N=16)
    # odd batch sizes only admit divisors
    assert pick_batch_tile(qm9, B=7, M=32, N=16) == 1
    assert pick_backward_tile(qm9, B=7, M=32, N=16) == 1


def test_bwd_vmem_model_is_keep_acts_aware(monkeypatch):
    """ADVICE r4: the backward VMEM estimate must reflect the keep-acts
    schedule's larger working set (~8 extra [M,N,*]-class activations per
    layer kept alive across the reverse walk) so near-the-edge shapes hit
    the probe gate / XLA fallback instead of an unguarded Mosaic compile
    failure. Tile PICKS stay on the calibrated recompute model."""
    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_forward import (
        _bwd_mol_bytes,
        _rnd_bytes,
        fits_vmem,
        pick_backward_tile,
    )

    qm9 = ModelConfig(n_attention=7, local_dim=128, g_update=True)
    lo = _bwd_mol_bytes(qm9, 32, 16, keep_acts=False)
    hi = _bwd_mol_bytes(qm9, 32, 16, keep_acts=True)
    assert hi - lo == 8 * qm9.n_attention * _rnd_bytes(qm9, 32, 16)
    # default tracks the env kill-switch
    monkeypatch.setenv("SCANN_TPU_UNROLL_STASH", "0")
    assert _bwd_mol_bytes(qm9, 32, 16) == lo
    monkeypatch.setenv("SCANN_TPU_UNROLL_STASH", "1")
    assert _bwd_mol_bytes(qm9, 32, 16) == hi
    # picks are schedule-independent: probed-OK tiles must not shrink
    monkeypatch.setenv("SCANN_TPU_UNROLL_STASH", "0")
    bt0 = pick_backward_tile(qm9, B=128, M=32, N=16)
    monkeypatch.setenv("SCANN_TPU_UNROLL_STASH", "1")
    assert pick_backward_tile(qm9, B=128, M=32, N=16) == bt0
    # a shape that fits the recompute schedule at bt=1 but overflows under
    # keep-acts routes to the XLA path rather than a doomed fused compile
    mp = ModelConfig(n_attention=9, local_dim=128, g_update=True)
    edge = (64, 32)
    if (not fits_vmem(mp, *edge)) and _bwd_mol_bytes(
            mp, *edge, keep_acts=False) < 120 * 1024 * 1024:
        monkeypatch.setenv("SCANN_TPU_UNROLL_STASH", "0")
        assert fits_vmem(mp, *edge)
    # ... but eval/serving gate on the FORWARD working set only: the same
    # shape keeps the fused forward even when the backward overflows
    monkeypatch.setenv("SCANN_TPU_UNROLL_STASH", "1")
    assert not fits_vmem(mp, *edge, training=True)
    assert fits_vmem(mp, *edge, training=False)
    # the atom-count compile gate applies to both modes
    assert not fits_vmem(mp, 96, 32, training=False)


@pytest.mark.slow
def test_dropout_masks_are_tiling_invariant(rng):
    """Dropout masks are keyed to GLOBAL molecule indices: the fused forward
    at any batch_tile and the fused backward at any (other) batch_tile see
    the same masks. Runs under the TPU interpreter (the in-kernel PRNG has
    no plain-CPU lowering)."""
    from jax.experimental.pallas import tpu as pltpu
    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_backward import fused_scann_grad
    from scann_tpu.kernels.scann_forward import fused_scann_forward
    from scann_tpu.models import ScannModel
    from conftest import make_synthetic_batch

    cfg = ModelConfig(n_atoms=10, embedding_dim=16, n_attention=2,
                      local_dim=32, num_head=4, global_dim=32, dense_out=16,
                      g_update=True, use_drop=True)
    inputs = make_synthetic_batch(rng, B=4, M=12, N=6)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    ct_p = np.ones((4, 1), np.float32)
    ct_g = np.linspace(0, 1, 48).reshape(4, 12, 1).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        preds = [fused_scann_forward(params, inputs, cfg, dropout_rate=0.1,
                                     dropout_seed=123, batch_tile=bt)[0]
                 for bt in (1, 2, 4)]
        grads = [fused_scann_grad(params, inputs, cfg, ct_p, ct_g,
                                  dropout_rate=0.1, dropout_seed=123,
                                  batch_tile=bt)
                 for bt in (1, 2, 4)]
        # a different seed must change the output (dropout is really on)
        p_other = fused_scann_forward(params, inputs, cfg, dropout_rate=0.1,
                                      dropout_seed=777, batch_tile=2)[0]

    for p in preds[1:]:
        np.testing.assert_allclose(np.asarray(p), np.asarray(preds[0]),
                                   rtol=1e-5, atol=1e-6)
    # the TPU *interpreter's* PRNG is seed-insensitive (a known limitation) —
    # assert seed-sensitivity only where the backend provides it; the real
    # check runs on hardware via tools/tpu_checks.py
    seed_diff = np.max(np.abs(np.asarray(p_other) - np.asarray(preds[0])))
    if seed_diff > 1e-6:
        assert seed_diff > 1e-4
    for g in grads[1:]:
        for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(g)):
            scale = np.abs(np.asarray(a)).max() + 1e-8
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=0, atol=3e-5 * scale)


@pytest.mark.slow
def test_dropout_gradient_matches_finite_difference(rng):
    """With a fixed dropout seed the fused loss is a deterministic function
    of params; its hand-written backward must match central finite
    differences along random parameter directions — this catches any
    forward/backward mask mismatch (the masks are replayed from the PRNG,
    never stored)."""
    from jax.experimental.pallas import tpu as pltpu
    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_backward import scann_apply
    from scann_tpu.models import ScannModel
    from conftest import make_synthetic_batch

    cfg = ModelConfig(n_atoms=10, embedding_dim=16, n_attention=2,
                      local_dim=32, num_head=4, global_dim=32, dense_out=16,
                      g_update=True, use_drop=True)
    inputs = make_synthetic_batch(rng, B=2, M=8, N=4)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    y = jnp.asarray([0.3, -0.7], jnp.float32)

    def loss(p):
        pred, ga = scann_apply(p, inputs, cfg, False, False, 0.1, 42)
        return (jnp.sqrt(jnp.mean((pred[:, 0] - y) ** 2))
                + 0.05 * jnp.sum(ga ** 2))

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(params)
        flat_p, tree = jax.tree_util.tree_flatten(params)
        flat_g = jax.tree_util.tree_leaves(g)
        dirs = [np.asarray(rng.normal(size=x.shape), np.float32)
                for x in flat_p]
        # normalize the direction globally so the FD step stays in the
        # linear regime (an unnormalized ~100k-param direction has norm
        # ~300, making eps*|dir| a huge, curvature-dominated step)
        gn = float(np.sqrt(sum(np.sum(d * d) for d in dirs)))
        dirs = [d / gn for d in dirs]
        eps = 1e-2
        plus = jax.tree_util.tree_unflatten(
            tree, [x + eps * d for x, d in zip(flat_p, dirs)])
        minus = jax.tree_util.tree_unflatten(
            tree, [x - eps * d for x, d in zip(flat_p, dirs)])
        fd = (float(loss(plus)) - float(loss(minus))) / (2 * eps)
    analytic = float(sum(np.sum(np.asarray(gg) * d)
                         for gg, d in zip(flat_g, dirs)))
    assert fd == pytest.approx(analytic, rel=2e-2, abs=1e-4)


def test_unrolled_keep_acts_matches_recompute(rng, monkeypatch):
    """The keep-acts backward schedule (round 4 default: +27.9% measured on
    v5e) must produce the recompute schedule's gradients — identical
    dataflow, different value lifetimes. Ulp-level tolerance: the two
    traced graphs fuse differently."""
    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_backward import fused_scann_grad
    from scann_tpu.models import ScannModel
    from conftest import make_synthetic_batch

    cfg = ModelConfig(n_atoms=10, embedding_dim=16, n_attention=2,
                      local_dim=32, num_head=4, global_dim=32, dense_out=16,
                      g_update=True, use_ga_norm=True)
    inputs = make_synthetic_batch(rng, B=2, M=12, N=6)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    ct_pred = jnp.asarray(np.linspace(-1, 1, 2, dtype=np.float32))[:, None]
    ct_ga = jnp.zeros((2, 12, 1), jnp.float32)

    monkeypatch.setenv("SCANN_TPU_UNROLL_STASH", "1")
    g_keep = fused_scann_grad(params, inputs, cfg, ct_pred, ct_ga,
                              interpret=True, batch_tile=1)
    monkeypatch.setenv("SCANN_TPU_UNROLL_STASH", "0")
    g_rec = fused_scann_grad(params, inputs, cfg, ct_pred, ct_ga,
                             interpret=True, batch_tile=1)
    flat_k = jax.tree_util.tree_flatten_with_path(g_keep)[0]
    flat_r = jax.tree_util.tree_flatten_with_path(g_rec)[0]
    assert len(flat_k) == len(flat_r)
    for (p1, v1), (p2, v2) in zip(flat_k, flat_r):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        scale = np.abs(np.asarray(v2)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=0, atol=1e-5 * scale,
            err_msg=f"keep-acts drift at {jax.tree_util.keystr(p1)}")


def test_bf16_stash_grads_close_to_f32(rng, monkeypatch):
    """The bf16 keep-acts stash EXPERIMENT (SCANN_TPU_STASH_BF16=1) rebuilds
    gradients from rounded activations: it must track the f32-stash
    gradients within bf16 tolerance (~1e-2 relative per tensor), not
    bit-exactly — and the default-off path must stay bit-identical."""
    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_backward import fused_scann_grad
    from scann_tpu.models import ScannModel
    from conftest import make_synthetic_batch

    cfg = ModelConfig(n_atoms=10, embedding_dim=16, n_attention=2,
                      local_dim=32, num_head=4, global_dim=32, dense_out=16,
                      g_update=True, use_ga_norm=True)
    inputs = make_synthetic_batch(rng, B=2, M=12, N=6)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    ct_pred = jnp.asarray(np.linspace(-1, 1, 2, dtype=np.float32))[:, None]
    ct_ga = jnp.zeros((2, 12, 1), jnp.float32)

    monkeypatch.setenv("SCANN_TPU_UNROLL_STASH", "1")
    monkeypatch.delenv("SCANN_TPU_STASH_BF16", raising=False)
    g_f32 = fused_scann_grad(params, inputs, cfg, ct_pred, ct_ga,
                             interpret=True, batch_tile=1)
    monkeypatch.setenv("SCANN_TPU_STASH_BF16", "1")
    g_bf16 = fused_scann_grad(params, inputs, cfg, ct_pred, ct_ga,
                              interpret=True, batch_tile=1)
    flat_a = jax.tree_util.tree_flatten_with_path(g_f32)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(g_bf16)[0]
    assert len(flat_a) == len(flat_b)
    for (p1, v1), (p2, v2) in zip(flat_a, flat_b):
        scale = np.abs(np.asarray(v1)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(v1), rtol=0, atol=2e-2 * scale,
            err_msg=f"bf16-stash drift at {jax.tree_util.keystr(p1)}")
