"""Loop-kernel parity tests (crystal-scale fused path, interpret mode).

The fori_loop-based kernels must reproduce the flax model (and therefore the
reference graph, via test_golden) exactly like the unrolled kernels do.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scann_tpu.config import ModelConfig
from scann_tpu.kernels.scann_loop import (
    fits_loop_vmem,
    loop_scann_apply,
    loop_scann_forward,
    loop_scann_grad,
    supports_loop,
)
from scann_tpu.models import ScannModel
from conftest import make_synthetic_batch, jit_apply, jit_init_vars


def _case(rng, g_update=True, ga_norm=True, B=3, M=24, N=8, L=3,
          use_ring=False, cgcnn=False):
    cfg = ModelConfig(n_atoms=12, embedding_dim=16, n_attention=L,
                      local_dim=32, num_head=4, global_dim=32, dense_out=16,
                      g_update=g_update, use_ga_norm=ga_norm,
                      use_ring=use_ring,
                      feature="cgcnn" if cgcnn else "atomic")
    inputs = make_synthetic_batch(rng, B=B, M=M, N=N, use_ring=use_ring,
                                  cgcnn=cgcnn)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    return cfg, inputs, model, params


@pytest.mark.parametrize("g_update,ga_norm", [
    pytest.param(True, True, marks=pytest.mark.slow),  # ~9 s interpret mode
    (False, False)])
def test_loop_forward_matches_flax(rng, g_update, ga_norm):
    cfg, inputs, model, params = _case(rng, g_update, ga_norm)
    ref = jit_apply(model)(params, inputs)
    pred, ga = loop_scann_forward(params, inputs, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(ref["property"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ref["ga_score"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # 8-device interpret mode
def test_sharded_loop_forward_matches_single_device(rng):
    """Multi-chip crystal EVAL (round-2 VERDICT #3b): the shard_map-wrapped
    loop forward over the 8-device mesh == single-device loop forward."""
    from scann_tpu.kernels.scann_loop import make_sharded_loop_forward
    from scann_tpu.parallel import make_mesh

    cfg, inputs, model, params = _case(rng, B=8, M=24, N=8, L=2)
    mesh = make_mesh(8)
    fwd = make_sharded_loop_forward(mesh, cfg, interpret=True)
    pred_s, ga_s = jax.jit(fwd)(params, inputs)
    pred_1, ga_1 = loop_scann_forward(params, inputs, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(pred_s), np.asarray(pred_1),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ga_s), np.asarray(ga_1),
                               rtol=1e-6, atol=1e-7)
    # and therefore == the flax model
    ref = jit_apply(model)(params, inputs)
    np.testing.assert_allclose(np.asarray(pred_s), np.asarray(ref["property"]),
                               rtol=1e-5, atol=1e-6)



@pytest.mark.slow  # two extra kernel builds in interpret mode (~36 s)
def test_loop_bf16_mode_tracks_f32(rng):
    """model.dtype='bfloat16' runs the loop kernels' dots in bf16 (f32
    accumulation); results must track the f32 kernels within bf16 mantissa
    tolerance (round-2 VERDICT #3c — the bandwidth-bound crystal tail)."""
    import dataclasses

    cfg, inputs, model, params = _case(rng, B=2, M=24, N=8, L=2)
    cfg_bf = dataclasses.replace(cfg, dtype="bfloat16")
    p32, g32 = loop_scann_forward(params, inputs, cfg, interpret=True)
    pbf, gbf = loop_scann_forward(params, inputs, cfg_bf, interpret=True)
    np.testing.assert_allclose(np.asarray(pbf), np.asarray(p32),
                               rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(gbf), np.asarray(g32),
                               rtol=0.1, atol=0.02)

    # gradients: direction must agree (cosine) even where magnitudes wobble
    ct_pred = np.ones((2, 1), np.float32)
    ct_ga = np.zeros((2, 24, 1), np.float32)
    d32 = loop_scann_grad(params, inputs, cfg, ct_pred, ct_ga, interpret=True)
    dbf = loop_scann_grad(params, inputs, cfg_bf, ct_pred, ct_ga,
                          interpret=True)
    flat32 = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(d32)])
    flatbf = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(dbf)])
    cos = flat32 @ flatbf / (np.linalg.norm(flat32) * np.linalg.norm(flatbf))
    assert cos > 0.999, f"bf16 gradient direction diverged: cos={cos:.5f}"


def test_loop_ring_forward_matches_flax(rng):
    """use_ring (the ptgp workflow: ring/aromatic extra embedding at crystal
    scale, reference model_ptgp.yaml + scann_model.py:367-371) through the
    loop forward == the flax model."""
    cfg, inputs, model, params = _case(rng, use_ring=True, L=2)
    ref = jit_apply(model)(params, inputs)
    pred, ga = loop_scann_forward(params, inputs, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(ref["property"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ref["ga_score"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # interpret-mode backward build
def test_loop_ring_backward_matches_jax_grad(rng):
    """use_ring gradients (extra_embed kernel/bias + the split dense_embed
    rows) from the loop backward == jax.grad through the flax model."""
    cfg, inputs, model, params = _case(rng, use_ring=True, L=2)
    y = jnp.asarray(np.linspace(-1, 1, 3, dtype=np.float32))

    def loss_ref(p):
        out = model.apply(p, inputs, deterministic=True)
        return (jnp.sqrt(jnp.mean((out["property"][:, 0] - y) ** 2))
                + 0.1 * jnp.sum(out["ga_score"] ** 2))

    def loss_loop(p):
        pred, ga = loop_scann_apply(p, inputs, cfg, False, True)
        return (jnp.sqrt(jnp.mean((pred[:, 0] - y) ** 2))
                + 0.1 * jnp.sum(ga ** 2))

    l1, g1 = jax.jit(jax.value_and_grad(loss_ref))(params)
    l2, g2 = jax.value_and_grad(loss_loop)(params)
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


def test_loop_cgcnn_forward_matches_flax(rng):
    """feature='cgcnn' (92-dim descriptor Dense embedding, reference
    scann_model.py:363-365) through the loop forward == the flax model."""
    cfg, inputs, model, params = _case(rng, cgcnn=True, L=2)
    ref = jit_apply(model)(params, inputs)
    pred, ga = loop_scann_forward(params, inputs, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(ref["property"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ref["ga_score"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # interpret-mode backward build
def test_loop_cgcnn_backward_matches_jax_grad(rng):
    """cgcnn gradients (embed_atom kernel/bias through the descriptor
    matmul) from the loop backward == jax.grad through the flax model."""
    cfg, inputs, model, params = _case(rng, cgcnn=True, L=2)
    y = jnp.asarray(np.linspace(-1, 1, 3, dtype=np.float32))

    def loss_ref(p):
        out = model.apply(p, inputs, deterministic=True)
        return (jnp.sqrt(jnp.mean((out["property"][:, 0] - y) ** 2))
                + 0.1 * jnp.sum(out["ga_score"] ** 2))

    def loss_loop(p):
        pred, ga = loop_scann_apply(p, inputs, cfg, False, True)
        return (jnp.sqrt(jnp.mean((pred[:, 0] - y) ** 2))
                + 0.1 * jnp.sum(ga ** 2))

    l1, g1 = jax.jit(jax.value_and_grad(loss_ref))(params)
    l2, g2 = jax.value_and_grad(loss_loop)(params)
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


@pytest.mark.slow  # two interpret-mode builds; BT=1 is the production default
def test_loop_forward_batch_tiled_matches_single(rng):
    """batch_tile=2 (two molecules per program, row-concatenated like the
    unrolled kernels) == batch_tile=1 == the flax model, per molecule."""
    cfg, inputs, model, params = _case(rng, B=4, M=24, N=8, L=2)
    p1, g1 = loop_scann_forward(params, inputs, cfg, interpret=True,
                                batch_tile=1)
    p2, g2 = loop_scann_forward(params, inputs, cfg, interpret=True,
                                batch_tile=2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-6, atol=1e-7)
    ref = jit_apply(model)(params, inputs)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(ref["property"]),
                               rtol=1e-5, atol=1e-6)


def test_loop_forward_matches_unrolled(rng):
    """Loop and unrolled fused kernels agree bit-closely on the same data."""
    from scann_tpu.kernels.scann_forward import fused_scann_forward

    cfg, inputs, _, params = _case(rng)
    p1, g1 = loop_scann_forward(params, inputs, cfg, interpret=True)
    p2, g2 = fused_scann_forward(params, inputs, cfg, interpret=True,
                                 batch_tile=1)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("g_update,ga_norm", [
    pytest.param(True, True, marks=pytest.mark.slow),  # ~25 s interpret mode
    (False, True)])
def test_loop_backward_matches_jax_grad(rng, g_update, ga_norm):
    cfg, inputs, model, params = _case(rng, g_update, ga_norm)
    y = jnp.asarray(np.linspace(-1, 1, 3, dtype=np.float32))

    def loss_ref(p):
        out = model.apply(p, inputs, deterministic=True)
        return (jnp.sqrt(jnp.mean((out["property"][:, 0] - y) ** 2))
                + 0.1 * jnp.sum(out["ga_score"] ** 2))

    def loss_loop(p):
        pred, ga = loop_scann_apply(p, inputs, cfg, False, True)
        return (jnp.sqrt(jnp.mean((pred[:, 0] - y) ** 2))
                + 0.1 * jnp.sum(ga ** 2))

    l1, g1 = jax.jit(jax.value_and_grad(loss_ref))(params)
    l2, g2 = jax.value_and_grad(loss_loop)(params)
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


@pytest.mark.parametrize("mrelu", [False, pytest.param(True, marks=pytest.mark.slow)])
def test_loop_train_grads_matches_apply_grad(rng, mrelu):
    """One-kernel-per-step training (forward + RMSE residual + backward in a
    single launch): raw grads scaled by 1/(B*rmse) must equal jax.grad of the
    RMSE loss through loop_scann_apply, and the emitted pred must equal the
    standalone loop forward."""
    from scann_tpu.kernels.scann_loop import loop_scann_train_grads

    # small case: this test builds 4 interpret-mode kernels; keep it fast
    cfg, inputs, model, params = _case(rng, False, True, B=3, M=16, N=8, L=2)
    y = jnp.asarray(np.linspace(-1, 1, 3, dtype=np.float32))

    pred, raw = loop_scann_train_grads(params, inputs, y, cfg,
                                       mrelu_head=mrelu, interpret=True)

    def loss(p):
        pr, _ = loop_scann_apply(p, inputs, cfg, mrelu, True)
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
def test_sharded_loop_train_matches_single_device(rng):
    """The shard_map one-shot training wrapper (params replicated, batch +
    targets sharded, raw-grad psum over ICI) == the single-device path."""
    from scann_tpu.kernels.scann_loop import (
        loop_scann_train_grads,
        make_sharded_loop_train,
    )
    from scann_tpu.parallel import make_mesh

    cfg, inputs, _, params = _case(rng, B=16, M=16, N=6, L=2)
    y = jnp.asarray(np.linspace(-1, 1, 16, dtype=np.float32))
    mesh = make_mesh(n_devices=8)
    f8 = make_sharded_loop_train(mesh, cfg, interpret=True)

    pred8, raw8 = jax.jit(lambda p: f8(p, inputs, y, jnp.int32(0)))(params)
    pred1, raw1 = loop_scann_train_grads(params, inputs, y, cfg,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(pred8), np.asarray(pred1),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(raw1), jax.tree.leaves(raw8)):
        s = np.abs(np.asarray(a)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=5e-5 * s)


@pytest.mark.slow
def test_sharded_loop_apply_matches_single_device(rng):
    """shard_map-wrapped loop kernels over the 8-device mesh == single
    device, including the psum'd parameter gradients (interpret mode)."""
    from scann_tpu.kernels.scann_loop import make_sharded_loop_apply
    from scann_tpu.parallel import make_mesh

    cfg, inputs, _, params = _case(rng, B=16, M=16, N=6, L=2)
    y = jnp.asarray(np.linspace(-1, 1, 16, dtype=np.float32))
    mesh = make_mesh(n_devices=8)
    f8 = make_sharded_loop_apply(mesh, cfg, interpret=True)

    def loss8(p):
        pred, _ = f8(p, {k: jnp.asarray(v) for k, v in inputs.items()},
                     jnp.int32(0))
        return jnp.sqrt(jnp.mean((pred[:, 0] - y) ** 2))

    def loss1(p):
        pred, _ = loop_scann_apply(p, inputs, cfg, False, True, 0.0, None)
        return jnp.sqrt(jnp.mean((pred[:, 0] - y) ** 2))

    l8, g8 = jax.jit(jax.value_and_grad(loss8))(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss1))(params)
    assert float(l8) == pytest.approx(float(l1), rel=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        scale = np.abs(np.asarray(a)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=5e-5 * scale)


def test_loop_gates():
    mp = ModelConfig(n_attention=9, local_dim=128, g_update=True)
    assert supports_loop(mp)
    # ring + cgcnn are supported since round 3 (ptgp trains use_ring at
    # M > 64; cgcnn is the one remaining feature option)
    assert supports_loop(ModelConfig(use_ring=True))
    assert supports_loop(ModelConfig(feature="cgcnn"))
    # use_drop fused since round 3 — completes the crystal config matrix
    assert supports_loop(ModelConfig(use_drop=True))
    assert not supports_loop(ModelConfig(use_attn_norm=False))
    # attention-dropout transients are budgeted but don't evict the
    # crystal-scale buckets
    assert fits_loop_vmem(ModelConfig(n_attention=9, local_dim=128,
                                      g_update=True, use_drop=True),
                          M=96, N=32)
    # mp2018 crystal buckets fit the loop kernels' VMEM model
    assert fits_loop_vmem(mp, M=96, N=32)
    assert fits_loop_vmem(mp, M=128, N=32)
    assert not fits_loop_vmem(mp, M=512, N=64)


def test_fits_loop_vmem_eval_not_charged_for_dropout():
    """Eval runs with attn_dropout=0 and allocates no mask scratch, so the
    VMEM estimate must only charge the dropout transients when training —
    otherwise borderline use_drop crystal shapes silently lose the fused
    eval path. Pin it via the minimal passing budget: train - eval must
    equal exactly the dropout transient term for use_drop, and zero without."""
    from scann_tpu.kernels.scann_loop import _pad8, _pad128

    def min_budget(cfm, M, N, training):
        lo, hi = 1, 1 << 34
        while lo < hi:  # first budget that fits
            mid = (lo + hi) // 2
            if fits_loop_vmem(cfm, M, N, budget_bytes=mid, training=training):
                hi = mid
            else:
                lo = mid + 1
        return lo

    M, N = 96, 32
    drop = ModelConfig(n_attention=9, local_dim=128, num_head=8,
                       g_update=True, use_drop=True)
    plain = ModelConfig(n_attention=9, local_dim=128, num_head=8,
                        g_update=True, use_drop=False)
    transient = 3 * M * _pad8(N) * _pad128(drop.num_head) * 4
    assert (min_budget(drop, M, N, True)
            - min_budget(drop, M, N, False)) == transient
    assert min_budget(plain, M, N, True) == min_budget(plain, M, N, False)


@pytest.mark.slow  # interpret-mode fwd + bwd builds with the in-kernel PRNG
def test_loop_dropout_gradient_matches_finite_difference(rng):
    """use_drop + training dropout through the LOOP kernels: with a fixed
    seed the fused loss is a deterministic function of params; the
    hand-written backward — which replays the residual masks from scratch
    and the ATTENTION masks by per-(molecule, layer) reseeding, never
    storing the latter — must match central finite differences.

    SCOPE: the TPU interpreter's PRNG is a stub (seed-insensitive, constant
    bits), so under it every mask degenerates to a uniform 1/keep scale —
    this test verifies the dropout SCALING and backward algebra, but cannot
    catch reseed-keying bugs (e.g. a dropped `+ l`). The authoritative
    replay checks run on hardware: tools/tpu_checks.py (per-layer mask
    distinctness, replay determinism, loop-family finite difference)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    cfg, inputs, model, params = _case(rng, B=2, M=8, N=4, L=2)
    cfg = dataclasses.replace(cfg, use_drop=True)
    y = jnp.asarray([0.3, -0.7], jnp.float32)

    def loss(p):
        pred, ga = loop_scann_apply(p, inputs, cfg, False, False, 0.1, 42)
        return (jnp.sqrt(jnp.mean((pred[:, 0] - y) ** 2))
                + 0.05 * jnp.sum(ga ** 2))

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(params)
        flat_p, tree = jax.tree_util.tree_flatten(params)
        flat_g = jax.tree_util.tree_leaves(g)
        dirs = [np.asarray(rng.normal(size=x.shape), np.float32)
                for x in flat_p]
        gn = float(np.sqrt(sum(np.sum(d * d) for d in dirs)))
        dirs = [d / gn for d in dirs]  # keep the FD step in the linear regime
        eps = 1e-2
        plus = jax.tree_util.tree_unflatten(
            tree, [x + eps * d for x, d in zip(flat_p, dirs)])
        minus = jax.tree_util.tree_unflatten(
            tree, [x - eps * d for x, d in zip(flat_p, dirs)])
        fd = (float(loss(plus)) - float(loss(minus))) / (2 * eps)
    analytic = float(sum(np.sum(np.asarray(gg) * d)
                         for gg, d in zip(flat_g, dirs)))
    assert fd == pytest.approx(analytic, rel=2e-2, abs=1e-4)


@pytest.mark.slow  # interpret-mode builds
def test_loop_use_drop_eval_matches_flax(rng):
    """A use_drop config at EVAL (dropout off) must still match the flax
    model exactly — the mask machinery must be fully inert when
    dropout_rate == 0."""
    import dataclasses

    cfg, inputs, model, params = _case(rng, L=2)
    cfg = dataclasses.replace(cfg, use_drop=True)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    ref = jit_apply(model)(params, inputs)
    pred, ga = loop_scann_forward(params, inputs, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(ref["property"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ref["ga_score"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # interpret-mode builds with the in-kernel PRNG
def test_loop_use_drop_train_grads_consistent(rng):
    """One-shot training with use_drop: the emitted pred equals the
    standalone dropout forward at the same seed (fwd and one-shot bwd draw
    identical masks), and the raw grads scaled by 1/(B*rmse) equal jax.grad
    through loop_scann_apply at that seed. (Same interpreter-PRNG scope
    caveat as the FD test above — hardware replay is proven by
    tools/tpu_checks.py.)"""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from scann_tpu.kernels.scann_loop import loop_scann_train_grads

    cfg, inputs, model, params = _case(rng, B=2, M=8, N=4, L=2)
    cfg = dataclasses.replace(cfg, use_drop=True)
    y = jnp.asarray([0.3, -0.7], jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        pred, raw = loop_scann_train_grads(params, inputs, y, cfg,
                                           dropout_rate=0.1, dropout_seed=42)
        pf, _ = loop_scann_forward(params, inputs, cfg, dropout_rate=0.1,
                                   dropout_seed=42)

        def loss(p):
            pr, _ = loop_scann_apply(p, inputs, cfg, False, False, 0.1, 42)
            return jnp.sqrt(jnp.mean((pr[:, 0] - y) ** 2))

        ref_loss, ref_g = jax.value_and_grad(loss)(params)

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


# ---------------------------------------------------------------------------
# structure packing (data/packing.py) through the loop kernels
# ---------------------------------------------------------------------------

def _packed_case(L=3):
    from scann_tpu.data.packing import pack_dataset_slots
    from scann_tpu.data.pipeline import load_dataset
    from scann_tpu.data.synthetic import make_synthetic_dataset
    import tempfile

    root = tempfile.mkdtemp()
    e, n = make_synthetic_dataset(root, n_structures=20, min_atoms=4,
                                  max_atoms=14, seed=9)
    records, neighbors = load_dataset(e, n, target="homo")
    cfg = ModelConfig(n_atoms=12, embedding_dim=16, n_attention=L,
                      local_dim=32, num_head=4, global_dim=32, dense_out=16,
                      g_update=True, use_ga_norm=True)
    packed = pack_dataset_slots(records, neighbors, g_update=True,
                                capacity=16, max_segments=4)
    inp = {k: jnp.asarray(v) for k, v in packed.inputs.items()}
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(7), inp)
    return cfg, packed, inp, model, params


def test_loop_packed_forward_matches_flax():
    """Loop forward on a PACKED batch (segment-aware readout, one slot per
    program) == the XLA packed path: per-segment predictions + GA scores."""
    cfg, packed, inp, model, params = _packed_case(L=2)
    ref = jit_apply(model)(params, inp)
    pred, ga = loop_scann_forward(params, inp, cfg, interpret=True)
    assert pred.shape == (packed.num_slots, packed.num_segments)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(ref["property"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ref["ga_score"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # interpret-mode backward, ~15 s
def test_loop_packed_train_grads_match_xla():
    """One-shot loop training on a PACKED batch: in-kernel masked residual +
    XLA 1/(n*rmse) scale == jax.grad of the masked-RMSE XLA loss."""
    import jax.flatten_util
    from scann_tpu.kernels.scann_loop import loop_scann_train_grads

    cfg, packed, inp, model, params = _packed_case(L=2)
    params_inner = params["params"]
    y = jnp.asarray(packed.targets)
    smask = jnp.asarray(packed.inputs["segment_mask"])
    nvalid = smask.sum()

    def loss_xla(p):
        out = model.apply({"params": p}, inp, deterministic=True)
        err = (out["property"] - y) * smask
        return jnp.sqrt(jnp.sum(jnp.square(err)) / nvalid)

    g_ref = jax.jit(jax.grad(loss_xla))(params_inner)

    pred, raw = loop_scann_train_grads(params_inner, inp, y, cfg,
                                       interpret=True)
    err = (np.asarray(pred) - np.asarray(y)) * np.asarray(smask)
    rmse = np.sqrt((err ** 2).sum() / float(nvalid))
    scale = 1.0 / (float(nvalid) * rmse)
    g_loop = jax.tree.map(lambda r: r * scale, raw)

    f1, _ = jax.flatten_util.ravel_pytree(g_ref)
    f2, _ = jax.flatten_util.ravel_pytree(g_loop)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=5e-4, atol=1e-6)


@pytest.mark.slow  # interpret-mode backward
def test_loop_packed_dropout_gradient_matches_finite_difference():
    """use_drop + training dropout on a PACKED batch through the loop
    kernels: fixed-seed fused loss must match central finite differences
    (same interpreter-PRNG scope caveat as the unpacked FD test above)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    cfg, packed, inp, model, params = _packed_case(L=2)
    cfg = dataclasses.replace(cfg, use_drop=True)
    params = params["params"]
    y = jnp.asarray(packed.targets)
    smask = jnp.asarray(packed.inputs["segment_mask"])
    nvalid = smask.sum()

    from scann_tpu.kernels.scann_loop import loop_scann_train_grads

    def loss_terms(p):
        pred, raw = loop_scann_train_grads(p, inp, y, cfg, False, False,
                                           0.1, 42)
        err = (pred - y) * smask
        rmse = jnp.sqrt(jnp.sum(jnp.square(err)) / nvalid)
        return rmse, raw

    with pltpu.force_tpu_interpret_mode():
        rmse0, raw = loss_terms(params)
        scale = 1.0 / (nvalid * rmse0)
        g = jax.tree.map(lambda r: r * scale, raw)

        flat_p, tree = jax.tree_util.tree_flatten(params)
        flat_g = jax.tree_util.tree_leaves(g)
        rng = np.random.default_rng(5)
        dirs = [np.asarray(rng.normal(size=np.shape(x)), np.float32)
                for x in flat_p]
        gn = float(np.sqrt(sum(np.sum(d * d) for d in dirs)))
        dirs = [d / gn for d in dirs]
        eps = 1e-2
        plus = jax.tree_util.tree_unflatten(
            tree, [x + eps * d for x, d in zip(flat_p, dirs)])
        minus = jax.tree_util.tree_unflatten(
            tree, [x - eps * d for x, d in zip(flat_p, dirs)])
        fd = (float(loss_terms(plus)[0]) - float(loss_terms(minus)[0])) / (2 * eps)
    analytic = float(sum(np.sum(np.asarray(gg) * d)
                         for gg, d in zip(flat_g, dirs)))
    assert fd == pytest.approx(analytic, rel=2e-2, abs=1e-4)


def test_stash_acts_grads_match_full_recompute(rng, monkeypatch):
    """The selective-activation-stash reverse walk (round 4) must produce
    the gradients of the classic full-recompute schedule — same math,
    different memoization. Pinned by running the same case with the
    kill-switch on and off. Tolerance is ulp-level, not exact: interpret
    mode jits two different graphs, and XLA's fusion/FMA choices differ
    between them (measured drift ~3e-7 relative — f32 ulp)."""
    from scann_tpu.kernels.scann_loop import fits_loop_stash

    cfg, inputs, model, params = _case(rng, g_update=True, ga_norm=True,
                                       B=2, M=16, N=6, L=2)
    assert fits_loop_stash(cfg, 16, 6)  # small case must take the new path
    ct_pred = jnp.asarray(np.linspace(-1, 1, 2, dtype=np.float32))[:, None]
    ct_ga = jnp.zeros((2, 16, 1), jnp.float32)

    monkeypatch.setenv("SCANN_TPU_LOOP_STASH", "1")
    g_stash = loop_scann_grad(params, inputs, cfg, ct_pred, ct_ga,
                              interpret=True)
    monkeypatch.setenv("SCANN_TPU_LOOP_STASH", "0")
    g_full = loop_scann_grad(params, inputs, cfg, ct_pred, ct_ga,
                             interpret=True)
    flat_s = jax.tree_util.tree_flatten_with_path(g_stash)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_full)[0]
    assert len(flat_s) == len(flat_f)
    for (p1, v1), (p2, v2) in zip(flat_s, flat_f):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        scale = np.abs(np.asarray(v2)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=0, atol=1e-5 * scale,
            err_msg=f"stash-vs-recompute drift at {jax.tree_util.keystr(p1)}")


def test_fits_loop_stash_boundaries():
    """The stash gate must admit the flagship crystal shape (where the win
    was measured) and refuse shapes whose extra scratch would overflow
    VMEM (deep ring crystals), which fall back to full recompute."""
    from scann_tpu.kernels.scann_loop import fits_loop_stash

    mp = ModelConfig(n_atoms=95, embedding_dim=128, n_attention=9,
                     local_dim=128, num_head=8, global_dim=128,
                     dense_out=128, g_update=True, use_ga_norm=True)
    assert fits_loop_stash(mp, 96, 32)          # the measured +15.7% case
    ptgp_like = ModelConfig(n_atoms=95, embedding_dim=128, n_attention=11,
                            local_dim=128, num_head=8, global_dim=128,
                            dense_out=128, g_update=True, use_ring=True)
    assert not fits_loop_stash(ptgp_like, 128, 32)  # overflows -> fallback
    # the gate is monotone in M at fixed config
    assert fits_loop_stash(mp, 64, 32)


def test_loop_stash_mode_selection(monkeypatch):
    """loop_stash_mode: "f32" where the full stash fits; "bf16" ONLY as the
    opt-in fallback where f32 overflows but the halved stash fits (e.g.
    ptgp-like 11L ring crystals at M=128); None otherwise / when killed."""
    from scann_tpu.kernels.scann_loop import loop_stash_mode

    mp = ModelConfig(n_atoms=95, embedding_dim=128, n_attention=9,
                     local_dim=128, num_head=8, global_dim=128,
                     dense_out=128, g_update=True, use_ga_norm=True)
    ptgp_like = ModelConfig(n_atoms=95, embedding_dim=128, n_attention=11,
                            local_dim=128, num_head=8, global_dim=128,
                            dense_out=128, g_update=True, use_ring=True)
    monkeypatch.delenv("SCANN_TPU_LOOP_STASH_BF16", raising=False)
    monkeypatch.delenv("SCANN_TPU_LOOP_STASH", raising=False)
    assert loop_stash_mode(mp, 96, 32) == "f32"
    assert loop_stash_mode(ptgp_like, 128, 32) is None  # exact by default
    monkeypatch.setenv("SCANN_TPU_LOOP_STASH_BF16", "1")
    assert loop_stash_mode(mp, 96, 32) == "f32"  # f32 still preferred
    assert loop_stash_mode(ptgp_like, 128, 32) == "bf16"
    monkeypatch.setenv("SCANN_TPU_LOOP_STASH", "0")
    assert loop_stash_mode(ptgp_like, 128, 32) is None
    assert loop_stash_mode(mp, 96, 32) is None


def test_loop_bf16_stash_grads_close_to_recompute(rng, monkeypatch):
    """The bf16 loop stash rebuilds gradients from rounded ns/u_pre/key:
    they must track the exact full-recompute gradients within bf16
    tolerance. The mode is forced via monkeypatching loop_stash_mode (a
    small test shape always fits the f32 stash, so the real selector
    would never pick bf16 here)."""
    from scann_tpu.kernels import scann_loop

    cfg, inputs, model, params = _case(rng, g_update=True, ga_norm=True,
                                       B=2, M=16, N=6, L=2)
    ct_pred = jnp.asarray(np.linspace(-1, 1, 2, dtype=np.float32))[:, None]
    ct_ga = jnp.zeros((2, 16, 1), jnp.float32)

    monkeypatch.setenv("SCANN_TPU_LOOP_STASH", "0")
    g_full = loop_scann_grad(params, inputs, cfg, ct_pred, ct_ga,
                             interpret=True)
    monkeypatch.delenv("SCANN_TPU_LOOP_STASH", raising=False)
    monkeypatch.setattr(scann_loop, "loop_stash_mode",
                        lambda *a, **k: "bf16")
    g_bf16 = loop_scann_grad(params, inputs, cfg, ct_pred, ct_ga,
                             interpret=True)
    flat_a = jax.tree_util.tree_flatten_with_path(g_full)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(g_bf16)[0]
    assert len(flat_a) == len(flat_b)
    for (p1, v1), (p2, v2) in zip(flat_a, flat_b):
        scale = np.abs(np.asarray(v1)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(v1), rtol=0, atol=2e-2 * scale,
            err_msg=f"bf16 loop-stash drift at {jax.tree_util.keystr(p1)}")
