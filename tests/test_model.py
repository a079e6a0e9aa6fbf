"""Model-level tests: shapes, masking invariance, both variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scann_tpu.config import ModelConfig
from scann_tpu.models import ScannModel
from scann_tpu.models.scann import l2_penalty

from conftest import make_synthetic_batch, jit_apply, jit_init_vars


def init_and_apply(cfg: ModelConfig, inputs, **kw):
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    out = model.apply(params, inputs, deterministic=True, **kw)
    return model, params, out


@pytest.mark.parametrize("g_update", [True, False])
def test_forward_shapes(rng, g_update):
    cfg = ModelConfig(n_attention=2, local_dim=32, num_head=4, global_dim=32,
                      dense_out=16, embedding_dim=8, g_update=g_update)
    inputs = make_synthetic_batch(rng, B=3, M=10, N=5)
    _, _, out = init_and_apply(cfg, inputs, return_local_attn=True)
    assert out["property"].shape == (3, 1)
    assert out["ga_score"].shape == (3, 10, 1)
    assert len(out["local_attn"]) == 2
    assert out["local_attn"][0].shape == (3, 4, 10, 5)
    assert np.all(np.isfinite(out["property"]))


def test_use_ring_and_cgcnn(rng):
    cfg = ModelConfig(n_attention=1, local_dim=16, num_head=2, global_dim=16,
                      dense_out=8, embedding_dim=8, use_ring=True, feature="cgcnn",
                      g_update=False)
    inputs = make_synthetic_batch(rng, B=2, M=6, N=3, use_ring=True, cgcnn=True)
    _, _, out = init_and_apply(cfg, inputs)
    assert out["property"].shape == (2, 1)


def test_padding_invariance(rng):
    """Adding extra padded atoms/neighbors must not change predictions.

    This validates the full masking path end to end (the key correctness
    property of the bucketed static-padding design).
    """
    cfg = ModelConfig(n_attention=2, local_dim=32, num_head=4, global_dim=32,
                      dense_out=16, embedding_dim=8, g_update=True)
    inputs = make_synthetic_batch(rng, B=2, M=8, N=4, seed=42)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    out1 = jit_apply(model)(params, inputs)

    padded = {
        "atomic": np.pad(inputs["atomic"], ((0, 0), (0, 5))),
        "atom_mask": np.pad(inputs["atom_mask"], ((0, 0), (0, 5), (0, 0))),
        "neighbors": np.pad(inputs["neighbors"], ((0, 0), (0, 5), (0, 3))),
        "neighbor_mask": np.pad(inputs["neighbor_mask"], ((0, 0), (0, 5), (0, 3))),
        "neighbor_weight": np.pad(inputs["neighbor_weight"], ((0, 0), (0, 5), (0, 3))),
        "neighbor_distance": np.pad(inputs["neighbor_distance"], ((0, 0), (0, 5), (0, 3))),
    }
    out2 = jit_apply(model)(params, padded)
    np.testing.assert_allclose(out1["property"], out2["property"], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out1["ga_score"]),
        np.asarray(out2["ga_score"])[:, :8], rtol=2e-4, atol=1e-5,
    )


def test_ga_scores_sum_to_one(rng):
    cfg = ModelConfig(n_attention=1, local_dim=16, num_head=2, global_dim=16,
                      dense_out=8, embedding_dim=8, g_update=True)
    inputs = make_synthetic_batch(rng, B=3, M=10, N=5)
    _, _, out = init_and_apply(cfg, inputs)
    sums = np.asarray(out["ga_score"]).sum(axis=1)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)
    # padded atoms get ~0 score
    pad = np.asarray(out["ga_score"]) * (1 - inputs["atom_mask"])
    assert np.all(np.abs(pad) < 1e-7)


def test_mrelu_head():
    cfg = ModelConfig(n_attention=1, local_dim=16, num_head=2, global_dim=16,
                      dense_out=8, embedding_dim=8, g_update=True)
    rng = np.random.default_rng(3)
    inputs = make_synthetic_batch(rng, B=4, M=6, N=3)
    model = ScannModel(config=cfg, mrelu_head=True)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    out = jit_apply(model)(params, inputs)
    assert np.all(np.asarray(out["property"]) >= 0.0)


def test_l2_penalty_selects_expected_kernels(rng):
    cfg = ModelConfig(n_attention=2, local_dim=16, num_head=2, global_dim=16,
                      dense_out=8, embedding_dim=8, g_update=True)
    inputs = make_synthetic_batch(rng, B=2, M=6, N=3)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)

    # oracle: walk the pytree by name
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    expect = 0.0
    n_hit = 0
    for path, leaf in flat:
        keys = [getattr(p, "key", "") for p in path]
        if keys[-1] != "kernel":
            continue
        layer = keys[-2]
        if layer in ("query", "key", "value", "filter_geo", "dense_1", "dense_2",
                     "after_Lc", "bf_property"):
            expect += float(np.sum(np.square(np.asarray(leaf))))
            n_hit += 1
    # 2 LA layers x (q, k, filter_geo) + 2 residual x 2 + GA x (q, k) + after_Lc
    # + bf_property = 6 + 4 + 2 + 2 = 14
    assert n_hit == 14
    got = float(l2_penalty(params, coeff=1e-4))
    np.testing.assert_allclose(got, 1e-4 * expect, rtol=1e-6)


def test_dropout_changes_train_output_but_not_eval(rng):
    cfg = ModelConfig(n_attention=1, local_dim=16, num_head=2, global_dim=16,
                      dense_out=8, embedding_dim=8, g_update=True, use_drop=True)
    inputs = make_synthetic_batch(rng, B=2, M=6, N=3)
    model = ScannModel(config=cfg)
    params = jit_init_vars(model, jax.random.PRNGKey(0), inputs)
    e1 = jit_apply(model)(params, inputs)
    e2 = jit_apply(model)(params, inputs)
    np.testing.assert_array_equal(e1["property"], e2["property"])
    t1 = model.apply(params, inputs, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = model.apply(params, inputs, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(t1["property"], t2["property"])
