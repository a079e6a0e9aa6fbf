"""Unit tests for scann_tpu.ops against hand-computed numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scann_tpu.ops import (
    gather_neighbor_states,
    gaussian_expansion,
    global_attention_core,
    local_attention_core,
    mrelu,
)
from scann_tpu.ops.rbf import make_centers


class TestGaussianExpansion:
    def test_values(self):
        centers = make_centers(4.0, 20)
        x = jnp.asarray([[0.0, 1.0, 4.0]])
        out = gaussian_expansion(x, jnp.asarray(centers))
        # oracle: exp(-(x-c)^2 / 0.25)
        expect = np.exp(-((np.asarray(x)[..., None] - centers) ** 2) / 0.25)
        np.testing.assert_allclose(out, expect, rtol=1e-5)

    def test_peak_at_center(self):
        centers = jnp.asarray(make_centers(4.0, 20))
        out = gaussian_expansion(jnp.asarray([centers[7]]), centers)
        assert out[0, 7] == pytest.approx(1.0)
        assert np.all(out[0, :7] < 1.0) and np.all(out[0, 8:] < 1.0)


class TestMrelu:
    def test_forward(self):
        x = jnp.asarray([-2.0, -0.5, 0.0, 3.0])
        np.testing.assert_allclose(mrelu(x), [0.0, 0.0, 0.0, 3.0])

    def test_straight_through_gradient(self):
        g = jax.grad(lambda x: jnp.sum(mrelu(x)))(jnp.asarray([-2.0, 0.0, 3.0]))
        np.testing.assert_allclose(g, [1.0, 1.0, 1.0])


class TestGather:
    def test_matches_loop(self, rng):
        B, M, N, D = 3, 5, 4, 8
        states = rng.normal(size=(B, M, D)).astype(np.float32)
        idx = rng.integers(0, M, size=(B, M, N)).astype(np.int32)
        out = gather_neighbor_states(jnp.asarray(states), jnp.asarray(idx))
        for b in range(B):
            for m in range(M):
                for n in range(N):
                    np.testing.assert_array_equal(out[b, m, n], states[b, idx[b, m, n]])


class TestLocalAttentionCore:
    def test_against_numpy_oracle(self, rng):
        B, M, N, D, H = 2, 6, 4, 16, 4
        q = rng.normal(size=(B, M, D)).astype(np.float32)
        k = rng.normal(size=(B, M, N, D)).astype(np.float32)
        mask = (rng.uniform(size=(B, M, N)) > 0.3).astype(np.float32)
        mask[:, :, 0] = 1.0  # at least one valid neighbor per center

        attn, ctx = local_attention_core(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(k), jnp.asarray(mask),
            num_head=H, scale=0.5,
        )

        hd = D // H
        qh = q.reshape(B, M, H, hd) * hd ** -0.5
        kh = k.reshape(B, M, N, H, hd)
        energy = np.einsum("bmhd,bmnhd->bhmn", qh, kh)
        energy += (1.0 - mask[:, None]) * -1e9
        e = np.exp(energy - energy.max(-1, keepdims=True))
        a = e / e.sum(-1, keepdims=True)
        ctx_o = np.einsum("bhmn,bmn,bmnhd->bmhd", a, mask, kh).reshape(B, M, D)

        np.testing.assert_allclose(attn, a, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ctx, ctx_o, rtol=1e-4, atol=1e-5)

    def test_masked_neighbors_get_zero_attention(self, rng):
        B, M, N, D = 1, 3, 5, 8
        q = rng.normal(size=(B, M, D)).astype(np.float32)
        k = rng.normal(size=(B, M, N, D)).astype(np.float32)
        mask = np.ones((B, M, N), np.float32)
        mask[0, 1, 3:] = 0.0
        attn, _ = local_attention_core(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(k), jnp.asarray(mask), num_head=2
        )
        assert np.all(np.asarray(attn)[0, :, 1, 3:] < 1e-8)
        np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, rtol=1e-5)


class TestGlobalAttentionCore:
    def test_linear_path_matches_materialized_energy(self, rng):
        B, M, D = 3, 7, 16
        q = rng.normal(size=(B, M, D)).astype(np.float32)
        k = rng.normal(size=(B, M, D)).astype(np.float32)
        mask = (rng.uniform(size=(B, M, 1)) > 0.2).astype(np.float32)
        mask[:, 0] = 1.0
        for norm in (True, False):
            a1, c1 = global_attention_core(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(k), jnp.asarray(mask),
                norm=norm, materialize_energy=True,
            )
            a2, c2 = global_attention_core(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(k), jnp.asarray(mask),
                norm=norm, materialize_energy=False,
            )
            np.testing.assert_allclose(a1, a2, rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(c1, c2, rtol=1e-4, atol=1e-5)

    def test_masked_atoms_zero_score(self, rng):
        B, M, D = 1, 5, 8
        q = rng.normal(size=(B, M, D)).astype(np.float32)
        k = rng.normal(size=(B, M, D)).astype(np.float32)
        mask = np.ones((B, M, 1), np.float32)
        mask[0, 3:] = 0.0
        attn, ctx = global_attention_core(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(k), jnp.asarray(mask), norm=True
        )
        assert np.all(np.asarray(attn)[0, 3:] < 1e-8)
        np.testing.assert_allclose(np.asarray(attn)[0, :3].sum(), 1.0, rtol=1e-5)

    def test_single_atom_gradients_finite_with_norm(self, rng):
        """A single-atom structure makes the diagonal-excluded GA score
        exactly zero, so the use_ga_norm L2 norm is 0. The zero-norm guard
        must protect the BACKWARD too: where() outside the sqrt leaves
        sqrt's VJP to produce 0/0 = NaN, which would poison the shared
        gradients of every batch containing one single-atom cell (e.g. an
        elemental crystal)."""
        B, M, D = 2, 4, 8
        q = rng.normal(size=(B, M, D)).astype(np.float32)
        k = rng.normal(size=(B, M, D)).astype(np.float32)
        mask = np.ones((B, M, 1), np.float32)
        mask[1, 1:] = 0.0  # structure 1 has exactly one real atom

        def loss(qk):
            qq, kk = qk
            _, ctx = global_attention_core(qq, kk, kk, jnp.asarray(mask),
                                           norm=True)
            return jnp.sum(ctx ** 2)

        grads = jax.grad(loss)((jnp.asarray(q), jnp.asarray(k)))
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g))), "NaN/inf gradient"

    def test_diagonal_excluded(self):
        # With a single valid atom, its own (diagonal) energy must not count:
        # agg score is 0 before masking -> softmax puts all weight on it anyway,
        # but context must equal its key.
        B, M, D = 1, 3, 4
        q = np.ones((B, M, D), np.float32)
        k = np.ones((B, M, D), np.float32) * 2.0
        mask = np.zeros((B, M, 1), np.float32)
        mask[0, 0] = 1.0
        attn, ctx = global_attention_core(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(k), jnp.asarray(mask), norm=False
        )
        np.testing.assert_allclose(np.asarray(attn)[0, 0, 0], 1.0, rtol=1e-5)
        np.testing.assert_allclose(ctx[0], k[0, 0], rtol=1e-5)


def test_gather_strategies_agree(rng):
    """one-hot-matmul gather == dynamic gather, values and gradients (the
    one-hot path is the TPU default at crystal sizes)."""
    import jax
    import jax.numpy as jnp

    from scann_tpu.ops.attention import gather_neighbor_states

    B, M, N, D = 3, 10, 5, 8
    states = jnp.asarray(rng.normal(size=(B, M, D)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, M, size=(B, M, N)), jnp.int32)

    take = gather_neighbor_states(states, idx, strategy="take")
    onehot = gather_neighbor_states(states, idx, strategy="onehot")
    np.testing.assert_allclose(np.asarray(onehot), np.asarray(take),
                               rtol=1e-6, atol=1e-6)

    def loss(strategy):
        return lambda s: jnp.sum(
            jnp.sin(gather_neighbor_states(s, idx, strategy=strategy)))

    g_take = jax.grad(loss("take"))(states)
    g_oh = jax.grad(loss("onehot"))(states)
    np.testing.assert_allclose(np.asarray(g_oh), np.asarray(g_take),
                               rtol=1e-5, atol=1e-6)
