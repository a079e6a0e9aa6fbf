"""Shared MXU dot helpers for the fused Pallas kernels.

All six contraction shapes the SCANN kernels use, each with f32 accumulation
(``preferred_element_type``), plus the single ``dot_fns`` factory that
implements the opt-in bf16 MXU mode (``model.dtype == 'bfloat16'``): operands
of every dot are cast to bfloat16, accumulation stays f32. One-hot/RBF
operands are exact in bf16; only activations lose mantissa. LN/softmax stay
f32 elementwise in the kernels.

One factory for all three kernel families (unrolled forward/backward and the
crystal loop kernels) so the casting policy can never desync between them.
"""

import os

import jax
import jax.numpy as jnp

# EXPERIMENT (round 5, roofline-gap hunt): lower the rank-3 dot3s as flat
# [M*N, X] @ [X, C] 2-D matmuls (leading-dim reshape, free in Mosaic)
# instead of rank-3 dot_general — A/B'd via tools/step_breakdown.py.
_DOT3_FLAT = os.environ.get("SCANN_TPU_DOT3_FLAT", "0") == "1"


def mm(a, b):  # [R, X] @ [X, C]
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def mm_tA(a, b):  # a^T @ b : [R, X],[R, C] -> [X, C]
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def mm_tB(a, b):  # a @ b^T : [R, X],[C, X] -> [R, C]
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def dot3(x, w):  # [M, N, X] @ [X, C]
    if _DOT3_FLAT:
        M, N, X = x.shape
        return mm(x.reshape(M * N, X), w).reshape(M, N, w.shape[-1])
    return jax.lax.dot_general(x, w, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def dot3_tB(x, w):  # [M, N, X] @ w^T with w [C, X]
    if _DOT3_FLAT:
        M, N, X = x.shape
        return mm_tB(x.reshape(M * N, X), w).reshape(M, N, w.shape[0])
    return jax.lax.dot_general(x, w, (((2,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def mm3_tA(x, dy):  # sum_{m,n} x[m,n,:]^T dy[m,n,:] -> [X, C]
    M, N, X = x.shape
    return mm_tA(x.reshape(M * N, X), dy.reshape(M * N, dy.shape[-1]))


def mm_hi(a, b):
    """f32-exact [R, X] @ [X, C] (Precision.HIGHEST = multi-pass bf16).

    For the PRECISION-CRITICAL one-hot segment pools of the packed readout:
    the TPU's default f32 matmul is a single bf16 pass, which would round
    the pooled VALUES to bf16 — the unpacked path's equivalent reductions
    are exact VPU sums, and packed-vs-unpacked prediction parity is a
    contract (data/packing.py). These dots are tiny ([M, S] one-hots), so
    the 3-pass cost is noise."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def mm_tA_hi(a, b):
    """f32-exact a^T @ b (see mm_hi)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def dot_fns(bf16: bool):
    """(mm, mm_tA, mm_tB, dot3, dot3_tB, mm3_tA); bf16 casts every dot's
    operands to bfloat16 with f32 accumulation. The kernels shadow their
    local dot names with these, so every call site (including layer_fwd /
    gather closures) picks the mode up without renames."""
    if not bf16:
        return mm, mm_tA, mm_tB, dot3, dot3_tB, mm3_tA
    c = lambda x: x.astype(jnp.bfloat16)
    b_mm3_tA = lambda x, dy: mm_tA(
        c(x).reshape(-1, x.shape[-1]), c(dy).reshape(-1, dy.shape[-1]))
    return (lambda a, b: mm(c(a), c(b)),
            lambda a, b: mm_tA(c(a), c(b)),
            lambda a, b: mm_tB(c(a), c(b)),
            lambda x, w: dot3(c(x), c(w)),
            lambda x, w: dot3_tB(c(x), c(w)),
            b_mm3_tA)
