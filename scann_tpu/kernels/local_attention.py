"""Fused Pallas TPU kernel for one LocalAttention layer.

Fuses the full layer body (reference ``attention.py:118-216``) into a single
kernel per batch row:

    neighbor gather -> SCANN+/SCANN geometry filtering -> K/Q projections ->
    per-head masked softmax over neighbors -> masked context sum ->
    +Q residual -> LayerNorm   (and the updated geometry for SCANN+)

TPU-native choices:

- the neighbor gather is computed as a **one-hot matmul on the MXU**:
  ``onehot(idx) @ centers`` with the one-hot built from an iota comparison in
  VMEM — no gather instruction, no [B, M, N, D] HBM intermediate;
- the whole layer's intermediates live in VMEM (for QM9 shapes the largest is
  [M*N, 3 blocks of D] ~ a few hundred KB);
- the per-head attention energies are computed as a lane-segmented reduction
  of the Q*K product (head dim = D/H lanes per head), keeping D=128 on the
  lane axis throughout;
- one kernel launch replaces the ~15 XLA ops of the unfused layer — the
  SCANN model is launch-latency-bound (tiny tensors), so fusion wins more
  than FLOPs here.

The public wrapper ``fused_local_attention`` is differentiable: forward runs
the Pallas kernel, backward re-derives the layer with the pure-jnp reference
ops (rematerialized under ``jax.vjp``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scann_tpu.ops.activations import swish
from scann_tpu.ops.attention import gather_neighbor_states, local_attention_core


def _layer_norm(x, gamma, beta, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def _kernel(
    # inputs (blocked per batch row)
    centers_ref,      # [1, M, D]
    idx_ref,          # [1, M, N] int32
    geometry_ref,     # [1, M, N, G]  (G = D for g_update, n_rbf otherwise)
    mask_ref,         # [1, M, N]
    weight_ref,       # [1, M, N] (only read when not g_update)
    # params (replicated across grid)
    w_fg_ref, b_fg_ref,       # [G_in, D], [D]
    w_k_ref, b_k_ref,         # [D, D], [D]
    w_q_ref, b_q_ref,         # [D, D], [D]
    ln_g_ref, ln_b_ref,       # [D], [D]      (context LayerNorm)
    lng_g_ref, lng_b_ref,     # [D], [D]      (geometry LayerNorm, g_update)
    # outputs
    out_ref,          # [1, M, D]
    geo_out_ref,      # [1, M, N, G_out]
    attn_out_ref,     # [1, M, N, H]  (post-softmax attention, pre-mask ctx)
    *,
    num_head: int,
    scale: float,
    g_update: bool,
    acc_dtype,
):
    M, D = centers_ref.shape[1], centers_ref.shape[2]
    N = idx_ref.shape[2]
    H = num_head
    hd = D // H

    def dot3(x, w):  # [M, N, X] @ [X, F] on the MXU
        return jax.lax.dot_general(
            x, w, (((2,), (0,)), ((), ())), preferred_element_type=acc_dtype)

    centers = centers_ref[0]                    # [M, D]
    idx = idx_ref[0]                            # [M, N] int32
    mask = mask_ref[0]                          # [M, N]

    # --- neighbor gather as one-hot matmul (MXU) -----------------------------
    # Mosaic-friendly rank-3 layout throughout: no lane-splitting reshapes.
    cols = jax.lax.broadcasted_iota(jnp.int32, (M, N, M), dimension=2)
    onehot = (cols == idx[:, :, None]).astype(centers.dtype)
    ns = dot3(onehot, centers)                                   # [M, N, D]

    # --- geometry path -------------------------------------------------------
    if g_update:
        geometry = geometry_ref[0]                               # [M, N, D]
        # split filter_geo: concat([c, g, n]) @ W == c@Wc + g@Wg + n@Wn
        cw = jnp.dot(centers, w_fg_ref[0:D, :],
                     preferred_element_type=acc_dtype)           # [M, D]
        u = (
            jnp.broadcast_to(cw.reshape(M, 1, D), (M, N, D))
            + dot3(geometry, w_fg_ref[D:2 * D, :])
            + dot3(ns, w_fg_ref[2 * D:3 * D, :])
            + b_fg_ref[:]
        )
        geometry = _layer_norm(swish(u) + geometry, lng_g_ref[:], lng_b_ref[:])
        geo_out_ref[0] = geometry.astype(geo_out_ref.dtype)
    else:
        u = swish(dot3(geometry_ref[0], w_fg_ref[:]) + b_fg_ref[:])
        geometry = u * weight_ref[0][:, :, None]
        geo_out_ref[0] = geometry_ref[0].astype(geo_out_ref.dtype)  # passthrough

    # --- projections ---------------------------------------------------------
    key = dot3(ns * geometry, w_k_ref[:]) + b_k_ref[:]           # [M, N, D]
    query = jnp.dot(centers, w_q_ref[:],
                    preferred_element_type=acc_dtype) + b_q_ref[:]   # [M, D]

    # --- per-head masked softmax over neighbors ------------------------------
    # head-segment reductions as matmuls with 0/1 block maps (no lane splits):
    #   seg_sum [D, H]: lane d -> head d // hd ;  seg_expand = seg_sum^T
    lane = jax.lax.broadcasted_iota(jnp.int32, (D, H), dimension=0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D, H), dimension=1)
    seg_sum = (lane // hd == head).astype(acc_dtype)             # [D, H]

    dk = jnp.asarray(hd, acc_dtype) ** jnp.asarray(-scale, acc_dtype)
    q_scaled = query * dk
    prod = jnp.broadcast_to(q_scaled.reshape(M, 1, D), (M, N, D)) * key
    energy = dot3(prod, seg_sum)                                 # [M, N, H]
    energy = energy + (1.0 - mask)[:, :, None] * jnp.asarray(-1e9, acc_dtype)
    energy = energy - jnp.max(energy, axis=1, keepdims=True)
    e = jnp.exp(energy)
    attn = e / jnp.sum(e, axis=1, keepdims=True)                 # [M, N, H]
    attn_out_ref[0] = attn.astype(attn_out_ref.dtype)

    # --- masked context sum + residual + LayerNorm ---------------------------
    a_lanes = dot3(attn, jnp.transpose(seg_sum))                 # [M, N, D]
    ctx = jnp.sum(a_lanes * mask[:, :, None] * key, axis=1)      # [M, D]
    out = _layer_norm(ctx + query, ln_g_ref[:], ln_b_ref[:])
    out_ref[0] = out.astype(out_ref.dtype)


def _pallas_forward(centers, neighbor_idx, geometry, neighbor_mask,
                    neighbor_weight, params, num_head, scale, g_update,
                    interpret=False):
    B, M, D = centers.shape
    N = neighbor_idx.shape[2]
    dtype = centers.dtype
    acc = jnp.float32

    if neighbor_weight is None:
        neighbor_weight = jnp.zeros_like(neighbor_mask)
    if g_update:
        lng_g = params["layer_norm_g"]["scale"]
        lng_b = params["layer_norm_g"]["bias"]
        geo_out_feat = D
    else:
        lng_g = jnp.zeros((D,), dtype)
        lng_b = jnp.zeros((D,), dtype)
        geo_out_feat = geometry.shape[-1]

    grid = (B,)
    row = lambda b: (b, 0, 0)
    row4 = lambda b: (b, 0, 0, 0)
    rep2 = lambda b: (0, 0)
    rep1 = lambda b: (0,)

    out, geo_out, attn = pl.pallas_call(
        functools.partial(_kernel, num_head=num_head, scale=scale,
                          g_update=g_update, acc_dtype=acc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, M, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, N, geometry.shape[-1]), row4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec(params["filter_geo"]["kernel"].shape, rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), rep1, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, M, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, N, geo_out_feat), row4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, N, num_head), row4, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, D), dtype),
            jax.ShapeDtypeStruct((B, M, N, geo_out_feat), dtype),
            jax.ShapeDtypeStruct((B, M, N, num_head), dtype),
        ],
        interpret=interpret,
    )(
        centers, neighbor_idx, geometry, neighbor_mask, neighbor_weight,
        params["filter_geo"]["kernel"], params["filter_geo"]["bias"],
        params["key"]["kernel"], params["key"]["bias"],
        params["query"]["kernel"], params["query"]["bias"],
        params["layer_norm"]["scale"], params["layer_norm"]["bias"],
        lng_g, lng_b,
    )
    return out, geo_out, attn


def reference_local_attention(centers, neighbor_idx, geometry, neighbor_mask,
                              neighbor_weight, params, num_head, scale,
                              g_update, dropout_rate=0.0, dropout_rng=None):
    """Pure-jnp layer (the kernel's contract, XLA-compiled): used as the CPU
    fallback, the dropout-enabled training path, and the backward pass.

    Returns (out [B,M,D], geometry_out, attn [B,M,N,H]); geometry_out is the
    unchanged input for non-g_update.
    """
    B, M, D = centers.shape
    ns = gather_neighbor_states(centers, neighbor_idx)

    w = params["filter_geo"]["kernel"]
    b = params["filter_geo"]["bias"]
    if g_update:
        # split-matmul form of filter_geo(concat([c, g, n])) — the center
        # term is computed once per atom and broadcast over neighbors
        u = (
            (centers @ w[0:D])[:, :, None, :]
            + geometry @ w[D:2 * D]
            + ns @ w[2 * D:3 * D]
            + b
        )
        u = swish(u)
        geometry = _layer_norm(u + geometry,
                               params["layer_norm_g"]["scale"],
                               params["layer_norm_g"]["bias"])
        geo_out = geometry
    else:
        geometry = swish(geometry @ w + b) * neighbor_weight[..., None]
        geo_out = None

    key = (ns * geometry) @ params["key"]["kernel"] + params["key"]["bias"]
    query = centers @ params["query"]["kernel"] + params["query"]["bias"]

    attn, ctx = local_attention_core(query, key, key, neighbor_mask,
                                     num_head=num_head, scale=scale,
                                     dropout_rate=dropout_rate,
                                     dropout_rng=dropout_rng)
    out = _layer_norm(ctx + query, params["layer_norm"]["scale"],
                      params["layer_norm"]["bias"])
    # match kernel outputs: attn as [B, M, N, H]
    attn = jnp.transpose(attn, (0, 2, 3, 1))
    return out, geo_out, attn


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_local_attention(centers, neighbor_idx, geometry, neighbor_mask,
                          neighbor_weight, params, num_head, scale, g_update):
    """One fused LocalAttention layer.

    Returns (context [B,M,D], geometry_out [B,M,N,*], attn [B,M,N,H]).
    For non-g_update, geometry_out is the unchanged input geometry.
    """
    out, geo_out, attn = _pallas_forward(
        centers, neighbor_idx, geometry, neighbor_mask, neighbor_weight,
        params, num_head, scale, g_update)
    return out, geo_out, attn


def _fla_fwd(centers, neighbor_idx, geometry, neighbor_mask, neighbor_weight,
             params, num_head, scale, g_update):
    outs = fused_local_attention(centers, neighbor_idx, geometry, neighbor_mask,
                                 neighbor_weight, params, num_head, scale,
                                 g_update)
    return outs, (centers, neighbor_idx, geometry, neighbor_mask,
                  neighbor_weight, params)


def _fla_bwd(num_head, scale, g_update, res, cts):
    centers, neighbor_idx, geometry, neighbor_mask, neighbor_weight, params = res
    ct_out, ct_geo, ct_attn = cts

    def f(centers, geometry, neighbor_weight, params):
        out, geo_out, attn = reference_local_attention(
            centers, neighbor_idx, geometry, neighbor_mask, neighbor_weight,
            params, num_head, scale, g_update)
        if geo_out is None:
            geo_out = geometry  # passthrough — carries ct_geo to the input
        return out, geo_out, attn

    _, vjp = jax.vjp(f, centers, geometry,
                     neighbor_weight if neighbor_weight is not None
                     else jnp.zeros_like(neighbor_mask),
                     params)
    d_centers, d_geometry, d_weight, d_params = vjp((ct_out, ct_geo, ct_attn))
    return (d_centers, None, d_geometry, None,
            None if neighbor_weight is None else d_weight, d_params)


fused_local_attention.defvjp(_fla_fwd, _fla_bwd)
