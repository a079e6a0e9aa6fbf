"""Whole-model fused Pallas backward: all parameter gradients in ONE kernel.

Pairs with ``scann_forward.fused_scann_forward``. Given the output cotangents
(d pred, d ga_score), one Pallas program per batch row recomputes the forward
(stashing only each layer's *inputs* — the center stream and, for SCANN+,
the geometry stream) and then walks the graph in reverse, producing the full
parameter-gradient pytree. Gradients accumulate across the sequential TPU
grid directly into the output refs (zeroed at program 0).

Notes:
- inputs (atom/neighbor tensors) need no gradients — only params do — which
  keeps the backward much leaner than a general VJP;
- ``mrelu`` is the reference's straight-through ReLU
  (``custom_layers.py:6-15``): its backward is the identity, so the head max
  simply disappears in reverse mode;
- matmul transposes are expressed as ``dot_general`` contractions (never
  explicit transposes of big operands);
- ``scann_apply`` wraps forward+backward into a ``jax.custom_vjp`` so
  ``jax.grad`` of any scalar loss of (pred, ga) flows through the kernels.

Supported configs: same subset as the fused forward (``supports_config``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scann_tpu.config import ModelConfig, attn_dropout_rate
from scann_tpu.kernels.dots import dot_fns, mm_hi, mm_tA_hi
from scann_tpu.kernels.scann_forward import (
    fused_scann_forward,
    stack_layer_params,
    supports_config,
)
from scann_tpu.ops.rbf import make_centers


# the six dot shapes + the bf16 operand-cast mode live in the shared
# kernels/dots.py factory (one casting policy across all kernel families)
_dot_fns = dot_fns


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _swish_grad(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _ln_fwd(x, gamma, beta, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * inv
    return xhat * gamma + beta, (xhat, inv)


def _ln_bwd(dy, xhat, inv, gamma):
    """Returns (dx, dgamma_rows, dbeta_rows); caller sums rows for dparams."""
    dgamma = dy * xhat
    dxhat = dy * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = inv * (dxhat - m1 - xhat * m2)
    return dx, dgamma, dy


def _kernel(
    # batched inputs
    atomic_ref, atom_mask_ref, idx_ref, nmask_ref, weight_ref, dist_ref,
    ring_ref, seg_ref, ct_pred_ref, ct_ga_ref, seed_ref,
    # params (same order as forward kernel)
    embed_ref, bembed_ref, wring_ref, bring_ref, wde_ref, bde_ref,
    wnd_ref, bnd_ref, wnw_ref, bnw_ref,
    wfg_ref, bfg_ref, wk_ref, bk_ref, wq_ref, bq_ref,
    ln_s_ref, ln_b_ref, lng_s_ref, lng_b_ref,
    wr1_ref, br1_ref, wr2_ref, br2_ref, rln_s_ref, rln_b_ref,
    wal_ref, bal_ref, wgq_ref, bgq_ref, wgk_ref, bgk_ref,
    wbf_ref, bbf_ref, wp_ref, bp_ref,
    dist_centers_ref, angle_centers_ref,
    # grad outputs (accumulated across the grid)
    d_embed, d_bembed, d_wring, d_bring, d_wde, d_bde,
    d_wnd, d_bnd, d_wnw, d_bnw,
    d_wfg, d_bfg, d_wk, d_bk, d_wq, d_bq,
    d_ln_s, d_ln_b, d_lng_s, d_lng_b,
    d_wr1, d_br1, d_wr2, d_br2, d_rln_s, d_rln_b,
    d_wal, d_bal, d_wgq, d_bgq, d_wgk, d_bgk,
    d_wbf, d_bbf, d_wp, d_bp, pred_out,
    *, n_layers: int, num_head: int, scale: float, g_update: bool,
    ga_norm: bool, rbf_width: float, dropout_rate: float = 0.0,
    attn_dropout: float = 0.0, use_ring: bool = False, cgcnn: bool = False,
    ct_from_target: bool = False, mrelu: bool = False, bf16: bool = False,
    n_segments: int = 0,
):
    # shadow: every dot below (incl. the layer_fwd/gather closures) follows
    # the bf16 mode
    _mm, _mm_tA, _mm_tB, _dot3, _dot3_tB, _mm3_tA = _dot_fns(bf16)
    b = pl.program_id(0)
    grads = [d_embed, d_bembed, d_wring, d_bring, d_wde, d_bde,
             d_wnd, d_bnd, d_wnw, d_bnw,
             d_wfg, d_bfg, d_wk, d_bk, d_wq, d_bq,
             d_ln_s, d_ln_b, d_lng_s, d_lng_b,
             d_wr1, d_br1, d_wr2, d_br2, d_rln_s, d_rln_b,
             d_wal, d_bal, d_wgq, d_bgq, d_wgk, d_bgk,
             d_wbf, d_bbf, d_wp, d_bp]

    @pl.when(b == 0)
    def _zero():
        for g in grads:
            g[...] = jnp.zeros_like(g)

    BT = atomic_ref.shape[0]        # molecules per program (batch tile)
    M = atomic_ref.shape[1]
    N = idx_ref.shape[2]
    R = BT * M                      # total atom rows
    vocab = embed_ref.shape[0]
    D = wk_ref.shape[2]
    H = num_head
    hd = D // H
    L = n_layers

    # row-stacked layout, as the forward kernel: molecules concatenated along
    # the row axis; only the neighbor gather and the GA readout see BT.
    am3 = atom_mask_ref[...]        # [BT, M, 1]
    nmask = nmask_ref[...].reshape(R, N)
    weight_rows = weight_ref[...].reshape(R, N)

    if cgcnn:
        feat_rows = atomic_ref[...].reshape(R, vocab)          # 92-dim f32
    else:
        atomic = atomic_ref[...].reshape(R, 1)
        zcols = jax.lax.broadcasted_iota(jnp.int32, (R, vocab), dimension=1)
        feat_rows = (zcols == atomic).astype(jnp.float32)      # one-hot
    ncols = jax.lax.broadcasted_iota(jnp.int32, (BT, M, N, M), dimension=3)
    n_oh4 = (ncols == idx_ref[...][:, :, :, None]).astype(jnp.float32)

    def gather(c_rows):
        """ns[t*M+m, n] = centers of molecule t at idx[t, m, n] -> [R, N, D]."""
        c4 = c_rows.reshape(BT, M, D)
        parts = [_dot3(n_oh4[t], c4[t]) for t in range(BT)]
        return jnp.concatenate(parts, axis=0) if BT > 1 else parts[0]

    def gather_t(dns):
        """Transpose of ``gather``: dc[t*M+j] = sum_{m,n} oh[t,m,n,j] dns."""
        d4 = dns.reshape(BT, M, N, D)
        parts = [_mm_tA(n_oh4[t].reshape(M * N, M), d4[t].reshape(M * N, D))
                 for t in range(BT)]
        return jnp.concatenate(parts, axis=0) if BT > 1 else parts[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (D, H), dimension=0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D, H), dimension=1)
    seg_sum = (lane // hd == head).astype(jnp.float32)
    seg_expand = jnp.transpose(seg_sum)
    dk_scale = jnp.asarray(hd, jnp.float32) ** jnp.asarray(-scale, jnp.float32)

    # dropout masks: per-molecule PRNG streams keyed to the global molecule
    # index — identical to the forward kernel's at ANY batch tiling
    if dropout_rate > 0.0 or attn_dropout > 0.0:
        from scann_tpu.kernels.scann_forward import make_dropout_masks

        embed_mask, layer_masks, attn_masks = make_dropout_masks(
            seed_ref[0, 0], b * BT, BT, M, D, L, dropout_rate,
            n=N, h=H, attn_rate=attn_dropout)

    # ---------------- forward (stash per-layer inputs) --------------------
    E = embed_ref.shape[1]
    emb = _mm(feat_rows, embed_ref[:])                         # [R, E]
    if cgcnn:
        emb = emb + bembed_ref[:]
    if use_ring:
        ring_rows = ring_ref[...].reshape(R, 2)
        ring_emb = _mm(ring_rows, wring_ref[:]) + bring_ref[:]
        s_de = (_mm(emb, wde_ref[0:E, :])
                + _mm(ring_emb, wde_ref[E:E + 10, :]) + bde_ref[:])
    else:
        s_de = _mm(emb, wde_ref[:]) + bde_ref[:]
    centers = _swish(s_de)                                     # [R, D]
    if dropout_rate > 0.0:
        centers = centers * embed_mask

    d3 = dist_ref[...].reshape(R, N)[:, :, None]
    rbf_d = jnp.exp(-jnp.square(d3 - dist_centers_ref[0]) / rbf_width)
    if g_update:
        w3 = weight_rows[:, :, None]
        rbf_w = jnp.exp(-jnp.square(w3 - angle_centers_ref[0]) / rbf_width)
        s_nd = _dot3(rbf_d, wnd_ref[:]) + bnd_ref[:]
        s_nw = _dot3(rbf_w, wnw_ref[:]) + bnw_ref[:]
        d_emb_v = _swish(s_nd)
        w_emb_v = _swish(s_nw)
        geometry = d_emb_v * w_emb_v

    c_stash = [None] * (L + 1)
    g_stash = [None] * (L + 1)
    c_stash[0] = centers
    if g_update:
        g_stash[0] = geometry

    def layer_fwd(l, c, g):
        """Forward one layer from its inputs; returns (c_out, g_out)."""
        ns = gather(c)
        if g_update:
            wfg = wfg_ref[l]
            cw = _mm(c, wfg[0:D, :])
            u_pre = (jnp.broadcast_to(cw.reshape(R, 1, D), (R, N, D))
                     + _dot3(g, wfg[D:2 * D, :]) + _dot3(ns, wfg[2 * D:3 * D, :])
                     + bfg_ref[l])
            r = _swish(u_pre) + g
            g_out, (g_xhat, g_inv) = _ln_fwd(r, lng_s_ref[l], lng_b_ref[l])
            geo_term = g_out
        else:
            u_pre = _dot3(rbf_d, wfg_ref[l]) + bfg_ref[l]
            geo_term = _swish(u_pre) * weight_rows[:, :, None]
            g_out, g_xhat, g_inv = g, None, None
        key = _dot3(ns * geo_term, wk_ref[l]) + bk_ref[l]
        query = _mm(c, wq_ref[l]) + bq_ref[l]
        prod = jnp.broadcast_to((query * dk_scale).reshape(R, 1, D), (R, N, D)) * key
        energy = _dot3(prod, seg_sum)
        energy = energy + (1.0 - nmask)[:, :, None] * (-1e9)
        energy = energy - jnp.max(energy, axis=1, keepdims=True)
        e = jnp.exp(energy)
        attn = e / jnp.sum(e, axis=1, keepdims=True)
        attn_used = attn * attn_masks[l] if attn_dropout > 0.0 else attn
        a_lanes = _dot3(attn_used, seg_expand)
        ctx = jnp.sum(a_lanes * nmask[:, :, None] * key, axis=1)
        o1, (o_xhat, o_inv) = _ln_fwd(ctx + query, ln_s_ref[l], ln_b_ref[l])
        s1 = _mm(o1, wr1_ref[l]) + br1_ref[l]
        h1 = _swish(s1)
        h2 = _mm(h1, wr2_ref[l]) + br2_ref[l]
        if dropout_rate > 0.0:
            h2 = h2 * layer_masks[l]
        c_out, (c_xhat, c_inv) = _ln_fwd(o1 + h2, rln_s_ref[l], rln_b_ref[l])
        acts = dict(ns=ns, u_pre=u_pre, geo_term=geo_term, g_xhat=g_xhat,
                    g_inv=g_inv, key=key, query=query, attn=attn,
                    attn_used=attn_used,
                    o1=o1, o_xhat=o_xhat, o_inv=o_inv, s1=s1, h1=h1,
                    c_xhat=c_xhat, c_inv=c_inv)
        return c_out, g_out, acts

    # Keep each layer's acts alive from the forward pass instead of
    # re-running layer_fwd in the reverse walk (round 4). In this
    # straight-line kernel both versions are one dataflow graph, so this
    # only changes VALUE LIFETIMES (VMEM pressure), not the math — but
    # Mosaic does NOT CSE the recompute on its own: measured on v5e at the
    # QM9 flagship shape, keep-acts trains at 34,411 structs/s vs 26,896
    # with the recompute schedule (+27.9%). Default ON; kill-switch
    # SCANN_TPU_UNROLL_STASH=0 restores the recompute schedule (also used
    # by the A/B parity test).
    import os as _os
    _keep_acts = _os.environ.get("SCANN_TPU_UNROLL_STASH", "1") != "0"
    # EXPERIMENT knob (benchmarks/packing_capacity_sweep.py): stash the five
    # big [R,N,D]-class activations in bf16, halving the keep-acts VMEM
    # extra so larger batch tiles fit at higher slot capacities. Changes
    # backward NUMERICS slightly (grads rebuilt from rounded activations) —
    # default OFF; the A/B parity test bounds the deviation.
    _stash_bf16 = _os.environ.get("SCANN_TPU_STASH_BF16", "0") == "1"
    _BF16_KEYS = ("ns", "u_pre", "geo_term", "g_xhat", "key")

    def _stash_cast(a, to):
        if not _stash_bf16:
            return a
        return {k: (v.astype(to) if k in _BF16_KEYS and v is not None else v)
                for k, v in a.items()}

    acts_stash = [None] * L
    for l in range(L):
        c_out, g_out, _a = layer_fwd(l, c_stash[l], g_stash[l])
        if _keep_acts:
            acts_stash[l] = _stash_cast(_a, jnp.bfloat16)
        c_stash[l + 1] = c_out
        g_stash[l + 1] = g_out

    cL = c_stash[L]
    s_al = _mm(cL, wal_ref[:]) + bal_ref[:]
    cg = _swish(s_al)                                          # [R, G]
    G = cg.shape[-1]
    gq = (_mm(cg, wgq_ref[:]) + bgq_ref[:]).reshape(BT, M, G)
    gk = (_mm(cg, wgk_ref[:]) + bgk_ref[:]).reshape(BT, M, G)
    mq = am3 * gq
    mk = am3 * gk
    # n_segments > 0 = STRUCTURE PACKING (see the forward kernel's readout
    # note): per-structure reductions become seg_pool/seg_own one-hot dot
    # pairs (P = seg seg^T is symmetric, so the transpose rule of every
    # pooled reduction is the same operator pair applied to the cotangent).
    if n_segments:
        seg = seg_ref[...]                                     # [BT, M, S]

        def seg_pool(x):  # [BT, M, C] -> [BT, S, C]
            return jnp.stack([mm_tA_hi(seg[t], x[t]) for t in range(BT)])

        def seg_own(y):   # [BT, S, C] -> [BT, M, C]
            return jnp.stack([mm_hi(seg[t], y[t]) for t in range(BT)])

        q_own = seg_own(seg_pool(mq))                          # [BT, M, G]
        cross = jnp.sum(mk * q_own, axis=-1, keepdims=True)
    else:
        qsum = jnp.sum(mq, axis=1, keepdims=True)              # [BT, 1, G]
        cross = jnp.sum(mk * qsum, axis=-1, keepdims=True)     # [BT, M, 1]
    diag = jnp.sum(mk * mq, axis=-1, keepdims=True)
    agg0 = am3 * (cross - diag)                                # [BT, M, 1]
    if ga_norm:
        if n_segments:
            nrm_own = seg_own(jnp.sqrt(seg_pool(agg0 * agg0)))
            # row-level guard also covers slot-padding rows (seg row = 0)
            nrm_safe = jnp.where(nrm_own == 0, jnp.ones_like(nrm_own),
                                 nrm_own)
        else:
            nrm = jnp.sqrt(jnp.sum(agg0 * agg0, axis=1, keepdims=True))
            nrm_safe = jnp.where(nrm == 0, jnp.ones_like(nrm), nrm)
        agg = agg0 / nrm_safe
    else:
        agg = agg0
    aggm = agg + (1.0 - am3) * (-1e9)
    aggm = aggm - jnp.max(aggm, axis=1, keepdims=True)
    e = jnp.exp(aggm)
    if n_segments:
        den_own = seg_own(seg_pool(e))
        ga = e / jnp.where(den_own == 0, jnp.ones_like(den_own), den_own)
        struc = seg_pool(ga * mk).reshape(BT * n_segments, G)  # [BT*S, G]
    else:
        ga = e / jnp.sum(e, axis=1, keepdims=True)             # [BT, M, 1]
        struc = jnp.sum(am3 * ga * gk, axis=1)                 # [BT, G]
    s_bf = _mm(struc, wbf_ref[:]) + bbf_ref[:]
    sb = _swish(s_bf)                                          # [BT(*S), O]

    SEG1 = max(n_segments, 1)
    pred_lin = _mm(sb, wp_ref[:]) + bp_ref[:]                  # [BT(*S), 1]
    pred = jnp.maximum(pred_lin, 0.0) if mrelu else pred_lin
    pred_out[...] = pred.reshape(BT, SEG1, 1)

    # ---------------- backward -------------------------------------------
    if ct_from_target:
        # one-shot train mode: ct_pred_ref carries the TARGET. The RMSE
        # cotangent factorizes as (pred - t) / (B * rmse); the per-structure
        # residual is applied here, the global 1/(B*rmse) scale in the XLA
        # epilogue (mrelu is straight-through — ops/activations.py — so no
        # relu gate on the residual). Packed runs zero the residual of
        # EMPTY segments (whose pred is a head-bias artifact) in-kernel.
        ct_pred = pred - ct_pred_ref[...].reshape(BT * SEG1, 1)
        if n_segments:
            # per-segment atom counts > 0; the [BT, S, 1] -> [BT*S, 1]
            # collapse matches the struc reshape's layout (Mosaic cannot
            # cast a [BT, S] lane dim into sublanes)
            seg_valid = (seg_pool(am3) > 0).astype(jnp.float32)
            ct_pred = ct_pred * seg_valid.reshape(BT * SEG1, 1)
        ct_ga = jnp.zeros((BT, M, 1), jnp.float32)
    else:
        ct_pred = ct_pred_ref[...].reshape(BT * SEG1, 1)
        ct_ga = ct_ga_ref[...]                                 # [BT, M, 1]

    d_wp[...] += _mm_tA(sb, ct_pred)
    d_bp[...] += jnp.sum(ct_pred, axis=0)
    dsb = _mm_tB(ct_pred, wp_ref[:])                           # [BT(*S), O]
    ds_bf = dsb * _swish_grad(s_bf)
    d_wbf[...] += _mm_tA(struc, ds_bf)
    d_bbf[...] += jnp.sum(ds_bf, axis=0)
    dstruc = _mm_tB(ds_bf, wbf_ref[:])                         # [BT(*S), G]

    if n_segments:
        dstruc_own = seg_own(dstruc.reshape(BT, n_segments, G))
        dga = jnp.sum(mk * dstruc_own, axis=-1, keepdims=True) + ct_ga
        dgk = am3 * ga * dstruc_own                            # [BT, M, G]
        # softmax over each segment's atoms
        dagg = ga * (dga - seg_own(seg_pool(ga * dga)))
    else:
        dstruc = dstruc.reshape(BT, 1, G)
        dga = jnp.sum(am3 * gk * dstruc, axis=-1, keepdims=True) + ct_ga
        dgk = am3 * ga * dstruc                                # [BT, M, G]
        # softmax over the atom axis (per molecule)
        dagg = ga * (dga - jnp.sum(ga * dga, axis=1, keepdims=True))
    if ga_norm:
        if n_segments:
            inner = seg_own(seg_pool(agg0 * dagg))
        else:
            inner = jnp.sum(agg0 * dagg, axis=1, keepdims=True)
        dagg0 = (dagg / nrm_safe
                 - agg0 * (inner / (nrm_safe * nrm_safe * nrm_safe)))
    else:
        dagg0 = dagg
    dcd = dagg0 * am3                                          # d(cross - diag)
    if n_segments:
        dmk = dcd * q_own - dcd * mq
        dmq = seg_own(seg_pool(dcd * mk)) - dcd * mk
    else:
        dmk = dcd * qsum - dcd * mq
        dmq = -dcd * mk
        dqsum = jnp.sum(dcd * mk, axis=1, keepdims=True)       # [BT, 1, G]
        dmq = dmq + jnp.broadcast_to(dqsum, mq.shape)
    dgq = (am3 * dmq).reshape(R, G)
    dgk = (dgk + am3 * dmk).reshape(R, G)

    d_wgq[...] += _mm_tA(cg, dgq)
    d_bgq[...] += jnp.sum(dgq, axis=0)
    d_wgk[...] += _mm_tA(cg, dgk)
    d_bgk[...] += jnp.sum(dgk, axis=0)
    dcg = _mm_tB(dgq, wgq_ref[:]) + _mm_tB(dgk, wgk_ref[:])
    ds_al = dcg * _swish_grad(s_al)
    d_wal[...] += _mm_tA(cL, ds_al)
    d_bal[...] += jnp.sum(ds_al, axis=0)
    dc = _mm_tB(ds_al, wal_ref[:])                             # [R, D]

    dg = jnp.zeros((R, N, D), jnp.float32) if g_update else None

    for l in range(L - 1, -1, -1):
        a = (_stash_cast(acts_stash[l], jnp.float32) if _keep_acts
             else layer_fwd(l, c_stash[l], g_stash[l])[2])
        c_in = c_stash[l]
        g_in = g_stash[l]
        ns, key, query, attn = a["ns"], a["key"], a["query"], a["attn"]

        # ResidualNorm
        dsum, dgam, dbet = _ln_bwd(dc, a["c_xhat"], a["c_inv"], rln_s_ref[l])
        d_rln_s[l] += jnp.sum(dgam, axis=0)
        d_rln_b[l] += jnp.sum(dbet, axis=0)
        dh2 = dsum * layer_masks[l] if dropout_rate > 0.0 else dsum
        d_wr2[l] += _mm_tA(a["h1"], dh2)
        d_br2[l] += jnp.sum(dh2, axis=0)
        dh1 = _mm_tB(dh2, wr2_ref[l])
        ds1 = dh1 * _swish_grad(a["s1"])
        d_wr1[l] += _mm_tA(a["o1"], ds1)
        d_br1[l] += jnp.sum(ds1, axis=0)
        do1 = dsum + _mm_tB(ds1, wr1_ref[l])

        # attention LayerNorm -> d(ctx + query)
        dcq, dgam, dbet = _ln_bwd(do1, a["o_xhat"], a["o_inv"], ln_s_ref[l])
        d_ln_s[l] += jnp.sum(dgam, axis=0)
        d_ln_b[l] += jnp.sum(dbet, axis=0)
        dctx = dcq                                             # [M, D]
        dquery = dcq

        # ctx = sum_N a_lanes * nmask * key  (a_lanes from the post-dropout
        # attention when use_drop is active)
        dctx3 = jnp.broadcast_to(dctx.reshape(R, 1, D), (R, N, D))
        a_lanes = _dot3(a["attn_used"], seg_expand)
        nm3 = nmask[:, :, None]
        dal3 = dctx3 * nm3 * key
        dkey = dctx3 * a_lanes * nm3
        dattn = _dot3(dal3, seg_sum)                           # [M, N, H]
        if attn_dropout > 0.0:
            dattn = dattn * attn_masks[l]

        # softmax over N (on the pre-dropout attention)
        de = attn * (dattn - jnp.sum(attn * dattn, axis=1, keepdims=True))
        dprod = _dot3(de, seg_expand)                          # [R, N, D]
        qs = jnp.broadcast_to((query * dk_scale).reshape(R, 1, D), (R, N, D))
        dkey = dkey + dprod * qs
        dquery = dquery + jnp.sum(dprod * key, axis=1) * dk_scale

        # key = (ns * geo_term) @ wk + bk
        kin = ns * a["geo_term"]
        d_wk[l] += _mm3_tA(kin, dkey)
        d_bk[l] += jnp.sum(jnp.sum(dkey, axis=0), axis=0)
        dkin = _dot3_tB(dkey, wk_ref[l])
        dns = dkin * a["geo_term"]
        dgeo_term = dkin * ns

        # query = c @ wq + bq
        d_wq[l] += _mm_tA(c_in, dquery)
        d_bq[l] += jnp.sum(dquery, axis=0)
        dc_new = _mm_tB(dquery, wq_ref[l])

        if g_update:
            dgout = dgeo_term + dg                             # [R, N, D]
            dr, dgam3, dbet3 = _ln_bwd(dgout, a["g_xhat"], a["g_inv"],
                                       lng_s_ref[l])
            d_lng_s[l] += jnp.sum(jnp.sum(dgam3, axis=0), axis=0)
            d_lng_b[l] += jnp.sum(jnp.sum(dbet3, axis=0), axis=0)
            du_pre = dr * _swish_grad(a["u_pre"])
            dg_new = dr                                        # residual into g
            wfg = wfg_ref[l]
            # u_pre = cw(+)broadcast + g@Wg + ns@Wn + b
            dcw = jnp.sum(du_pre, axis=1)                      # [R, D]
            d_wfg[l, 0:D, :] += _mm_tA(c_in, dcw)
            d_wfg[l, D:2 * D, :] += _mm3_tA(g_in, du_pre)
            d_wfg[l, 2 * D:3 * D, :] += _mm3_tA(ns, du_pre)
            d_bfg[l] += jnp.sum(jnp.sum(du_pre, axis=0), axis=0)
            dc_new = dc_new + _mm_tB(dcw, wfg[0:D, :])
            dg_new = dg_new + _dot3_tB(du_pre, wfg[D:2 * D, :])
            dns = dns + _dot3_tB(du_pre, wfg[2 * D:3 * D, :])
            dg = dg_new
        else:
            # geo_term = swish(rbf_d @ wfg + b) * weight
            du = dgeo_term * weight_rows[:, :, None]
            du_pre = du * _swish_grad(a["u_pre"])
            d_wfg[l] += _mm3_tA(rbf_d, du_pre)
            d_bfg[l] += jnp.sum(jnp.sum(du_pre, axis=0), axis=0)

        # ns = gather(c)  ->  dc += gather^T(dns), per molecule
        dc_new = dc_new + gather_t(dns)
        dc = dc_new

    # embedding backward
    if dropout_rate > 0.0:
        dc = dc * embed_mask
    ds_de = dc * _swish_grad(s_de)
    d_bde[...] += jnp.sum(ds_de, axis=0)
    if use_ring:
        d_wde[0:E, :] += _mm_tA(emb, ds_de)
        d_wde[E:E + 10, :] += _mm_tA(ring_emb, ds_de)
        dring_emb = _mm_tB(ds_de, wde_ref[E:E + 10, :])
        d_wring[...] += _mm_tA(ring_rows, dring_emb)
        d_bring[...] += jnp.sum(dring_emb, axis=0)
        demb = _mm_tB(ds_de, wde_ref[0:E, :])
    else:
        d_wde[...] += _mm_tA(emb, ds_de)
        demb = _mm_tB(ds_de, wde_ref[:])
    d_embed[...] += _mm_tA(feat_rows, demb)
    if cgcnn:
        d_bembed[...] += jnp.sum(demb, axis=0)

    if g_update:
        # geometry_0 = swish(s_nd) * swish(s_nw)
        dd_emb = dg * w_emb_v
        dw_emb = dg * d_emb_v
        ds_nd = dd_emb * _swish_grad(s_nd)
        ds_nw = dw_emb * _swish_grad(s_nw)
        d_wnd[...] += _mm3_tA(rbf_d, ds_nd)
        d_bnd[...] += jnp.sum(jnp.sum(ds_nd, axis=0), axis=0)
        d_wnw[...] += _mm3_tA(rbf_w, ds_nw)
        d_bnw[...] += jnp.sum(jnp.sum(ds_nw, axis=0), axis=0)


def _fused_grad_impl(params: dict, inputs: dict, cfm: ModelConfig,
                     ct_pred, ct_ga, interpret: bool,
                     dropout_rate: float, dropout_seed,
                     batch_tile, ct_from_target: bool, mrelu: bool):
    """Shared body of the fused backward: returns (grads dict, pred [B, 1]).

    ``batch_tile`` molecules are processed per Pallas program (auto-picked by
    VMEM budget when None; the stash working set makes the backward tile
    smaller than the forward's). Dropout masks are keyed to global molecule
    indices, so any tile size replays the forward's masks exactly.

    When ``ct_from_target`` the ``ct_pred`` operand carries per-structure
    TARGETS and the kernel forms the RMSE residual (pred - t) itself — the
    one-kernel-per-step training path (the 1/(B*rmse) scale and the l2 term
    are applied by the caller in XLA)."""
    assert supports_config(cfm)
    params = params.get("params", params)

    seg_in = inputs.get("segment_onehot")
    S = int(seg_in.shape[-1]) if seg_in is not None else 0

    B, M = inputs["atomic"].shape[:2]
    N = inputs["neighbors"].shape[2]
    L, D = cfm.n_attention, cfm.local_dim
    from scann_tpu.kernels.scann_forward import resolve_tile

    BT = (batch_tile if batch_tile is not None
          else resolve_tile(cfm, B, M, N, "bwd", dropout_rate))
    if B % BT:
        raise ValueError(f"batch {B} not divisible by batch_tile {BT}")

    sp = stack_layer_params(params, L, cfm.g_update)
    dist_centers = jnp.asarray(make_centers(cfm.gaussian_d, cfm.num_gaussian))[None]
    angle_centers = jnp.asarray(make_centers(2 * np.pi, cfm.num_gaussian))[None]

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    if cfm.g_update:
        wnd, bnd = params["neighbor_d"]["kernel"], params["neighbor_d"]["bias"]
        wnw, bnw = params["neighbor_w"]["kernel"], params["neighbor_w"]["bias"]
    else:
        K = cfm.num_gaussian
        wnd = jnp.zeros((K, D), jnp.float32)
        bnd = jnp.zeros((D,), jnp.float32)
        wnw, bnw = wnd, bnd

    cgcnn = cfm.feature == "cgcnn"
    if cgcnn:
        w_embed = f32(params["embed_atom"]["kernel"])
        b_embed = f32(params["embed_atom"]["bias"])
        atomic_op = f32(inputs["atomic"])
    else:
        w_embed = f32(params["embed_atom"]["embedding"])
        b_embed = jnp.zeros((w_embed.shape[1],), jnp.float32)
        atomic_op = jnp.asarray(inputs["atomic"], jnp.int32)[..., None]
    if cfm.use_ring:
        w_ring = f32(params["extra_embed"]["kernel"])
        b_ring = f32(params["extra_embed"]["bias"])
        ring_op = f32(inputs["ring_aromatic"])
    else:
        w_ring = jnp.zeros((2, 10), jnp.float32)
        b_ring = jnp.zeros((10,), jnp.float32)
        ring_op = jnp.zeros((B, M, 2), jnp.float32)

    param_operands = [
        w_embed, b_embed, w_ring, b_ring,
        f32(params["dense_embed"]["kernel"]), f32(params["dense_embed"]["bias"]),
        f32(wnd), f32(bnd), f32(wnw), f32(bnw),
        f32(sp["wfg"]), f32(sp["bfg"]), f32(sp["wk"]), f32(sp["bk"]),
        f32(sp["wq"]), f32(sp["bq"]),
        f32(sp["ln_s"]), f32(sp["ln_b"]), f32(sp["lng_s"]), f32(sp["lng_b"]),
        f32(sp["wr1"]), f32(sp["br1"]), f32(sp["wr2"]), f32(sp["br2"]),
        f32(sp["rln_s"]), f32(sp["rln_b"]),
        f32(params["after_Lc"]["kernel"]), f32(params["after_Lc"]["bias"]),
        f32(params["global_attention"]["query"]["kernel"]),
        f32(params["global_attention"]["query"]["bias"]),
        f32(params["global_attention"]["key"]["kernel"]),
        f32(params["global_attention"]["key"]["bias"]),
        f32(params["bf_property"]["kernel"]), f32(params["bf_property"]["bias"]),
        f32(params["predict_property"]["kernel"]), f32(params["predict_property"]["bias"]),
    ]
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1, 1), jnp.int32)
    else:
        dropout_seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)

    operands = [
        atomic_op,
        f32(inputs["atom_mask"]),
        jnp.asarray(inputs["neighbors"], jnp.int32),
        f32(inputs["neighbor_mask"]),
        f32(inputs["neighbor_weight"]),
        f32(inputs["neighbor_distance"]),
        ring_op,
        # unpacked runs reuse atom_mask as a never-read dummy seg operand
        f32(seg_in) if seg_in is not None else f32(inputs["atom_mask"]),
        f32(ct_pred).reshape(B, -1)[..., None],   # [B, S(=1), 1]
        f32(ct_ga),                       # [B, M, 1]
        dropout_seed,
    ] + param_operands + [dist_centers, angle_centers]

    def spec_for(x, batched):
        if batched:
            blk = (BT,) + x.shape[1:]
            idx_map = lambda bb, nd=x.ndim: (bb,) + (0,) * (nd - 1)
        else:
            blk = x.shape
            idx_map = lambda bb, nd=x.ndim: (0,) * nd
        return pl.BlockSpec(blk, idx_map, memory_space=pltpu.VMEM)

    in_specs = [spec_for(x, i < 10) for i, x in enumerate(operands)]

    S1 = max(S, 1)
    grad_templates = param_operands  # same order as the d_* kernel args
    out_specs = [spec_for(x, False) for x in grad_templates] + [
        pl.BlockSpec((BT, S1, 1), lambda bb: (bb, 0, 0),
                     memory_space=pltpu.VMEM)]
    out_shape = ([jax.ShapeDtypeStruct(x.shape, jnp.float32)
                  for x in grad_templates]
                 + [jax.ShapeDtypeStruct((B, S1, 1), jnp.float32)])

    from scann_tpu.kernels.scann_forward import VMEM_BUDGET_BYTES

    outs = pl.pallas_call(
        functools.partial(
            _kernel, n_layers=L, num_head=cfm.num_head, scale=cfm.scale,
            g_update=cfm.g_update, ga_norm=cfm.use_ga_norm, rbf_width=0.25,
            dropout_rate=dropout_rate,
            attn_dropout=attn_dropout_rate(cfm, dropout_rate),
            use_ring=cfm.use_ring, cgcnn=cgcnn,
            ct_from_target=ct_from_target, mrelu=mrelu,
            bf16=(cfm.dtype == "bfloat16"), n_segments=S,
        ),
        grid=(B // BT,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES + (16 << 20)),
        interpret=interpret,
    )(*operands)
    grads_flat, pred = outs[:-1], outs[-1][:, :, 0]

    (g_embed, g_bembed, g_wring, g_bring, g_wde, g_bde,
     g_wnd, g_bnd, g_wnw, g_bnw,
     g_wfg, g_bfg, g_wk, g_bk, g_wq, g_bq,
     g_ln_s, g_ln_b, g_lng_s, g_lng_b,
     g_wr1, g_br1, g_wr2, g_br2, g_rln_s, g_rln_b,
     g_wal, g_bal, g_wgq, g_bgq, g_wgk, g_bgk,
     g_wbf, g_bbf, g_wp, g_bp) = grads_flat

    out = {
        "embed_atom": ({"kernel": g_embed, "bias": g_bembed} if cgcnn
                       else {"embedding": g_embed}),
        "dense_embed": {"kernel": g_wde, "bias": g_bde},
        "after_Lc": {"kernel": g_wal, "bias": g_bal},
        "global_attention": {
            "query": {"kernel": g_wgq, "bias": g_bgq},
            "key": {"kernel": g_wgk, "bias": g_bgk},
        },
        "bf_property": {"kernel": g_wbf, "bias": g_bbf},
        "predict_property": {"kernel": g_wp, "bias": g_bp},
    }
    if cfm.use_ring:
        out["extra_embed"] = {"kernel": g_wring, "bias": g_bring}
    if cfm.g_update:
        out["neighbor_d"] = {"kernel": g_wnd, "bias": g_bnd}
        out["neighbor_w"] = {"kernel": g_wnw, "bias": g_bnw}
    for i in range(L):
        la = {
            "filter_geo": {"kernel": g_wfg[i], "bias": g_bfg[i]},
            "key": {"kernel": g_wk[i], "bias": g_bk[i]},
            "query": {"kernel": g_wq[i], "bias": g_bq[i]},
            "layer_norm": {"scale": g_ln_s[i], "bias": g_ln_b[i]},
        }
        if cfm.g_update:
            la["layer_norm_g"] = {"scale": g_lng_s[i], "bias": g_lng_b[i]}
        out[f"local_attention_{i}"] = la
        out[f"residual_norm_{i}"] = {
            "dense_1": {"kernel": g_wr1[i], "bias": g_br1[i]},
            "dense_2": {"kernel": g_wr2[i], "bias": g_br2[i]},
            "layer_norm": {"scale": g_rln_s[i], "bias": g_rln_b[i]},
        }
    return out, pred


def fused_scann_grad(params: dict, inputs: dict, cfm: ModelConfig,
                     ct_pred, ct_ga, interpret: bool = False,
                     dropout_rate: float = 0.0, dropout_seed=None,
                     batch_tile: int = None) -> dict:
    """Parameter gradients of (pred, ga) contracted with (ct_pred, ct_ga)."""
    grads, _ = _fused_grad_impl(params, inputs, cfm, ct_pred, ct_ga,
                                interpret, dropout_rate, dropout_seed,
                                batch_tile, ct_from_target=False, mrelu=False)
    return grads


def fused_scann_train_grads(params, inputs, targets, cfm: ModelConfig,
                            mrelu_head: bool = False, interpret: bool = False,
                            dropout_rate: float = 0.0, dropout_seed=None,
                            batch_tile: int = None):
    """One-kernel-per-step training: forward + RMSE residual + backward in a
    single launch. Returns (pred [B, 1], raw grads dict).

    ``raw`` are gradients of 0.5 * sum((pred - t)^2); the caller turns them
    into RMSE + l2 gradients with ``raw / (B * rmse) + d l2`` — see
    Trainer._make_steps. Eliminates the separate forward launch the
    custom-vjp path needs (the bwd kernel recomputes the forward anyway).

    Packed batches (``segment_onehot`` in inputs): targets are [B, S],
    pred comes back [B, S], and empty segments' residuals are zeroed
    in-kernel — the caller's scale divisor is the VALID segment count."""
    B, M = inputs["atomic"].shape[:2]
    targets = jnp.asarray(targets, jnp.float32).reshape(B, -1)
    ct_ga = jnp.zeros((B, M, 1), jnp.float32)
    grads, pred = _fused_grad_impl(params, inputs, cfm, targets, ct_ga,
                                   interpret, dropout_rate, dropout_seed,
                                   batch_tile, ct_from_target=True,
                                   mrelu=mrelu_head)
    return pred, grads


def make_sharded_scann_train(mesh, cfm: ModelConfig, mrelu_head: bool = False,
                             interpret: bool = False,
                             dropout_rate: float = 0.0):
    """Data-parallel wrapper for the one-kernel-per-step training path:
    params replicated, batch + targets sharded over 'data', RAW gradient
    psum over ICI. Returns (pred [B, 1] gathered, raw grads replicated);
    the caller applies the global 1/(B*rmse) scale + l2 term in XLA."""
    from jax.sharding import PartitionSpec as P

    from scann_tpu.kernels.shard_util import lazy_sharded

    def fn(params, inputs, targets, seed):
        ax = jax.lax.axis_index("data")
        b_local = inputs["atomic"].shape[0]
        shard_seed = (None if seed is None
                      else seed + ax.astype(jnp.int32) * b_local)
        pred, raw = fused_scann_train_grads(params, inputs, targets, cfm,
                                            mrelu_head, interpret,
                                            dropout_rate, shard_seed)
        return pred, jax.lax.psum(raw, "data")

    base_keys = ("atomic", "atom_mask", "neighbors", "neighbor_mask",
                 "neighbor_weight", "neighbor_distance")
    if cfm.use_ring:
        base_keys = base_keys + ("ring_aromatic",)

    get_sharded = lazy_sharded(fn, mesh, extra_in_specs=(P("data"), P()))

    def wrapper(params, inputs, targets, seed):
        # packed batches (data/packing.py) additionally shard the segment
        # one-hot; segment_mask is epilogue-only and never enters the kernel
        batch_keys = base_keys + (
            ("segment_onehot",) if "segment_onehot" in inputs else ())
        extra = set(inputs) - set(batch_keys) - {"segment_mask"}
        if extra:
            raise ValueError(f"unsupported inputs for the fused kernels: {extra}")
        targets = jnp.asarray(targets, jnp.float32)
        targets = targets.reshape(targets.shape[0], -1)
        return get_sharded(batch_keys)(
            params, {k: inputs[k] for k in batch_keys}, targets, seed)

    return wrapper


# ---------------- differentiable wrapper -------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def scann_apply(params, inputs, cfm: ModelConfig, mrelu_head: bool = False,
                interpret: bool = False, dropout_rate: float = 0.0,
                dropout_seed=None):
    """Differentiable fused SCANN forward: returns (pred [B,1], ga [B,M,1]).

    ``jax.grad`` through this runs the fused backward kernel (parameter
    gradients only — inputs get zero cotangents). ``dropout_rate > 0``
    applies the reference's training dropout with identical masks in forward
    and backward (same PRNG stream)."""
    return fused_scann_forward(params, inputs, cfm, mrelu_head=mrelu_head,
                               interpret=interpret, dropout_rate=dropout_rate,
                               dropout_seed=dropout_seed)


def _sa_fwd(params, inputs, cfm, mrelu_head, interpret, dropout_rate,
            dropout_seed):
    out = scann_apply(params, inputs, cfm, mrelu_head, interpret,
                      dropout_rate, dropout_seed)
    return out, (params, inputs, dropout_seed)


def _sa_bwd(cfm, mrelu_head, interpret, dropout_rate, res, cts):
    params, inputs, dropout_seed = res
    ct_pred, ct_ga = cts
    # mrelu head: straight-through gradient (identity) — nothing to do
    dparams = fused_scann_grad(params, inputs, cfm, ct_pred, ct_ga,
                               interpret=interpret,
                               dropout_rate=dropout_rate,
                               dropout_seed=dropout_seed)
    if isinstance(params, dict) and "params" in params:
        dparams = {"params": dparams}
    dinputs = jax.tree.map(jnp.zeros_like,
                           {k: jnp.asarray(v) for k, v in inputs.items()})
    dseed = None if dropout_seed is None else jnp.zeros_like(
        jnp.asarray(dropout_seed))
    return dparams, dinputs, dseed


scann_apply.defvjp(_sa_fwd, _sa_bwd)


def make_sharded_scann_apply(mesh, cfm: ModelConfig, mrelu_head: bool = False,
                             interpret: bool = False, dropout_rate: float = 0.0):
    """Data-parallel wrapper: run the fused forward/backward per shard.

    Params are replicated (spec P()), every batched input and both outputs
    are sharded over the 'data' axis. Under ``jax.grad`` shard_map transposes
    the replicated param spec into the gradient ``psum`` over ICI — the same
    collective layout as the XLA path. The dropout seed is offset by
    shard_index * local_batch so the per-molecule PRNG streams (seed +
    global molecule index) never collide across shards.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def fn(params, inputs, seed):
        ax = jax.lax.axis_index("data")
        b_local = inputs["atomic"].shape[0]  # static at trace time
        shard_seed = (None if seed is None
                      else seed + ax.astype(jnp.int32) * b_local)
        return scann_apply(params, inputs, cfm, mrelu_head, interpret,
                           dropout_rate, shard_seed)

    batch_keys = ("atomic", "atom_mask", "neighbors", "neighbor_mask",
                  "neighbor_weight", "neighbor_distance")
    if cfm.use_ring:
        batch_keys = batch_keys + ("ring_aromatic",)
    in_specs = (P(), {k: P("data") for k in batch_keys}, P())
    sharded = shard_map(fn, mesh=mesh,
                        in_specs=in_specs,
                        out_specs=(P("data"), P("data")),
                        check_vma=False)

    def wrapper(params, inputs, seed):
        extra = set(inputs) - set(batch_keys)
        if extra:
            raise ValueError(f"unsupported inputs for the fused kernels: {extra}")
        return sharded(params, {k: inputs[k] for k in batch_keys}, seed)

    return wrapper
