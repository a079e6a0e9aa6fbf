"""Loop-based whole-model fused kernels for CRYSTAL-scale structures.

The unrolled kernels (``scann_forward``/``scann_backward``) inline all
``n_attention`` layers as straight-line code — unbeatable at molecule scale
(M <= 64) but unusable for crystals: Mosaic compile time grows superlinearly
with the unrolled instruction stream (an M=96/L=9 backward exceeded 25
minutes), and the per-program working set outgrows VMEM.

This module implements the same math (reference graph
``scann_model.py:329-453``) with a ``jax.lax.fori_loop`` over layers:

- the loop body compiles ONCE regardless of depth (compile time bounded),
- stacked [L, ...] parameters are indexed dynamically inside the loop,
- per-layer gradient accumulation uses dynamic-index stores
  (``d_wk[l] = d_wk[l] + g``),
- the backward stashes each layer's INPUTS (center stream + geometry
  stream) in VMEM scratch arrays and recomputes activations in the reverse
  walk — the standard recompute schedule, now with O(1) code size,
- embed/residual dropout masks are pre-drawn into a scratch array (the
  reverse walk needs them in reverse order; the PRNG only streams forward).

One molecule per program (measured optimal — see ``pick_loop_fwd_tile``).
Scope: the full crystal-scale configuration matrix — atomic or cgcnn
features, with or without ring/aromatic features, with or without attention
dropout (``use_drop``). Attention dropout masks are NOT stashed (a
``[L, M, N, H]`` scratch pads H to 128 lanes — ~14 MB at the MP2018 shape);
instead the PRNG is RESEEDED per (molecule, layer) immediately before each
draw, so the reverse walk replays the exact masks by reseeding — random
access into the mask stream with zero storage.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scann_tpu.config import ModelConfig, attn_dropout_rate
from scann_tpu.kernels.dots import dot_fns
from scann_tpu.kernels.scann_forward import (
    VMEM_BUDGET_BYTES,
    _pad8,
    _pad128,
    _param_bytes,
    stack_layer_params,
)
from scann_tpu.ops.rbf import make_centers


# PRNG stream tag separating the per-(molecule, layer) attention-dropout
# draws from the molecule-stream embed/residual draws
_ATTN_STREAM = 0x5CA


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
    dgamma = dy * xhat
    dxhat = dy * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = inv * (dxhat - m1 - xhat * m2)
    return dx, dgamma, dy


def supports_loop(cfm: ModelConfig) -> bool:
    """Everything the crystal-scale path can need: atomic OR cgcnn features,
    with or without the ring/aromatic extra embedding (model_ptgp.yaml
    trains Pt/graphene with use_ring at M > 64, beyond the unrolled
    kernels' reach), with or without attention dropout (``use_drop``,
    reference attention.py:115-116,191-192). Only ``use_attn_norm=False``
    (no published config) falls back to XLA."""
    return cfm.use_attn_norm


def fits_loop_vmem(cfm: ModelConfig, M: int, N: int,
                   budget_bytes: int = VMEM_BUDGET_BYTES,
                   training: bool = True) -> bool:
    """Per-program VMEM of the loop backward: the layer-input stashes (the
    dominant term at crystal sizes) + ONE layer's recomputed working set
    (the loop body reuses its allocation across iterations).

    ``training=False`` drops the attention-dropout transient term: eval runs
    with attn_dropout=0 and the kernels allocate no mask scratch, so charging
    it would spuriously push borderline use_drop crystal shapes off the fused
    eval path."""
    D, L = cfm.local_dim, cfm.n_attention
    rnd = M * _pad8(N) * _pad128(D) * 4
    c_stash = (L + 1) * M * _pad128(D) * 4
    g_stash = (L + 1) * rnd if cfm.g_update else 0
    work = 18 * rnd                      # one reverse-iteration working set
    onehot = M * _pad8(N) * _pad128(M) * 4
    masks = (L + 1) * M * _pad128(D) * 4
    if cfm.use_drop and training:
        # attention-dropout transients ([M, N, H] mask + dropped attn;
        # H pads to 128 lanes) — replayed by reseeding, never stashed
        work += 3 * M * _pad8(N) * _pad128(cfm.num_head) * 4
    static = 2 * _param_bytes(cfm)
    return c_stash + g_stash + work + onehot + masks + static < budget_bytes



def _stash_extra_bytes(cfm: ModelConfig, M: int, N: int,
                       big_bytes: int = 4) -> int:
    """VMEM cost of the selective activation stash (ns, u_pre, key per
    layer [M, N, D]; attn [M, N, H] — H pads to 128 lanes; o1 [M, D]).
    ``big_bytes=2`` models the bf16 stash variant (ns/u_pre/key AND attn
    halve — the lane-padded attn stash alone is ~22 MB at the ptgp shape;
    o1 stays f32, it feeds LN-stat recomputes and is [M, D]-small)."""
    D, L = cfm.local_dim, cfm.n_attention
    rnd = M * _pad8(N) * _pad128(D) * big_bytes
    attn = M * _pad8(N) * _pad128(cfm.num_head) * big_bytes
    return L * (3 * rnd + attn + M * _pad128(D) * 4)


def fits_loop_stash(cfm: ModelConfig, M: int, N: int,
                    budget_bytes: int = VMEM_BUDGET_BYTES) -> bool:
    """Whether the loop backward can afford the selective activation stash
    (round 4): stashing ns/u_pre/key/attn/o1 per layer lets the reverse
    walk skip recomputing the gather / geometry / key / energy-softmax
    dots — ~the whole per-layer forward dot budget, measured +24% crystal
    train throughput at the MP2018 shape. Falls back to the classic
    full-recompute schedule when the extra scratch would overflow VMEM
    (larger (M, N) shapes or deep ring configs)."""
    return (_loop_bwd_base_bytes(cfm, M, N) + _stash_extra_bytes(cfm, M, N)
            < budget_bytes)


def _loop_bwd_base_bytes(cfm: ModelConfig, M: int, N: int) -> int:
    """Loop-backward VMEM excluding the selective stash."""
    D, L = cfm.local_dim, cfm.n_attention
    rnd = M * _pad8(N) * _pad128(D) * 4
    base = ((L + 1) * M * _pad128(D) * 4                 # c_stash
            + ((L + 1) * rnd if cfm.g_update else 0)     # g_stash
            + 18 * rnd                                   # reverse working set
            + M * _pad8(N) * _pad128(M) * 4              # one-hot
            + (L + 1) * M * _pad128(D) * 4               # dropout masks
            + 2 * _param_bytes(cfm))
    if cfm.use_drop:
        base += 3 * M * _pad8(N) * _pad128(cfm.num_head) * 4
    return base


def loop_stash_mode(cfm: ModelConfig, M: int, N: int,
                    budget_bytes: int = VMEM_BUDGET_BYTES):
    """Selective-stash schedule for shape (M, N): ``"f32"`` (exact, when
    the full stash fits), ``"bf16"`` (OPT-IN via
    SCANN_TPU_LOOP_STASH_BF16=1: the three big [L, M, N, D] buffers
    stashed in bf16 — halves the extra VMEM so deep ring/crystal shapes
    whose f32 stash overflows, e.g. ptgp-like 11L at M=128, keep the
    +15-24% schedule at the cost of bf16-rounded gradient rebuilds;
    parity-bounded by tests), or ``None`` (classic full-recompute,
    exact). SCANN_TPU_LOOP_STASH=0 forces None."""
    if os.environ.get("SCANN_TPU_LOOP_STASH", "1") == "0":
        return None
    if fits_loop_stash(cfm, M, N, budget_bytes):
        return "f32"
    if (os.environ.get("SCANN_TPU_LOOP_STASH_BF16", "0") == "1"
            and _loop_bwd_base_bytes(cfm, M, N)
            + _stash_extra_bytes(cfm, M, N, big_bytes=2) < budget_bytes):
        return "bf16"
    return None


def _make_attn_mask(mol_seed, M, N, H, attn_dropout):
    """Per-(molecule, layer) attention-dropout mask generator, SHARED by the
    forward and backward kernels: the replay scheme requires both to reseed
    and draw identically, which this factory enforces by construction
    (random-access mask replay, no [L, M, N, H] stash — see module
    docstring). Mosaic caps prng_seed at 2 values, so the stream tag and
    layer fold into the second seed word."""
    a_keep = jnp.uint32(int((1.0 - attn_dropout) * (2 ** 32 - 1)))
    a_inv = jnp.float32(1.0 / (1.0 - attn_dropout))

    def attn_mask(l):
        pltpu.prng_seed(mol_seed, _ATTN_STREAM + l)
        bits = pltpu.bitcast(pltpu.prng_random_bits((M, N, H)), jnp.uint32)
        return (bits < a_keep).astype(jnp.float32) * a_inv

    return attn_mask


# ---------------------------------------------------------------------------
# forward kernel (one molecule per program; fori_loop over layers)
# ---------------------------------------------------------------------------

def _fwd_kernel(
    atomic_ref, atom_mask_ref, idx_ref, nmask_ref, weight_ref, dist_ref,
    ring_ref, seg_ref, seed_ref,
    embed_ref, bembed_ref, wde_ref, bde_ref,
    wnd_ref, bnd_ref, wnw_ref, bnw_ref,
    wfg_ref, bfg_ref, wk_ref, bk_ref, wq_ref, bq_ref,
    ln_s_ref, ln_b_ref, lng_s_ref, lng_b_ref,
    wr1_ref, br1_ref, wr2_ref, br2_ref, rln_s_ref, rln_b_ref,
    wal_ref, bal_ref, wgq_ref, bgq_ref, wgk_ref, bgk_ref,
    wbf_ref, bbf_ref, wp_ref, bp_ref,
    wring_ref, bring_ref,
    dist_centers_ref, angle_centers_ref,
    out_ref, ga_ref,
    mask_scratch,
    *, n_layers: int, num_head: int, scale: float, g_update: bool,
    ga_norm: bool, mrelu: bool, rbf_width: float, dropout_rate: float = 0.0,
    attn_dropout: float = 0.0, use_ring: bool = False, cgcnn: bool = False,
    bf16: bool = False, n_segments: int = 0,
):
    BT = atomic_ref.shape[0]  # molecules per program (eval tiling; train BT=1)
    M = atomic_ref.shape[1]
    N = idx_ref.shape[2]
    R = BT * M                # row-concatenated molecules (the unrolled
    vocab = embed_ref.shape[0]  # kernel's layout, scann_forward.py:226-230)
    D = wk_ref.shape[2]
    H = num_head
    hd = D // H
    L = n_layers

    # opt-in bf16 MXU mode (model.dtype == 'bfloat16'); shared factory,
    # kernels/dots.py — one casting policy across all kernel families
    mm, mm_tA, mm_tB, dot3, dot3_tB, mm3_tA = dot_fns(bf16)

    am = atom_mask_ref[...].reshape(R, 1)
    nmask = nmask_ref[...].reshape(R, N)
    assert (dropout_rate == 0.0 and attn_dropout == 0.0) or BT == 1, \
        "dropout (training) runs the loop forward at batch_tile=1"
    assert n_segments == 0 or BT == 1, \
        "structure packing (n_segments > 0) runs one slot per program"

    # dropout: per-molecule stream (seed + global molecule index), drawn
    # up-front in a fixed order (embed, then layer 0..L-1) into scratch
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        keep = jnp.uint32(int((1.0 - dropout_rate) * (2 ** 32 - 1)))
        inv_keep = jnp.float32(1.0 / (1.0 - dropout_rate))

        def draw():
            bits = pltpu.bitcast(pltpu.prng_random_bits((M, D)), jnp.uint32)
            return (bits < keep).astype(jnp.float32) * inv_keep

        embed_mask = draw()
        for l in range(L):  # static unroll: PRNG draws need a fixed schedule
            mask_scratch[l] = draw()

    if attn_dropout > 0.0:
        attn_mask = _make_attn_mask(seed_ref[0, 0] + pl.program_id(0),
                                    M, N, H, attn_dropout)

    if not cgcnn:
        atomic = atomic_ref[...].reshape(R, 1)
        zcols = jax.lax.broadcasted_iota(jnp.int32, (R, vocab), dimension=1)
        z_oh = (zcols == atomic).astype(jnp.float32)
    # per-molecule one-hot neighbor maps (indices address the molecule's own
    # atom space; the gather below applies them per molecule)
    ncols = jax.lax.broadcasted_iota(jnp.int32, (BT, M, N, M), dimension=3)
    n_oh4 = (ncols == idx_ref[...][:, :, :, None]).astype(jnp.float32)

    def gather(c_rows):
        """ns[t*M+m, n] = centers of molecule t at idx[t, m, n] -> [R, N, D]."""
        if BT == 1:
            return dot3(n_oh4[0], c_rows)
        c4 = c_rows.reshape(BT, M, D)
        parts = [dot3(n_oh4[t], c4[t]) for t in range(BT)]
        return jnp.concatenate(parts, axis=0).reshape(R, N, D)

    lane = jax.lax.broadcasted_iota(jnp.int32, (D, H), dimension=0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D, H), dimension=1)
    seg_sum = (lane // hd == head).astype(jnp.float32)
    seg_expand = jnp.transpose(seg_sum)
    dk_scale = jnp.asarray(hd, jnp.float32) ** jnp.asarray(-scale, jnp.float32)

    if cgcnn:
        # feature="cgcnn": Dense projection of the 92-dim descriptors
        # (reference scann_model.py:363-365)
        feat = atomic_ref[...].reshape(R, vocab)
        emb = mm(feat, embed_ref[:]) + bembed_ref[:]
    else:
        emb = mm(z_oh, embed_ref[:])
    if use_ring:
        # ring/aromatic concat expressed as split partial matmuls of
        # dense_embed's kernel rows (scann_forward.py:251-256; reference
        # scann_model.py:367-371)
        E = emb.shape[1]
        ring_emb = mm(ring_ref[...].reshape(R, 2), wring_ref[:]) + bring_ref[:]
        s_de = (mm(emb, wde_ref[0:E, :])
                + mm(ring_emb, wde_ref[E:E + 10, :]) + bde_ref[:])
    else:
        s_de = mm(emb, wde_ref[:]) + bde_ref[:]
    centers = _swish(s_de)
    if dropout_rate > 0.0:
        centers = centers * embed_mask

    dist_rows = dist_ref[...].reshape(R, N)
    weight_rows = weight_ref[...].reshape(R, N)
    d3 = dist_rows[:, :, None]
    rbf_d = jnp.exp(-jnp.square(d3 - dist_centers_ref[0]) / rbf_width)
    if g_update:
        w3 = weight_rows[:, :, None]
        rbf_w = jnp.exp(-jnp.square(w3 - angle_centers_ref[0]) / rbf_width)
        geometry = (_swish(dot3(rbf_d, wnd_ref[:]) + bnd_ref[:])
                    * _swish(dot3(rbf_w, wnw_ref[:]) + bnw_ref[:]))
    else:
        geometry = jnp.zeros((R, N, D), jnp.float32)  # unused carry slot

    def layer(l, c, g):
        ns = gather(c)
        if g_update:
            wfg = wfg_ref[l]
            cw = mm(c, wfg[0:D, :])
            u = (jnp.broadcast_to(cw.reshape(R, 1, D), (R, N, D))
                 + dot3(g, wfg[D:2 * D, :]) + dot3(ns, wfg[2 * D:3 * D, :])
                 + bfg_ref[l])
            g, _ = _ln_fwd(_swish(u) + g, lng_s_ref[l], lng_b_ref[l])
            geo_term = g
        else:
            u = _swish(dot3(rbf_d, wfg_ref[l]) + bfg_ref[l])
            geo_term = u * weight_rows[:, :, None]
        key = dot3(ns * geo_term, wk_ref[l]) + bk_ref[l]
        query = mm(c, wq_ref[l]) + bq_ref[l]
        prod = jnp.broadcast_to((query * dk_scale).reshape(R, 1, D),
                                (R, N, D)) * key
        energy = dot3(prod, seg_sum)
        energy = energy + (1.0 - nmask)[:, :, None] * (-1e9)
        energy = energy - jnp.max(energy, axis=1, keepdims=True)
        e = jnp.exp(energy)
        attn = e / jnp.sum(e, axis=1, keepdims=True)
        if attn_dropout > 0.0:  # use_drop: dropout on the attention probs
            attn = attn * attn_mask(l)
        a_lanes = dot3(attn, seg_expand)
        ctx = jnp.sum(a_lanes * nmask[:, :, None] * key, axis=1)
        o1, _ = _ln_fwd(ctx + query, ln_s_ref[l], ln_b_ref[l])
        h = _swish(mm(o1, wr1_ref[l]) + br1_ref[l])
        h = mm(h, wr2_ref[l]) + br2_ref[l]
        if dropout_rate > 0.0:
            h = h * mask_scratch[l]
        c, _ = _ln_fwd(o1 + h, rln_s_ref[l], rln_b_ref[l])
        return c, g

    def body(l, carry):
        c, g = carry
        return layer(l, c, g)

    centers, _ = jax.lax.fori_loop(0, L, body, (centers, geometry))

    # readout (the unrolled kernel's [BT, M, .] per-molecule reductions,
    # scann_forward.py:331-358)
    centers = _swish(mm(centers, wal_ref[:]) + bal_ref[:])
    G = centers.shape[-1]
    if n_segments:
        # STRUCTURE PACKING (data/packing.py): the slot's M rows hold
        # several structures; every cross-structure reduction becomes a
        # per-segment pool (mm_tA with the masked [M, S] one-hot) followed
        # by a broadcast back to member rows (mm with it) — the unrolled
        # kernels' scheme (scann_forward.py:321-375), BT=1 only.
        S = n_segments
        seg = seg_ref[...].reshape(M, S)
        pool = lambda x: mm_tA(seg, x)            # [M, C] -> [S, C]
        rows = lambda x: mm(seg, x)               # [S, C] -> [M, C]
        gq = mm(centers, wgq_ref[:]) + bgq_ref[:]  # [M, G]
        gk = mm(centers, wgk_ref[:]) + bgk_ref[:]
        mq = am * gq
        mk = am * gk
        qsum_rows = rows(pool(mq))
        cross = jnp.sum(mk * qsum_rows, axis=-1, keepdims=True)
        diag = jnp.sum(mk * mq, axis=-1, keepdims=True)
        agg = am * (cross - diag)                 # [M, 1]
        if ga_norm:
            nrm = rows(jnp.sqrt(pool(agg * agg)))
            agg = agg / jnp.where(nrm == 0, jnp.ones_like(nrm), nrm)
        aggm = agg + (1.0 - am) * (-1e9)
        # per-segment max: members see their value, non-members -inf
        t = aggm + (seg - 1.0) * 1e9              # [M, S]
        segmax = jnp.max(t, axis=0, keepdims=True)        # [1, S]
        e = jnp.exp(aggm - mm_tB(seg, segmax)) * am
        # guard AFTER the rows-broadcast: padding atoms have an all-zero
        # one-hot row, so their denominator is 0 regardless of esum
        den = rows(pool(e))                               # [M, 1]
        ga = e / jnp.where(den == 0, jnp.ones_like(den), den)
        struc = pool(am * ga * gk)                        # [S, G]
        struc = _swish(mm(struc, wbf_ref[:]) + bbf_ref[:])
        pred = mm(struc, wp_ref[:]) + bp_ref[:]           # [S, 1]
        if mrelu:
            pred = jnp.maximum(pred, 0.0)
        out_ref[...] = pred[None]                         # [1, S, 1]
        ga_ref[...] = ga[None]                            # [1, M, 1]
        return
    gq = (mm(centers, wgq_ref[:]) + bgq_ref[:]).reshape(BT, M, G)
    gk = (mm(centers, wgk_ref[:]) + bgk_ref[:]).reshape(BT, M, G)
    am3 = am.reshape(BT, M, 1)
    mq = am3 * gq
    mk = am3 * gk
    qsum = jnp.sum(mq, axis=1, keepdims=True)
    cross = jnp.sum(mk * qsum, axis=-1, keepdims=True)
    diag = jnp.sum(mk * mq, axis=-1, keepdims=True)
    agg = am3 * (cross - diag)
    if ga_norm:
        nrm = jnp.sqrt(jnp.sum(agg * agg, axis=1, keepdims=True))
        agg = agg / jnp.where(nrm == 0, jnp.ones_like(nrm), nrm)
    agg = agg + (1.0 - am3) * (-1e9)
    agg = agg - jnp.max(agg, axis=1, keepdims=True)
    e = jnp.exp(agg)
    ga = e / jnp.sum(e, axis=1, keepdims=True)                 # [BT, M, 1]
    struc = jnp.sum(am3 * ga * gk, axis=1)                     # [BT, G]
    struc = _swish(mm(struc, wbf_ref[:]) + bbf_ref[:])
    pred = mm(struc, wp_ref[:]) + bp_ref[:]                    # [BT, 1]
    if mrelu:
        pred = jnp.maximum(pred, 0.0)

    out_ref[...] = pred[:, :, None]                            # [BT, 1, 1]
    ga_ref[...] = ga


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(
    atomic_ref, atom_mask_ref, idx_ref, nmask_ref, weight_ref, dist_ref,
    ring_ref, seg_ref, ct_pred_ref, ct_ga_ref, seed_ref,
    embed_ref, bembed_ref, wde_ref, bde_ref,
    wnd_ref, bnd_ref, wnw_ref, bnw_ref,
    wfg_ref, bfg_ref, wk_ref, bk_ref, wq_ref, bq_ref,
    ln_s_ref, ln_b_ref, lng_s_ref, lng_b_ref,
    wr1_ref, br1_ref, wr2_ref, br2_ref, rln_s_ref, rln_b_ref,
    wal_ref, bal_ref, wgq_ref, bgq_ref, wgk_ref, bgk_ref,
    wbf_ref, bbf_ref, wp_ref, bp_ref,
    wring_ref, bring_ref,
    dist_centers_ref, angle_centers_ref,
    d_embed, d_bembed, d_wde, d_bde, d_wnd, d_bnd, d_wnw, d_bnw,
    d_wfg, d_bfg, d_wk, d_bk, d_wq, d_bq,
    d_ln_s, d_ln_b, d_lng_s, d_lng_b,
    d_wr1, d_br1, d_wr2, d_br2, d_rln_s, d_rln_b,
    d_wal, d_bal, d_wgq, d_bgq, d_wgk, d_bgk,
    d_wbf, d_bbf, d_wp, d_bp, d_wring, d_bring, pred_out,
    c_stash, g_stash, mask_scratch,
    ns_stash, key_stash, attn_stash, u_stash, o1_stash,
    *, n_layers: int, num_head: int, scale: float, g_update: bool,
    ga_norm: bool, rbf_width: float, dropout_rate: float = 0.0,
    attn_dropout: float = 0.0, use_ring: bool = False, cgcnn: bool = False,
    bf16: bool = False, ct_from_target: bool = False, mrelu: bool = False,
    n_segments: int = 0, stash_acts: bool = False,
):
    b = pl.program_id(0)
    grads = [d_embed, d_bembed, d_wde, d_bde, d_wnd, d_bnd, d_wnw, d_bnw,
             d_wfg, d_bfg, d_wk, d_bk, d_wq, d_bq,
             d_ln_s, d_ln_b, d_lng_s, d_lng_b,
             d_wr1, d_br1, d_wr2, d_br2, d_rln_s, d_rln_b,
             d_wal, d_bal, d_wgq, d_bgq, d_wgk, d_bgk,
             d_wbf, d_bbf, d_wp, d_bp, d_wring, d_bring]

    @pl.when(b == 0)
    def _zero():
        for g in grads:
            g[...] = jnp.zeros_like(g)

    M = atomic_ref.shape[1]
    N = idx_ref.shape[2]
    vocab = embed_ref.shape[0]
    D = wk_ref.shape[2]
    H = num_head
    hd = D // H
    L = n_layers

    # opt-in bf16 MXU mode (model.dtype == 'bfloat16'); shared factory,
    # kernels/dots.py — one casting policy across all kernel families
    mm, mm_tA, mm_tB, dot3, dot3_tB, mm3_tA = dot_fns(bf16)

    atomic = atomic_ref[0]
    am = atom_mask_ref[0]
    nmask = nmask_ref[0]

    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + b)
        keep = jnp.uint32(int((1.0 - dropout_rate) * (2 ** 32 - 1)))
        inv_keep = jnp.float32(1.0 / (1.0 - dropout_rate))

        def draw():
            bits = pltpu.bitcast(pltpu.prng_random_bits((M, D)), jnp.uint32)
            return (bits < keep).astype(jnp.float32) * inv_keep

        embed_mask = draw()
        for l in range(L):  # same fixed draw order as the forward kernel
            mask_scratch[l] = draw()

    if attn_dropout > 0.0:
        # same (molecule, layer)-keyed reseed as the forward kernel: the
        # stash pass and the reverse walk replay exact masks
        attn_mask = _make_attn_mask(seed_ref[0, 0] + b, M, N, H, attn_dropout)

    if not cgcnn:
        zcols = jax.lax.broadcasted_iota(jnp.int32, (M, vocab), dimension=1)
        z_oh = (zcols == atomic).astype(jnp.float32)
    ncols = jax.lax.broadcasted_iota(jnp.int32, (M, N, M), dimension=2)
    n_oh = (ncols == idx_ref[0][:, :, None]).astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (D, H), dimension=0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D, H), dimension=1)
    seg_sum = (lane // hd == head).astype(jnp.float32)
    seg_expand = jnp.transpose(seg_sum)
    dk_scale = jnp.asarray(hd, jnp.float32) ** jnp.asarray(-scale, jnp.float32)

    # ---------------- forward (stash per-layer inputs) --------------------
    if cgcnn:
        feat = atomic_ref[0]                                   # [M, 92] f32
        emb = mm(feat, embed_ref[:]) + bembed_ref[:]
    else:
        emb = mm(z_oh, embed_ref[:])
    if use_ring:
        E = emb.shape[1]
        ring_rows = ring_ref[0]
        ring_emb = mm(ring_rows, wring_ref[:]) + bring_ref[:]
        s_de = (mm(emb, wde_ref[0:E, :])
                + mm(ring_emb, wde_ref[E:E + 10, :]) + bde_ref[:])
    else:
        s_de = mm(emb, wde_ref[:]) + bde_ref[:]
    centers = _swish(s_de)
    if dropout_rate > 0.0:
        centers = centers * embed_mask

    d3 = dist_ref[0][:, :, None]
    rbf_d = jnp.exp(-jnp.square(d3 - dist_centers_ref[0]) / rbf_width)
    if g_update:
        w3 = weight_ref[0][:, :, None]
        rbf_w = jnp.exp(-jnp.square(w3 - angle_centers_ref[0]) / rbf_width)
        s_nd = dot3(rbf_d, wnd_ref[:]) + bnd_ref[:]
        s_nw = dot3(rbf_w, wnw_ref[:]) + bnw_ref[:]
        d_emb_v = _swish(s_nd)
        w_emb_v = _swish(s_nw)
        geometry = d_emb_v * w_emb_v
    else:
        geometry = jnp.zeros((M, N, D), jnp.float32)

    def layer_fwd(l, c, g):
        """One layer from its inputs; returns (c_out, g_out, acts tuple)."""
        ns = dot3(n_oh, c)
        if g_update:
            wfg = wfg_ref[l]
            cw = mm(c, wfg[0:D, :])
            u_pre = (jnp.broadcast_to(cw.reshape(M, 1, D), (M, N, D))
                     + dot3(g, wfg[D:2 * D, :]) + dot3(ns, wfg[2 * D:3 * D, :])
                     + bfg_ref[l])
            r = _swish(u_pre) + g
            g_out, (g_xhat, g_inv) = _ln_fwd(r, lng_s_ref[l], lng_b_ref[l])
            geo_term = g_out
        else:
            u_pre = dot3(rbf_d, wfg_ref[l]) + bfg_ref[l]
            geo_term = _swish(u_pre) * weight_ref[0][:, :, None]
            g_out = g
            g_xhat = jnp.zeros_like(geo_term)
            g_inv = jnp.zeros((M, N, 1), jnp.float32)
        key = dot3(ns * geo_term, wk_ref[l]) + bk_ref[l]
        query = mm(c, wq_ref[l]) + bq_ref[l]
        prod = jnp.broadcast_to((query * dk_scale).reshape(M, 1, D),
                                (M, N, D)) * key
        energy = dot3(prod, seg_sum)
        energy = energy + (1.0 - nmask)[:, :, None] * (-1e9)
        energy = energy - jnp.max(energy, axis=1, keepdims=True)
        e = jnp.exp(energy)
        attn = e / jnp.sum(e, axis=1, keepdims=True)
        if attn_dropout > 0.0:  # use_drop: dropout on the attention probs
            amask = attn_mask(l)
            attn_used = attn * amask
        else:
            amask = None
            attn_used = attn
        a_lanes = dot3(attn_used, seg_expand)
        ctx = jnp.sum(a_lanes * nmask[:, :, None] * key, axis=1)
        o1, (o_xhat, o_inv) = _ln_fwd(ctx + query, ln_s_ref[l], ln_b_ref[l])
        s1 = mm(o1, wr1_ref[l]) + br1_ref[l]
        h1 = _swish(s1)
        h2 = mm(h1, wr2_ref[l]) + br2_ref[l]
        if dropout_rate > 0.0:
            h2 = h2 * mask_scratch[l]
        c_out, (c_xhat, c_inv) = _ln_fwd(o1 + h2, rln_s_ref[l], rln_b_ref[l])
        acts = (ns, u_pre, geo_term, g_xhat, g_inv, key, query, attn,
                attn_used, amask, o1, o_xhat, o_inv, s1, h1, c_xhat, c_inv)
        return c_out, g_out, acts

    def stash_body(l, carry):
        c, g = carry
        c_stash[l] = c
        if g_update:
            g_stash[l] = g
        c, g, acts = layer_fwd(l, c, g)
        if stash_acts:
            # SELECTIVE ACTIVATION STASH (round 4): keep the tensors whose
            # recomputation dominates the reverse walk — the neighbor
            # gather (ns), the key projection, the attention probabilities
            # (pre-dropout; the softmax chain), u_pre (feeds swish-grad and
            # the geometry LN recompute) and o1 (feeds the FFN recompute).
            # The reverse walk then rebuilds the full acts tuple with only
            # cheap [M, D] matmuls + elementwise/LN-stat recomputes,
            # skipping ~the whole per-layer forward dot budget. Gated by
            # fits_loop_stash — the extra (L, M, N, D)-class scratch is
            # ~57 MB at the MP2018 shape.
            # the three big buffers may be bf16 (loop_stash_mode "bf16"):
            # cast on write, cast back on read — a trace-time no-op when
            # the scratch is f32
            ns_stash[l] = acts[0].astype(ns_stash.dtype)
            u_stash[l] = acts[1].astype(u_stash.dtype)
            key_stash[l] = acts[5].astype(key_stash.dtype)
            attn_stash[l] = acts[7].astype(attn_stash.dtype)
            o1_stash[l] = acts[10]
        return (c, g)

    cL, gL = jax.lax.fori_loop(0, L, stash_body, (centers, geometry))
    c_stash[L] = cL
    if g_update:
        g_stash[L] = gL

    # ---------------- readout forward + backward --------------------------
    # STRUCTURE PACKING (n_segments > 0): every cross-structure reduction
    # becomes pool (per-segment sum via the masked [M, S] one-hot) + rows
    # (broadcast back to member rows); with n_segments == 0 pool is the
    # whole-slot sum and rows the identity ([1, C] broadcasts elementwise),
    # so one code path serves both.
    if n_segments:
        seg = seg_ref[0]                                       # [M, S]
        pool = lambda x: mm_tA(seg, x)
        rows = lambda x: mm(seg, x)
    else:
        pool = lambda x: jnp.sum(x, axis=0, keepdims=True)
        rows = lambda x: x
    s_al = mm(cL, wal_ref[:]) + bal_ref[:]
    cg = _swish(s_al)
    gq = mm(cg, wgq_ref[:]) + bgq_ref[:]
    gk = mm(cg, wgk_ref[:]) + bgk_ref[:]
    mq = am * gq
    mk = am * gk
    qsum = rows(pool(mq))                   # [M or 1, G]
    cross = jnp.sum(mk * qsum, axis=-1, keepdims=True)
    diag = jnp.sum(mk * mq, axis=-1, keepdims=True)
    agg0 = am * (cross - diag)
    if ga_norm:
        nrm = rows(jnp.sqrt(pool(agg0 * agg0)))
        nrm_safe = jnp.where(nrm == 0, jnp.ones_like(nrm), nrm)
        agg = agg0 / nrm_safe
    else:
        agg = agg0
    aggm = agg + (1.0 - am) * (-1e9)
    if n_segments:
        # per-segment max: members see their value, non-members -inf
        segmax = jnp.max(aggm + (seg - 1.0) * 1e9, axis=0, keepdims=True)
        aggm = aggm - mm_tB(seg, segmax)
    else:
        aggm = aggm - jnp.max(aggm, axis=0, keepdims=True)
    e = jnp.exp(aggm) * am
    # guard AFTER the rows-broadcast: padding atoms have an all-zero one-hot
    # row, so their denominator is 0 regardless of the per-segment sum
    den = rows(pool(e))
    ga = e / jnp.where(den == 0, jnp.ones_like(den), den)
    struc = pool(am * ga * gk)              # [S or 1, G]
    s_bf = mm(struc, wbf_ref[:]) + bbf_ref[:]
    sb = _swish(s_bf)

    pred_lin = mm(sb, wp_ref[:]) + bp_ref[:]
    pred = jnp.maximum(pred_lin, 0.0) if mrelu else pred_lin
    pred_out[0] = pred
    if ct_from_target:
        # one-shot train mode: ct_pred_ref carries the TARGET. The RMSE
        # cotangent factorizes as (pred - t) / (n * rmse); the per-structure
        # residual is applied here, the global 1/(n*rmse) scale in the XLA
        # epilogue (mrelu is straight-through — ops/activations.py — so no
        # relu gate on the residual). Packed: empty segments' residuals are
        # zeroed so the caller's masked loss is exact.
        ct_pred = pred - ct_pred_ref[0]
        if n_segments:
            ct_pred = ct_pred * (pool(am) > 0).astype(jnp.float32)
        ct_ga = jnp.zeros((M, 1), jnp.float32)
    else:
        ct_pred = ct_pred_ref[0]
        ct_ga = ct_ga_ref[0]

    d_wp[...] += mm_tA(sb, ct_pred)
    d_bp[...] += jnp.sum(ct_pred, axis=0)
    dsb = mm_tB(ct_pred, wp_ref[:])
    ds_bf = dsb * _swish_grad(s_bf)
    d_wbf[...] += mm_tA(struc, ds_bf)
    d_bbf[...] += jnp.sum(ds_bf, axis=0)
    dstruc = rows(mm_tB(ds_bf, wbf_ref[:]))

    dga = jnp.sum(am * gk * dstruc, axis=-1, keepdims=True) + ct_ga
    dgk = am * ga * dstruc
    dagg = ga * (dga - rows(pool(ga * dga)))
    if ga_norm:
        dagg0 = (dagg / nrm_safe
                 - agg0 * (rows(pool(agg0 * dagg))
                           / (nrm_safe * nrm_safe * nrm_safe)))
    else:
        dagg0 = dagg
    dcd = dagg0 * am
    dmk = dcd * qsum - dcd * mq
    dmq = -dcd * mk
    dmq = dmq + jnp.broadcast_to(rows(pool(dcd * mk)), mq.shape)
    dgq = am * dmq
    dgk = dgk + am * dmk

    d_wgq[...] += mm_tA(cg, dgq)
    d_bgq[...] += jnp.sum(dgq, axis=0)
    d_wgk[...] += mm_tA(cg, dgk)
    d_bgk[...] += jnp.sum(dgk, axis=0)
    dcg = mm_tB(dgq, wgq_ref[:]) + mm_tB(dgk, wgk_ref[:])
    ds_al = dcg * _swish_grad(s_al)
    d_wal[...] += mm_tA(cL, ds_al)
    d_bal[...] += jnp.sum(ds_al, axis=0)
    dc0 = mm_tB(ds_al, wal_ref[:])

    def acts_from_stash(l, c_in, g_in):
        """Rebuild layer_fwd's acts tuple from the selective stash: only
        cheap [M, D] matmuls, elementwise chains, and LN-stat recomputes —
        the gather / wfg / key / energy-softmax dots are all read back."""
        ns = ns_stash[l].astype(jnp.float32)
        u_pre = u_stash[l].astype(jnp.float32)
        key = key_stash[l].astype(jnp.float32)
        attn = attn_stash[l].astype(jnp.float32)
        o1 = o1_stash[l]
        if g_update:
            r = _swish(u_pre) + g_in
            geo_term, (g_xhat, g_inv) = _ln_fwd(r, lng_s_ref[l], lng_b_ref[l])
        else:
            geo_term = _swish(u_pre) * weight_ref[0][:, :, None]
            g_xhat = jnp.zeros_like(geo_term)
            g_inv = jnp.zeros((M, N, 1), jnp.float32)
        query = mm(c_in, wq_ref[l]) + bq_ref[l]
        if attn_dropout > 0.0:
            amask = attn_mask(l)
            attn_used = attn * amask
        else:
            amask = None
            attn_used = attn
        a_lanes = dot3(attn_used, seg_expand)
        ctx = jnp.sum(a_lanes * nmask[:, :, None] * key, axis=1)
        _, (o_xhat, o_inv) = _ln_fwd(ctx + query, ln_s_ref[l], ln_b_ref[l])
        s1 = mm(o1, wr1_ref[l]) + br1_ref[l]
        h1 = _swish(s1)
        h2 = mm(h1, wr2_ref[l]) + br2_ref[l]
        if dropout_rate > 0.0:
            h2 = h2 * mask_scratch[l]
        _, (c_xhat, c_inv) = _ln_fwd(o1 + h2, rln_s_ref[l], rln_b_ref[l])
        return (ns, u_pre, geo_term, g_xhat, g_inv, key, query, attn,
                attn_used, amask, o1, o_xhat, o_inv, s1, h1, c_xhat, c_inv)

    # ---------------- reverse walk over layers ----------------------------
    def rev_body(i, carry):
        dc, dg = carry
        l = L - 1 - i
        c_in = c_stash[l]
        g_in = g_stash[l] if g_update else jnp.zeros((M, N, D), jnp.float32)
        (ns, u_pre, geo_term, g_xhat, g_inv, key, query, attn,
         attn_used, amask, o1, o_xhat, o_inv, s1, h1, c_xhat,
         c_inv) = (acts_from_stash(l, c_in, g_in) if stash_acts
                   else layer_fwd(l, c_in, g_in)[2])

        dsum, dgam, dbet = _ln_bwd(dc, c_xhat, c_inv, rln_s_ref[l])
        d_rln_s[l] = d_rln_s[l] + jnp.sum(dgam, axis=0)
        d_rln_b[l] = d_rln_b[l] + jnp.sum(dbet, axis=0)
        dh2 = dsum * mask_scratch[l] if dropout_rate > 0.0 else dsum
        d_wr2[l] = d_wr2[l] + mm_tA(h1, dh2)
        d_br2[l] = d_br2[l] + jnp.sum(dh2, axis=0)
        dh1 = mm_tB(dh2, wr2_ref[l])
        ds1 = dh1 * _swish_grad(s1)
        d_wr1[l] = d_wr1[l] + mm_tA(o1, ds1)
        d_br1[l] = d_br1[l] + jnp.sum(ds1, axis=0)
        do1 = dsum + mm_tB(ds1, wr1_ref[l])

        dcq, dgam, dbet = _ln_bwd(do1, o_xhat, o_inv, ln_s_ref[l])
        d_ln_s[l] = d_ln_s[l] + jnp.sum(dgam, axis=0)
        d_ln_b[l] = d_ln_b[l] + jnp.sum(dbet, axis=0)
        dctx = dcq
        dquery = dcq

        # ctx path uses the POST-dropout attention; the softmax backward
        # runs on the PRE-dropout attention with dattn gated by the mask
        dctx3 = jnp.broadcast_to(dctx.reshape(M, 1, D), (M, N, D))
        a_lanes = dot3(attn_used, seg_expand)
        nm3 = nmask[:, :, None]
        dal3 = dctx3 * nm3 * key
        dkey = dctx3 * a_lanes * nm3
        dattn = dot3(dal3, seg_sum)
        if attn_dropout > 0.0:
            dattn = dattn * amask
        de = attn * (dattn - jnp.sum(attn * dattn, axis=1, keepdims=True))
        dprod = dot3(de, seg_expand)
        qs = jnp.broadcast_to((query * dk_scale).reshape(M, 1, D), (M, N, D))
        dkey = dkey + dprod * qs
        dquery = dquery + jnp.sum(dprod * key, axis=1) * dk_scale

        kin = ns * geo_term
        d_wk[l] = d_wk[l] + mm3_tA(kin, dkey)
        d_bk[l] = d_bk[l] + jnp.sum(jnp.sum(dkey, axis=0), axis=0)
        dkin = dot3_tB(dkey, wk_ref[l])
        dns = dkin * geo_term
        dgeo_term = dkin * ns

        d_wq[l] = d_wq[l] + mm_tA(c_in, dquery)
        d_bq[l] = d_bq[l] + jnp.sum(dquery, axis=0)
        dc_new = mm_tB(dquery, wq_ref[l])

        if g_update:
            dgout = dgeo_term + dg
            dr, dgam3, dbet3 = _ln_bwd(dgout, g_xhat, g_inv, lng_s_ref[l])
            d_lng_s[l] = d_lng_s[l] + jnp.sum(jnp.sum(dgam3, axis=0), axis=0)
            d_lng_b[l] = d_lng_b[l] + jnp.sum(jnp.sum(dbet3, axis=0), axis=0)
            du_pre = dr * _swish_grad(u_pre)
            dg_new = dr
            wfg = wfg_ref[l]
            dcw = jnp.sum(du_pre, axis=1)
            # one dynamic accumulate for the whole [3D, D] stacked kernel
            d_wfg[l] = d_wfg[l] + jnp.concatenate(
                [mm_tA(c_in, dcw), mm3_tA(g_in, du_pre),
                 mm3_tA(ns, du_pre)], axis=0)
            d_bfg[l] = d_bfg[l] + jnp.sum(jnp.sum(du_pre, axis=0), axis=0)
            dc_new = dc_new + mm_tB(dcw, wfg[0:D, :])
            dg_new = dg_new + dot3_tB(du_pre, wfg[D:2 * D, :])
            dns = dns + dot3_tB(du_pre, wfg[2 * D:3 * D, :])
            dg = dg_new
        else:
            du = dgeo_term * weight_ref[0][:, :, None]
            du_pre = du * _swish_grad(u_pre)
            d_wfg[l] = d_wfg[l] + mm3_tA(rbf_d, du_pre)
            d_bfg[l] = d_bfg[l] + jnp.sum(jnp.sum(du_pre, axis=0), axis=0)

        dc_new = dc_new + mm_tA(n_oh.reshape(M * N, M), dns.reshape(M * N, D))
        return (dc_new, dg)

    dc, dg = jax.lax.fori_loop(
        0, L, rev_body, (dc0, jnp.zeros((M, N, D), jnp.float32)))

    # embedding backward
    if dropout_rate > 0.0:
        dc = dc * embed_mask
    ds_de = dc * _swish_grad(s_de)
    if use_ring:
        # dense_embed's kernel rows split between the atom embedding (0:E)
        # and the ring embedding (E:E+10) — mirror the forward's partial
        # matmuls
        d_wde[...] += jnp.concatenate(
            [mm_tA(emb, ds_de), mm_tA(ring_emb, ds_de)], axis=0)
        d_bde[...] += jnp.sum(ds_de, axis=0)
        demb = mm_tB(ds_de, wde_ref[0:E, :])
        dring_emb = mm_tB(ds_de, wde_ref[E:E + 10, :])
        d_wring[...] += mm_tA(ring_rows, dring_emb)
        d_bring[...] += jnp.sum(dring_emb, axis=0)
    else:
        d_wde[...] += mm_tA(emb, ds_de)
        d_bde[...] += jnp.sum(ds_de, axis=0)
        demb = mm_tB(ds_de, wde_ref[:])
    if cgcnn:
        d_embed[...] += mm_tA(feat, demb)
        d_bembed[...] += jnp.sum(demb, axis=0)
    else:
        d_embed[...] += mm_tA(z_oh, demb)

    if g_update:
        dd_emb = dg * w_emb_v
        dw_emb = dg * d_emb_v
        ds_nd = dd_emb * _swish_grad(s_nd)
        ds_nw = dw_emb * _swish_grad(s_nw)
        d_wnd[...] += mm3_tA(rbf_d, ds_nd)
        d_bnd[...] += jnp.sum(jnp.sum(ds_nd, axis=0), axis=0)
        d_wnw[...] += mm3_tA(rbf_w, ds_nw)
        d_bnw[...] += jnp.sum(jnp.sum(ds_nw, axis=0), axis=0)


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _assemble(params, cfm: ModelConfig):
    params = params.get("params", params)
    L, D = cfm.n_attention, cfm.local_dim
    sp = stack_layer_params(params, L, cfm.g_update)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    if cfm.g_update:
        wnd, bnd = params["neighbor_d"]["kernel"], params["neighbor_d"]["bias"]
        wnw, bnw = params["neighbor_w"]["kernel"], params["neighbor_w"]["bias"]
    else:
        K = cfm.num_gaussian
        wnd = jnp.zeros((K, D), jnp.float32)
        bnd = jnp.zeros((D,), jnp.float32)
        wnw, bnw = wnd, bnd
    if cfm.feature == "cgcnn":
        w_embed = f32(params["embed_atom"]["kernel"])      # [92, E]
        b_embed = f32(params["embed_atom"]["bias"])
    else:
        w_embed = f32(params["embed_atom"]["embedding"])   # [vocab, E]
        b_embed = jnp.zeros((w_embed.shape[1],), jnp.float32)
    return [
        w_embed, b_embed,
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
        f32(params["predict_property"]["kernel"]),
        f32(params["predict_property"]["bias"]),
        # ring/aromatic extra embedding (zeros when use_ring is off; kept
        # positional so every kernel signature is static)
        (f32(params["extra_embed"]["kernel"]) if cfm.use_ring
         else jnp.zeros((2, 10), jnp.float32)),
        (f32(params["extra_embed"]["bias"]) if cfm.use_ring
         else jnp.zeros((10,), jnp.float32)),
    ]


N_BATCH_OPERANDS = 8


def _batch_operands(inputs, cgcnn=False,
                    f32=lambda x: jnp.asarray(x, jnp.float32)):
    B, M = inputs["atomic"].shape[:2]
    ring = inputs.get("ring_aromatic")
    seg = inputs.get("segment_onehot")
    return [
        # feature="cgcnn": [B, M, 92] one-hot descriptors (already rank 3);
        # feature="atomic": [B, M] numbers with a trailing singleton
        (f32(inputs["atomic"]) if cgcnn
         else jnp.asarray(inputs["atomic"], jnp.int32)[..., None]),
        f32(inputs["atom_mask"]),
        jnp.asarray(inputs["neighbors"], jnp.int32),
        f32(inputs["neighbor_mask"]),
        f32(inputs["neighbor_weight"]),
        f32(inputs["neighbor_distance"]),
        f32(ring) if ring is not None else jnp.zeros((B, M, 2), jnp.float32),
        # structure packing: masked [B, M, S] segment one-hot (dummy [B,M,1]
        # when unpacked — the kernels ignore it at n_segments == 0)
        f32(seg) if seg is not None else jnp.zeros((B, M, 1), jnp.float32),
    ]


def _n_segments(inputs) -> int:
    seg = inputs.get("segment_onehot")
    return 0 if seg is None else int(seg.shape[-1])


def _specs(operands, n_batched, bt: int = 1):
    def spec_for(x, batched):
        if batched:
            blk = (bt,) + x.shape[1:]
            idx_map = lambda bb, nd=x.ndim: (bb,) + (0,) * (nd - 1)
        else:
            blk = x.shape
            idx_map = lambda bb, nd=x.ndim: (0,) * nd
        return pl.BlockSpec(blk, idx_map, memory_space=pltpu.VMEM)

    return [spec_for(x, i < n_batched) for i, x in enumerate(operands)]


def pick_loop_fwd_tile(cfm: ModelConfig, B: int, M: int, N: int,
                       budget_bytes: int = VMEM_BUDGET_BYTES) -> int:
    """Molecules per program for the loop FORWARD. MEASURED round 3 on v5e
    at the MP2018 eval shape (M=96, N=32, 9L, B=64): BT=1 8.20 ms,
    BT=2 8.53 ms, BT=4 9.33 ms — tiling LOSES. At crystal M the main dots
    already have M*pad8(N) >= ~2-3k rows per program, so per-program
    overhead is negligible and larger tiles only dilute VMEM locality.
    Default is therefore 1; ``loop_scann_forward(batch_tile=...)`` remains
    for explicit experiments (parity-tested at BT=2). The training paths
    always run BT=1 (per-molecule dropout PRNG streams + backward stashes)."""
    return 1


def _seed_operand(dropout_seed):
    if dropout_seed is None:
        return jnp.zeros((1, 1), jnp.int32)
    return jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)


def loop_scann_forward(params, inputs, cfm: ModelConfig,
                       mrelu_head: bool = False, interpret: bool = False,
                       dropout_rate: float = 0.0, dropout_seed=None,
                       batch_tile: int = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crystal-scale fused forward (fori_loop over layers). ``batch_tile``
    molecules per program (auto-picked by VMEM budget when None; forced to 1
    when dropout is on — the per-molecule PRNG streams require it).
    Returns (property [B, 1], ga_score [B, M, 1])."""
    assert supports_loop(cfm), "config not supported by the loop kernels"
    B, M = inputs["atomic"].shape[:2]
    N = inputs["neighbors"].shape[2]
    L, D = cfm.n_attention, cfm.local_dim
    S = _n_segments(inputs)
    if dropout_rate > 0.0 or S:
        BT = 1  # per-molecule PRNG streams / one packed slot per program
    else:
        BT = (batch_tile if batch_tile is not None
              else pick_loop_fwd_tile(cfm, B, M, N))
    if B % BT:
        raise ValueError(f"batch {B} not divisible by batch_tile {BT}")

    dist_centers = jnp.asarray(make_centers(cfm.gaussian_d, cfm.num_gaussian))[None]
    angle_centers = jnp.asarray(make_centers(2 * np.pi, cfm.num_gaussian))[None]
    operands = (_batch_operands(inputs, cgcnn=(cfm.feature == "cgcnn"))
                + [_seed_operand(dropout_seed)]
                + _assemble(params, cfm) + [dist_centers, angle_centers])

    out, ga = pl.pallas_call(
        functools.partial(
            _fwd_kernel, n_layers=L, num_head=cfm.num_head, scale=cfm.scale,
            g_update=cfm.g_update, ga_norm=cfm.use_ga_norm, mrelu=mrelu_head,
            rbf_width=0.25, dropout_rate=dropout_rate,
            attn_dropout=attn_dropout_rate(cfm, dropout_rate),
            use_ring=cfm.use_ring, cgcnn=(cfm.feature == "cgcnn"),
            bf16=(cfm.dtype == "bfloat16"), n_segments=S),
        grid=(B // BT,),
        in_specs=_specs(operands, N_BATCH_OPERANDS, bt=BT),
        out_specs=[
            pl.BlockSpec((BT, max(S, 1), 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, M, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, max(S, 1), 1), jnp.float32),
            jax.ShapeDtypeStruct((B, M, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((max(L, 1), M, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES + (16 << 20)),
        interpret=interpret,
    )(*operands)
    return out[:, :, 0], ga


def _grad_impl(params, inputs, cfm: ModelConfig, ct_pred, ct_ga,
               interpret: bool, dropout_rate: float, dropout_seed,
               ct_from_target: bool, mrelu: bool):
    """Shared body of the loop backward: returns (grads dict, pred [B, 1]).

    When ``ct_from_target`` the ``ct_pred`` operand carries per-structure
    TARGETS and the kernel forms the RMSE residual (pred - t) itself — the
    one-kernel-per-step training path (the 1/(B*rmse) scale and the l2 term
    are applied by the caller in XLA)."""
    assert supports_loop(cfm)
    params = params.get("params", params)
    B, M = inputs["atomic"].shape[:2]
    N = inputs["neighbors"].shape[2]
    L, D = cfm.n_attention, cfm.local_dim
    S = _n_segments(inputs)
    f32 = lambda x: jnp.asarray(x, jnp.float32)

    dist_centers = jnp.asarray(make_centers(cfm.gaussian_d, cfm.num_gaussian))[None]
    angle_centers = jnp.asarray(make_centers(2 * np.pi, cfm.num_gaussian))[None]
    param_operands = _assemble(params, cfm)
    operands = (_batch_operands(inputs, cgcnn=(cfm.feature == "cgcnn"))
                + [f32(ct_pred)[..., None], f32(ct_ga), _seed_operand(dropout_seed)]
                + param_operands + [dist_centers, angle_centers])

    out_specs = _specs(param_operands, 0) + [
        pl.BlockSpec((1, max(S, 1), 1), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM)]
    out_shape = ([jax.ShapeDtypeStruct(x.shape, jnp.float32)
                  for x in param_operands]
                 + [jax.ShapeDtypeStruct((B, max(S, 1), 1), jnp.float32)])

    g_shape = (L + 1, M, N, D) if cfm.g_update else (1, 1, 1, 1)
    # selective activation stash when it fits VMEM (see loop_stash_mode;
    # "bf16" is the opt-in half-VMEM variant for deep/large shapes);
    # SCANN_TPU_LOOP_STASH=0 is the kill-switch for A/B and emergencies
    stash_mode = loop_stash_mode(cfm, M, N)
    stash_acts = stash_mode is not None
    big_dtype = jnp.bfloat16 if stash_mode == "bf16" else jnp.float32
    a_shape = lambda shp: shp if stash_acts else (1, 1, 1, 1)
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, n_layers=L, num_head=cfm.num_head, scale=cfm.scale,
            g_update=cfm.g_update, ga_norm=cfm.use_ga_norm, rbf_width=0.25,
            dropout_rate=dropout_rate,
            attn_dropout=attn_dropout_rate(cfm, dropout_rate),
            use_ring=cfm.use_ring,
            cgcnn=(cfm.feature == "cgcnn"),
            bf16=(cfm.dtype == "bfloat16"),
            ct_from_target=ct_from_target, mrelu=mrelu, n_segments=S,
            stash_acts=stash_acts),
        grid=(B,),
        in_specs=_specs(operands, N_BATCH_OPERANDS + 2),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((L + 1, M, D), jnp.float32),    # c_stash
            pltpu.VMEM(g_shape, jnp.float32),          # g_stash
            pltpu.VMEM((max(L, 1), M, D), jnp.float32),  # dropout masks
            pltpu.VMEM(a_shape((L, M, N, D)), big_dtype),    # ns_stash
            pltpu.VMEM(a_shape((L, M, N, D)), big_dtype),    # key_stash
            pltpu.VMEM(a_shape((L, M, N, cfm.num_head)),
                       big_dtype),                           # attn_stash
            pltpu.VMEM(a_shape((L, M, N, D)), big_dtype),    # u_stash
            pltpu.VMEM(a_shape((L, M, D))
                       if stash_acts else (1, 1, 1), jnp.float32),  # o1
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES + (16 << 20)),
        interpret=interpret,
    )(*operands)
    grads_flat, pred = outs[:-1], outs[-1][:, :, 0]
    return _grads_dict(grads_flat, cfm, L), pred


def loop_scann_grad(params, inputs, cfm: ModelConfig, ct_pred, ct_ga,
                    interpret: bool = False, dropout_rate: float = 0.0,
                    dropout_seed=None) -> dict:
    """Parameter gradients via the loop backward kernel."""
    grads, _ = _grad_impl(params, inputs, cfm, ct_pred, ct_ga, interpret,
                          dropout_rate, dropout_seed,
                          ct_from_target=False, mrelu=False)
    return grads


def loop_scann_train_grads(params, inputs, targets, cfm: ModelConfig,
                           mrelu_head: bool = False, interpret: bool = False,
                           dropout_rate: float = 0.0, dropout_seed=None):
    """One-kernel-per-step training: forward + RMSE residual + backward in a
    single launch. Returns (pred [B, 1], raw grads dict).

    ``raw`` are gradients of 0.5 * sum((pred - t)^2); the caller turns them
    into RMSE + l2 gradients with ``raw / (B * rmse) + d l2`` — see
    Trainer._make_steps. Eliminates the separate forward launch the
    custom-vjp path needs (the bwd kernel recomputes the forward anyway),
    measured ~27%% of crystal-shape step time."""
    B, M = inputs["atomic"].shape[:2]
    # packed slots: targets are [B, SEG] (one per segment); otherwise [B, 1]
    targets = jnp.asarray(targets, jnp.float32).reshape(B, -1)
    ct_ga = jnp.zeros((B, M, 1), jnp.float32)
    grads, pred = _grad_impl(params, inputs, cfm, targets, ct_ga, interpret,
                             dropout_rate, dropout_seed,
                             ct_from_target=True, mrelu=mrelu_head)
    return pred, grads


def _grads_dict(grads_flat, cfm: ModelConfig, L: int) -> dict:
    (g_embed, g_bembed, g_wde, g_bde, g_wnd, g_bnd, g_wnw, g_bnw,
     g_wfg, g_bfg, g_wk, g_bk, g_wq, g_bq,
     g_ln_s, g_ln_b, g_lng_s, g_lng_b,
     g_wr1, g_br1, g_wr2, g_br2, g_rln_s, g_rln_b,
     g_wal, g_bal, g_wgq, g_bgq, g_wgk, g_bgk,
     g_wbf, g_bbf, g_wp, g_bp, g_wring, g_bring) = grads_flat

    out = {
        "embed_atom": ({"kernel": g_embed, "bias": g_bembed}
                       if cfm.feature == "cgcnn" else {"embedding": g_embed}),
        "dense_embed": {"kernel": g_wde, "bias": g_bde},
        "after_Lc": {"kernel": g_wal, "bias": g_bal},
        "global_attention": {
            "query": {"kernel": g_wgq, "bias": g_bgq},
            "key": {"kernel": g_wgk, "bias": g_bgk},
        },
        "bf_property": {"kernel": g_wbf, "bias": g_bbf},
        "predict_property": {"kernel": g_wp, "bias": g_bp},
    }
    if cfm.g_update:
        out["neighbor_d"] = {"kernel": g_wnd, "bias": g_bnd}
        out["neighbor_w"] = {"kernel": g_wnw, "bias": g_bnw}
    if cfm.use_ring:
        out["extra_embed"] = {"kernel": g_wring, "bias": g_bring}
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
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def loop_scann_apply(params, inputs, cfm: ModelConfig,
                     mrelu_head: bool = False, interpret: bool = False,
                     dropout_rate: float = 0.0, dropout_seed=None):
    """Differentiable crystal-scale fused forward (loop kernels)."""
    return loop_scann_forward(params, inputs, cfm, mrelu_head=mrelu_head,
                              interpret=interpret, dropout_rate=dropout_rate,
                              dropout_seed=dropout_seed)


def _la_fwd(params, inputs, cfm, mrelu_head, interpret, dropout_rate,
            dropout_seed):
    out = loop_scann_apply(params, inputs, cfm, mrelu_head, interpret,
                           dropout_rate, dropout_seed)
    return out, (params, inputs, dropout_seed)


def _la_bwd(cfm, mrelu_head, interpret, dropout_rate, res, cts):
    params, inputs, dropout_seed = res
    ct_pred, ct_ga = cts
    dparams = loop_scann_grad(params, inputs, cfm, ct_pred, ct_ga,
                              interpret=interpret, dropout_rate=dropout_rate,
                              dropout_seed=dropout_seed)
    if isinstance(params, dict) and "params" in params:
        dparams = {"params": dparams}
    dinputs = jax.tree.map(jnp.zeros_like,
                           {k: jnp.asarray(v) for k, v in inputs.items()})
    dseed = None if dropout_seed is None else jnp.zeros_like(
        jnp.asarray(dropout_seed))
    return dparams, dinputs, dseed


loop_scann_apply.defvjp(_la_fwd, _la_bwd)


def _loop_batch_keys(cfm: ModelConfig, inputs=None):
    keys = ("atomic", "atom_mask", "neighbors", "neighbor_mask",
            "neighbor_weight", "neighbor_distance")
    if cfm.use_ring:
        keys = keys + ("ring_aromatic",)
    if inputs is not None and "segment_onehot" in inputs:
        keys = keys + ("segment_onehot",)  # packed batches (data/packing.py)
    return keys


def make_sharded_loop_forward(mesh, cfm: ModelConfig, mrelu_head: bool = False,
                              interpret: bool = False):
    """Data-parallel EVAL wrapper for the loop forward: params replicated,
    batch sharded over 'data'. Round-2 VERDICT #3b: multi-chip eval at
    crystal scale previously fell back to XLA because Pallas kernels can't
    be auto-partitioned by GSPMD; this shard_map wrapper runs the fused
    forward per shard instead."""
    from jax.sharding import PartitionSpec as P

    from scann_tpu.kernels.shard_util import lazy_sharded

    def fn(params, inputs):
        return loop_scann_forward(params, inputs, cfm, mrelu_head=mrelu_head,
                                  interpret=interpret)

    get_sharded = lazy_sharded(fn, mesh, out_specs=(P("data"), P("data")))

    def wrapper(params, inputs):
        batch_keys = _loop_batch_keys(cfm, inputs)
        extra = set(inputs) - set(batch_keys) - {"segment_mask"}
        if extra:
            raise ValueError(f"unsupported inputs for the loop kernels: {extra}")
        return get_sharded(batch_keys)(
            params, {k: inputs[k] for k in batch_keys})

    return wrapper


def make_sharded_loop_train(mesh, cfm: ModelConfig, mrelu_head: bool = False,
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
        pred, raw = loop_scann_train_grads(params, inputs, targets, cfm,
                                           mrelu_head, interpret,
                                           dropout_rate, shard_seed)
        return pred, jax.lax.psum(raw, "data")

    get_sharded = lazy_sharded(fn, mesh, extra_in_specs=(P("data"), P()))

    def wrapper(params, inputs, targets, seed):
        batch_keys = _loop_batch_keys(cfm, inputs)
        extra = set(inputs) - set(batch_keys) - {"segment_mask"}
        if extra:
            raise ValueError(f"unsupported inputs for the loop kernels: {extra}")
        targets = jnp.asarray(targets, jnp.float32)
        targets = targets.reshape(targets.shape[0], -1)
        return get_sharded(batch_keys)(
            params, {k: inputs[k] for k in batch_keys}, targets, seed)

    return wrapper


def make_sharded_loop_apply(mesh, cfm: ModelConfig, mrelu_head: bool = False,
                            interpret: bool = False,
                            dropout_rate: float = 0.0):
    """Data-parallel wrapper for the loop kernels: params replicated, batch
    sharded over 'data', gradient psum over ICI — same layout as the
    unrolled kernels' ``make_sharded_scann_apply``. The dropout seed is
    offset by shard_index * local_batch so per-molecule PRNG streams never
    collide across shards."""
    from jax.sharding import PartitionSpec as P

    from scann_tpu.kernels.shard_util import lazy_sharded

    def fn(params, inputs, seed):
        ax = jax.lax.axis_index("data")
        b_local = inputs["atomic"].shape[0]
        shard_seed = (None if seed is None
                      else seed + ax.astype(jnp.int32) * b_local)
        return loop_scann_apply(params, inputs, cfm, mrelu_head, interpret,
                                dropout_rate, shard_seed)

    get_sharded = lazy_sharded(fn, mesh, extra_in_specs=(P(),),
                               out_specs=(P("data"), P("data")))

    def wrapper(params, inputs, seed):
        batch_keys = _loop_batch_keys(cfm, inputs)
        extra = set(inputs) - set(batch_keys) - {"segment_mask"}
        if extra:
            raise ValueError(f"unsupported inputs for the loop kernels: {extra}")
        return get_sharded(batch_keys)(
            params, {k: inputs[k] for k in batch_keys}, seed)

    return wrapper
