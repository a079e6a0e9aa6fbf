"""Whole-model fused Pallas forward: the entire SCANN graph in ONE kernel.

The SCANN model is launch-latency-bound: its tensors are tiny (M<=64 atoms,
D=128) but the unfused graph is hundreds of XLA ops. This kernel runs the
full forward — atom embedding, Gaussian RBF geometry, all n_attention
LocalAttention(+ResidualNorm) layers, the GlobalAttention readout and the
property head (reference graph at ``scann_model.py:329-453``) — inside a
single Pallas program per batch row, with every intermediate in VMEM:

- atom embedding and neighbor gather are one-hot matmuls on the MXU,
- per-layer parameters are stacked [L, ...] and sliced inside the kernel
  (static python loop over layers -> fully unrolled),
- per-head attention reductions are 0/1 segment matmuls (no lane reshapes),
- the GA readout uses the O(M D) diagonal-excluded row-sum identity
  (see ``ops/attention.py``).

Supported config subset (the flagship paths): feature="atomic",
use_attn_norm=True, optional g_update / use_ga_norm / mrelu head / use_drop
(in-kernel PRNG dropout for training), no ring features. Unsupported configs
fall back to the flax model automatically (see ``supports_config``).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scann_tpu.config import ModelConfig, attn_dropout_rate
from scann_tpu.kernels.dots import dot_fns, mm_hi, mm_tA_hi
from scann_tpu.ops.activations import swish
from scann_tpu.ops.rbf import make_centers


def _ln(x, gamma, beta, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def supports_config(cfm: ModelConfig) -> bool:
    # atomic + cgcnn features, ring concat, dropout, mrelu head, both model
    # variants are all fused; only use_attn_norm=False (no ResidualNorm
    # between layers — unpublished configuration) falls back to XLA
    return cfm.use_attn_norm


# Mosaic's scoped-VMEM stack limit observed in compile errors on v5e is
# ~121 MB ("limit 120.97M"); the budget below is what our calibrated
# working-set model may fill. The model was fitted against on-device
# compile outcomes (see tools/tpu_checks.py history):
#   qm9   L=7 D=128 M=32 N=16: bwd BT=8 OK, fwd BT=32 OK
#   small L=3 D=64  M=32 N=16: bwd BT=16 OOM ("size 127.41M")
# and tile/lane padding matters: VMEM stores pad the last dim to 128 lanes
# and the second-to-last to 8 sublanes (f32), so [R, N, H=8] tensors cost
# 16x their logical bytes.
VMEM_BUDGET_BYTES = 120 * 1024 * 1024


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _param_bytes(cfm: ModelConfig) -> int:
    """Static (non-batched) VMEM cost: all stacked layer params, resident for
    the whole grid (constant index_map -> fetched once)."""
    D, L = cfm.local_dim, cfm.n_attention
    per_layer = 3 * D * D + 4 * D * D  # wfg + (wk, wq, wr1, wr2)
    head = cfm.n_atoms * cfm.embedding_dim + 3 * D * D + 2 * D * cfm.dense_out
    return (L * per_layer + head) * 4


def _rnd_bytes(cfm: ModelConfig, M: int, N: int) -> int:
    """Padded bytes of one [M, N, D]-class tensor (the unit everything else
    is counted in; [M, N, H] and [M, N, 20] tensors pad to the same size)."""
    return M * _pad8(N) * _pad128(cfm.local_dim) * 4


def _onehot_bytes(cfm: ModelConfig, M: int, N: int) -> int:
    return M * _pad8(N) * _pad128(M) * 4


def _keep_acts_enabled() -> bool:
    return os.environ.get("SCANN_TPU_UNROLL_STASH", "1") != "0"


def _stash_bf16_enabled() -> bool:
    """Experiment knob: bf16 keep-acts stash (scann_backward.py)."""
    return os.environ.get("SCANN_TPU_STASH_BF16", "0") == "1"


def _bwd_mol_bytes(cfm: ModelConfig, M: int, N: int,
                   keep_acts: bool = None) -> int:
    """Per-molecule VMEM working set of the fused BACKWARD: layer-input
    stashes + recomputed activations + reverse-mode temporaries. The
    ``6L + 12`` coefficient is calibrated against on-device compiles (the
    Mosaic stack allocator only partially reuses across the unrolled layer
    walk); it intentionally admits the largest probed-OK tiles.

    ``keep_acts`` (default: the SCANN_TPU_UNROLL_STASH env setting) adds
    the keep-acts schedule's extra value lifetimes: the per-layer acts
    dict keeps ~8 [M,N,*]-class tensors alive across the whole reverse
    walk (ns, u_pre, geo_term, g_xhat, g_inv, key, attn, attn_used —
    ``scann_backward.py`` layer_fwd) that the recompute schedule frees
    (round-4 advisor finding: the stale recompute-only estimate could
    pass a keep-acts shape straight past the probe gate into a Mosaic
    compile failure with no fallback). Tile *picks* intentionally stay on
    the calibrated recompute coefficient (see ``pick_backward_tile``) so
    probed-OK tiles keep their measured performance; this term widens the
    feasibility gate (``fits_vmem``) and the probe net (``resolve_tile``)."""
    if keep_acts is None:
        keep_acts = _keep_acts_enabled()
    L = cfm.n_attention
    # keep-acts extra: ~8 [M,N,*]-class acts per layer; the bf16-stash
    # experiment halves the 5 big [R,N,D] ones -> 3 + 5/2 = 5.5
    extra = (5.5 if _stash_bf16_enabled() else 8.0) if keep_acts else 0.0
    coeff = (6 + extra) * L + 12
    return int(coeff * _rnd_bytes(cfm, M, N)) + _onehot_bytes(cfm, M, N)


def _fwd_mol_bytes(cfm: ModelConfig, M: int, N: int) -> int:
    """Per-molecule VMEM working set of the fused FORWARD (no stashes, no
    reverse temporaries — much leaner; ``L + 6`` calibrated like above)."""
    L = cfm.n_attention
    return (L + 6) * _rnd_bytes(cfm, M, N) + _onehot_bytes(cfm, M, N)


MAX_FUSED_ATOMS = 64


def fits_vmem(cfm: ModelConfig, M: int, N: int,
              budget_bytes: int = VMEM_BUDGET_BYTES,
              training: bool = True) -> bool:
    """Feasibility of the fused kernels at bucket (M, N): per-program VMEM
    (batch_tile=1; training gates on the backward — its stash working set
    dominates the forward's; ``training=False`` gates on the forward only,
    so eval/serving shapes whose backward would overflow still get the
    fused forward instead of the much slower XLA fallback) AND compile
    cost.

    The compile-cost gate (``M <= MAX_FUSED_ATOMS``): the kernels unroll all
    layers over [M*N, D]-sized straight-line code, and Mosaic compile time
    grows superlinearly with it — an M=96/L=9 backward was measured at >25
    minutes of compile on v5e, vs ~1 minute for the XLA path at that shape
    (where tensors are big enough that per-op overhead no longer dominates).
    Callers fall back to the XLA path beyond either limit — resolved
    statically per bucket shape at trace time.
    """
    if M > MAX_FUSED_ATOMS:
        return False
    if not training:
        return _fwd_mol_bytes(cfm, M, N) + _param_bytes(cfm) < budget_bytes
    # grads double the param cost (accumulator blocks live in VMEM).
    # keep-acts aware: a shape whose keep-acts working set overflows VMEM
    # even at batch_tile=1 falls back to the XLA path here instead of
    # failing at Mosaic compile time with no fallback
    return _bwd_mol_bytes(cfm, M, N) + 2 * _param_bytes(cfm) < budget_bytes


def _dot_fns(bf16: bool):
    """(mm, mm_tA, dot3) — the contraction shapes this kernel uses, from the
    shared ``kernels/dots.py`` factory (single casting policy across all
    three kernel families); mm_tA drives the segment-pooling one-hot dots
    of the packed readout."""
    fns = dot_fns(bf16)
    return fns[0], fns[1], fns[3]


def make_dropout_masks(seed, mol_base, bt, m, d, n_layers, rate,
                       n: int = 0, h: int = 0, attn_rate: float = 0.0):
    """Draw the embed mask + per-layer residual masks (+ optional per-layer
    attention masks, reference use_drop: Dropout(0.05) on the attention
    probabilities, attention.py:115-116,191-192) for ``bt`` molecules.

    The PRNG is seeded PER MOLECULE with (seed + global molecule index) and
    each molecule's masks are drawn from its own stream in a fixed order
    (embed, n_layers residual, n_layers attention). Masks therefore depend
    only on a molecule's global index — NOT on the batch tiling — so the
    forward and backward kernels may each run at whatever batch_tile suits
    them and still see identical masks, with no mask storage.

    Returns (embed_mask [bt*m, d], [L x [bt*m, d]], [L x [bt*m, n, h]]),
    each already scaled by 1/keep_prob.
    """
    def draw(shp, keep_prob):
        threshold = jnp.uint32(int(keep_prob * (2 ** 32 - 1)))
        bits = pltpu.prng_random_bits(shp)
        return ((pltpu.bitcast(bits, jnp.uint32) < threshold)
                .astype(jnp.float32) * jnp.float32(1.0 / keep_prob))

    embeds = []
    layers = [[] for _ in range(n_layers)]
    attns = [[] for _ in range(n_layers)]
    for t in range(bt):
        pltpu.prng_seed(seed + mol_base + t)
        embeds.append(draw((m, d), 1.0 - rate))
        for l in range(n_layers):
            layers[l].append(draw((m, d), 1.0 - rate))
        if attn_rate > 0.0:
            for l in range(n_layers):
                attns[l].append(draw((m, n, h), 1.0 - attn_rate))

    cat = lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=0)
    embed_mask = cat(embeds)
    layer_masks = [cat(layers[l]) for l in range(n_layers)]
    attn_masks = ([cat(attns[l]) for l in range(n_layers)]
                  if attn_rate > 0.0 else [])
    return embed_mask, layer_masks, attn_masks


def _kernel(
    atomic_ref, atom_mask_ref, idx_ref, nmask_ref, weight_ref, dist_ref,
    ring_ref, seg_ref, seed_ref,
    embed_ref, bembed_ref, wring_ref, bring_ref, wde_ref, bde_ref,
    wnd_ref, bnd_ref, wnw_ref, bnw_ref,          # g_update geometry embeds
    wfg_ref, bfg_ref, wk_ref, bk_ref, wq_ref, bq_ref,
    ln_s_ref, ln_b_ref, lng_s_ref, lng_b_ref,
    wr1_ref, br1_ref, wr2_ref, br2_ref, rln_s_ref, rln_b_ref,
    wal_ref, bal_ref,                             # after_Lc
    wgq_ref, bgq_ref, wgk_ref, bgk_ref,           # global attention
    wbf_ref, bbf_ref, wp_ref, bp_ref,             # property head
    dist_centers_ref, angle_centers_ref,
    out_ref, ga_ref,
    *, n_layers: int, num_head: int, scale: float, g_update: bool,
    ga_norm: bool, mrelu: bool, rbf_width: float, dropout_rate: float = 0.0,
    attn_dropout: float = 0.0, use_ring: bool = False, cgcnn: bool = False,
    bf16: bool = False, n_segments: int = 0,
):
    # shadow: every dot below follows the mode
    _mm, _mm_tA_f, _dot3 = _dot_fns(bf16)
    BT = atomic_ref.shape[0]                                   # molecules/program
    M = atomic_ref.shape[1]
    N = idx_ref.shape[2]
    R = BT * M                                                 # total atom rows
    vocab = embed_ref.shape[0]
    E = embed_ref.shape[1]
    D = wk_ref.shape[2]
    H = num_head
    hd = D // H

    # batch-tiled layout: molecules are concatenated along the row axis; all
    # row-wise ops (projections, LayerNorm, per-atom softmax over N) are
    # molecule-oblivious; only the neighbor gather (per-molecule index space)
    # and the GA readout (reductions over each molecule's atoms, via
    # [R, .] <-> [BT, M, .] reshapes) know about BT.
    am = atom_mask_ref[...].reshape(R, 1)
    nmask = nmask_ref[...].reshape(R, N)

    # --- atom embedding --------------------------------------------------
    if dropout_rate > 0.0 or attn_dropout > 0.0:
        embed_mask, layer_masks, attn_masks = make_dropout_masks(
            seed_ref[0, 0], pl.program_id(0) * BT, BT, M, D, n_layers,
            dropout_rate, n=N, h=H, attn_rate=attn_dropout)

    if cgcnn:
        # feature="cgcnn": a Dense projection of the 92-dim CGCNN one-hot
        # descriptors (reference scann_model.py:363-365)
        feat = atomic_ref[...].reshape(R, vocab)
        emb = _mm(feat, embed_ref[:]) + bembed_ref[:]          # [R, E]
    else:
        # atomic numbers: embedding lookup as a one-hot matmul (MXU)
        atomic = atomic_ref[...].reshape(R, 1)                 # int32
        zcols = jax.lax.broadcasted_iota(jnp.int32, (R, vocab), dimension=1)
        z_oh = (zcols == atomic).astype(jnp.float32)
        emb = _mm(z_oh, embed_ref[:])                          # [R, E]
    if use_ring:
        # ring/aromatic concat (scann_model.py:367-371) expressed as split
        # partial matmuls of dense_embed's kernel rows — no lane concat
        ring_emb = _mm(ring_ref[...].reshape(R, 2), wring_ref[:]) + bring_ref[:]
        s_de = (_mm(emb, wde_ref[0:E, :])
                + _mm(ring_emb, wde_ref[E:E + 10, :]) + bde_ref[:])
    else:
        s_de = _mm(emb, wde_ref[:]) + bde_ref[:]
    centers = swish(s_de)                                      # [R, D]
    if dropout_rate > 0.0:
        centers = centers * embed_mask

    # --- geometry features ------------------------------------------------
    d3 = dist_ref[...].reshape(R, N)[:, :, None]               # [R, N, 1]
    rbf_d = jnp.exp(-jnp.square(d3 - dist_centers_ref[0]) / rbf_width)
    weight_rows = weight_ref[...].reshape(R, N)
    if g_update:
        w3 = weight_rows[:, :, None]
        rbf_w = jnp.exp(-jnp.square(w3 - angle_centers_ref[0]) / rbf_width)
        d_emb = swish(_dot3(rbf_d, wnd_ref[:]) + bnd_ref[:])
        w_emb = swish(_dot3(rbf_w, wnw_ref[:]) + bnw_ref[:])
        geometry = d_emb * w_emb                               # [R, N, D]

    # per-molecule one-hot neighbor maps, reused by every layer
    ncols = jax.lax.broadcasted_iota(jnp.int32, (BT, M, N, M), dimension=3)
    n_oh4 = (ncols == idx_ref[...][:, :, :, None]).astype(jnp.float32)

    def gather(c_rows):
        """ns[t*M+m, n] = centers of molecule t at idx[t, m, n] -> [R, N, D]."""
        c4 = c_rows.reshape(BT, M, D)
        parts = [_dot3(n_oh4[t], c4[t]) for t in range(BT)]
        return jnp.concatenate(parts, axis=0) if BT > 1 else parts[0]

    # head-segment matmul maps
    lane = jax.lax.broadcasted_iota(jnp.int32, (D, H), dimension=0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D, H), dimension=1)
    seg_sum = (lane // hd == head).astype(jnp.float32)         # [D, H]
    seg_expand = jnp.transpose(seg_sum)                        # [H, D]
    dk = jnp.asarray(hd, jnp.float32) ** jnp.asarray(-scale, jnp.float32)

    # --- attention stack (static unroll) ----------------------------------
    for l in range(n_layers):
        ns = gather(centers)                                   # [R, N, D]
        if g_update:
            wfg = wfg_ref[l]
            cw = _mm(centers, wfg[0:D, :])
            u = (jnp.broadcast_to(cw.reshape(R, 1, D), (R, N, D))
                 + _dot3(geometry, wfg[D:2 * D, :])
                 + _dot3(ns, wfg[2 * D:3 * D, :])
                 + bfg_ref[l])
            geometry = _ln(swish(u) + geometry, lng_s_ref[l], lng_b_ref[l])
            geo_term = geometry
        else:
            u = swish(_dot3(rbf_d, wfg_ref[l]) + bfg_ref[l])
            geo_term = u * weight_rows[:, :, None]

        key = _dot3(ns * geo_term, wk_ref[l]) + bk_ref[l]      # [R, N, D]
        query = _mm(centers, wq_ref[l]) + bq_ref[l]            # [R, D]

        prod = jnp.broadcast_to((query * dk).reshape(R, 1, D), (R, N, D)) * key
        energy = _dot3(prod, seg_sum)                          # [R, N, H]
        energy = energy + (1.0 - nmask)[:, :, None] * (-1e9)
        energy = energy - jnp.max(energy, axis=1, keepdims=True)
        e = jnp.exp(energy)
        attn = e / jnp.sum(e, axis=1, keepdims=True)
        if attn_dropout > 0.0:
            attn = attn * attn_masks[l]

        a_lanes = _dot3(attn, seg_expand)                      # [R, N, D]
        ctx = jnp.sum(a_lanes * nmask[:, :, None] * key, axis=1)
        out = _ln(ctx + query, ln_s_ref[l], ln_b_ref[l])

        # ResidualNorm FFN (reference attention.py:19-50; Dropout(0.1) after
        # the second Dense when training)
        h = swish(_mm(out, wr1_ref[l]) + br1_ref[l])
        h = _mm(h, wr2_ref[l]) + br2_ref[l]
        if dropout_rate > 0.0:
            h = h * layer_masks[l]
        centers = _ln(out + h, rln_s_ref[l], rln_b_ref[l])

    # --- readout (per-molecule reductions via [BT, M, .] views) -----------
    # n_segments > 0 = STRUCTURE PACKING (data/packing.py): each slot's M
    # rows hold several structures, identified by the one-hot seg_ref
    # [BT, M, S]; every per-structure reduction (q-sum, GA norm, softmax
    # normalization, pooled context) becomes a pair of one-hot matmuls
    # (pool rows per segment / broadcast back to member rows), and the
    # property head runs on [BT*S] pooled rows. The unpacked branch is
    # byte-identical to before (no numeric drift on golden fixtures).
    centers = swish(_mm(centers, wal_ref[:]) + bal_ref[:])     # [R, G]
    G = centers.shape[-1]
    gq = (_mm(centers, wgq_ref[:]) + bgq_ref[:]).reshape(BT, M, G)
    gk = (_mm(centers, wgk_ref[:]) + bgk_ref[:]).reshape(BT, M, G)
    am3 = am.reshape(BT, M, 1)
    mq = am3 * gq
    mk = am3 * gk
    if n_segments:
        seg = seg_ref[...]                                     # [BT, M, S]

        def seg_pool(x):  # [BT, M, C] -> [BT, S, C]: sum rows per segment
            return jnp.stack([mm_tA_hi(seg[t], x[t]) for t in range(BT)])

        def seg_own(y):   # [BT, S, C] -> [BT, M, C]: broadcast to own rows
            return jnp.stack([mm_hi(seg[t], y[t]) for t in range(BT)])

        cross = jnp.sum(mk * seg_own(seg_pool(mq)), axis=-1, keepdims=True)
    else:
        qsum = jnp.sum(mq, axis=1, keepdims=True)              # [BT, 1, G]
        cross = jnp.sum(mk * qsum, axis=-1, keepdims=True)     # [BT, M, 1]
    diag = jnp.sum(mk * mq, axis=-1, keepdims=True)
    agg = am3 * (cross - diag)
    if ga_norm:
        if n_segments:
            nrm_own = seg_own(jnp.sqrt(seg_pool(agg * agg)))
            agg = agg / jnp.where(nrm_own == 0, jnp.ones_like(nrm_own),
                                  nrm_own)
        else:
            nrm = jnp.sqrt(jnp.sum(agg * agg, axis=1, keepdims=True))
            agg = agg / jnp.where(nrm == 0, jnp.ones_like(nrm), nrm)
    # the per-SLOT max shift is constant within every segment, so each
    # segment's softmax is exact under it
    agg = agg + (1.0 - am3) * (-1e9)
    agg = agg - jnp.max(agg, axis=1, keepdims=True)
    e = jnp.exp(agg)
    if n_segments:
        den_own = seg_own(seg_pool(e))
        ga = e / jnp.where(den_own == 0, jnp.ones_like(den_own), den_own)
        struc = seg_pool(ga * mk).reshape(BT * n_segments, G)  # [BT*S, G]
    else:
        ga = e / jnp.sum(e, axis=1, keepdims=True)             # [BT, M, 1]
        struc = jnp.sum(am3 * ga * gk, axis=1)                 # [BT, G]
    struc = swish(_mm(struc, wbf_ref[:]) + bbf_ref[:])         # [BT(*S), O]
    pred = _mm(struc, wp_ref[:]) + bp_ref[:]                   # [BT(*S), 1]
    if mrelu:
        pred = jnp.maximum(pred, 0.0)

    out_ref[...] = pred.reshape(BT, max(n_segments, 1), 1)
    ga_ref[...] = ga                                           # [BT, M, 1]


def stack_layer_params(params: dict, n_layers: int, g_update: bool):
    """Stack per-layer LocalAttention/ResidualNorm params along a new leading
    [L] axis for the fused kernel."""
    def stack(getter):
        return jnp.stack([getter(i) for i in range(n_layers)])

    la = lambda i: params[f"local_attention_{i}"]
    rn = lambda i: params[f"residual_norm_{i}"]
    out = dict(
        wfg=stack(lambda i: la(i)["filter_geo"]["kernel"]),
        bfg=stack(lambda i: la(i)["filter_geo"]["bias"]),
        wk=stack(lambda i: la(i)["key"]["kernel"]),
        bk=stack(lambda i: la(i)["key"]["bias"]),
        wq=stack(lambda i: la(i)["query"]["kernel"]),
        bq=stack(lambda i: la(i)["query"]["bias"]),
        ln_s=stack(lambda i: la(i)["layer_norm"]["scale"]),
        ln_b=stack(lambda i: la(i)["layer_norm"]["bias"]),
        wr1=stack(lambda i: rn(i)["dense_1"]["kernel"]),
        br1=stack(lambda i: rn(i)["dense_1"]["bias"]),
        wr2=stack(lambda i: rn(i)["dense_2"]["kernel"]),
        br2=stack(lambda i: rn(i)["dense_2"]["bias"]),
        rln_s=stack(lambda i: rn(i)["layer_norm"]["scale"]),
        rln_b=stack(lambda i: rn(i)["layer_norm"]["bias"]),
    )
    if g_update:
        out["lng_s"] = stack(lambda i: la(i)["layer_norm_g"]["scale"])
        out["lng_b"] = stack(lambda i: la(i)["layer_norm_g"]["bias"])
    else:
        D = out["wk"].shape[-1]
        out["lng_s"] = jnp.ones((n_layers, D), jnp.float32)
        out["lng_b"] = jnp.zeros((n_layers, D), jnp.float32)
    return out


def _dummy_params(cfm: ModelConfig) -> dict:
    """Zero-valued parameter pytree with the model's exact shapes — used by
    the tile resolver to compile-probe kernels on concrete data."""
    D, L, G, O = cfm.local_dim, cfm.n_attention, cfm.global_dim, cfm.dense_out
    K = cfm.num_gaussian
    z = lambda *s: jnp.zeros(s, jnp.float32)
    dense = lambda i, o: {"kernel": z(i, o), "bias": z(o)}
    ln = lambda: {"scale": z(D), "bias": z(D)}
    E = cfm.embedding_dim
    params = {
        "embed_atom": (dense(92, E) if cfm.feature == "cgcnn"
                       else {"embedding": z(cfm.n_atoms, E)}),
        "dense_embed": dense(E + 10 if cfm.use_ring else E, D),
        "after_Lc": dense(D, G),
        "global_attention": {"query": dense(G, G), "key": dense(G, G)},
        "bf_property": dense(G, O),
        "predict_property": dense(O, 1),
    }
    if cfm.use_ring:
        params["extra_embed"] = dense(2, 10)
    if cfm.g_update:
        params["neighbor_d"] = dense(K, D)
        params["neighbor_w"] = dense(K, D)
    for i in range(L):
        la = {"filter_geo": dense(3 * D if cfm.g_update else K, D),
              "key": dense(D, D), "query": dense(D, D), "layer_norm": ln()}
        if cfm.g_update:
            la["layer_norm_g"] = ln()
        params[f"local_attention_{i}"] = la
        params[f"residual_norm_{i}"] = {"dense_1": dense(D, D),
                                        "dense_2": dense(D, D),
                                        "layer_norm": ln()}
    return params


def _dummy_inputs(cfm: ModelConfig, B: int, M: int, N: int) -> dict:
    out = {
        "atomic": (jnp.ones((B, M, 92), jnp.float32)
                   if cfm.feature == "cgcnn" else jnp.ones((B, M), jnp.int32)),
        "atom_mask": jnp.ones((B, M, 1), jnp.float32),
        "neighbors": jnp.zeros((B, M, N), jnp.int32),
        "neighbor_mask": jnp.ones((B, M, N), jnp.float32),
        "neighbor_weight": jnp.ones((B, M, N), jnp.float32),
        "neighbor_distance": jnp.ones((B, M, N), jnp.float32),
    }
    if cfm.use_ring:
        out["ring_aromatic"] = jnp.zeros((B, M, 2), jnp.float32)
    return out


_RESOLVED_TILES: dict = {}

# Probes only run when the analytic estimate lands within this fraction of
# the VMEM budget — picks with more headroom are trusted outright (the
# calibration data says they are safe), which avoids minutes of probe
# compiles at training startup for the common shapes.
PROBE_ABOVE_FRACTION = 0.6

_TILE_CACHE_PATH = os.path.join(
    os.path.expanduser("~"), ".cache", "scann_tpu", "tiles.json")


def _load_tile_cache() -> dict:
    try:
        with open(_TILE_CACHE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _store_tile_cache(key: str, bt: int) -> None:
    """Best-effort persistent cache: probe results survive process restarts
    (a probe compile can cost minutes)."""
    try:
        os.makedirs(os.path.dirname(_TILE_CACHE_PATH), exist_ok=True)
        cache = _load_tile_cache()
        cache[key] = bt
        tmp = _TILE_CACHE_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f)
        os.replace(tmp, _TILE_CACHE_PATH)
    except Exception:
        pass


def _config_key(cfm: ModelConfig):
    return (cfm.n_attention, cfm.local_dim, cfm.num_head, cfm.global_dim,
            cfm.dense_out, cfm.embedding_dim, cfm.n_atoms, cfm.g_update,
            cfm.use_ga_norm, cfm.use_drop, cfm.num_gaussian, cfm.feature,
            cfm.use_ring)


def _probe_tile(cfm: ModelConfig, M: int, N: int, bt: int, which: str,
                dropout_rate: float) -> int:
    """Compile+run the kernel at tile ``bt`` on dummy data (grid of ONE
    program — per-program VMEM is what can blow); halve on failure.

    Mosaic's scoped-VMEM allocator is only approximately predictable from
    tensor shapes, so the analytic pick is validated on the device once per
    (config, shape) and cached. A failed compile costs minutes, but the
    calibrated estimate makes that rare, and the result is reused for the
    whole process (e.g. every epoch of a training run)."""
    import numpy as np

    try:  # an eager probe cannot run while another computation is tracing
        from jax._src.core import trace_state_clean
    except ImportError:  # pragma: no cover - API drift guard
        trace_state_clean = lambda: True
    if not trace_state_clean():
        # mid-trace (e.g. a caller that skipped Trainer's pre-resolution):
        # trust the calibrated analytic pick rather than silently degrading
        return bt

    while bt > 1:
        try:
            params = _dummy_params(cfm)
            inputs = _dummy_inputs(cfm, bt, M, N)
            if which == "fwd":
                out, _ = fused_scann_forward(
                    params, inputs, cfm, dropout_rate=dropout_rate,
                    dropout_seed=0 if dropout_rate > 0 else None,
                    batch_tile=bt)
                float(np.asarray(out)[0, 0])  # value fetch = real sync
            else:
                from scann_tpu.kernels.scann_backward import fused_scann_grad

                grads = fused_scann_grad(
                    params, inputs, cfm,
                    jnp.zeros((bt, 1), jnp.float32),
                    jnp.zeros((bt, M, 1), jnp.float32),
                    dropout_rate=dropout_rate,
                    dropout_seed=0 if dropout_rate > 0 else None,
                    batch_tile=bt)
                float(np.asarray(jax.tree.leaves(grads)[0]).ravel()[0])
            return bt
        except Exception as e:  # VMEM OOM (or any compile failure): halve
            print(f"[scann_tpu] fused {which} kernel batch_tile={bt} failed "
                  f"({str(e).splitlines()[0][:100]}); retrying at {bt // 2}")
            bt //= 2
    return 1


def resolve_tile(cfm: ModelConfig, B: int, M: int, N: int, which: str,
                 dropout_rate: float = 0.0) -> int:
    """Batch tile for the fused ``which`` ('fwd'/'bwd') kernel at bucket
    (B, M, N): analytic estimate; picks close to the VMEM budget are
    additionally validated once on a real TPU (result cached in memory and
    on disk)."""
    # the backward's VMEM pressure differs between the keep-acts schedule
    # (default, round 4) and the recompute schedule, so probe results are
    # keyed by mode — a tile probed OK under one must not be trusted by
    # the other
    # the bf16-stash experiment changes the bwd VMEM footprint too
    mode = ((_keep_acts_enabled(), _stash_bf16_enabled()) if which == "bwd"
            else (True, False))
    key = (_config_key(cfm), B, M, N, which, dropout_rate > 0, mode)
    if key in _RESOLVED_TILES:
        return _RESOLVED_TILES[key]
    # experiment override (benchmarks/packing_capacity_sweep.py): force the
    # tile, bypassing the analytic pick AND the probe — the caller owns the
    # VMEM risk. B must stay divisible.
    force = os.environ.get(f"SCANN_TPU_FORCE_TILE_{which.upper()}")
    if force:
        bt = int(force)
        if B % bt:
            raise ValueError(f"forced {which} tile {bt} does not divide "
                             f"batch {B}")
        _RESOLVED_TILES[key] = bt
        return bt
    if which == "fwd":
        bt = pick_batch_tile(cfm, B, M, N)
        est = bt * _fwd_mol_bytes(cfm, M, N) + _param_bytes(cfm)
    else:
        bt = pick_backward_tile(cfm, B, M, N)
        # probe gate uses the SCHEDULE-AWARE estimate: under keep-acts the
        # true working set is much larger than the calibrated pick model,
        # and a shape skating past the probe on the stale estimate fails
        # at Mosaic compile time with no fallback (round-4 advisor)
        est = bt * _bwd_mol_bytes(cfm, M, N) + 2 * _param_bytes(cfm)
    needs_probe = (bt > 1 and jax.default_backend() == "tpu"
                   and est >= PROBE_ABOVE_FRACTION * VMEM_BUDGET_BYTES)
    if needs_probe:
        disk_key = repr(key)
        cached = _load_tile_cache().get(disk_key)
        if isinstance(cached, int) and cached >= 1 and B % cached == 0:
            bt = min(bt, cached)
        else:
            bt = _probe_tile(cfm, M, N, bt, which, dropout_rate)
            while B % bt:
                bt //= 2
            _store_tile_cache(disk_key, bt)
    _RESOLVED_TILES[key] = bt
    return bt


# Compile-cost bounds: Mosaic compile time AND the compile helper's host
# memory scale with the kernel's tile count (~ BT * M * N rows of work).
# The caps below are the largest configurations compiled successfully on
# this toolchain (fwd 16*32*16; bwd 3*48*16 — the round-5 capacity-48
# packed case, 95 s compile); larger-N buckets take smaller tiles instead
# of risking a helper OOM (observed: SIGKILLed compile helper at BT=16
# with N=32 buckets).
MAX_FWD_TILE_ROWS = 16 * 32 * 16
MAX_BWD_TILE_ROWS = 3 * 48 * 16


def pick_batch_tile(cfm: ModelConfig, B: int, M: int, N: int,
                    budget_bytes: int = VMEM_BUDGET_BYTES) -> int:
    """Molecules per forward Pallas program: larger tiles feed the MXU bigger
    matmuls ([BT*M*N, D] rows); bounded by the VMEM working set and the
    compile-cost row cap. The measured step-time curve flattens past
    (fwd 16, bwd 4) at the flagship shape — a (32, 8) pair was still
    compiling after 25 minutes for ~no expected gain."""
    per_mol = _fwd_mol_bytes(cfm, M, N)
    static = _param_bytes(cfm)
    # small-M anomaly: at M=16 a BT=16 forward took 14 min of Mosaic compile
    # (every per-molecule gather matmul is a tiny heavily-lane-padded op, and
    # the unroll multiplies them) — cap the tile below 32 atoms
    max_bt = 16 if M >= 32 else 8
    for bt in (16, 8, 4, 2, 1):
        if bt > max_bt or B % bt:
            continue
        if bt * M * _pad8(N) > MAX_FWD_TILE_ROWS:
            continue
        if bt * per_mol + static < budget_bytes:
            return bt
    return 1


def pick_backward_tile(cfm: ModelConfig, B: int, M: int, N: int,
                       budget_bytes: int = VMEM_BUDGET_BYTES) -> int:
    """Molecules per backward Pallas program (the stash working set is much
    bigger than the forward's, so the backward tiles smaller; see
    pick_batch_tile on the compile-cost caps).

    Picks stay on the calibrated RECOMPUTE-schedule model (keep_acts=False)
    regardless of the active schedule: the round-4 keep-acts tiles were
    probed OK at exactly these picks, and inflating the pick model would
    silently shrink known-good tiles. The schedule-aware estimate instead
    gates feasibility (fits_vmem) and the on-device probe (resolve_tile),
    which halves the tile on a real failure."""
    per_mol = _bwd_mol_bytes(cfm, M, N, keep_acts=False)
    static = 2 * _param_bytes(cfm)  # params + grad accumulators
    # 3 sits between the power-of-two rungs for shapes where 4 exceeds the
    # row cap or VMEM but 2 wastes parallelism: at the capacity-40 packed
    # QM9 shape (M=40, N=16, B=48) bt=3 measured 51,363 structs/s vs
    # 46,449 at bt=2 — the tile drop, not the one-hot gather, was the
    # round-4 capacity-40 regression (benchmarks/packing_capacity_sweep.py)
    for bt in (4, 3, 2, 1):
        if B % bt:
            continue
        if bt * M * _pad8(N) > MAX_BWD_TILE_ROWS:
            continue
        if bt * per_mol + static < budget_bytes:
            return bt
    return 1


def fused_scann_forward(params: dict, inputs: dict, cfm: ModelConfig,
                        mrelu_head: bool = False,
                        interpret: bool = False,
                        dropout_rate: float = 0.0,
                        dropout_seed=None,
                        batch_tile: int = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the full SCANN forward in one Pallas kernel.

    Returns (property [B, 1], ga_score [B, M, 1]); f32.
    ``dropout_rate > 0`` enables the training-time embed/residual dropout
    (in-kernel PRNG streamed from ``dropout_seed`` + program id).
    ``batch_tile`` molecules are processed per Pallas program (auto-picked
    by VMEM budget when None).

    STRUCTURE PACKING: when ``inputs`` carries ``segment_onehot``
    [B, M, S] (data/packing.py), each slot holds several structures and
    property comes back [B, S] — one prediction per packed segment (empty
    segments produce a head-bias artifact; mask with ``segment_mask``).
    """
    assert supports_config(cfm), "config not supported by the fused forward"
    params = params.get("params", params)

    seg_in = inputs.get("segment_onehot")
    S = int(seg_in.shape[-1]) if seg_in is not None else 0

    B, M = inputs["atomic"].shape[:2]
    N = inputs["neighbors"].shape[2]
    L = cfm.n_attention
    D = cfm.local_dim
    cgcnn = cfm.feature == "cgcnn"
    # dropout no longer pins the tile: masks are keyed to the global molecule
    # index (per-molecule PRNG streams), so the backward replays them at any
    # tile size
    BT = (batch_tile if batch_tile is not None
          else resolve_tile(cfm, B, M, N, "fwd", dropout_rate))
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

    if dropout_seed is None:
        dropout_seed = jnp.zeros((1, 1), jnp.int32)
    else:
        dropout_seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)

    if cgcnn:
        atomic_op = f32(inputs["atomic"])                      # [B, M, 92]
        w_embed = f32(params["embed_atom"]["kernel"])
        b_embed = f32(params["embed_atom"]["bias"])
    else:
        # batched rank-2 arrays carry a trailing singleton so every block's
        # last two dims equal the array dims (Mosaic block-shape rule)
        atomic_op = jnp.asarray(inputs["atomic"], jnp.int32)[..., None]
        w_embed = f32(params["embed_atom"]["embedding"])
        b_embed = jnp.zeros((w_embed.shape[1],), jnp.float32)
    if cfm.use_ring:
        ring_op = f32(inputs["ring_aromatic"])                 # [B, M, 2]
        w_ring = f32(params["extra_embed"]["kernel"])
        b_ring = f32(params["extra_embed"]["bias"])
    else:
        ring_op = jnp.zeros((B, M, 2), jnp.float32)
        w_ring = jnp.zeros((2, 10), jnp.float32)
        b_ring = jnp.zeros((10,), jnp.float32)

    operands = [
        atomic_op,
        f32(inputs["atom_mask"]),
        jnp.asarray(inputs["neighbors"], jnp.int32),
        f32(inputs["neighbor_mask"]),
        f32(inputs["neighbor_weight"]),
        f32(inputs["neighbor_distance"]),
        ring_op,
        # unpacked runs reuse atom_mask as a never-read dummy seg operand
        # (no extra HBM, negligible DMA)
        f32(seg_in) if seg_in is not None else f32(inputs["atom_mask"]),
        dropout_seed,
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
        dist_centers, angle_centers,
    ]

    def spec_for(x, batched):
        if batched:
            blk = (BT,) + x.shape[1:]
            idx_map = lambda b, nd=x.ndim: (b,) + (0,) * (nd - 1)
        else:
            blk = x.shape
            idx_map = lambda b, nd=x.ndim: (0,) * nd
        return pl.BlockSpec(blk, idx_map, memory_space=pltpu.VMEM)

    in_specs = [spec_for(x, i < 8) for i, x in enumerate(operands)]

    S1 = max(S, 1)
    out, ga = pl.pallas_call(
        functools.partial(
            _kernel, n_layers=L, num_head=cfm.num_head, scale=cfm.scale,
            g_update=cfm.g_update, ga_norm=cfm.use_ga_norm, mrelu=mrelu_head,
            rbf_width=0.25, dropout_rate=dropout_rate,
            attn_dropout=attn_dropout_rate(cfm, dropout_rate),
            use_ring=cfm.use_ring, cgcnn=cgcnn,
            bf16=(cfm.dtype == "bfloat16"), n_segments=S,
        ),
        grid=(B // BT,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((BT, S1, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, M, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S1, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, M, 1), jnp.float32),
        ],
        # v5e has ~128 MB VMEM; Mosaic's default cap is far lower, so raise
        # it to our probed budget (see VMEM_BUDGET_BYTES)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET_BYTES + (16 << 20)),
        interpret=interpret,
    )(*operands)
    return out[:, :, 0], ga
