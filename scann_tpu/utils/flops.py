"""Analytic FLOP model of the SCANN forward/training step.

Round-2 VERDICT #2: ``bench.py`` must report TFLOP/s and MFU beside
structures/sec, from an explicit FLOP model — not judge back-of-envelope.

The model counts the matmul-dominated graph of SURVEY.md §3.2 (reference
``scann_model.py:329-453`` + ``attention.py:118-216,267-318``) at a padded
bucket shape (M atoms, N neighbors): every dense/einsum contributes
``2*m*n*k``, elementwise/softmax/LayerNorm terms are counted with small
constants. Validated against XLA's own ``cost_analysis`` on the lowered
training step (``tests/test_flops.py``, agreement well within 20%).

Conventions:
- forward FLOPs are per structure;
- training multiplier 3x: the backward pass of a matmul chain costs ~2x the
  forward (two GEMMs per GEMM), and the Adam/elementwise overhead is noise
  at these sizes;
- the one-hot MXU gather strategy (``ops/attention.py:33-57``) is NOT
  counted as useful FLOPs: it trades redundant MXU work for serialization,
  so counting it would inflate MFU. MFU here = useful model FLOPs / peak.
"""

from typing import Optional

from scann_tpu.config import ModelConfig

RBF_CENTERS = 20  # linspace(0, gaussian_d, 20), scann_model.py:378


def forward_flops_per_structure(cfm: ModelConfig, M: int, N: int) -> float:
    """Useful forward FLOPs for ONE structure at padded shape (M, N)."""
    d = cfm.local_dim
    g = cfm.global_dim
    h = cfm.num_head
    E = cfm.embedding_dim
    K = RBF_CENTERS
    L = cfm.n_attention

    f = 0.0
    # embedding: table lookup (atomic) or dense (cgcnn), then dense_embed
    if cfm.feature == "cgcnn":
        f += 2 * M * 92 * E
    e_in = E + (10 if cfm.use_ring else 0)
    if cfm.use_ring:
        f += 2 * M * 2 * 10  # extra_embed Dense(2->10)
    f += 2 * M * e_in * d  # dense_embed

    # distance RBF (exp per center) and SCANN+ geometry embeddings
    f += 5 * M * N * K
    if cfm.g_update:
        f += 5 * M * N * K          # solid-angle RBF
        f += 2 * M * N * K * d * 2  # neighbor_d + neighbor_w denses
        f += M * N * d              # geometry = d_emb * w_emb

    # per LocalAttention layer (attention.py:118-216)
    per_layer = 0.0
    if cfm.g_update:
        # filter_geo(concat[center, geo, neighbor]) in split-matmul form
        # (kernels/local_attention.py:94-102): the center term is one
        # [M,d]x[d,d] GEMM broadcast over neighbors; geo+neighbor terms are
        # [M,N,d]x[d,d]; then residual add + LayerNorm on [M, N, d]
        per_layer += 2 * M * d * d + 2 * 2 * M * N * d * d
        per_layer += 10 * M * N * d
    else:
        # filter_geo on the distance RBF: Dense(K -> d), times voronoi weight
        per_layer += 2 * M * N * K * d + M * N * d
    per_layer += M * N * d          # neighbor * geometry
    per_layer += 2 * M * N * d * d  # K projection [M,N,d]->[M,N,d]
    per_layer += 2 * M * d * d      # Q projection
    per_layer += 2 * M * N * d      # QK energy einsum (per-head dot)
    per_layer += 6 * M * N * h      # masked softmax over N
    per_layer += 2 * M * N * d      # context = attn . V
    per_layer += 10 * M * d         # residual + LayerNorm
    if cfm.use_attn_norm:
        per_layer += 2 * 2 * M * d * d  # ResidualNorm: two Dense(d->d)
        per_layer += 10 * M * d
    f += L * per_layer

    # readout
    f += 2 * M * d * g              # after_Lc
    f += 2 * 2 * M * g * g          # GA query/key projections
    f += 4 * M * g                  # O(M.D) GA identity (ops/attention.py)
    f += 6 * M                      # GA softmax over atoms
    f += 2 * M * g                  # pooled context
    f += 2 * g * cfm.dense_out      # bf_property
    f += 2 * cfm.dense_out          # predict_property
    return f


def train_flops_per_structure(cfm: ModelConfig, M: int, N: int) -> float:
    """Forward + backward (~2x forward for a matmul chain)."""
    return 3.0 * forward_flops_per_structure(cfm, M, N)


def gather_flops_per_structure(cfm: ModelConfig, M: int, N: int,
                               training: bool = True) -> float:
    """MXU FLOPs of the one-hot neighbor gather (ops/attention.py:33-57,
    kernels' ``gather``): [M*N, M] @ [M, d] per layer, plus the transposed
    scatter in the backward. EXCLUDED from ``forward_flops_per_structure``
    (it is serialization traded for redundant MXU work, not useful model
    FLOPs — docstring up top), but it IS real MXU occupancy, so the
    roofline's MXU term must include it: at (M=96, N=32) the gather is
    ~0.75x the useful per-layer matmul work."""
    d = cfm.local_dim
    L = cfm.n_attention
    per_layer = 2 * M * N * M * d          # one-hot gather GEMM
    if training:
        per_layer *= 3                     # bwd: scatter (A^T) + regather
    return L * per_layer


def vpu_costs_per_structure(cfm: ModelConfig, M: int, N: int,
                            training: bool = True) -> dict:
    """VPU-side op counts for ONE structure at padded shape (M, N):

    - ``transcendentals``: exp evaluations (swish sigmoids, RBF gaussians,
      softmax) plus LayerNorm rsqrts — the ops the VPU serializes through
      its transcendental path. Dominated by the [M,N,D]-stream swish of the
      SCANN+ geometry update: (L+2)*M*N*D exps forward.
    - ``elementwise``: simple VPU ops (add/mul/select) on the activation
      streams, counted with small per-tensor constants (±30% fidelity — the
      point is the ORDER of the VPU term vs the MXU term, see
      utils/roofline.py).

    ``training=True`` reflects the PRODUCTION schedule (keep-acts backward,
    kernels/scann_backward.py): activations are stashed, so the backward
    re-evaluates each transcendental about once (sigmoid'(s) from the
    stashed pre-activation) -> ~2x forward; elementwise follows the usual
    ~3x matmul-chain rule. The ALGORITHMIC minimum (stash every sigmoid
    value too) would be ~1x transcendentals — reported separately by
    roofline.step_ceiling(schedule="stash_all").
    """
    d = cfm.local_dim
    g = cfm.global_dim
    h = cfm.num_head
    K = RBF_CENTERS
    L = cfm.n_attention

    trans = M * d                 # dense_embed swish
    trans += M * N * K            # distance RBF exp
    elem = 4 * M * N * K          # RBF (d - c)^2 / width etc.
    if cfm.g_update:
        trans += M * N * K        # solid-angle RBF exp
        trans += 2 * M * N * d    # d_emb + w_emb swish
        elem += 4 * M * N * K + 4 * M * N * d
    per_layer_trans = 0.0
    per_layer_elem = 0.0
    if cfm.g_update:
        per_layer_trans += M * N * d   # u_pre swish ([M,N,D] stream)
        per_layer_trans += M * N       # geometry LayerNorm rsqrt
        per_layer_elem += 10 * M * N * d  # u_pre adds, residual, LN norm
    else:
        per_layer_trans += M * N * d   # filter_geo swish
        per_layer_elem += 2 * M * N * d
    per_layer_trans += M * N * h       # softmax exp over neighbors
    per_layer_elem += 6 * M * N * h    # softmax max/sub/sum/div + mask
    per_layer_elem += 4 * M * N * d    # ns*geo, QK prod, attn*key, mask
    per_layer_trans += M * d           # h1 swish
    per_layer_trans += 2 * M           # o1 + context LayerNorm rsqrt
    per_layer_elem += 12 * M * d       # residuals + two LN normalizations
    trans += L * per_layer_trans
    elem += L * per_layer_elem

    trans += M * g + M + cfm.dense_out  # after_Lc swish, GA softmax, bf swish
    elem += 8 * M * g

    if training:
        # keep-acts backward: each transcendental re-evaluated ~once from
        # the stashed pre-activation; elementwise ~2x more in the bwd chain
        trans *= 2.0
        elem *= 3.0
    return {"transcendentals": trans, "elementwise": elem}


def hbm_bytes_per_structure(cfm: ModelConfig, M: int, N: int,
                            batch_size: int, training: bool = True) -> float:
    """HBM traffic per structure per step: the gathered input streams (the
    bucket is device-resident; each step reads its batch rows) plus the
    parameter read (+ gradient write + Adam state) amortized over the
    batch. Fused kernels keep activations in VMEM, so no activation
    spill is counted."""
    input_bytes = (4 * M * N * 4        # neighbors/mask/weight/distance f32
                   + M * (4 + 4))       # atomic + atom_mask
    p = _param_count(cfm)
    # params read (fwd+bwd) + grad write + Adam mu/nu read+write, all f32
    param_traffic = (2 + 1 + 4) * 4 * p if training else 4 * p
    return input_bytes + param_traffic / batch_size


def _param_count(cfm: ModelConfig) -> float:
    d, g = cfm.local_dim, cfm.global_dim
    E, K, L = cfm.embedding_dim, RBF_CENTERS, cfm.n_attention
    p = cfm.n_atoms * E + E * d + d            # embed + dense_embed
    if cfm.g_update:
        p += 2 * (K * d + d)                   # neighbor_d / neighbor_w
        p += L * (3 * d * d + d + 2 * d)       # filter_geo + geometry LN
    else:
        p += L * (K * d + d)
    p += L * (2 * d * d + 2 * d + 2 * d)       # Q/K proj + output LN
    if cfm.use_attn_norm:
        p += L * (2 * d * d + 2 * d + 2 * d)   # ResidualNorm
    p += d * g + g + 2 * g * g + 2 * g         # after_Lc + GA projections
    p += g * cfm.dense_out + cfm.dense_out + cfm.dense_out + 1
    return p


# Peak dense bf16 TFLOP/s per chip (public spec sheets). The default TPU
# matmul path runs bf16 MXU passes for f32 inputs, so bf16 peak is the
# honest denominator for MFU.
_PEAK_TFLOPS_BF16 = {
    "v4": 275.0,
    "v5 lite": 197.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6 lite": 918.0,
    "v6e": 918.0,
}


def peak_tflops(device_kind: Optional[str] = None) -> Optional[float]:
    """Peak bf16 TFLOP/s for a jax device kind string; None if unknown."""
    if device_kind is None:
        import jax

        device_kind = jax.devices()[0].device_kind
    kind = device_kind.lower()
    for key, val in _PEAK_TFLOPS_BF16.items():
        if key in kind:
            return val
    return None
