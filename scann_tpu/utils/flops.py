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
