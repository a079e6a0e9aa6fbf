"""The SCANN / SCANN+ model as a Flax module.

Mirrors the reference Keras functional graph (``scann/models/scann_model.py:
329-453``) and layer semantics (``scann/layers/attention.py``), with module
names chosen to match the reference Keras layer names so the H5 checkpoint
converter (``scann_tpu.compat.h5_loader``) maps weights 1:1:

    embed_atom, extra_embed, dense_embed, neighbor_d, neighbor_w,
    local_attention_{i} (query/key/filter_geo/layer_norm/layer_norm_g),
    residual_norm_{i}, after_Lc, global_attention (query/key),
    bf_property, predict_property

Inputs (see reference ``datagenerator.py:123-135`` and SURVEY.md §2.3):

    atomic            [B, M] int32 (or [B, M, 92] float for feature="cgcnn")
    atom_mask         [B, M, 1] float
    neighbors         [B, M, N] int32 (pad remapped to 0)
    neighbor_mask     [B, M, N] float
    neighbor_weight   [B, M, N] float (solid angle; normalized when not g_update)
    neighbor_distance [B, M, N] float
    ring_aromatic     [B, M, 2] float (only when use_ring)

Outputs: dict with ``property`` [B, 1] (standardized target) and ``ga_score``
[B, M, 1] (the interpretability signal; reference infer mode,
``scann_model.py:79-83``).
"""

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from scann_tpu.config import ATTN_DROPOUT_RATE, ModelConfig
from scann_tpu.ops.activations import mrelu, swish
from scann_tpu.ops.attention import global_attention_core
from scann_tpu.ops.rbf import gaussian_expansion, make_centers

# Keras Dense default init (glorot_uniform) — kept for matching reference
# training dynamics; flax's default would be lecun_normal.
dense_init = nn.initializers.glorot_uniform()


def _embed_uniform_init(key, shape, dtype=jnp.float32):
    """Keras Embedding default init: RandomUniform(-0.05, 0.05)."""
    return jax.random.uniform(key, shape, dtype, minval=-0.05, maxval=0.05)


class ResidualNorm(nn.Module):
    """Post-attention FFN block (reference ``attention.py:19-50``)."""

    dim: int
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.dim, kernel_init=dense_init, dtype=self.dtype, name="dense_1")(x)
        h = swish(h)
        h = nn.Dense(self.dim, kernel_init=dense_init, dtype=self.dtype, name="dense_2")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        x = x + h
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="layer_norm")(x)


class DenseParams(nn.Module):
    """Parameter container with a Dense-compatible pytree (kernel/bias)."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", dense_init, (self.in_dim, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return {"kernel": k, "bias": b}


class LayerNormParams(nn.Module):
    """Parameter container with a LayerNorm-compatible pytree (scale/bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return {"scale": s, "bias": b}


class LocalAttention(nn.Module):
    """Attention over Voronoi neighbors (reference ``attention.py:53-231``).

    The reference model always builds this with v_proj=False, kq_proj=True
    (``scann_model.py:395-403``): values are the projected keys and the
    residual stream is the projected query.

    Two execution paths over one parameter set:
    - ``use_pallas=True``: the fused single-kernel TPU path
      (``scann_tpu.kernels.local_attention``),
    - otherwise the pure-jnp composition, with the SCANN+ geometry update
      computed as split partial matmuls (no [B,M,N,3D] concat; the center
      term is computed once per atom, not once per neighbor).
    """

    dim: int
    num_head: int = 8
    scale: float = 0.5
    g_update: bool = False
    dropout: bool = False
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        centers: jnp.ndarray,            # [B, M, D]
        neighbor_idx: jnp.ndarray,       # [B, M, N] int
        geometry: jnp.ndarray,           # [B, M, N, D] (g_update) or [B, M, N, K] dist RBF
        neighbor_mask: jnp.ndarray,      # [B, M, N] float
        neighbor_weight: Optional[jnp.ndarray] = None,  # [B, M, N, 1] (no g_update)
        deterministic: bool = True,
    ):
        from scann_tpu.kernels.local_attention import (
            fused_local_attention,
            reference_local_attention,
        )

        B, M, D = centers.shape
        fg_in = 3 * D if self.g_update else geometry.shape[-1]
        params = {
            "filter_geo": DenseParams(fg_in, self.dim, name="filter_geo")(),
            "key": DenseParams(self.dim, self.dim, name="key")(),
            "query": DenseParams(self.dim, self.dim, name="query")(),
            "layer_norm": LayerNormParams(self.dim, name="layer_norm")(),
        }
        if self.g_update:
            params["layer_norm_g"] = LayerNormParams(self.dim, name="layer_norm_g")()
        params = jax.tree.map(lambda x: x.astype(self.dtype), params)

        drop_rng = None
        rate = 0.0
        if self.dropout and not deterministic:
            drop_rng = self.make_rng("dropout")
            rate = ATTN_DROPOUT_RATE

        weight_in = None if neighbor_weight is None else neighbor_weight[..., 0]
        if self.use_pallas and rate == 0.0:
            out, geo_out, attn = fused_local_attention(
                centers, neighbor_idx, geometry, neighbor_mask, weight_in,
                params, self.num_head, self.scale, self.g_update)
        else:
            out, geo_out, attn = reference_local_attention(
                centers, neighbor_idx, geometry, neighbor_mask, weight_in,
                params, self.num_head, self.scale, self.g_update,
                dropout_rate=rate, dropout_rng=drop_rng)

        # public attn layout [B, H, M, N] (matches the reference's energy
        # layout at attention.py:183)
        attn = jnp.transpose(attn, (0, 3, 1, 2))
        geometry_out = geo_out if self.g_update else geometry
        return attn, out, geometry_out


class GlobalAttention(nn.Module):
    """GA-score readout (reference ``attention.py:234-331``)."""

    dim: int
    norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, centers: jnp.ndarray, atom_mask: jnp.ndarray,
                 segment_onehot: Optional[jnp.ndarray] = None):
        query = nn.Dense(self.dim, kernel_init=dense_init, dtype=self.dtype, name="query")(centers)
        key = nn.Dense(self.dim, kernel_init=dense_init, dtype=self.dtype, name="key")(centers)
        return global_attention_core(query, key, key, atom_mask, norm=self.norm,
                                     segment_onehot=segment_onehot)


class ScannModel(nn.Module):
    """Full SCANN graph (reference ``create_model``, scann_model.py:329-453)."""

    config: ModelConfig
    mrelu_head: bool = False  # reference: activation=mrelu iff target == "e_b"
    use_pallas: bool = False  # fused TPU kernels for the attention stack

    @nn.compact
    def __call__(
        self,
        inputs: Dict[str, jnp.ndarray],
        deterministic: bool = True,
        return_local_attn: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfm = self.config
        dtype = jnp.bfloat16 if cfm.dtype == "bfloat16" else jnp.float32

        atomic = inputs["atomic"]
        atom_mask = inputs["atom_mask"].astype(dtype)
        neighbor_idx = inputs["neighbors"]
        neighbor_mask = inputs["neighbor_mask"].astype(dtype)
        neighbor_weight = inputs["neighbor_weight"].astype(dtype)
        neighbor_distance = inputs["neighbor_distance"].astype(dtype)

        # --- atom embedding (scann_model.py:361-374) ---
        if cfm.feature == "atomic":
            centers = nn.Embed(
                cfm.n_atoms, cfm.embedding_dim,
                embedding_init=_embed_uniform_init, dtype=dtype, name="embed_atom",
            )(atomic)
        elif cfm.feature == "cgcnn":
            centers = nn.Dense(
                cfm.embedding_dim, kernel_init=dense_init, dtype=dtype, name="embed_atom"
            )(atomic.astype(dtype))
        else:
            raise ValueError(f"unknown feature mode: {cfm.feature}")

        if cfm.use_ring:
            ring_embed = nn.Dense(10, kernel_init=dense_init, dtype=dtype, name="extra_embed")(
                inputs["ring_aromatic"].astype(dtype)
            )
            centers = jnp.concatenate([centers, ring_embed], axis=-1)

        centers = swish(
            nn.Dense(cfm.local_dim, kernel_init=dense_init, dtype=dtype, name="dense_embed")(centers)
        )
        centers = nn.Dropout(0.1, deterministic=deterministic)(centers)

        # --- geometry features (scann_model.py:376-391) ---
        dist_rbf = gaussian_expansion(
            neighbor_distance, jnp.asarray(make_centers(cfm.gaussian_d, cfm.num_gaussian), dtype)
        )

        if cfm.g_update:
            d_emb = swish(
                nn.Dense(cfm.local_dim, kernel_init=dense_init, dtype=dtype, name="neighbor_d")(dist_rbf)
            )
            w_rbf = gaussian_expansion(
                neighbor_weight, jnp.asarray(make_centers(2 * np.pi, cfm.num_gaussian), dtype)
            )
            w_emb = swish(
                nn.Dense(cfm.local_dim, kernel_init=dense_init, dtype=dtype, name="neighbor_w")(w_rbf)
            )
            geometry = d_emb * w_emb
            weight_in = None
        else:
            geometry = dist_rbf
            weight_in = neighbor_weight[..., None]

        # --- recursive local attention stack (scann_model.py:413-421) ---
        local_attns = []
        for i in range(cfm.n_attention):
            attn_local, context, geometry_out = LocalAttention(
                dim=cfm.local_dim,
                num_head=cfm.num_head,
                scale=cfm.scale,
                g_update=cfm.g_update,
                dropout=cfm.use_drop,
                dtype=dtype,
                use_pallas=self.use_pallas,
                name=f"local_attention_{i}",
            )(centers, neighbor_idx, geometry, neighbor_mask, weight_in, deterministic)

            if cfm.g_update:
                geometry = geometry_out  # self-consistent thread-through

            if cfm.use_attn_norm:
                centers = ResidualNorm(
                    cfm.local_dim, dtype=dtype, name=f"residual_norm_{i}"
                )(context, deterministic)
            else:
                centers = context

            if return_local_attn:
                local_attns.append(attn_local)

        # --- readout (scann_model.py:424-447) ---
        centers = swish(
            nn.Dense(cfm.global_dim, kernel_init=dense_init, dtype=dtype, name="after_Lc")(centers)
        )

        # structure packing: per-segment readout when slots carry several
        # structures (inputs["segment_onehot"] [B, M, S]); property is then
        # [B, S] — one prediction per packed structure
        segments = inputs.get("segment_onehot")
        if segments is not None:
            segments = segments.astype(dtype)

        ga_score, struc_rep = GlobalAttention(
            dim=cfm.global_dim, norm=cfm.use_ga_norm, dtype=dtype, name="global_attention"
        )(centers, atom_mask, segment_onehot=segments)

        struc_rep = swish(
            nn.Dense(cfm.dense_out, kernel_init=dense_init, dtype=dtype, name="bf_property")(struc_rep)
        )

        out = nn.Dense(1, kernel_init=dense_init, dtype=jnp.float32, name="predict_property")(
            struc_rep.astype(jnp.float32)
        )
        if self.mrelu_head:
            out = mrelu(out)
        if segments is not None:
            out = out[..., 0]  # [B, S]

        result = {"property": out, "ga_score": ga_score.astype(jnp.float32)}
        if return_local_attn:
            result["local_attn"] = local_attns
        return result


# --- L2 regularization -------------------------------------------------------
# The reference puts Keras l2(1e-4) kernel regularizers on: the q/k/v and
# filter_geo projections of every attention layer (attention.py:95-109,
# 260-265), both ResidualNorm Dense layers (attention.py:27-28), after_Lc and
# bf_property (scann_model.py:424-442) — but NOT on embed_atom, dense_embed,
# neighbor_d, neighbor_w, extra_embed or predict_property. In JAX the penalty
# must be added to the loss explicitly.

_REGULARIZED_LAYERS = (
    "query", "key", "value", "filter_geo", "dense_1", "dense_2",
    "after_Lc", "bf_property",
)


def l2_penalty(params, coeff: float = 1e-4) -> jnp.ndarray:
    """Sum of l2(coeff) kernel penalties matching the reference placement."""
    total = 0.0

    def visit(path, leaf):
        nonlocal total
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if keys and keys[-1] == "kernel" and any(k in _REGULARIZED_LAYERS for k in keys[:-1]):
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))

    jax.tree_util.tree_map_with_path(visit, params)
    return coeff * total
