"""Cross-region fusion encoder (flax.linen).

Behavioral re-implementation of ``main_model/src/models/brain_encoder.py``
(``BrainRegionEncoder``), redesigned for TPU: the four ragged regions arrive
as one stacked ``(B, R=4, C=16, T)`` tensor with a channel mask, and the four
per-region encoders (separate weights, identical shapes) run as a single
``nn.vmap`` over the region axis — one compiled program, batch-busy MXU —
instead of four sequential ModuleDict calls (brain_encoder.py:147-150).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import BrainEncoderConfig
from .layers import MultiHeadAttention, RegionConvAttentionEncoder, token_init


class _FusionLayer(nn.Module):
    """Pre-norm transformer encoder layer (torch ``TransformerEncoderLayer``
    with ``norm_first=True``; brain_encoder.py:66-75)."""

    num_heads: int
    ffn_mult: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        a = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        a = MultiHeadAttention(self.num_heads, dropout=self.dropout, name="attn")(
            a, deterministic=deterministic
        )
        x = x + nn.Dropout(self.dropout)(a, deterministic=deterministic)
        f = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        f = nn.Dense(x.shape[-1] * self.ffn_mult, name="ffn_fc1")(f)
        f = nn.Dropout(self.dropout)(nn.gelu(f), deterministic=deterministic)
        f = nn.Dense(x.shape[-1], name="ffn_fc2")(f)
        x = x + nn.Dropout(self.dropout)(f, deterministic=deterministic)
        return x


class _Enhancer(nn.Module):
    """Linear(h→2h) GELU Dropout Linear(2h→h) LayerNorm
    (feature_enhancer / diversity_projection shape, brain_encoder.py:86-92)."""

    hidden_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        y = nn.Dense(self.hidden_dim * 2, name="fc1")(x)
        y = nn.Dropout(self.dropout)(nn.gelu(y), deterministic=deterministic)
        y = nn.Dense(self.hidden_dim, name="fc2")(y)
        return nn.LayerNorm(epsilon=1e-5, name="ln")(y)


class BrainRegionEncoder(nn.Module):
    """Stacked-region EEG encoder → fused ``(B, hidden_dim)`` feature."""

    cfg: BrainEncoderConfig
    n_regions: int = 4

    @nn.compact
    def __call__(self, eeg, channel_mask=None, *, train: bool = False):
        """``eeg``: (B, R, C, T); ``channel_mask``: (R, C) bool (padded input
        channel slots; already zeroed upstream, accepted for clarity)."""
        cfg = self.cfg
        h = cfg.hidden_dim
        det = not train

        if channel_mask is not None:
            eeg = jnp.where(channel_mask[None, :, :, None], eeg, 0.0)

        # ---- per-region encoders, vmapped over the region axis ----------
        # (B, R, C, T) -> (B, R, T, C) feature-last
        x_in = jnp.swapaxes(eeg, -1, -2)
        EncoderCls = RegionConvAttentionEncoder
        if cfg.remat:
            # trade FLOPs for HBM: recompute region-encoder activations in
            # the backward pass (the 1655-token attentions dominate memory)
            EncoderCls = nn.remat(EncoderCls, static_argnums=(2,))
        VmappedEncoder = nn.vmap(
            EncoderCls,
            in_axes=(1, None),
            out_axes=1,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
            methods=["__call__"],
        )
        feats = VmappedEncoder(cfg.region_encoder, h, name="region_encoders")(
            x_in, train
        )  # (B, R, h)

        # ---- multi-scale processing over the region axis ---------------
        # conv over the 4-region axis at kernel sizes 3/7/15/31, gelu, mean
        # (brain_encoder.py:31-43, 94-113)
        scale_feats = []
        for k in cfg.multi_scale_kernels:
            s = nn.Conv(h, (k,), padding="SAME", name=f"temporal_scale_k{k}")(feats)
            scale_feats.append(nn.gelu(s).mean(axis=1))
        ms = jnp.concatenate(scale_feats, axis=-1)  # (B, 4h)
        y = nn.Dense(h * 2, name="diversity_projection_fc1")(ms)
        y = nn.Dropout(0.1)(nn.gelu(y), deterministic=det)
        y = nn.Dense(h, name="diversity_projection_fc2")(y)
        y = nn.LayerNorm(epsilon=1e-5, name="diversity_projection_ln")(y)
        x = feats + cfg.multi_scale_weight * y[:, None, :]

        # ---- region embeddings (brain_encoder.py:27-28, 159-160) --------
        region_emb = self.param(
            "region_embeddings", token_init, (self.n_regions, h)
        )
        x = x + cfg.region_embed_weight * region_emb[None]

        # ---- cross-region fusion (brain_encoder.py:163-176) -------------
        enhancer = _Enhancer(h, name="feature_enhancer")
        if not cfg.disable_cross_region_attn:
            for i in range(cfg.fusion_layers):
                x = _FusionLayer(cfg.fusion_heads, name=f"fusion_layer{i}")(
                    x, deterministic=det
                )
            cross = MultiHeadAttention(
                cfg.cross_region_heads, dropout=0.1, name="cross_region_attention"
            )(x, deterministic=det)
            gate = jax.nn.sigmoid(enhancer(x.mean(axis=1), deterministic=det))
            x = x + gate[:, None, :] * cross

        # ---- region weighting + fusion (brain_encoder.py:115-134,179-185)
        if cfg.uniform_region_weight:
            fused = x.mean(axis=1)
        else:
            importance = self.param(
                "region_importance",
                nn.initializers.normal(stddev=0.5),
                (self.n_regions,),
            )
            pooled = x.mean(axis=1)
            g = nn.Dense(h // 2, name="region_gate_fc1")(pooled)
            g = nn.Dropout(0.1)(nn.gelu(g), deterministic=det)
            g = nn.Dense(self.n_regions, name="region_gate_fc2")(g)
            dynamic = jax.nn.sigmoid(g)
            static = jax.nn.softmax(importance)
            combined = jax.nn.softmax(
                cfg.static_weight_frac * static[None]
                + (1.0 - cfg.static_weight_frac) * dynamic,
                axis=1,
            )
            fused = (x * combined[..., None]).sum(axis=1)

        # ---- final enhancement (brain_encoder.py:187-192) ---------------
        enhanced = enhancer(fused, deterministic=det)
        return fused + cfg.enhancer_weight * enhanced

    # ------------------------------------------------------------------
    @staticmethod
    def region_weights(params, cfg: BrainEncoderConfig):
        """Static softmax region importance for logging
        (reference: get_region_weights, brain_encoder.py:195-212)."""
        names = ("frontal", "temporal", "central", "parietal")
        if cfg.uniform_region_weight or "region_importance" not in params:
            return {"names": names, "softmax": [0.25] * 4, "has_dynamic": False}
        w = jax.nn.softmax(params["region_importance"])
        return {"names": names, "softmax": list(map(float, w)), "has_dynamic": True}


def feature_diversity_stats(region_feats: jax.Array) -> dict:
    """Diversity monitoring on per-region features ``(B, R, h)``
    (reference: get_feature_diversity_stats, brain_encoder.py:214-239):
    diversity = 1 − mean off-diagonal cosine similarity."""
    x = region_feats / (jnp.linalg.norm(region_feats, axis=-1, keepdims=True) + 1e-12)
    sim = jnp.einsum("brh,bsh->brs", x, x).mean(axis=0)
    r = sim.shape[0]
    mask = ~jnp.eye(r, dtype=bool)
    diversity = 1.0 - sim[mask].mean()
    return {"diversity_score": diversity, "region_similarities": sim}
