"""Region-encoder building blocks (flax.linen).

Behavioral re-implementation of ``main_model/src/models/layers.py`` (the
``Conv1DWithAttention`` per-region encoder, ``SqueezeExciteBlock``,
``FeedForwardNetwork``), redesigned for TPU:

* feature-last ``(batch, time, channel)`` layout so conv/matmul channels sit
  in MXU lanes;
* attention routed through ``ops.dot_product_attention`` (Pallas flash kernel
  on TPU for the 1655-token sequences — the reference's O(T²) hot spot,
  layers.py:230-251);
* all shapes static; dropout/BN flagged by ``deterministic`` /
  ``use_running_average``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import RegionEncoderConfig
from ..ops import dot_product_attention

default_kernel_init = nn.initializers.lecun_normal()
token_init = nn.initializers.normal(stddev=0.02)


class SqueezeExcite(nn.Module):
    """Channel attention (reference: SqueezeExciteBlock, layers.py:275-298).

    Input/output ``(B, T, C)``: squeeze = mean over time, excitation =
    Linear(C→C/r) ReLU Linear(→C) sigmoid, applied multiplicatively."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        squeezed = x.mean(axis=-2)  # (B, C)
        e = nn.Dense(max(1, c // self.reduction), name="fc1")(squeezed)
        e = nn.relu(e)
        e = nn.Dense(c, name="fc2")(e)
        e = jax.nn.sigmoid(e)
        return x * e[..., None, :]


class GatedFFN(nn.Module):
    """Gated feed-forward (reference: FeedForwardNetwork, layers.py:301-317):
    ``linear2(dropout(gelu(linear1(x)) * sigmoid(gate(x))))``."""

    hidden_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.gelu(nn.Dense(self.hidden_dim, name="linear1")(x))
        g = jax.nn.sigmoid(nn.Dense(self.hidden_dim, name="gate")(x))
        y = nn.Dropout(self.dropout)(h * g, deterministic=deterministic)
        return nn.Dense(x.shape[-1], name="linear2")(y)


class MultiHeadAttention(nn.Module):
    """MHA over ``(B, S, D)`` with optional KV cache for decode.

    Equivalent to ``torch.nn.MultiheadAttention(batch_first=True)`` with
    separate q/k/v/out projections.  Attention-prob dropout runs in-kernel on
    the flash path (TPU, training and eval) and via ``jax.random.bernoulli``
    on the jnp path (CPU oracle) — same distribution, different bits.
    """

    num_heads: int
    dropout: float = 0.0
    out_features: int | None = None
    # >1 routes through parallel.context.ring_attention: q/k/v sharded on
    # the ``seq_axis`` mesh axis of the mesh installed by ``context_mesh``.
    # Window context parallelism — see RegionEncoderConfig.seq_shards.
    seq_shards: int = 1
    seq_axis: str = "seq"

    @nn.compact
    def __call__(
        self,
        q_in,
        kv_in=None,
        mask=None,
        *,
        deterministic: bool = True,
        cache=None,
        kv_valid=None,
    ):
        kv_in = q_in if kv_in is None else kv_in
        d = self.out_features or q_in.shape[-1]
        if d % self.num_heads:
            raise ValueError(f"dim {d} not divisible by heads {self.num_heads}")
        hd = d // self.num_heads

        def split(x):
            return x.reshape(x.shape[:-1] + (self.num_heads, hd)).swapaxes(-3, -2)

        q = split(nn.Dense(d, name="q_proj")(q_in))
        k = split(nn.Dense(d, name="k_proj")(kv_in))
        v = split(nn.Dense(d, name="v_proj")(kv_in))

        new_cache = None
        if cache is not None:
            # cache: {'k': (B,H,L,hd), 'v': ..., 'index': scalar}
            idx = cache["index"]
            k = jax.lax.dynamic_update_slice(cache["k"], k, (0, 0, idx, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v, (0, 0, idx, 0))
            new_cache = {"k": k, "v": v, "index": idx + q_in.shape[-2]}

        if self.seq_shards > 1:
            if cache is not None or mask is not None:
                raise ValueError(
                    "seq_shards>1 supports only the self/cross-encoder "
                    "pattern (no KV cache, no attention mask)"
                )
            from ..parallel.context import get_context_mesh, ring_attention

            mesh = get_context_mesh()
            if mesh is None:
                raise RuntimeError(
                    "seq_shards>1 requires the mesh: wrap model init/apply "
                    "tracing in parallel.context.context_mesh(mesh)"
                )
            # ring path: no attention-prob dropout (documented contract in
            # parallel/context.py); other dropouts are unaffected
            out = ring_attention(
                q, k, v, mesh=mesh, axis=self.seq_axis, kv_valid=kv_valid
            )
            out = out.swapaxes(-3, -2).reshape(
                out.shape[:-3] + (q_in.shape[-2], d)
            )
            return nn.Dense(d, name="out_proj")(out)

        if kv_valid is not None:
            raise ValueError("kv_valid is only used on the seq_shards>1 path")
        use_drop = (not deterministic) and self.dropout > 0.0
        if use_drop:
            # attention-prob dropout rides the flash kernel on TPU (in-kernel
            # PRNG) so the training hot loop never materializes (S, S)
            out = dot_product_attention(
                q, k, v, mask=mask,
                dropout_rate=self.dropout,
                dropout_rng=self.make_rng("dropout"),
            )
        else:
            out = dot_product_attention(q, k, v, mask=mask)

        out = out.swapaxes(-3, -2).reshape(out.shape[:-3] + (q_in.shape[-2], d))
        out = nn.Dense(d, name="out_proj")(out)
        if cache is not None:
            return out, new_cache
        return out


def _make_norm(norm: str, gn_groups: int, det: bool, name: str):
    if norm == "batch":
        return nn.BatchNorm(
            use_running_average=det, momentum=0.9, epsilon=1e-5, name=name
        )
    if norm == "group":
        return nn.GroupNorm(num_groups=gn_groups, epsilon=1e-5, name=name)
    raise ValueError(f"unknown norm {norm!r}")


class _ConvBN(nn.Module):
    """Conv1d + norm on (B, T, C)."""

    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = True
    groups: int = 1
    norm: str = "batch"
    gn_groups: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel,),
            strides=(self.stride,),
            padding="SAME",
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            name="conv",
        )(x)
        return _make_norm(self.norm, self.gn_groups, not train, "bn")(x)


class RegionConvAttentionEncoder(nn.Module):
    """Per-region encoder: conv stem → SE → token attention → pooled feature.

    Reference: ``Conv1DWithAttention`` (layers.py:9-272).  Stages:
    conv k=9→128, k=7→256, depthwise5+pointwise→384, k=5→512, k=3→768, each
    BN + 1×1-conv residual + GELU + tiered dropout; SE; CLS + 3 temporal
    tokens; learned positions (repeat-extended on overflow, layers.py:219-225);
    3 pre-norm MHA layers (heads 8/4/4) with gated FFN and a shared
    cross-scale attention to the previous layer's state scaled ×0.1; pooling
    CLS + 0.3·mean(temporal); 3 multi-scale projections → final projection;
    output ``feat + 0.1·normalize(diversity_head(feat))``.

    ``cnn_only=True`` reproduces the ablation path (layers.py:180-207).
    Input ``(B, T, C_in)`` feature-last; output ``(B, hidden_dim)``.
    """

    cfg: RegionEncoderConfig
    hidden_dim: int = 768

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NOTE: ``train`` is positional — nn.vmap does not forward kwargs.
        cfg = self.cfg
        h = self.hidden_dim
        drop_light, drop_med, drop_heavy = cfg.dropout_tiers
        det = not train

        def dropout(x, rate):
            return nn.Dropout(rate)(x, deterministic=det)

        # ---- conv stem -------------------------------------------------
        for i, (feats, kern, stride) in enumerate(
            zip(cfg.conv_channels, cfg.conv_kernels, cfg.conv_strides)
        ):
            if i == cfg.depthwise_stage:
                # depthwise + pointwise, no residual (layers.py:156-161)
                y = nn.Conv(
                    x.shape[-1], (kern,), padding="SAME",
                    feature_group_count=x.shape[-1], name=f"stage{i}_depthwise",
                )(x)
                y = nn.Conv(feats, (1,), name=f"stage{i}_pointwise")(y)
                y = _make_norm(
                    cfg.norm, cfg.groupnorm_groups, det, f"stage{i}_bn"
                )(y)
                x = dropout(nn.gelu(y), drop_med)
                continue
            if x.shape[-1] == feats and stride == 1:
                residual = x
            else:
                residual = _ConvBN(
                    feats, 1, stride=stride, use_bias=False,
                    norm=cfg.norm, gn_groups=cfg.groupnorm_groups,
                    name=f"stage{i}_residual",
                )(x, train=train)
            y = _ConvBN(
                feats, kern, stride=stride,
                norm=cfg.norm, gn_groups=cfg.groupnorm_groups,
                name=f"stage{i}_convbn",
            )(x, train=train)
            y = nn.gelu(y + residual)
            rate = drop_light if i < 2 else (drop_med if i < 4 else drop_heavy)
            x = dropout(y, rate)

        x = SqueezeExcite(cfg.se_reduction, name="se")(x)
        x = dropout(x, drop_heavy)
        c_out = x.shape[-1]  # 768

        if cfg.cnn_only:
            return self._cnn_only_pool(x, det)

        # ---- token attention ------------------------------------------
        # cnn_to_attn MLP (layers.py:61-71)
        y = nn.Dense(h * 2, name="cnn_to_attn_fc1")(x)
        y = nn.LayerNorm(epsilon=1e-5, name="cnn_to_attn_ln1")(y)
        y = dropout(nn.gelu(y), 0.1)
        y = nn.Dense(h, name="cnn_to_attn_fc2")(y)
        y = nn.LayerNorm(epsilon=1e-5, name="cnn_to_attn_ln2")(y)
        y = dropout(nn.gelu(y), 0.05)
        x = nn.Dense(h, name="cnn_to_attn_fc3")(y)

        b, t = x.shape[0], x.shape[1]
        n_special = 1 + cfg.num_temporal_tokens
        cls = self.param("cls_token", token_init, (1, 1, h))
        temporal = self.param("temporal_tokens", token_init, (1, cfg.num_temporal_tokens, h))
        x = jnp.concatenate(
            [jnp.tile(cls, (b, 1, 1)), jnp.tile(temporal, (b, 1, 1)), x], axis=1
        )

        seq_len = t + n_special
        if cfg.use_positional_embedding:
            pos = self.param("pos_emb", token_init, (1, seq_len, h))
            if x.shape[1] <= seq_len:
                x = x + pos[:, : x.shape[1]]
            else:  # repeat-extension overflow path (layers.py:219-225)
                reps = x.shape[1] // seq_len + 1
                x = x + jnp.tile(pos, (1, reps, 1))[:, : x.shape[1]]

        # window context parallelism (seq_shards > 1): zero-pad the token
        # sequence to a shard multiple and exclude the padded KEYS from
        # every softmax via kv_valid — identical math, sharded time axis
        # (parallel/context.py).  Padded rows ride the residual stream as
        # garbage but are never attended to and never pooled (pooling reads
        # tokens 0..n_special-1 only).
        n_cp = cfg.seq_shards
        kv_valid = None
        if n_cp > 1:
            true_len = x.shape[1]
            pad = (-true_len) % n_cp
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            kv_valid = jnp.arange(x.shape[1]) < true_len
        cp_kw = dict(seq_shards=n_cp, seq_axis=cfg.seq_axis)

        # single shared cross-scale attention module reused by every layer
        # (reference keeps one ``self.cross_scale_attn``, layers.py:98-103)
        cross_scale_attn = MultiHeadAttention(
            cfg.attn_heads[0] // 2, dropout=0.1, name="cross_scale_attn",
            **cp_kw,
        )
        states = []
        for i in range(cfg.num_attn_layers):
            a = nn.LayerNorm(epsilon=1e-5, name=f"attn{i}_norm")(x)
            a = MultiHeadAttention(
                cfg.attn_heads[i], dropout=0.1, name=f"attn{i}", **cp_kw
            )(a, deterministic=det, kv_valid=kv_valid)
            x = x + dropout(a, drop_light)
            states.append(x)
            f = nn.LayerNorm(epsilon=1e-5, name=f"ffn{i}_norm")(x)
            f = GatedFFN(h * (4 if i == 0 else 2), name=f"ffn{i}")(
                f, deterministic=det
            )
            x = x + dropout(f, drop_med)
            if i > 0:
                # cross-scale attention to the pre-FFN state of the previous
                # layer (layers.py:244-251)
                cross = cross_scale_attn(
                    x, states[-2], deterministic=det, kv_valid=kv_valid
                )
                x = x + cfg.cross_scale_weight * cross

        cls_feat = x[:, 0]
        temporal_feat = x[:, 1 : 1 + cfg.num_temporal_tokens].mean(axis=1)
        combined = cls_feat + cfg.temporal_pool_weight * temporal_feat
        return self._project(combined, det)

    # ------------------------------------------------------------------
    def _multi_scale_proj(self, inputs: Sequence[jax.Array], det: bool):
        outs = []
        for i, inp in enumerate(inputs):
            y = nn.Dense(self.hidden_dim, name=f"multi_scale_proj{i}_fc")(inp)
            y = nn.LayerNorm(epsilon=1e-5, name=f"multi_scale_proj{i}_ln")(y)
            y = nn.Dropout(0.05)(nn.gelu(y), deterministic=det)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)

    def _project(self, feat, det: bool):
        h = self.hidden_dim
        combined = self._multi_scale_proj([feat, feat, feat], det)
        y = nn.Dense(h * 2, name="projection_fc1")(combined)
        y = nn.LayerNorm(epsilon=1e-5, name="projection_ln1")(y)
        y = nn.Dropout(0.1)(nn.gelu(y), deterministic=det)
        y = nn.Dense(h, name="projection_fc2")(y)
        final = nn.LayerNorm(epsilon=1e-5, name="projection_ln2")(y)
        div = nn.Dense(h, name="diversity_head")(final)
        div = div / (jnp.linalg.norm(div, axis=-1, keepdims=True) + 1e-12)
        return final + self.cfg.diversity_weight * div

    def _cnn_only_pool(self, x, det: bool):
        # (B, T, 768): mean/max/attention pooling (layers.py:180-207)
        mean_pool = x.mean(axis=1)
        max_pool = x.max(axis=1)
        attn_w = jax.nn.softmax(jnp.sum(x * mean_pool[:, None, :], axis=2), axis=1)
        attn_pool = jnp.sum(x * attn_w[..., None], axis=1)
        combined = self._multi_scale_proj([mean_pool, max_pool, attn_pool], det)
        h = self.hidden_dim
        y = nn.Dense(h * 2, name="projection_fc1")(combined)
        y = nn.LayerNorm(epsilon=1e-5, name="projection_ln1")(y)
        y = nn.Dropout(0.1)(nn.gelu(y), deterministic=det)
        y = nn.Dense(h, name="projection_fc2")(y)
        final = nn.LayerNorm(epsilon=1e-5, name="projection_ln2")(y)
        div = nn.Dense(h, name="diversity_head")(final)
        div = div / (jnp.linalg.norm(div, axis=-1, keepdims=True) + 1e-12)
        return final + self.cfg.diversity_weight * div
