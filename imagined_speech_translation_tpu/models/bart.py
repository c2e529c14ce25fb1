"""From-scratch JAX BART seq2seq decoder (``fnlp/bart-base-chinese`` family).

The reference wraps HF ``BartForConditionalGeneration`` and bypasses its text
encoder entirely: the single EEG feature vector is projected and tiled to a
pseudo "encoder sequence" of length ``config.encoder_layers`` (=6) injected
via ``encoder_outputs`` (``main_model/src/models/bart_decoder.py:29-48``).
This module implements exactly the machinery that actually runs: shared token
embedding, learned positions (offset 2), ``layernorm_embedding``, N post-norm
decoder layers (self-attention with causal mask → cross-attention to the
pseudo-encoder states → FFN, each with residual + LayerNorm after — HF BART's
``normalize_before=False`` ordering), tied lm_head + ``final_logits_bias``.

Numerics are validated token-identically against HF's torch implementation in
``tests/test_bart_parity.py``.  Incremental decoding uses an explicit KV
cache threaded functionally (static shapes, ``lax.dynamic_update_slice``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import BartConfig
from ..ops import dot_product_attention


def pseudo_encoder_sequence(proj_eeg: jax.Array, length: int) -> jax.Array:
    """Tile a ``(B, d)`` projected EEG feature to ``(B, length, d)``
    (reference: create_encoder_sequence, bart_decoder.py:29-33)."""
    return jnp.tile(proj_eeg[:, None, :], (1, length, 1))


class _BartAttention(nn.Module):
    """HF ``BartAttention``: q/k/v/out projections, q pre-scaled by
    ``head_dim**-0.5``; optional growing KV cache for self-attention."""

    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, kv=None, mask=None, *, cache=None, deterministic=True):
        d = x.shape[-1]
        hd = d // self.num_heads
        kv = x if kv is None else kv

        def split(t):
            return t.reshape(t.shape[:-1] + (self.num_heads, hd)).swapaxes(-3, -2)

        q = split(nn.Dense(d, name="q_proj")(x))
        k = split(nn.Dense(d, name="k_proj")(kv))
        v = split(nn.Dense(d, name="v_proj")(kv))

        new_cache = None
        if cache is not None:
            idx = cache["index"]
            k = jax.lax.dynamic_update_slice(cache["k"], k, (0, 0, idx, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v, (0, 0, idx, 0))
            new_cache = {"k": k, "v": v, "index": idx + x.shape[-2]}

        if (not deterministic) and self.dropout > 0.0:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (
                hd**-0.5
            )
            if mask is not None:
                logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(logits, axis=-1)
            probs = nn.Dropout(self.dropout)(probs, deterministic=False)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        else:
            out = dot_product_attention(q, k, v, mask=mask)
        out = out.swapaxes(-3, -2).reshape(x.shape[:-1] + (d,))
        out = nn.Dense(d, name="out_proj")(out)
        return out, new_cache


class _BartDecoderLayer(nn.Module):
    """Post-norm decoder layer (HF ``BartDecoderLayer``)."""

    cfg: BartConfig

    @nn.compact
    def __call__(
        self,
        x,
        encoder_hidden,
        self_mask,
        cross_mask=None,
        *,
        cache=None,
        deterministic=True,
    ):
        cfg = self.cfg

        def drop(t):
            return nn.Dropout(cfg.dropout)(t, deterministic=deterministic)

        residual = x
        a, new_cache = _BartAttention(
            cfg.num_heads, cfg.attention_dropout, name="self_attn"
        )(x, mask=self_mask, cache=cache, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(residual + drop(a))

        residual = x
        a, _ = _BartAttention(
            cfg.num_heads, cfg.attention_dropout, name="encoder_attn"
        )(x, kv=encoder_hidden, mask=cross_mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="encoder_attn_layer_norm")(residual + drop(a))

        residual = x
        f = nn.Dense(cfg.ffn_dim, name="fc1")(x)
        f = nn.gelu(f, approximate=False)
        f = nn.Dropout(cfg.dropout)(f, deterministic=deterministic)
        f = nn.Dense(x.shape[-1], name="fc2")(f)
        x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(residual + drop(f))
        return x, new_cache


class BartDecoderModel(nn.Module):
    """Decoder + tied lm_head.  Two entry modes:

    * full-sequence (training / teacher forcing): ``caches=None``, causal mask
      over ``(L, L)``;
    * incremental (decode): pass ``caches`` from :meth:`init_cache` and 1-token
      inputs with explicit ``positions``.
    """

    cfg: BartConfig

    @nn.compact
    def __call__(
        self,
        decoder_input_ids: jax.Array,       # (B, L) int
        encoder_hidden_states: jax.Array,   # (B, S, d)
        encoder_attention_mask: jax.Array | None = None,  # (B, S)
        *,
        positions: jax.Array | None = None,  # (B, L) int
        caches=None,
        train: bool = False,
        return_hidden: bool = False,
    ):
        cfg = self.cfg
        det = not train
        b, l = decoder_input_ids.shape

        shared = nn.Embed(
            cfg.vocab_size,
            cfg.d_model,
            embedding_init=nn.initializers.normal(stddev=0.02),
            name="shared",
        )
        x = shared(decoder_input_ids)
        if cfg.scale_embedding:
            x = x * (cfg.d_model**0.5)

        pos_table = self.param(
            "embed_positions",
            nn.initializers.normal(stddev=0.02),
            (cfg.max_position_embeddings + cfg.position_offset, cfg.d_model),
        )
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
        x = x + jnp.take(pos_table, positions + cfg.position_offset, axis=0)
        x = nn.LayerNorm(epsilon=1e-5, name="layernorm_embedding")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=det)

        # self-attention mask
        if caches is None:
            i = jnp.arange(l)[:, None]
            j = jnp.arange(l)[None, :]
            self_mask = (j <= i)[None, None]  # (1,1,L,L)
        else:
            # query at absolute position p attends keys [0..p]
            kmax = caches[0]["k"].shape[-2]
            j = jnp.arange(kmax)[None, None, None, :]
            self_mask = j <= positions[:, None, :, None]  # (B,1,L,Kmax)

        cross_mask = None
        if encoder_attention_mask is not None:
            cross_mask = encoder_attention_mask[:, None, None, :].astype(bool)

        new_caches = []
        for li in range(cfg.decoder_layers):
            x, c = _BartDecoderLayer(cfg, name=f"layer{li}")(
                x,
                encoder_hidden_states,
                self_mask,
                cross_mask,
                cache=None if caches is None else caches[li],
                deterministic=det,
            )
            new_caches.append(c)

        hidden = x
        logits = shared.attend(x)
        if cfg.tie_word_embeddings:
            bias = self.param(
                "final_logits_bias", nn.initializers.zeros, (cfg.vocab_size,)
            )
            logits = logits + bias
        if caches is None:
            return (logits, hidden) if return_hidden else logits
        return logits, new_caches

    # ------------------------------------------------------------------
    def init_cache(self, batch: int, max_length: int, dtype=jnp.float32):
        hd = self.cfg.d_model // self.cfg.num_heads
        return [
            {
                "k": jnp.zeros((batch, self.cfg.num_heads, max_length, hd), dtype),
                "v": jnp.zeros((batch, self.cfg.num_heads, max_length, hd), dtype),
                "index": 0,
            }
            for _ in range(self.cfg.decoder_layers)
        ]


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, *, label_smoothing: float = 0.0
):
    """Token-level CE with ``-100`` ignore-index (HF semantics: mean over
    non-ignored tokens).  Returns (loss, n_valid_tokens)."""
    vocab = logits.shape[-1]
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -logp.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    nll = jnp.where(valid, nll, 0.0)
    n = jnp.maximum(valid.sum(), 1)
    return nll.sum() / n, valid.sum()
