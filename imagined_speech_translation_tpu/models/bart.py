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

Decode-path specializations (round 3, both loop-invariant hoists):

* ``cross_attn_kv`` — cross-attention K/V are projections of the (fixed)
  encoder states; computing them once per generate call removes 2 matmuls ×
  layers × steps from the decode loop with bit-identical outputs.
* ``cross_attn_const`` — the EEG pseudo-encoder is a TILED sequence (every
  position is the same vector), so softmax attention over it is the identity
  on V: the whole cross-attention block collapses to
  ``out_proj(v_proj(enc_vec))`` — a per-call constant, no per-step
  cross-attention at all.  (Equal logits → exactly uniform probabilities →
  the value mean is the value itself; this is the same math with one fewer
  rounding through the 1/S softmax weights.)
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

    d: int
    num_heads: int
    dropout: float = 0.0

    def setup(self):
        self.q_proj = nn.Dense(self.d)
        self.k_proj = nn.Dense(self.d)
        self.v_proj = nn.Dense(self.d)
        self.out_proj = nn.Dense(self.d)
        self.drop = nn.Dropout(self.dropout)

    def _split(self, t):
        hd = self.d // self.num_heads
        return t.reshape(t.shape[:-1] + (self.num_heads, hd)).swapaxes(-3, -2)

    def kv(self, kv_in):
        """(k, v) head-split projections — loop-invariant for fixed
        ``kv_in`` (decode-time cross-attention hoist)."""
        return self._split(self.k_proj(kv_in)), self._split(self.v_proj(kv_in))

    def uniform_const(self, vec):
        """Cross-attention output when every key/value position holds
        ``vec`` (the tiled pseudo-encoder): softmax weights are exactly
        uniform, so attention returns v itself — ``out_proj(v_proj(vec))``.
        ``vec``: (B, d) → (B, d)."""
        return self.out_proj(self.v_proj(vec))

    def __call__(
        self, x, kv=None, mask=None, *, cache=None, kv_pair=None,
        deterministic=True,
    ):
        hd = self.d // self.num_heads
        q = self._split(self.q_proj(x))
        if kv_pair is not None:
            k, v = kv_pair
        else:
            k, v = self.kv(x if kv is None else kv)

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
            probs = self.drop(probs, deterministic=False)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        else:
            out = dot_product_attention(q, k, v, mask=mask)
        out = out.swapaxes(-3, -2).reshape(x.shape[:-1] + (self.d,))
        out = self.out_proj(out)
        return out, new_cache


class _BartDecoderLayer(nn.Module):
    """Post-norm decoder layer (HF ``BartDecoderLayer``)."""

    cfg: BartConfig

    def setup(self):
        cfg = self.cfg
        self.self_attn = _BartAttention(
            cfg.d_model, cfg.num_heads, cfg.attention_dropout
        )
        self.self_attn_layer_norm = nn.LayerNorm(epsilon=1e-5)
        self.encoder_attn = _BartAttention(
            cfg.d_model, cfg.num_heads, cfg.attention_dropout
        )
        self.encoder_attn_layer_norm = nn.LayerNorm(epsilon=1e-5)
        self.fc1 = nn.Dense(cfg.ffn_dim)
        self.fc2 = nn.Dense(cfg.d_model)
        self.final_layer_norm = nn.LayerNorm(epsilon=1e-5)
        self.drop = nn.Dropout(cfg.dropout)

    def cross_kv(self, encoder_hidden):
        return self.encoder_attn.kv(encoder_hidden)

    def cross_const(self, enc_vec):
        return self.encoder_attn.uniform_const(enc_vec)

    def __call__(
        self,
        x,
        encoder_hidden,
        self_mask,
        cross_mask=None,
        *,
        cache=None,
        cross_kv=None,
        cross_const=None,
        deterministic=True,
    ):
        def drop(t):
            return self.drop(t, deterministic=deterministic)

        residual = x
        a, new_cache = self.self_attn(
            x, mask=self_mask, cache=cache, deterministic=deterministic
        )
        x = self.self_attn_layer_norm(residual + drop(a))

        residual = x
        if cross_const is not None:
            # tiled pseudo-encoder: attention is the identity on V
            a = cross_const[:, None, :] if cross_const.ndim == 2 else cross_const
        else:
            a, _ = self.encoder_attn(
                x, kv=encoder_hidden, mask=cross_mask, kv_pair=cross_kv,
                deterministic=deterministic,
            )
        x = self.encoder_attn_layer_norm(residual + drop(a))

        residual = x
        f = self.fc1(x)
        f = nn.gelu(f, approximate=False)
        f = self.drop(f, deterministic=deterministic)
        f = self.fc2(f)
        x = self.final_layer_norm(residual + drop(f))
        return x, new_cache


class BartDecoderModel(nn.Module):
    """Decoder + tied lm_head.  Entry modes:

    * full-sequence (training / teacher forcing): ``caches=None``, causal mask
      over ``(L, L)``;
    * incremental (decode): pass ``caches`` from :meth:`init_cache` and 1-token
      inputs with explicit ``positions``; optionally ``cross_kvs`` (from
      ``method='cross_attn_kv'``) or ``cross_consts`` (from
      ``method='cross_attn_const'``, tiled pseudo-encoder only) to hoist the
      loop-invariant cross-attention work out of the decode loop.
    """

    cfg: BartConfig

    def setup(self):
        cfg = self.cfg
        self.shared = nn.Embed(
            cfg.vocab_size,
            cfg.d_model,
            embedding_init=nn.initializers.normal(stddev=0.02),
        )
        self.embed_positions = self.param(
            "embed_positions",
            nn.initializers.normal(stddev=0.02),
            (cfg.max_position_embeddings + cfg.position_offset, cfg.d_model),
        )
        self.layernorm_embedding = nn.LayerNorm(epsilon=1e-5)
        for li in range(cfg.decoder_layers):
            setattr(self, f"layer{li}", _BartDecoderLayer(cfg))
        if cfg.tie_word_embeddings:
            self.final_logits_bias = self.param(
                "final_logits_bias", nn.initializers.zeros, (cfg.vocab_size,)
            )
        self.embed_drop = nn.Dropout(cfg.dropout)

    def _layer(self, li: int) -> _BartDecoderLayer:
        return getattr(self, f"layer{li}")

    def cross_attn_kv(self, encoder_hidden):
        """Per-layer (k, v) cross-attention projections of fixed encoder
        states — compute once per generate call."""
        return [
            self._layer(li).cross_kv(encoder_hidden)
            for li in range(self.cfg.decoder_layers)
        ]

    def cross_attn_const(self, enc_vec):
        """Per-layer constant cross-attention outputs for a TILED
        pseudo-encoder built from ``enc_vec`` (B, d)."""
        return [
            self._layer(li).cross_const(enc_vec)
            for li in range(self.cfg.decoder_layers)
        ]

    def __call__(
        self,
        decoder_input_ids: jax.Array,       # (B, L) int
        encoder_hidden_states: jax.Array | None = None,  # (B, S, d)
        encoder_attention_mask: jax.Array | None = None,  # (B, S)
        *,
        positions: jax.Array | None = None,  # (B, L) int
        caches=None,
        cross_kvs=None,
        cross_consts=None,
        train: bool = False,
        return_hidden: bool = False,
    ):
        cfg = self.cfg
        det = not train
        b, l = decoder_input_ids.shape
        if encoder_hidden_states is None and cross_kvs is None and (
            cross_consts is None
        ):
            raise ValueError(
                "need encoder_hidden_states, cross_kvs, or cross_consts"
            )

        x = self.shared(decoder_input_ids)
        if cfg.scale_embedding:
            x = x * (cfg.d_model**0.5)

        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
        x = x + jnp.take(
            self.embed_positions, positions + cfg.position_offset, axis=0
        )
        x = self.layernorm_embedding(x)
        x = self.embed_drop(x, deterministic=det)

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
            x, c = self._layer(li)(
                x,
                encoder_hidden_states,
                self_mask,
                cross_mask,
                cache=None if caches is None else caches[li],
                cross_kv=None if cross_kvs is None else cross_kvs[li],
                cross_const=None if cross_consts is None else cross_consts[li],
                deterministic=det,
            )
            new_caches.append(c)

        hidden = x
        logits = self.shared.attend(x)
        if cfg.tie_word_embeddings:
            logits = logits + self.final_logits_bias
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
