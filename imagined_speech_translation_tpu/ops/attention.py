"""Scaled-dot-product attention with a Pallas flash kernel on TPU.

The reference's FLOPs hot spot is dense O(T²) ``nn.MultiheadAttention`` over
the 1655-token per-region sequence (``main_model/src/models/layers.py:83-103,
230-251``; SURVEY.md §3.2).  Here attention goes through one wrapper:

* ``impl='jnp'`` — reference einsum implementation (CPU tests, oracle).
* ``impl='flash'`` — blocked online-softmax Pallas kernel with a custom VJP
  and in-kernel attention-prob dropout (``pallas_attention``) — the training
  AND eval/decode path on TPU.
* ``impl='auto'`` — flash on TPU when the head dim/seq length tile cleanly,
  jnp otherwise.

Layout convention: ``(batch, heads, seq, head_dim)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_causal_mask(q_len: int, k_len: int, dtype=jnp.bool_) -> jax.Array:
    """Lower-triangular (q, k) mask; True = attend."""
    i = jnp.arange(q_len)[:, None]
    j = jnp.arange(k_len)[None, :]
    return (j <= i + (k_len - q_len)).astype(dtype)


def _jnp_attention(q, k, v, mask, scale, dropout_rate=0.0, dropout_rng=None):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _flash_available(q, k, mask) -> bool:
    if mask is not None:  # the kernel is unmasked-only (encoder pattern)
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    *_, q_len, d = q.shape
    k_len = k.shape[-2]
    # the kernel pads internally; only bail out on shapes where padding would
    # dominate (tiny decode-style queries are cheaper dense)
    return q_len >= 128 and k_len >= 128 and d <= 256


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    *,
    scale: float | None = None,
    impl: str = "auto",
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """Attention over ``(B, H, S, D)`` tensors.

    ``mask`` broadcasts against ``(B, H, Q, K)``; True = attend.
    ``dropout_rate`` applies attention-probability dropout (reference:
    ``nn.MultiheadAttention(dropout=...)``); requires ``dropout_rng``.  The
    flash path draws its mask from the in-kernel TPU PRNG seeded from
    ``dropout_rng``; the jnp path uses ``jax.random.bernoulli`` — both give
    i.i.d. Bernoulli(1-rate) keeps, but not the same bits.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if dropout_rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    if impl == "auto":
        impl = "flash" if _flash_available(q, k, mask) else "jnp"
    if impl == "flash":
        from .pallas_attention import flash_attention

        seed = None
        if dropout_rate > 0.0:
            seed = jax.random.randint(
                dropout_rng, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
        try:
            return flash_attention(
                q, k, v, mask=mask, scale=scale,
                dropout_rate=dropout_rate, dropout_seed=seed,
            )
        except NotImplementedError:
            impl = "jnp"
    if impl != "jnp":
        raise ValueError(f"unknown attention impl {impl!r}")
    return _jnp_attention(q, k, v, mask, scale, dropout_rate, dropout_rng)
