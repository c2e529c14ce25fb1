"""Op-level tests: flash attention kernel (interpret mode on CPU) vs the jnp
reference, wrapper dispatch rules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagined_speech_translation_tpu.ops import dot_product_attention, make_causal_mask
from imagined_speech_translation_tpu.ops.pallas_attention import flash_attention


def _qkv(b=2, h=3, s=200, d=96, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, h, s, d)) * 0.3, dtype)
    return mk(), mk(), mk()


def test_flash_matches_jnp_interpret():
    q, k, v = _qkv()
    ref = dot_product_attention(q, k, v, impl="jnp")
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_unaligned_shapes():
    # 1655-token-style odd seq length + non-128 head dim
    q, k, v = _qkv(b=1, h=2, s=333, d=48, seed=1)
    ref = dot_product_attention(q, k, v, impl="jnp")
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_grad_matches_jnp_interpret():
    # the custom VJP (FlashAttention-2 style dq / dkv kernels) against
    # jax.grad through the jnp oracle
    q, k, v = _qkv(b=1, h=2, s=200, d=96, seed=4)
    scale = q.shape[-1] ** -0.5

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, interpret=True) ** 2).sum()

    def loss_ref(q, k, v):
        from imagined_speech_translation_tpu.ops.attention import _jnp_attention

        return (_jnp_attention(q, k, v, None, scale) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_grad_unaligned_blocks_interpret():
    # odd seq + multi-block kv so the padded-tail masking runs in backward
    q, k, v = _qkv(b=1, h=1, s=333, d=48, seed=5)
    scale = q.shape[-1] ** -0.5

    def loss_flash(q, k, v):
        return flash_attention(
            q, k, v, interpret=True, block_q=128, block_k=128
        ).sum()

    def loss_ref(q, k, v):
        from imagined_speech_translation_tpu.ops.attention import _jnp_attention

        return _jnp_attention(q, k, v, None, scale).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_dropout_requires_seed():
    q, k, v = _qkv(s=128)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, dropout_rate=0.1, interpret=True)


def test_wrapper_dropout_jnp_path():
    # jnp dropout: zeros appear, scaling preserves the mean, rng-deterministic
    q, k, v = _qkv(b=1, h=2, s=64, d=32, seed=6)
    rng = jax.random.PRNGKey(0)
    out = dot_product_attention(
        q, k, v, impl="jnp", dropout_rate=0.5, dropout_rng=rng
    )
    out2 = dot_product_attention(
        q, k, v, impl="jnp", dropout_rate=0.5, dropout_rng=rng
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    ref = dot_product_attention(q, k, v, impl="jnp")
    assert not np.allclose(np.asarray(out), np.asarray(ref))


def test_flash_rejects_mask():
    q, k, v = _qkv(s=128)
    with pytest.raises(NotImplementedError):
        flash_attention(q, k, v, mask=make_causal_mask(128, 128))


def test_wrapper_masked_matches_expected():
    q, k, v = _qkv(b=1, h=1, s=8, d=4, seed=2)
    mask = make_causal_mask(8, 8)[None, None]
    out = dot_product_attention(q, k, v, mask=mask)
    # row 0 attends only key 0 -> output equals v[...,0,:]
    np.testing.assert_allclose(
        np.asarray(out)[0, 0, 0], np.asarray(v)[0, 0, 0], atol=1e-5
    )


def test_custom_scale():
    q, k, v = _qkv(b=1, h=1, s=16, d=8, seed=3)
    a = dot_product_attention(q, k, v, scale=0.01, impl="jnp")
    b_ = dot_product_attention(q, k, v, scale=1.0, impl="jnp")
    assert not np.allclose(np.asarray(a), np.asarray(b_))


def test_flash_dropout_grad_matches_masked_oracle_interpret():
    """Dropout fwd + FUSED backward (interpret) vs a jnp attention carrying
    the exact same keep-mask (host-reconstructed via the portable hash the
    interpret-mode kernels draw from)."""
    from imagined_speech_translation_tpu.ops.pallas_attention import (
        dropout_keep_mask_reference,
    )

    q, k, v = _qkv(b=1, h=2, s=200, d=96, seed=9)
    scale = q.shape[-1] ** -0.5
    rate, seed, bq, bk = 0.3, 7, 128, 128
    keep = dropout_keep_mask_reference(
        seed, 1, 2, 200, 200, block_q=bq, block_k=bk, rate=rate
    )

    def loss_flash(q, k, v):
        return (
            flash_attention(
                q, k, v, dropout_rate=rate, dropout_seed=seed,
                interpret=True, block_q=bq, block_k=bk,
            )
            ** 2
        ).sum()

    def loss_ref(q, k, v):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
        return ((jnp.einsum("bhqk,bhkd->bhqd", probs, v)) ** 2).sum()

    np.testing.assert_allclose(
        float(loss_flash(q, k, v)), float(loss_ref(q, k, v)), rtol=1e-4
    )
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dropout_tile_packing_guard():
    # tile ids pack (bh, qi, ki) into one int32: qi/ki >= 256 or bh >= 2^15
    # would silently alias dropout seeds — must raise, not alias
    q, k, v = _qkv(b=1, h=1, s=256, d=8, seed=7)
    with pytest.raises(ValueError, match="tile-id packing"):
        flash_attention(
            q, k, v, dropout_rate=0.1, dropout_seed=0,
            block_q=128, block_k=1, interpret=True,
        )
    rng = np.random.default_rng(0)
    big = jnp.asarray(rng.normal(size=(1, 40000, 8, 8)) * 0.3, np.float32)
    with pytest.raises(ValueError, match="tile-id packing"):
        flash_attention(
            big, big, big, dropout_rate=0.1, dropout_seed=0, interpret=True
        )
    # no dropout: no packing constraint (ids unused)
    out = flash_attention(q, k, v, block_q=128, block_k=1, interpret=True)
    assert out.shape == q.shape
