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
