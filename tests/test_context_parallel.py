"""Context parallelism: ring attention over a ``seq`` mesh axis.

The reference has no sequence/context parallelism (single device handles the
whole T=1651 window; SURVEY.md §2.6) — ``parallel/context.py`` is the
TPU-native scaling path for longer windows.  These tests pin, on the 8-device
virtual CPU mesh:

* forward identity vs the jnp attention oracle (``ops/attention.py``);
* reverse-mode AD identity (the scan+ppermute loop differentiates to the
  correct ring backward without a hand-written VJP);
* composition with a data axis ({data, seq} mesh);
* bf16 inputs (f32 online-softmax accumulation inside).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagined_speech_translation_tpu.ops import dot_product_attention
from imagined_speech_translation_tpu.parallel import ring_attention


def _qkv(rng, b=2, h=4, s=256, d=32, dtype=jnp.float32):
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, d)), dtype) for _ in range(3)
    )
    return q, k, v


def _mesh(shape, names):
    return Mesh(np.asarray(jax.devices()[: np.prod(shape)]).reshape(shape), names)


def test_ring_attention_matches_oracle(rng):
    mesh = _mesh((8,), ("seq",))
    q, k, v = _qkv(rng)
    out = ring_attention(q, k, v, mesh=mesh)
    ref = dot_product_attention(q, k, v, impl="jnp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_gradients_match_oracle(rng):
    mesh = _mesh((4,), ("seq",))
    q, k, v = _qkv(rng, s=128)
    w = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mesh=mesh) * w).sum()

    def loss_ref(q, k, v):
        return (dot_product_attention(q, k, v, impl="jnp") * w).sum()

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_ring_attention_composes_with_data_axis(rng):
    """{data: 2, seq: 4}: batch sharded over data, time over seq — the
    layout a context-parallel trainer would run."""
    mesh = _mesh((2, 4), ("data", "seq"))
    q, k, v = _qkv(rng, b=4, s=128)
    sh = NamedSharding(mesh, P("data", None, "seq", None))
    q, k, v = (jax.device_put(x, sh) for x in (q, k, v))

    @jax.jit
    def run(q, k, v):
        return ring_attention(q, k, v, mesh=mesh)

    out = run(q, k, v)
    ref = dot_product_attention(q, k, v, impl="jnp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_bf16(rng):
    mesh = _mesh((8,), ("seq",))
    q, k, v = _qkv(rng, dtype=jnp.bfloat16)
    out = ring_attention(q, k, v, mesh=mesh)
    assert out.dtype == jnp.bfloat16
    ref = dot_product_attention(q, k, v, impl="jnp")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_ring_attention_validates_divisibility(rng):
    mesh = _mesh((8,), ("seq",))
    q, k, v = _qkv(rng, s=100)
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, mesh=mesh)
