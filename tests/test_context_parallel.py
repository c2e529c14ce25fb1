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


def test_ring_attention_kv_valid_matches_unpadded_oracle(rng):
    """Key-validity masking: S=100 padded to 104 over 4 shards must equal
    the UNPADDED single-device attention on the 100 true rows — the
    contract the region encoder's padding path relies on."""
    mesh = _mesh((4,), ("seq",))
    true_s = 100
    q, k, v = _qkv(rng, s=true_s)
    pad = (-true_s) % 4
    qp, kp, vp = (
        jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0))) for x in (q, k, v)
    )
    kv_valid = jnp.arange(true_s + pad) < true_s
    out = ring_attention(qp, kp, vp, mesh=mesh, kv_valid=kv_valid)
    ref = dot_product_attention(q, k, v, impl="jnp")
    np.testing.assert_allclose(
        np.asarray(out[:, :, :true_s]), np.asarray(ref), atol=2e-5
    )
    assert np.isfinite(np.asarray(out)).all()  # padded q rows stay finite


def test_ring_attention_kv_valid_gradients(rng):
    """Reverse-mode AD through the masked ring: padding must contribute
    exactly zero gradient and true rows must match the unpadded oracle."""
    mesh = _mesh((4,), ("seq",))
    true_s = 60
    q, k, v = _qkv(rng, s=true_s, h=2, d=16)
    pad = (-true_s) % 4
    w = jnp.asarray(rng.normal(size=q.shape), jnp.float32)
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kv_valid = jnp.arange(true_s + pad) < true_s

    def loss_ring(q, k, v):
        qp, kp, vp = (
            jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
            for x in (q, k, v)
        )
        return (
            ring_attention(qp, kp, vp, mesh=mesh, kv_valid=kv_valid) * wp
        ).sum()

    def loss_ref(q, k, v):
        return (dot_product_attention(q, k, v, impl="jnp") * w).sum()

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


# ---------------------------------------------------------------------------
# model-level consumer: RegionEncoderConfig.seq_shards (round-4 verdict 5)
# ---------------------------------------------------------------------------


def _tiny_brain_cfg(seq_shards: int):
    from imagined_speech_translation_tpu.config import (
        BrainEncoderConfig,
        RegionEncoderConfig,
    )

    return BrainEncoderConfig(
        hidden_dim=32, fusion_heads=4, cross_region_heads=4,
        region_encoder=RegionEncoderConfig(
            conv_channels=(8, 12, 16, 24, 32),
            attn_heads=(4, 2, 2), se_reduction=4,
            seq_shards=seq_shards,
        ),
    )


def test_region_encoder_forward_context_parallel_identity(rng):
    """END-TO-END consumer test: the full BrainRegionEncoder forward with
    ``seq_shards=4`` on a {data:2, seq:4} mesh equals the single-device
    forward with the SAME params.  T=33 → 37 tokens (not a shard multiple),
    so the padding + kv_valid path is exercised, not just the op."""
    from imagined_speech_translation_tpu.models import BrainRegionEncoder
    from imagined_speech_translation_tpu.parallel import context_mesh

    t = 33  # 33 + 4 special tokens = 37: pads to 40 over 4 shards
    eeg = jnp.asarray(rng.normal(size=(2, 4, 16, t)), jnp.float32)
    mask = np.zeros((4, 16), bool)
    for r, c in enumerate((16, 9, 11, 12)):
        mask[r, :c] = True
    mask = jnp.asarray(mask)

    oracle = BrainRegionEncoder(_tiny_brain_cfg(1))
    variables = oracle.init(jax.random.key(0), eeg, mask)
    ref = oracle.apply(variables, eeg, mask)

    mesh = _mesh((2, 4), ("data", "seq"))
    sharded_model = BrainRegionEncoder(_tiny_brain_cfg(4))
    with context_mesh(mesh):
        out = jax.jit(
            lambda v, e, m: sharded_model.apply(v, e, m)
        )(variables, eeg, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def _encoder_grads(*, shard_batch: bool):
    """Oracle vs seq_shards=4 gradients on a {data:2, seq:4} mesh; the batch
    is either sharded over ``data`` (the real CP-training layout) or
    replicated (the degenerate layout).  Uses its own seeded generator so
    the data (and hence the float tolerance budget) does not depend on test
    order through the session-scoped ``rng`` fixture."""
    from imagined_speech_translation_tpu.models import BrainRegionEncoder
    from imagined_speech_translation_tpu.parallel import context_mesh

    rng = np.random.default_rng(7)
    t = 17  # 21 tokens -> pads to 24 over 4 shards
    eeg = jnp.asarray(rng.normal(size=(2, 4, 16, t)), jnp.float32)
    mask = np.zeros((4, 16), bool)
    for r, c in enumerate((16, 9, 11, 12)):
        mask[r, :c] = True
    mask = jnp.asarray(mask)

    oracle = BrainRegionEncoder(_tiny_brain_cfg(1))
    variables = oracle.init(jax.random.key(0), eeg, mask)

    def loss_oracle(params, x):
        out = oracle.apply({**variables, "params": params}, x, mask)
        return (out ** 2).sum()

    sharded = BrainRegionEncoder(_tiny_brain_cfg(4))

    def loss_sharded(params, x):
        out = sharded.apply({**variables, "params": params}, x, mask)
        return (out ** 2).sum()

    g_ref = jax.grad(loss_oracle)(variables["params"], eeg)
    mesh = _mesh((2, 4), ("data", "seq"))
    if shard_batch:
        eeg = jax.device_put(eeg, NamedSharding(mesh, P("data")))
    with context_mesh(mesh):
        g_cp = jax.jit(jax.grad(loss_sharded))(variables["params"], eeg)
    return g_ref, g_cp


def test_region_encoder_context_parallel_gradients():
    """Training THROUGH the context-sharded encoder: with the batch sharded
    over ``data`` (the layout every real DPxCP trainer uses), reverse-mode
    AD of the seq_shards=4 forward equals the single-device gradients --
    the property that makes CP a training-capable path, not an eval-only
    one.  Comparison is normalized by the GLOBAL gradient scale, not
    per-leaf: ``k_proj.bias`` gradients are analytically zero (softmax is
    invariant to a uniform key-logit shift), so those leaves hold only
    catastrophic-cancellation residue whose per-leaf relative error is
    reduction-order luck.  Measured absolute diffs are <6e-4 against a
    global max ~4e2 (rel ~1.5e-6); a double-count bug (the
    replicated-batch artifact pinned below) is absdiff ~= leafmax, 3+
    orders above this tolerance."""
    g_ref, g_cp = _encoder_grads(shard_batch=True)
    gscale = max(
        np.abs(np.asarray(leaf)).max() for leaf in jax.tree.leaves(g_ref)
    )

    def _check(path, a, b):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-4 * gscale, (
            f"{jax.tree_util.keystr(path)}: max diff "
            f"{np.abs(a - b).max():.3e} vs global scale {gscale:.3e}"
        )

    jax.tree_util.tree_map_with_path(_check, g_ref, g_cp)


@pytest.mark.xfail(
    strict=True,
    reason="upstream jax/XLA: with the batch REPLICATED over a mesh axis "
    "unmentioned by the ring shard_map, the partitioned backward double-"
    "counts conv-FILTER gradients upstream of the manual region (exactly "
    "x data-axis-size; conv biases, BN and every attention-side param stay "
    "correct).  Real CP training shards the batch over data, where "
    "gradients are exact (test above).  Pinned strictly so a jax upgrade "
    "that fixes it flips this test and the note can be dropped.",
)
def test_region_encoder_cp_gradients_replicated_batch_known_bad():
    g_ref, g_cp = _encoder_grads(shard_batch=False)
    a = np.asarray(
        g_ref["region_encoders"]["stage0_convbn"]["conv"]["kernel"]
    )
    b = np.asarray(
        g_cp["region_encoders"]["stage0_convbn"]["conv"]["kernel"]
    )
    scale = max(np.abs(a).max(), 1e-3)
    np.testing.assert_allclose(a / scale, b / scale, atol=5e-5)

def test_region_encoder_seq_shards_requires_context_mesh(rng):
    from imagined_speech_translation_tpu.models import BrainRegionEncoder

    eeg = jnp.asarray(rng.normal(size=(1, 4, 16, 12)), jnp.float32)
    model = BrainRegionEncoder(_tiny_brain_cfg(4))
    with pytest.raises(RuntimeError, match="context_mesh"):
        model.init(jax.random.key(0), eeg)
