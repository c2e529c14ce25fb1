"""Model-library tests: shapes/jit for the region encoder, brain encoder
fusion, assembled model, ablation flags, and KV-cache consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_translation_tpu.config import (
    BartConfig,
    BrainEncoderConfig,
    ModelConfig,
    RegionEncoderConfig,
)
from imagined_speech_translation_tpu.models import (
    BartDecoderModel,
    BrainRegionEncoder,
    EEGDecodingModel,
    RegionConvAttentionEncoder,
    feature_diversity_stats,
)
from imagined_speech_translation_tpu.models.bart import cross_entropy_loss

# Small configs so tests are fast
TINY_REGION = RegionEncoderConfig(
    conv_channels=(8, 16, 24, 32, 48),
    conv_kernels=(9, 7, 5, 5, 3),
    conv_strides=(1, 1, 1, 1, 1),
    attn_heads=(4, 2, 2),
    se_reduction=4,
)
TINY_BRAIN = BrainEncoderConfig(
    hidden_dim=48,
    fusion_heads=4,
    cross_region_heads=4,
    region_encoder=TINY_REGION,
)
TINY_BART = BartConfig(
    vocab_size=120,
    d_model=48,
    encoder_layers=3,
    decoder_layers=2,
    num_heads=4,
    ffn_dim=96,
    max_position_embeddings=32,
)
TINY_MODEL = ModelConfig(
    hidden_dim=48,
    max_region_channels=6,
    region_channel_counts=(6, 3, 4, 5),
    brain_encoder=TINY_BRAIN,
    bart=TINY_BART,
)

B, R, C, T = 2, 4, 6, 64


def _eeg(key=0):
    rng = np.random.default_rng(key)
    eeg = rng.normal(size=(B, R, C, T)).astype(np.float32)
    mask = np.zeros((R, C), bool)
    for r, cnt in enumerate(TINY_MODEL.region_channel_counts):
        mask[r, :cnt] = True
    return jnp.asarray(eeg * mask[None, :, :, None]), jnp.asarray(mask)


def test_region_encoder_shapes():
    enc = RegionConvAttentionEncoder(TINY_REGION, hidden_dim=48)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, C)), jnp.float32)
    variables = enc.init(jax.random.key(0), x)
    out = enc.apply(variables, x)
    assert out.shape == (B, 48)
    assert jnp.isfinite(out).all()


def test_region_encoder_groupnorm_flag():
    import dataclasses

    cfg = dataclasses.replace(TINY_REGION, norm="group", groupnorm_groups=4)
    enc = RegionConvAttentionEncoder(cfg, hidden_dim=48)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, C)), jnp.float32)
    variables = enc.init(jax.random.key(0), x)
    assert "batch_stats" not in variables  # no running stats under GroupNorm
    out = enc.apply(variables, x)
    assert out.shape == (B, 48) and jnp.isfinite(out).all()


def test_region_encoder_cnn_only():
    cfg = RegionEncoderConfig(
        conv_channels=TINY_REGION.conv_channels,
        conv_kernels=TINY_REGION.conv_kernels,
        conv_strides=TINY_REGION.conv_strides,
        attn_heads=TINY_REGION.attn_heads,
        se_reduction=4,
        cnn_only=True,
    )
    enc = RegionConvAttentionEncoder(cfg, hidden_dim=48)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, C)), jnp.float32)
    variables = enc.init(jax.random.key(0), x)
    out = enc.apply(variables, x)
    assert out.shape == (B, 48)
    # no attention params on the cnn_only path
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert not any("attn0" in n for n in names)


def test_brain_encoder_fusion_and_ablations():
    eeg, mask = _eeg()
    enc = BrainRegionEncoder(TINY_BRAIN)
    variables = enc.init(jax.random.key(0), eeg, mask)
    out = enc.apply(variables, eeg, mask)
    assert out.shape == (B, 48)

    # per-region weights are distinct (vmapped params with region axis)
    p = variables["params"]["region_encoders"]
    leaf = jax.tree_util.tree_leaves(p)[0]
    assert leaf.shape[0] == 4  # leading region axis

    # ablation: no cross-region attention -> fewer params, still works
    cfg2 = BrainEncoderConfig(
        hidden_dim=48, fusion_heads=4, cross_region_heads=4,
        region_encoder=TINY_REGION, disable_cross_region_attn=True,
    )
    enc2 = BrainRegionEncoder(cfg2)
    v2 = enc2.init(jax.random.key(0), eeg, mask)
    assert "fusion_layer0" not in v2["params"]
    assert enc2.apply(v2, eeg, mask).shape == (B, 48)

    # ablation: uniform region weight -> no importance param
    cfg3 = BrainEncoderConfig(
        hidden_dim=48, fusion_heads=4, cross_region_heads=4,
        region_encoder=TINY_REGION, uniform_region_weight=True,
    )
    enc3 = BrainRegionEncoder(cfg3)
    v3 = enc3.init(jax.random.key(0), eeg, mask)
    assert "region_importance" not in v3["params"]


def test_full_model_forward_and_jit():
    eeg, mask = _eeg()
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 120, (B, 8)), jnp.int32)
    model = EEGDecodingModel(TINY_MODEL)
    variables = model.init(jax.random.key(0), eeg, ids, mask)
    logits = model.apply(variables, eeg, ids, mask)
    assert logits.shape == (B, 8, 120)

    fwd = jax.jit(lambda v, e, i, m: model.apply(v, e, i, m))
    logits2 = fwd(variables, eeg, ids, mask)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), atol=2e-4)

    # train mode requires dropout rng and batch_stats mutability
    out, mutated = model.apply(
        variables, eeg, ids, mask, train=True,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
    )
    assert out.shape == (B, 8, 120)
    assert "batch_stats" in mutated


def test_kv_cache_matches_full_forward():
    cfg = TINY_BART
    model = BartDecoderModel(cfg)
    rng = np.random.default_rng(0)
    L = 6
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L)), jnp.int32)
    enc = jnp.asarray(rng.normal(size=(B, cfg.encoder_layers, cfg.d_model)), jnp.float32)
    encmask = jnp.ones((B, cfg.encoder_layers), jnp.int32)
    variables = model.init(jax.random.key(0), ids, enc, encmask)

    full = model.apply(variables, ids, enc, encmask)

    caches = model.init_cache(B, L)
    step_logits = []
    for t in range(L):
        pos = jnp.full((B, 1), t, jnp.int32)
        logits, caches = model.apply(
            variables, ids[:, t : t + 1], enc, encmask,
            positions=pos, caches=caches,
        )
        step_logits.append(logits[:, 0])
    stepped = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped), atol=1e-4)


def test_cross_entropy_ignore_index():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 10)), jnp.float32)
    labels = jnp.asarray([[1, 2, -100, -100], [3, -100, -100, -100]])
    loss, n = cross_entropy_loss(logits, labels)
    assert n == 3
    assert jnp.isfinite(loss)
    # all-ignored doesn't nan
    loss2, n2 = cross_entropy_loss(logits, jnp.full((2, 4), -100))
    assert n2 == 0 and jnp.isfinite(loss2)


def test_feature_diversity_stats():
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4, 16)), jnp.float32)
    stats = feature_diversity_stats(feats)
    assert 0.0 <= float(stats["diversity_score"]) <= 2.0
    # identical regions -> zero diversity
    same = jnp.tile(feats[:, :1], (1, 4, 1))
    assert float(feature_diversity_stats(same)["diversity_score"]) == pytest.approx(
        0.0, abs=1e-5
    )


def test_exact_top_k_matches_lax_top_k():
    # the beam's sort-free top-k must be bit-identical to lax.top_k,
    # including stable tie order and repeated values
    import jax
    import jax.numpy as jnp

    from imagined_speech_translation_tpu.decode.search import _exact_top_k

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 997)).astype(np.float32))
    # inject ties and extremes
    x = x.at[0, 10].set(x[0, 500]).at[1, :8].set(3.25)
    x = x.at[2, 7].set(-1e9).at[3, :].set(0.0)
    for k in (1, 3, 6, 9):
        ev, ei = _exact_top_k(x, k)
        lv, li = jax.lax.top_k(x, k)
        np.testing.assert_array_equal(np.asarray(ev), np.asarray(lv))
        np.testing.assert_array_equal(np.asarray(ei), np.asarray(li))


def test_batchnorm_folding_preserves_eval_forward(rng):
    """models/folding.py: with NON-trivial running stats/affines, the folded
    variables reproduce the eval-mode forward (all three fold sites:
    conv+bias, bias-less residual conv, depthwise→pointwise), and the BN
    leaves are actually neutralized."""
    import jax
    import jax.numpy as jnp

    from imagined_speech_translation_tpu.models import EEGDecodingModel
    from imagined_speech_translation_tpu.models.folding import fold_batch_norm
    from tests.helpers import tiny_config, tiny_tokenizer

    tok = tiny_tokenizer()
    cfg = tiny_config(tok.vocab_size)
    model = EEGDecodingModel(cfg.model)
    eeg = jnp.asarray(rng.normal(size=(2, 4, 16, 64)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, tok.vocab_size, (2, 6)), jnp.int32)
    mask = jnp.ones((4, 16), bool)
    variables = jax.jit(model.init)(jax.random.key(0), eeg, ids, mask)

    # randomize stats + BN affines so the fold is doing real arithmetic
    key = iter(jax.random.split(jax.random.key(1), 64))

    def perturb_stats(x):
        return jnp.abs(jax.random.normal(next(key), x.shape)) + 0.3

    def perturb(tree, pred):
        def visit(d, path=()):
            for k, v in d.items():
                if isinstance(v, dict):
                    visit(v, path + (k,))
                elif pred(path + (k,)):
                    d[k] = jax.random.normal(next(key), v.shape) * 0.5 + 1.0
        visit(tree)

    variables = jax.tree.map(lambda x: x, variables)  # writable copy
    variables["batch_stats"] = jax.tree.map(
        perturb_stats, variables["batch_stats"]
    )
    perturb(
        variables["params"],
        lambda p: any("bn" in seg for seg in p) and p[-1] in ("scale", "bias"),
    )

    ref = model.apply(variables, eeg, ids, mask, train=False)
    folded = fold_batch_norm(variables)
    got = model.apply(folded, eeg, ids, mask, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4
    )

    # every BN is neutralized: scale 1, stats (0, 1-eps)
    enc = folded["params"]["brain_encoder"]["region_encoders"]
    stats = folded["batch_stats"]["brain_encoder"]["region_encoders"]
    for name, sub in stats.items():
        bn = sub["bn"] if "bn" in sub else sub
        np.testing.assert_array_equal(np.asarray(bn["mean"]), 0.0)
        np.testing.assert_allclose(np.asarray(bn["var"]), 1.0 - 1e-5)
        pbn = enc[name]["bn"] if "bn" in sub else enc[name]
        np.testing.assert_array_equal(np.asarray(pbn["scale"]), 1.0)
    # conv+bias sites fully absorb the shift; bias-less residuals keep it
    np.testing.assert_array_equal(
        np.asarray(enc["stage0_convbn"]["bn"]["bias"]), 0.0
    )
    assert np.abs(
        np.asarray(enc["stage0_residual"]["bn"]["bias"])
    ).max() > 0
