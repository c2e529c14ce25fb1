"""Encoder-internal segment profiler (TPU): where the ~85 ms batch-16
region-encoder forward goes — the dominant segment of the decode pipeline
(docs/PERFORMANCE.md round-3/4: encoder ≈ 85 of ~105 ms; frontend 3.6,
beam 10.4).

Method: program subtraction over CONFIG ablations of the real
``BrainRegionEncoder`` (the house style — tools/train_profile.py), not
xplane parsing: each variant is the full jitted forward with one
architectural stage removed, so segment cost = difference of medians.

Segments:

* ``stem``       — cnn_only=True: conv stem + SE + cnn-only pooling;
* ``+mlp+attn1`` — num_attn_layers=1: adds the cnn→attn MLP, CLS/temporal
  tokens, positions, one MHA+FFN layer, CLS pooling + projections;
* ``attn_layer`` — (layers=3) − (layers=2): one MHA + gated FFN(2h) +
  cross-scale attention at S=1655 — the marginal token-attention layer;
* ``fusion``     — full BrainRegionEncoder − 4×vmapped region encoders:
  multi-scale region conv, fusion transformer, cross-region MHA, weighting.

Also reports the bf16 MXU efficiency estimate for the full encoder
(analytic FLOPs / measured time).

Usage::

    python tools/encoder_profile.py                 # default config, chip
    BATCH=16 ITERS=8 python tools/encoder_profile.py
    PROFILE_FORCE_PLATFORM=cpu HIDDEN=64 python tools/encoder_profile.py

Writes ``runs/train_profile/encoder_segments.json``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from pathlib import Path


def _timed(fn, *args, iters=8):
    """Median wall time of ``float(fn(*args, i))`` — scalar-fetch synced
    (``block_until_ready`` does not fence the tunnel backend; see
    tools/decode_profile.py)."""
    import jax.numpy as jnp

    float(fn(*args, jnp.float32(0)))  # compile + warmup
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*args, jnp.float32(i + 1)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax

    if os.environ.get("PROFILE_FORCE_PLATFORM"):
        jax.config.update(
            "jax_platforms", os.environ["PROFILE_FORCE_PLATFORM"]
        )
    import jax.numpy as jnp
    import numpy as np

    from imagined_speech_translation_tpu.config import default_config
    from imagined_speech_translation_tpu.models import BrainRegionEncoder
    from imagined_speech_translation_tpu.models.layers import (
        RegionConvAttentionEncoder,
    )
    from imagined_speech_translation_tpu.models.folding import fold_batch_norm
    from imagined_speech_translation_tpu.utils.cache import (
        enable_persistent_cache,
    )
    from imagined_speech_translation_tpu.utils.trees import cast_floating

    enable_persistent_cache()

    B = int(os.environ.get("BATCH", "16"))
    iters = int(os.environ.get("ITERS", "8"))
    cfg = default_config()
    be = cfg.model.brain_encoder
    if os.environ.get("HIDDEN"):  # CPU smoke of the harness itself
        h = int(os.environ["HIDDEN"])
        be = dataclasses.replace(
            be, hidden_dim=h, fusion_heads=4, cross_region_heads=4,
            region_encoder=dataclasses.replace(
                be.region_encoder,
                conv_channels=tuple(
                    max(8, h * f // 768) for f in (128, 256, 384, 512, 768)
                ),
                attn_heads=(4, 2, 2), se_reduction=4,
            ),
        )
    T = int(os.environ.get("T", str(cfg.data.n_timepoints)))

    rng = np.random.default_rng(0)
    eeg = jnp.asarray(rng.normal(size=(B, 4, 16, T)), jnp.bfloat16)
    mask_np = np.zeros((4, 16), bool)
    for r, c in enumerate(cfg.model.region_channel_counts):
        mask_np[r, :c] = True
    mask = jnp.asarray(mask_np)

    def build(be_cfg, module_cls=BrainRegionEncoder):
        model = module_cls(be_cfg)
        variables = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1, 4, 16, T), jnp.float32), mask
        )
        variables = cast_floating(fold_batch_norm(variables), jnp.bfloat16)

        def prog(v, x, i):
            out = model.apply(v, x, mask)
            return (out.astype(jnp.float32).sum() + i).astype(jnp.float32)

        return jax.jit(prog), variables

    # round-trip baseline: a trivial scalar program (tunnel fetch cost)
    @jax.jit
    def _rt_prog(i):
        return i + 1.0

    rt = _timed(_rt_prog, iters=iters)

    report = {
        "batch": B, "timepoints": T, "iters": iters,
        "platform": jax.devices()[0].platform,
        "roundtrip_ms": round(rt * 1e3, 2),
    }

    def ms(key, be_cfg):
        prog, variables = build(be_cfg)
        t = (_timed(prog, variables, eeg, iters=iters) - rt) * 1e3
        report[key] = round(t, 2)
        print(f"{key}: {report[key]} ms", flush=True)
        return t

    re_cfg = be.region_encoder
    full = ms("full_ms", be)
    ms("layers2_ms", dataclasses.replace(
        be, region_encoder=dataclasses.replace(
            re_cfg, num_attn_layers=2, attn_heads=re_cfg.attn_heads[:2]
        )
    ))
    ms("layers1_ms", dataclasses.replace(
        be, region_encoder=dataclasses.replace(
            re_cfg, num_attn_layers=1, attn_heads=re_cfg.attn_heads[:1]
        )
    ))
    ms("stem_ms", dataclasses.replace(
        be, region_encoder=dataclasses.replace(re_cfg, cnn_only=True)
    ))
    # fusion overhead: full brain encoder minus the 4 vmapped region
    # encoders alone (same vmap construction the brain encoder uses)
    from flax import linen as nn

    class _RegionsOnly(nn.Module):
        cfg: object

        @nn.compact
        def __call__(self, eeg, channel_mask=None):
            x = jnp.where(channel_mask[None, :, :, None], eeg, 0.0)
            x = jnp.swapaxes(x, -1, -2)
            V = nn.vmap(
                RegionConvAttentionEncoder,
                in_axes=(1, None), out_axes=1,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
                methods=["__call__"],
            )
            return V(self.cfg.region_encoder, self.cfg.hidden_dim,
                     name="region_encoders")(x, False)

    prog, variables = build(be, module_cls=_RegionsOnly)
    t = (_timed(prog, variables, eeg, iters=iters) - rt) * 1e3
    report["regions_only_ms"] = round(t, 2)
    print(f"regions_only_ms: {report['regions_only_ms']} ms", flush=True)

    report["derived"] = {
        "attn_layer3_marginal_ms": round(report["full_ms"] - report["layers2_ms"], 2),
        "attn_layer2_marginal_ms": round(report["layers2_ms"] - report["layers1_ms"], 2),
        "mlp_tokens_layer1_ms": round(report["layers1_ms"] - report["stem_ms"], 2),
        "fusion_ms": round(report["full_ms"] - report["regions_only_ms"], 2),
    }

    # analytic bf16 FLOPs of the full encoder forward (MACs×2), per batch
    h = be.hidden_dim
    chans = [16] + list(be.region_encoder.conv_channels)
    kerns = be.region_encoder.conv_kernels
    stem = sum(
        k * cin * cout
        for k, cin, cout in zip(kerns, chans[:-1], chans[1:])
    ) * T * 2
    S = T + 4
    mlp = S * (h * 2 * h + 2 * h * h + h * h) * 2
    per_layer = (
        4 * S * h * h * 2          # qkvo projections
        + 2 * S * S * h * 2        # scores + weighted V
        + S * (h * 4 * h * 2 + h * 4 * h) * 2  # gated FFN (first layer 4h)
    )
    flops_rs = stem + mlp + 3 * per_layer
    total = flops_rs * 4 * B
    report["analytic_tflop_per_fwd"] = round(total / 1e12, 2)
    report["effective_tflops"] = round(
        total / 1e12 / (report["full_ms"] / 1e3), 1
    )

    out = Path("runs/train_profile")
    out.mkdir(parents=True, exist_ok=True)
    (out / "encoder_segments.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
