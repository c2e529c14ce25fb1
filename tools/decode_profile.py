"""Decode-path segment profiler (TPU): frontend / encoder / beam timings,
plus ablation toggles for the round-3 performance work.

Usage::

    python tools/decode_profile.py                 # default config
    HEADS=6,6,6 python tools/decode_profile.py     # MXU-aligned head split
    BEAM_ONLY=1 python tools/decode_profile.py     # skip encoder timing

Timings are steady-state medians over ITERS runs (arrays generated on
device; the remote tunnel makes host arrays crawl).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time


def _median_time(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagined_speech_translation_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from imagined_speech_translation_tpu.config import default_config
    from imagined_speech_translation_tpu.decode import DecodeParams, build_generate_fn
    from imagined_speech_translation_tpu.decode.search import beam_search
    from imagined_speech_translation_tpu.frontend import SignalFrontend
    from imagined_speech_translation_tpu.models import EEGDecodingModel
    from imagined_speech_translation_tpu.utils.trees import cast_floating

    cfg = default_config()
    if os.environ.get("HEADS"):
        heads = tuple(int(x) for x in os.environ["HEADS"].split(","))
        re_cfg = dataclasses.replace(
            cfg.model.brain_encoder.region_encoder, attn_heads=heads
        )
        be = dataclasses.replace(cfg.model.brain_encoder, region_encoder=re_cfg)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, brain_encoder=be)
        )

    B = int(os.environ.get("BENCH_BATCH", "16"))
    T = cfg.data.n_timepoints
    bart = cfg.model.bart
    gen = cfg.generation
    dp = DecodeParams(
        max_length=gen.max_length, min_length=gen.max_length,
        num_beams=gen.num_beams, pad_token_id=bart.pad_token_id,
        eos_token_id=bart.eos_token_id,
        decoder_start_token_id=bart.decoder_start_token_id,
    )

    model = EEGDecodingModel(cfg.model)
    mask_np = np.zeros((4, 16), bool)
    for r, c in enumerate(cfg.model.region_channel_counts):
        mask_np[r, :c] = True
    channel_mask = jnp.asarray(mask_np)

    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((B, 4, 16, T), jnp.float32),
        jnp.zeros((B, 4), jnp.int32),
        channel_mask,
    )
    variables = cast_floating(variables, jnp.bfloat16)

    key = jax.random.key(1)
    eeg = jax.random.normal(key, (B, 4, 16, T), jnp.bfloat16)
    raw = jax.random.normal(key, (B, 125, T), jnp.float32)

    report = {"config_heads": list(cfg.model.brain_encoder.region_encoder.attn_heads),
              "batch": B}

    # ---- frontend ----------------------------------------------------
    frontend = SignalFrontend(cfg.frontend)
    fe = jax.jit(frontend.preprocess)
    report["frontend_ms"] = round(_median_time(fe, raw) * 1000, 2)

    # ---- encoder forward --------------------------------------------
    encode = jax.jit(
        lambda v, x, m: model.apply(v, x, m, method="encode")
    )
    report["encoder_ms"] = round(_median_time(encode, variables, eeg, channel_mask) * 1000, 2)

    # ---- beam decode (given encoder states) -------------------------
    _, enc = encode(variables, eeg, channel_mask)

    @jax.jit
    def beam_only(variables, enc):
        b = enc.shape[0]
        enc_x = jnp.repeat(enc, dp.num_beams, axis=0)
        caches = model.init_cache(b * dp.num_beams, dp.max_length, enc.dtype)

        def step(tokens, positions, caches):
            return model.apply(
                variables, tokens, positions, enc_x, caches, method="decode_step"
            )

        return beam_search(step, caches, b, dp)

    report["beam_ms"] = round(_median_time(beam_only, variables, enc) * 1000, 2)

    # ---- full pipeline ----------------------------------------------
    generate = build_generate_fn(model, dp, jit=False)

    @jax.jit
    def full(variables, eeg):
        return generate(variables, eeg, channel_mask)

    full_ms = _median_time(full, variables, eeg) * 1000
    report["full_ms"] = round(full_ms, 2)
    report["windows_per_sec"] = round(B / (full_ms / 1000), 1)
    print(json.dumps(report))


if __name__ == "__main__":
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
