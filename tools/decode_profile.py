"""Decode-path segment profiler (TPU): frontend / encoder / beam timings,
plus ablation toggles for the round-3 performance work.

Usage::

    python tools/decode_profile.py                 # default config
    HEADS=6,6,6 python tools/decode_profile.py     # MXU-aligned head split
    SEGMENTS=beam python tools/decode_profile.py   # subset

Measurement notes: on the remote-tunnel backend ``block_until_ready`` does
not reliably fence remote execution, so every timed call reduces its output
to a scalar that is fetched to host (a full sync), inputs vary per
iteration (defeats any execution caching), and the tunnel's scalar-fetch
round-trip (measured on a trivial program) is subtracted.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time


def _timed(fn, *args, iters=8):
    """Median wall time of ``float(fn(*args, i))`` (the trailing scalar
    varies per call to defeat any execution caching; outputs are reduced to
    a host-fetched scalar because ``block_until_ready`` does not fence the
    tunnel backend).  Caller subtracts the round-trip baseline.  Arrays ride
    as jit ARGUMENTS — closing over the 310M-param tree embeds it in the
    program body and overflows the remote-compile request (HTTP 413)."""
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
    segments = os.environ.get("SEGMENTS", "frontend,encoder,beam,full").split(",")

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

    eeg = jax.random.normal(jax.random.key(1), (B, 4, 16, T), jnp.bfloat16)
    raw = jax.random.normal(jax.random.key(2), (B, 125, T), jnp.float32)

    report = {
        "config_heads": list(cfg.model.brain_encoder.region_encoder.attn_heads),
        "batch": B,
    }

    # tunnel round-trip baseline: trivial program + scalar fetch
    trivial = jax.jit(lambda i: jnp.sum(i))
    rt = _timed(trivial, iters=10)
    report["roundtrip_ms"] = round(rt * 1000, 2)

    if "frontend" in segments:
        frontend = SignalFrontend(cfg.frontend)
        fe = jax.jit(
            lambda raw, i: jnp.sum(frontend.preprocess(raw + i * 1e-4))
        )
        report["frontend_ms"] = round((_timed(fe, raw) - rt) * 1000, 2)

    if "encoder" in segments:
        enc_fn = jax.jit(
            lambda v, x, i: jnp.sum(
                model.apply(
                    v, x + jnp.bfloat16(i * 1e-4), channel_mask,
                    method="encode",
                )[1].astype(jnp.float32)
            )
        )
        report["encoder_ms"] = round(
            (_timed(enc_fn, variables, eeg) - rt) * 1000, 2
        )

    _, enc = jax.jit(
        lambda v, x, m: model.apply(v, x, m, method="encode")
    )(variables, eeg, channel_mask)

    if "beam" in segments:
        @jax.jit
        def beam_sum(v, e, i):
            e = e + jnp.bfloat16(i * 1e-4)
            enc_x = jnp.repeat(e, dp.num_beams, axis=0)
            caches = model.init_cache(B * dp.num_beams, dp.max_length, e.dtype)

            def step(tokens, positions, caches):
                return model.apply(
                    v, tokens, positions, enc_x, caches,
                    method="decode_step",
                )

            return jnp.sum(beam_search(step, caches, B, dp))

        report["beam_ms"] = round(
            (_timed(beam_sum, variables, enc) - rt) * 1000, 2
        )

    if "full" in segments:
        generate = build_generate_fn(model, dp, jit=False)
        full = jax.jit(
            lambda v, x, i: jnp.sum(
                generate(v, x + jnp.bfloat16(i * 1e-4), channel_mask)
            )
        )
        full_ms = (_timed(full, variables, eeg) - rt) * 1000
        report["full_ms"] = round(full_ms, 2)
        report["windows_per_sec"] = round(B / (full_ms / 1000), 1)
    print(json.dumps(report))


if __name__ == "__main__":
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
