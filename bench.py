#!/usr/bin/env python
"""Headline benchmark: EEG windows/sec/chip through the fused
preprocess → encode → beam-decode path on real TPU hardware.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline comparator: the reference trains/evals at 2.9 samples/s on an RTX
3090 (1.38 s/it @ batch 4 — BASELINE.md "Train throughput"); the BASELINE.json
north star is >10x the CPU-reference on batched window→text decode.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SAMPLES_PER_SEC = 2.9


def main():
    import jax

    from imagined_speech_translation_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from imagined_speech_translation_tpu.config import default_config
    from imagined_speech_translation_tpu.decode import (
        DecodeParams,
        build_generate_fn,
    )
    from imagined_speech_translation_tpu.frontend import SignalFrontend
    from imagined_speech_translation_tpu.models import EEGDecodingModel
    from imagined_speech_translation_tpu.data.regions import RegionSpec
    from imagined_speech_translation_tpu.data.synthetic import (
        make_synthetic_montage,
    )
    import tempfile, os

    cfg = default_config()
    B = int(os.environ.get("BENCH_BATCH", "16"))
    T = cfg.data.n_timepoints  # 1651

    # montage/region layout (48ch -> stacked (4, 16, T))
    with tempfile.TemporaryDirectory() as d:
        labels = make_synthetic_montage(os.path.join(d, "m.csv"))
    spec = RegionSpec.from_channel_names(labels)

    frontend = SignalFrontend(cfg.frontend)
    model = EEGDecodingModel(cfg.model)
    gen_cfg = cfg.generation
    bart = cfg.model.bart
    # Pinned decode length: with min_length == max_length, EOS is banned until
    # the final position, so every window decodes exactly max_length tokens
    # regardless of where randomly-initialized weights would hit EOS.  This
    # makes BENCH_r*.json comparable across rounds (worst-case decode work).
    dp = DecodeParams(
        max_length=gen_cfg.max_length,
        min_length=gen_cfg.max_length,
        num_beams=gen_cfg.num_beams,
        pad_token_id=bart.pad_token_id,
        eos_token_id=bart.eos_token_id,
        decoder_start_token_id=bart.decoder_start_token_id,
    )

    rng = np.random.default_rng(0)
    raw = rng.normal(size=(B, 125, T)).astype(np.float32)
    channel_mask = jnp.asarray(spec.channel_mask)
    gather = jnp.asarray(spec.gather_indices)

    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((B, 4, 16, T), jnp.float32),
        jnp.zeros((B, 4), jnp.int32),
        channel_mask,
    )
    # bfloat16 inference: params + activations on the MXU fast path
    if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16":
        from imagined_speech_translation_tpu.utils.trees import cast_floating

        variables = cast_floating(variables, jnp.bfloat16)
    generate = build_generate_fn(model, dp, jit=False)

    compute_dtype = (
        jnp.bfloat16
        if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16"
        else jnp.float32
    )

    @jax.jit
    def window_to_tokens(variables, raw):
        # fused: filter + notch + CAR -> region gather -> decode
        clean = frontend.preprocess(raw)
        stacked = clean[:, gather.reshape(-1), :].reshape(raw.shape[0], 4, 16, T)
        stacked = jnp.where(channel_mask[None, :, :, None], stacked, 0.0)
        return generate(variables, stacked.astype(compute_dtype), channel_mask)

    x = jnp.asarray(raw)
    # compile + warmup
    out = window_to_tokens(variables, x)
    jax.block_until_ready(out)

    iters = int(os.environ.get("BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = window_to_tokens(variables, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    windows_per_sec = B * iters / dt
    print(
        json.dumps(
            {
                "metric": "eeg_windows_per_sec_per_chip",
                "value": round(windows_per_sec, 3),
                "unit": "windows/s (preproc+beam3 decode, pinned len=%d, B=%d, T=%d)"
                % (dp.max_length, B, T),
                "vs_baseline": round(windows_per_sec / REFERENCE_SAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
