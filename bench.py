#!/usr/bin/env python
"""Headline benchmark: EEG windows/sec/chip through the fused
preprocess → encode → beam-decode path on real TPU hardware.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline comparator: the reference trains/evals at 2.9 samples/s on an RTX
3090 (1.38 s/it @ batch 4 — BASELINE.md "Train throughput"); the BASELINE.json
north star is >10x the CPU-reference on batched window→text decode.

Chip-claim resilience: the TPU behind the axon tunnel is claim-based and can
be UNAVAILABLE for long stretches.  The measurement runs in a subprocess; on
backend-init UNAVAILABLE the parent retries within ``BENCH_CLAIM_BUDGET_S``
(default 3600 s) and, if the claim never lands, prints a structured
``{"skipped": "chip-unavailable"}`` JSON line and exits 0 — never rc=1 for a
transiently missing chip.  Successful runs are also persisted to
``runs/bench/bench_<utc-timestamp>.json``.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SAMPLES_PER_SEC = 2.9
METRIC = "eeg_windows_per_sec_per_chip"


def run_measurement():
    import os

    import jax

    # Testing hook: the axon sitecustomize overrides JAX_PLATFORMS, so forcing
    # a platform (e.g. a CPU smoke of this path) must go through jax.config.
    if os.environ.get("BENCH_FORCE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_FORCE_PLATFORM"])

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
    # inference-only BN folding (f32, BEFORE the bf16 cast), then
    # bfloat16 params + activations on the MXU fast path
    if os.environ.get("BENCH_FOLD_BN", "1") == "1":
        from imagined_speech_translation_tpu.models.folding import (
            fold_batch_norm,
        )

        variables = fold_batch_norm(variables)
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
                "metric": METRIC,
                "value": round(windows_per_sec, 3),
                "unit": "windows/s (preproc+beam3 decode, pinned len=%d, B=%d, T=%d)"
                % (dp.max_length, B, T),
                "vs_baseline": round(windows_per_sec / REFERENCE_SAMPLES_PER_SEC, 2),
                "platform": jax.devices()[0].platform,
            }
        )
    )


def _is_chip_unavailable(text: str) -> bool:
    """True when the failure is the axon claim loop giving up, not a bug."""
    markers = (
        "Unable to initialize backend 'axon'",
        "UNAVAILABLE: TPU backend setup/compile error",
        "failed to claim",
    )
    return any(m in text for m in markers)


def _persist_artifact(result: dict) -> None:
    import os

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "runs", "bench")
    try:
        os.makedirs(d, exist_ok=True)
        stamp = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
        with open(os.path.join(d, f"bench_{stamp}.json"), "w") as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass  # artifact persistence must never fail the bench


def main():
    """Claim-resilient driver: retry the measurement subprocess on a
    transiently unavailable chip; emit a structured skip line otherwise."""
    import os
    import subprocess
    import sys

    budget_s = float(os.environ.get("BENCH_CLAIM_BUDGET_S", "3600"))
    retry_sleep_s = float(os.environ.get("BENCH_CLAIM_RETRY_SLEEP_S", "60"))
    deadline = time.monotonic() + budget_s
    me = os.path.abspath(__file__)
    attempts = 0
    t_start = time.monotonic()

    def _skip(reason: str) -> int:
        print(
            json.dumps(
                {
                    "metric": METRIC,
                    "value": None,
                    "unit": "windows/s",
                    "vs_baseline": None,
                    "skipped": reason,
                    "claim_attempts": attempts,
                    "waited_s": round(time.monotonic() - t_start, 1),
                }
            )
        )
        return 0

    while True:
        attempts += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-u", me, "--inner"],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(me),
                timeout=max(120.0, deadline - time.monotonic()),
            )
        except subprocess.TimeoutExpired:
            return _skip("chip-unavailable")
        if proc.returncode == 0:
            # Re-emit the inner run's final JSON line as ours.
            lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
            result = json.loads(lines[-1])
            result["claim_attempts"] = attempts
            if not os.environ.get("BENCH_FORCE_PLATFORM"):
                _persist_artifact(result)
            print(json.dumps(result))
            return 0
        blob = proc.stdout + proc.stderr
        if not _is_chip_unavailable(blob):
            sys.stderr.write(blob[-4000:])
            return proc.returncode or 1
        waited = time.monotonic() - t_start
        sys.stderr.write(
            "bench: chip claim unavailable (attempt %d, %.0fs elapsed of %.0fs budget)\n"
            % (attempts, waited, budget_s)
        )
        if time.monotonic() + retry_sleep_s >= deadline:
            return _skip("chip-unavailable")
        time.sleep(retry_sleep_s)


if __name__ == "__main__":
    import sys as _sys

    if "--inner" in _sys.argv:
        run_measurement()
    else:
        _sys.exit(main())
