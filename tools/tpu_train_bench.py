"""On-chip training-step throughput at the reference's full size.

Measures one full gradient-accumulation window (micro-batch 4 × accum 8 =
32 samples, T=1651, composite loss) through ``make_train_step`` — the same
program `cli/train.py` runs — in fp32 and bf16 (mixed precision).  Round-1
baselines: 22 samples/s fp32, 17 samples/s bf16 (jnp attention, materialized
(S, S) probs in fwd+bwd).  Reference: 2.9 samples/s (RTX 3090, fp32).

Usage:  python tools/tpu_train_bench.py [--accum 8] [--micro 4] [--iters 5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro", type=int, default=4)
    ap.add_argument("--accum", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--modes", default="fp32,bf16")
    ap.add_argument("--rng-impl", default=None, help="dropout key impl (threefry2x32/rbg)")
    ap.add_argument(
        "--accum-dtype",
        default=None,
        help="grad accumulation carry dtype under bf16 (float32/bfloat16)",
    )
    ap.add_argument(
        "--fused",
        action="store_true",
        help="single-pass fused clip+AdamW (fused_optimizer.py)",
    )
    ap.add_argument(
        "--mu-dtype",
        default=None,
        help="first-moment storage dtype (bfloat16 halves m-state traffic)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from imagined_speech_translation_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from imagined_speech_translation_tpu.config import default_config, replace_nested
    from imagined_speech_translation_tpu.training.losses import AdaptiveLossScheduler
    from imagined_speech_translation_tpu.training.optimizer import build_optimizer
    from imagined_speech_translation_tpu.training.train_state import (
        TrainModule,
        create_train_state,
    )
    from imagined_speech_translation_tpu.training.train_step import make_train_step

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)

    for mode in args.modes.split(","):
        cfg = default_config()
        cfg = replace_nested(cfg, "training.mixed_precision", mode == "bf16")
        cfg = replace_nested(cfg, "training.grad_accum_steps", args.accum)
        if args.accum_dtype:
            cfg = replace_nested(
                cfg, "training.grad_accum_dtype", args.accum_dtype
            )
        if args.fused:
            cfg = replace_nested(cfg, "training.optimizer.fused", True)
        if args.mu_dtype:
            cfg = replace_nested(
                cfg, "training.optimizer.mu_dtype", args.mu_dtype
            )
        T = cfg.data.n_timepoints
        B = args.micro

        bow_k = cfg.training.loss.bow_vocab_size
        module = TrainModule(cfg, bow_k=bow_k)
        mask = np.zeros((4, 16), bool)
        for r, c in enumerate(cfg.model.region_channel_counts):
            mask[r, :c] = True
        mask = jnp.asarray(mask)
        L = cfg.data.max_length
        # on-device generation: host arrays this size would crawl through
        # the remote-TPU tunnel
        kk = jax.random.split(jax.random.key(0), 4)
        sample = {
            "eeg": jax.random.normal(kk[0], (B, 4, 16, T), jnp.float32),
            "decoder_input_ids": jax.random.randint(
                kk[1], (B, L), 0, 1000, jnp.int32
            ),
            "channel_mask": mask,
        }
        params_probe = jax.eval_shape(
            lambda r: module.init(
                r, sample["eeg"], sample["decoder_input_ids"],
                sample["channel_mask"], method="init_all",
            ),
            jax.random.key(0),
        )["params"]
        optimizer = build_optimizer(params_probe, cfg.training.optimizer, 1000)
        state = create_train_state(
            module, jax.random.key(0), sample, optimizer,
            AdaptiveLossScheduler(cfg.training.loss).initial_weights(),
        )
        bow = rng.integers(0, cfg.model.bart.vocab_size, bow_k)
        # donate the state exactly as the product trainer does
        # (trainer.py:172-177) — in-place param/opt-state updates, no
        # copy-on-write of the 310M-param tree per window
        step = jax.jit(
            make_train_step(module, optimizer, cfg, bow), donate_argnums=(0,)
        )
        batch = {
            "eeg": jax.random.normal(
                kk[2], (args.accum, B, 4, 16, T), jnp.float32
            ),
            "decoder_input_ids": jax.random.randint(
                kk[3], (args.accum, B, L), 0, 1000, jnp.int32
            ),
            "labels": jax.random.randint(
                kk[3], (args.accum, B, L), 0, 1000, jnp.int32
            ),
            "attention_mask": jnp.ones((args.accum, B, L), jnp.int32),
            "channel_mask": mask,
        }
        key = jax.random.key(1, impl=args.rng_impl or cfg.training.rng_impl)
        t0 = time.perf_counter()
        state, metrics = jax.block_until_ready(step(state, batch, key))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step(state, batch, key)
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / args.iters
        n = args.accum * B
        print(
            f"[{mode}] window {dt*1e3:8.1f} ms  {n/dt:6.1f} samples/s  "
            f"(compile {compile_s:.0f}s, loss {float(metrics['loss']):.3f})"
        )


if __name__ == "__main__":
    main()
