"""Training-window segment profiler: where do the ~720 ms go?

Times SUB-PROGRAMS of the full gradient-accumulation window in isolation on
the device (same construction as ``tools/tpu_train_bench.py``), so each
cost bucket is measured by program subtraction rather than xplane parsing
(no TF profiler proto reader in this environment):

* ``window``       — the full product train step (scan(8) + clip + AdamW);
* ``grads_only``   — the accumulation scan alone (no clip/optimizer/apply);
* ``fwd_only``     — scan of loss evaluations (no backward);
* ``micro_grad``   — ONE micro-step fwd+bwd, standalone jit (no scan);
* ``ce_only``      — full window, composite loss off (isolates loss heads);
* ``cast``         — the hoisted f32→bf16 param cast alone;
* ``optimizer``    — clip + AdamW update + apply on precomputed grads.

Derived rows: optimizer+clip = window − grads_only; backward = grads_only −
fwd_only; accumulation overhead = grads_only − 8·micro_grad (the f32
accumulator adds + scan slicing — negative ⇒ XLA pipelines the scan better
than standalone dispatch); loss heads = window − ce_only.

Usage: python tools/train_profile.py [--iters 5] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro", type=int, default=4)
    ap.add_argument("--accum", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagined_speech_translation_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from imagined_speech_translation_tpu.config import default_config, replace_nested
    from imagined_speech_translation_tpu.training.losses import AdaptiveLossScheduler
    from imagined_speech_translation_tpu.training.optimizer import build_optimizer
    from imagined_speech_translation_tpu.training.train_state import (
        TrainModule,
        create_train_state,
    )
    from imagined_speech_translation_tpu.training.train_step import (
        make_loss_fn,
        make_train_step,
    )

    print("backend:", jax.default_backend(), jax.devices())

    def build(cfg):
        B = args.micro
        T = cfg.data.n_timepoints
        L = cfg.data.max_length
        bow_k = cfg.training.loss.bow_vocab_size
        module = TrainModule(cfg, bow_k=bow_k)
        mask = np.zeros((4, 16), bool)
        for r, c in enumerate(cfg.model.region_channel_counts):
            mask[r, :c] = True
        mask = jnp.asarray(mask)
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
        bow = np.random.default_rng(0).integers(
            0, cfg.model.bart.vocab_size, bow_k
        )
        return module, optimizer, state, batch, bow

    def timeit(fn, *fargs):
        jax.block_until_ready(fn(*fargs))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*fargs))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    results = {}
    # Remote-TPU tunnel round trip: every block_until_ready pays a constant
    # host<->device latency that has nothing to do with the program; measure
    # it with a trivial program and report rtt-corrected numbers.
    import jax as _jax
    noop = _jax.jit(lambda x: x + 1)
    base_cfg = default_config()
    base_cfg = replace_nested(base_cfg, "training.mixed_precision", True)
    base_cfg = replace_nested(base_cfg, "training.grad_accum_steps", args.accum)
    key = jax.random.key(1, impl=base_cfg.training.rng_impl)

    module, optimizer, state, batch, bow = build(base_cfg)
    import jax.numpy as _jnp
    results["rtt"] = timeit(lambda: noop(_jnp.float32(0)))

    # ---- full window ------------------------------------------------------
    step = jax.jit(make_train_step(module, optimizer, base_cfg, bow))
    results["window"] = timeit(lambda: step(state, batch, key))

    # ---- grads_only: the accumulation scan without clip/optimizer ---------
    def make_grads_only(cfg, fwd_only: bool):
        loss_fn = make_loss_fn(module, cfg, bow)
        grad_fn = jax.grad(loss_fn, has_aux=True)

        def prog(state, batch, rng):
            channel_mask = batch["channel_mask"]
            fwd_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                state.params,
            )

            def body(carry, micro):
                acc, stats, i = carry
                micro = dict(micro, channel_mask=channel_mask)
                rng_i = jax.random.fold_in(rng, i)
                if fwd_only:
                    loss, (stats, _) = loss_fn(
                        fwd_params, stats, micro, rng_i, state.loss_weights
                    )
                    return (acc + loss, stats, i + 1), None
                grads, (stats, _) = grad_fn(
                    fwd_params, stats, micro, rng_i, state.loss_weights
                )
                acc = jax.tree.map(
                    lambda a, g: a + g.astype(a.dtype), acc, grads
                )
                return (acc, stats, i + 1), None

            if fwd_only:
                acc0 = jnp.zeros((), jnp.float32)
            else:
                acc0 = jax.tree.map(
                    lambda x: jnp.zeros(
                        x.shape,
                        jnp.float32
                        if jnp.issubdtype(x.dtype, jnp.floating)
                        else x.dtype,
                    ),
                    state.params,
                )
            micro_batches = {
                k: v for k, v in batch.items() if k != "channel_mask"
            }
            (acc, stats, _), _ = jax.lax.scan(
                body, (acc0, state.batch_stats, jnp.int32(0)), micro_batches,
                length=args.accum,
            )
            return acc, stats

        return jax.jit(prog)

    grads_only_j = make_grads_only(base_cfg, False)
    fwd_only_j = make_grads_only(base_cfg, True)
    results["grads_only"] = timeit(lambda: grads_only_j(state, batch, key))
    results["fwd_only"] = timeit(lambda: fwd_only_j(state, batch, key))

    # ---- micro_grad: one micro-step fwd+bwd, no scan ----------------------
    loss_fn1 = make_loss_fn(module, base_cfg, bow)
    grad_fn1 = jax.grad(loss_fn1, has_aux=True)

    def micro_prog(state, batch, rng):
        fwd_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            state.params,
        )
        micro = {
            k: (v[0] if k != "channel_mask" else v) for k, v in batch.items()
        }
        return grad_fn1(
            fwd_params, state.batch_stats, micro, rng, state.loss_weights
        )[0]

    micro_j = jax.jit(micro_prog)
    results["micro_grad"] = timeit(lambda: micro_j(state, batch, key))

    # ---- ce_only ----------------------------------------------------------
    ce_cfg = replace_nested(base_cfg, "training.loss.composite", False)
    step_ce = jax.jit(make_train_step(module, optimizer, ce_cfg, bow))
    results["ce_only"] = timeit(lambda: step_ce(state, batch, key))

    # ---- cast -------------------------------------------------------------
    cast = jax.jit(
        lambda p: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            p,
        )
    )
    results["cast"] = timeit(lambda: cast(state.params))

    # ---- optimizer on precomputed grads -----------------------------------
    import optax

    grads_tree, _ = grads_only_j(state, batch, key)
    grads_tree = jax.block_until_ready(grads_tree)

    def opt_prog(state, grads):
        grads = jax.tree.map(
            lambda g: (g / args.accum).astype(jnp.float32)
            if jnp.issubdtype(g.dtype, jnp.floating)
            else g,
            grads,
        )
        gn = optax.global_norm(grads)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return gn, params, opt_state

    opt_j = jax.jit(opt_prog)
    results["optimizer"] = timeit(lambda: opt_j(state, grads_tree))

    # ---- report -----------------------------------------------------------
    rtt = results["rtt"]
    results = {
        k: (v - rtt if k != "rtt" else v) for k, v in results.items()
    }
    ms = {k: round(v * 1e3, 1) for k, v in results.items()}
    derived = {
        "clip+adamw+apply (window - grads_only)": round(
            (results["window"] - results["grads_only"]) * 1e3, 1
        ),
        "backward (grads_only - fwd_only)": round(
            (results["grads_only"] - results["fwd_only"]) * 1e3, 1
        ),
        f"accum overhead (grads_only - {args.accum}*micro_grad)": round(
            (results["grads_only"] - args.accum * results["micro_grad"])
            * 1e3, 1
        ),
        "aux loss heads (window - ce_only)": round(
            (results["window"] - results["ce_only"]) * 1e3, 1
        ),
    }
    n = args.accum * args.micro
    print(json.dumps({"segments_ms": ms, "derived_ms": derived}, indent=2))
    print(
        f"window {ms['window']} ms = {n / results['window']:.1f} samples/s"
    )
    if args.json:
        Path(args.json).write_text(
            json.dumps({"segments_ms": ms, "derived_ms": derived}, indent=2)
        )


if __name__ == "__main__":
    main()
