"""Loss-curve guard for promoting the fast training numerics to default.

Trains the SAME model from the SAME init on the SAME fixed data under two
configurations and compares the loss curves window-by-window:

* arm A (reference numerics): f32 gradient accumulation, stock optax chain,
  f32 moments;
* arm B (fast numerics): bf16 accumulation carry + fused single-pass AdamW
  + bf16 first-moment storage (``--fast`` flags configurable).

Data: ``--distinct`` fixed random batches cycled for ``--windows`` windows,
so the model can actually fit (the curve descends) and a numerics
regression shows up as curve divergence, not noise.  All arrays are
generated on device (remote-tunnel rule).

Pass criteria (rc 1 on violation, report JSON written to --json):
* per-window relative loss delta |A-B|/A < ``--tol`` (default 2%);
* final-window delta < tol;
* both curves strictly descend overall (last < first).

Promotion context: VERDICT r3 item 2 asked for ``grad_accum_dtype=
bfloat16`` to be "guarded by a loss-curve comparison" before becoming the
default; reference training loop ``main_model/src/training/trainer.py:
79-136`` runs fp32 end-to-end.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_arm(cfg, args, label: str) -> list[float]:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagined_speech_translation_tpu.training.losses import (
        AdaptiveLossScheduler,
    )
    from imagined_speech_translation_tpu.training.optimizer import (
        build_optimizer,
    )
    from imagined_speech_translation_tpu.training.train_state import (
        TrainModule,
        create_train_state,
    )
    from imagined_speech_translation_tpu.training.train_step import (
        make_train_step,
    )

    B, T, L = args.micro, cfg.data.n_timepoints, cfg.data.max_length
    bow_k = cfg.training.loss.bow_vocab_size
    module = TrainModule(cfg, bow_k=bow_k)
    mask = np.zeros((4, 16), bool)
    for r, c in enumerate(cfg.model.region_channel_counts):
        mask[r, :c] = True
    mask = jnp.asarray(mask)
    kk = jax.random.split(jax.random.key(0), 4)
    sample = {
        "eeg": jax.random.normal(kk[0], (B, 4, 16, T), jnp.float32),
        "decoder_input_ids": jax.random.randint(kk[1], (B, L), 0, 1000, jnp.int32),
        "channel_mask": mask,
    }
    params_probe = jax.eval_shape(
        lambda r: module.init(
            r, sample["eeg"], sample["decoder_input_ids"],
            sample["channel_mask"], method="init_all",
        ),
        jax.random.key(0),
    )["params"]
    optimizer = build_optimizer(params_probe, cfg.training.optimizer, args.windows)
    state = create_train_state(
        module, jax.random.key(0), sample, optimizer,
        AdaptiveLossScheduler(cfg.training.loss).initial_weights(),
    )
    bow = np.random.default_rng(0).integers(0, cfg.model.bart.vocab_size, bow_k)
    step = jax.jit(
        make_train_step(module, optimizer, cfg, bow), donate_argnums=(0,)
    )

    # fixed pool of distinct batches, generated on device with fixed seeds
    accum = cfg.training.grad_accum_steps
    batches = []
    for i in range(args.distinct):
        bk = jax.random.split(jax.random.key(100 + i), 3)
        ids = jax.random.randint(bk[1], (accum, B, L), 0, 1000, jnp.int32)
        batches.append({
            "eeg": jax.random.normal(bk[0], (accum, B, 4, 16, T), jnp.float32),
            "decoder_input_ids": ids,
            "labels": ids,  # learnable: predict the (shifted) input stream
            "attention_mask": jnp.ones((accum, B, L), jnp.int32),
            "channel_mask": mask,
        })

    key = jax.random.key(1, impl=cfg.training.rng_impl)
    losses = []
    t0 = time.perf_counter()
    for w in range(args.windows):
        state, metrics = step(state, batches[w % args.distinct],
                              jax.random.fold_in(key, w))
        losses.append(float(metrics["loss"]))
    print(f"[{label}] {args.windows} windows in "
          f"{time.perf_counter() - t0:.0f}s  "
          f"loss {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro", type=int, default=4)
    ap.add_argument("--accum", type=int, default=8)
    ap.add_argument("--windows", type=int, default=40)
    ap.add_argument("--distinct", type=int, default=4)
    ap.add_argument("--tol", type=float, default=0.02)
    ap.add_argument("--json", default="runs/train_profile/accum_curve.json")
    ap.add_argument(
        "--fast",
        default="fused,accum_bf16,mu_bf16",
        help="comma list of fast-arm flags (fused, accum_bf16, mu_bf16)",
    )
    args = ap.parse_args()

    from imagined_speech_translation_tpu.utils.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    import jax

    from imagined_speech_translation_tpu.config import (
        default_config,
        replace_nested,
    )

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    base = default_config()
    base = replace_nested(base, "training.mixed_precision", True)
    base = replace_nested(base, "training.grad_accum_steps", args.accum)
    fast = base
    flags = {f.strip() for f in args.fast.split(",") if f.strip()}
    if "fused" in flags:
        fast = replace_nested(fast, "training.optimizer.fused", True)
    if "accum_bf16" in flags:
        fast = replace_nested(fast, "training.grad_accum_dtype", "bfloat16")
    if "mu_bf16" in flags:
        fast = replace_nested(fast, "training.optimizer.mu_dtype", "bfloat16")

    ref_losses = run_arm(base, args, "reference-numerics")
    fast_losses = run_arm(fast, args, "fast-numerics")

    rel = [abs(a - b) / max(abs(a), 1e-9)
           for a, b in zip(ref_losses, fast_losses)]
    report = {
        "windows": args.windows,
        "distinct_batches": args.distinct,
        "fast_flags": sorted(flags),
        "ref_first_last": [ref_losses[0], ref_losses[-1]],
        "fast_first_last": [fast_losses[0], fast_losses[-1]],
        "max_rel_delta": max(rel),
        "final_rel_delta": rel[-1],
        "tol": args.tol,
        "ref_losses": [round(v, 5) for v in ref_losses],
        "fast_losses": [round(v, 5) for v in fast_losses],
    }
    ok = (
        max(rel) < args.tol
        and ref_losses[-1] < ref_losses[0]
        and fast_losses[-1] < fast_losses[0]
    )
    report["ok"] = ok
    out = Path(args.json)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps({k: v for k, v in report.items()
                      if not k.endswith("losses")}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
