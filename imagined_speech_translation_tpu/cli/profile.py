"""Capture an xplane trace of the hot paths (encode / decode / train step)
for TensorBoard/XProf (SURVEY.md §5: tracing as first-class).

Usage::

    python -m imagined_speech_translation_tpu.cli.profile \
        --out /tmp/ist_trace [--what encode|generate|train] [--batch 8]
        [--tiny] [--platform cpu]
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

logger = logging.getLogger(__name__)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--what", choices=("encode", "generate", "train"), default="encode")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tiny", action="store_true", help="tiny config (fast compile)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from ..utils.cache import enable_persistent_cache
    from ..utils.profiling import annotate, trace

    enable_persistent_cache()

    from ..config import default_config, replace_nested
    from ..models import EEGDecodingModel

    cfg = default_config()
    if args.tiny:
        for path, v in (
            ("model.hidden_dim", 48),
            ("model.brain_encoder.hidden_dim", 48),
            ("model.brain_encoder.fusion_heads", 4),
            ("model.brain_encoder.cross_region_heads", 4),
            ("model.brain_encoder.region_encoder.conv_channels", (8, 16, 24, 32, 48)),
            ("model.brain_encoder.region_encoder.attn_heads", (4, 2, 2)),
            ("model.brain_encoder.region_encoder.se_reduction", 4),
            ("model.bart.d_model", 48),
            ("model.bart.vocab_size", 256),
            ("model.bart.decoder_layers", 2),
            ("model.bart.num_heads", 4),
            ("model.bart.ffn_dim", 96),
            ("data.n_timepoints", 128),
        ):
            cfg = replace_nested(cfg, path, v)

    B, T = args.batch, cfg.data.n_timepoints
    model = EEGDecodingModel(cfg.model)
    rng = np.random.default_rng(0)
    mask = np.zeros((4, 16), bool)
    for r, c in enumerate(cfg.model.region_channel_counts):
        mask[r, :c] = True
    mask = jnp.asarray(mask)
    eeg = jnp.asarray(rng.normal(size=(B, 4, 16, T)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, cfg.model.bart.vocab_size, (B, 8)), jnp.int32)
    variables = jax.jit(model.init)(jax.random.key(0), eeg, ids, mask)

    if args.what == "encode":
        fn = jax.jit(lambda v, e: model.apply(v, e, mask, method="encode"))
        run = lambda: fn(variables, eeg)
    elif args.what == "generate":
        from ..decode import DecodeParams, build_generate_fn

        bart = cfg.model.bart
        dp = DecodeParams(
            max_length=16, min_length=4, num_beams=3,
            pad_token_id=bart.pad_token_id, eos_token_id=bart.eos_token_id,
            decoder_start_token_id=bart.decoder_start_token_id,
        )
        gen = build_generate_fn(model, dp)
        run = lambda: gen(variables, eeg, mask)
    else:  # train
        labels = jnp.asarray(
            rng.integers(0, cfg.model.bart.vocab_size, (B, 8)), jnp.int32
        )

        from ..models.bart import cross_entropy_loss

        @jax.jit
        def step(v, e, i, l):
            def loss_fn(p):
                logits = model.apply(
                    {"params": p, "batch_stats": v.get("batch_stats", {})},
                    e, i, mask,
                )
                return cross_entropy_loss(logits, l)[0]

            return jax.grad(loss_fn)(v["params"])

        run = lambda: step(variables, eeg, ids, labels)

    logger.info("compiling %s ...", args.what)
    jax.block_until_ready(run())
    logger.info("tracing %d iterations to %s", args.iters, args.out)
    with trace(args.out):
        for i in range(args.iters):
            with annotate(f"{args.what}_{i}"):
                out = run()
        jax.block_until_ready(out)
    logger.info("trace written to %s (open with TensorBoard profile plugin)", args.out)
    return args.out


if __name__ == "__main__":
    main()
