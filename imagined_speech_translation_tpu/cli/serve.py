"""Serve the streaming EEG→text pipeline over websockets.

The end-to-end product path (SURVEY.md §3.5): device streams EEG bytes →
wake gate → windowed preprocess → TPU decode → text back to the client.
Loads a trained checkpoint (or random weights with ``--random-init`` for
smoke testing), builds the fused decode function, and runs the
``runtime.server.WssService``.

Usage::

    python -m imagined_speech_translation_tpu.cli.serve \
        --montage data/montage.csv --vocab vocab.txt \
        [--checkpoint runs/.../best_model] [--port 4040] [--random-init]
"""

from __future__ import annotations

import argparse
import asyncio
import functools
import logging

import numpy as np

logger = logging.getLogger(__name__)


def build_decode_fn(
    cfg, tokenizer, region_spec, variables, *, mesh=None, fold_bn=True,
    compute_dtype=None, transfer_dtype=None,
):
    """(N, 48, T) raw windows → list[str], one fused jitted program.

    ``transfer_dtype=np.float16`` casts the raw windows on the HOST and
    upcasts to float32 on-device before the IIR preprocess: halves
    host→device bytes per decode call (PCIe, or a remote-tunnel transport).
    Raw EEG spans ~±50 µV-scale units after acquisition scaling; float16's
    ~3 decimal digits keep the cast error far below the noise floor, but
    the mode stays opt-in because decoded tokens are no longer bit-pinned
    to the float32 path.

    With ``mesh`` (a ``jax.sharding.Mesh``), the batch axis is sharded over
    every non-``model`` mesh axis and the weights are replicated, so one
    pooled serving batch (``runtime.batcher.BatchScheduler``) fans out over
    all chips via SPMD — the decode twin of the trainer's DP axis
    (``parallel/mesh.py``).  ``N`` must then be a multiple of the product of
    the sharded axis sizes (the scheduler's ``max_batch`` padding guarantees
    a fixed, divisible shape).
    """
    import jax
    import jax.numpy as jnp

    from ..utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from ..decode import DecodeParams, build_generate_fn
    from ..frontend import SignalFrontend
    from ..models import EEGDecodingModel
    from ..models.folding import fold_batch_norm

    if fold_bn:
        # inference-only: fold eval-mode BatchNorm into the conv stems
        # (models/folding.py) — removes the per-channel affine between
        # MXU convs; algebraically identical, float-rounding aside
        variables = fold_batch_norm(variables)
    if compute_dtype is not None:
        # bf16 serving: params cast AFTER the f32 fold; activations cast
        # after the (numerically sensitive) IIR preprocess below
        from ..utils.trees import cast_floating

        variables = cast_floating(variables, compute_dtype)
    model = EEGDecodingModel(cfg.model)
    frontend = SignalFrontend(cfg.frontend)
    # decode ids from the tokenizer (the data contract; see trainer.py note)
    dp = DecodeParams(
        max_length=cfg.generation.max_length,
        min_length=cfg.generation.min_length,
        num_beams=cfg.generation.num_beams,
        pad_token_id=tokenizer.pad_token_id,
        eos_token_id=tokenizer.sep_token_id,
        decoder_start_token_id=tokenizer.bos_token_id,
    )
    generate = build_generate_fn(model, dp, jit=False)
    gather = jnp.asarray(region_spec.gather_indices)
    mask = jnp.asarray(region_spec.channel_mask)
    R, C = mask.shape
    T = cfg.data.n_timepoints

    # params ride as a jitted ARGUMENT, not a closure: closure-captured
    # weights become HLO constants, bloating the serialized program by the
    # full weight set (hundreds of MB — remote-compile transports reject
    # it) and pinning the executable to one weight snapshot
    def run(params, raw):
        # half-precision transfer upcasts before the (f32-sensitive) IIR
        clean = frontend.preprocess(raw.astype(jnp.float32))
        stacked = clean[:, gather.reshape(-1), :].reshape(raw.shape[0], R, C, T)
        stacked = jnp.where(mask[None, :, :, None], stacked, 0.0)
        if compute_dtype is not None:
            stacked = stacked.astype(compute_dtype)
        return generate(params, stacked, mask)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_axes = tuple(n for n in mesh.axis_names if n != "model")
        n_shards = int(np.prod([mesh.shape[a] for a in batch_axes]))
        # weights replicated once at build time; windows sharded on batch
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
        run = jax.jit(
            run,
            in_shardings=(
                NamedSharding(mesh, P()),
                NamedSharding(mesh, P(batch_axes)),
            ),
        )
    else:
        n_shards = 1
        variables = jax.device_put(variables)
        run = jax.jit(run)

    def decode_fn(windows: np.ndarray):
        if windows.shape[0] % n_shards:
            raise ValueError(
                f"batch {windows.shape[0]} not divisible by the mesh's "
                f"{n_shards} batch shards"
            )
        wire = np.asarray(
            windows, transfer_dtype if transfer_dtype is not None else np.float32
        )
        tokens = np.asarray(run(variables, jnp.asarray(wire)))
        return [t.strip() for t in tokenizer.batch_decode(tokens)]

    return decode_fn


def build_decode_fn_from_args(
    *,
    vocab: str,
    montage: str,
    config: str | None = None,
    checkpoint: str | None = None,
    random_init: bool = False,
    data_parallel: int = 0,
    compute_dtype: str | None = None,
    transfer_dtype: str | None = None,
    max_batch: int = 1,
    platform: str | None = None,
):
    """Build + WARM the full serving decode_fn from picklable args.

    Every device-touching step lives here (backend init, weight init or
    checkpoint restore, jit, warmup) so the whole build can run either
    inline in the server process or inside a ``runtime.worker.DecodeWorker``
    child — in worker mode the server process never claims the device and
    its RSS stays flat under the tunnel-transport leak (round-4 soak
    attribution; see runtime/worker.py).
    """
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    import jax
    import jax.numpy as jnp

    from ..config import replace_nested
    from ..data import ChineseCharTokenizer
    from ..data.regions import RegionSpec, load_montage
    from ..models import EEGDecodingModel
    from ..utils.cache import enable_persistent_cache
    from .train import load_config

    enable_persistent_cache()
    cfg = load_config(config, None)
    tokenizer = ChineseCharTokenizer.from_vocab_file(vocab)
    if tokenizer.vocab_size != cfg.model.bart.vocab_size:
        cfg = replace_nested(cfg, "model.bart.vocab_size", tokenizer.vocab_size)
    spec = RegionSpec.from_channel_names(load_montage(montage))
    T = cfg.data.n_timepoints

    model = EEGDecodingModel(cfg.model)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, len(spec.region_names), spec.max_channels, T), jnp.float32),
        jnp.zeros((1, 4), jnp.int32),
        jnp.asarray(spec.channel_mask),
    )
    if checkpoint and not random_init:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(checkpoint)
        # accept either bare model params or a full train-state tree
        params = restored.get("params", restored)
        if "model" in params:
            params = params["model"]
        variables = {
            "params": params,
            "batch_stats": variables.get("batch_stats", {}),
        }
        logger.info("loaded checkpoint %s", checkpoint)
    else:
        logger.warning("serving with random weights (smoke mode)")

    mesh = None
    if data_parallel > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(data_parallel, 1)
        logger.info("decode mesh: %s", dict(mesh.shape))
    decode_fn = build_decode_fn(
        cfg, tokenizer, spec, variables, mesh=mesh,
        compute_dtype=jnp.dtype(compute_dtype) if compute_dtype else None,
        transfer_dtype=np.dtype(transfer_dtype) if transfer_dtype else None,
    )
    n_ch = int(spec.gather_indices.max() + 1)
    logger.info("warming up the decode program...")
    decode_fn(np.zeros((max(1, max_batch), n_ch, T), np.float32))
    logger.info("decode program ready")
    return decode_fn


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--montage", required=True)
    ap.add_argument("--platform", default=None, help="jax platform override (cpu/tpu)")
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=4040)
    ap.add_argument("--window-hop", type=int, default=None)
    ap.add_argument("--wake-threshold", type=float, default=0.0)
    ap.add_argument(
        "--max-batch", type=int, default=1,
        help=">1 pools windows from ALL sessions into fixed-shape decode "
        "batches (runtime.batcher.BatchScheduler)",
    )
    ap.add_argument(
        "--max-delay-ms", type=float, default=25.0,
        help="batching deadline: launch at most this long after the oldest "
        "pending window arrived",
    )
    ap.add_argument(
        "--data-parallel", type=int, default=0,
        help="shard each decode batch over this many devices (0 = single "
        "device); requires --max-batch divisible by it",
    )
    ap.add_argument(
        "--compute-dtype", default=None, choices=("bfloat16", "float32"),
        help="serving compute dtype; bfloat16 halves HBM weight traffic and "
        "doubles MXU rate (IIR preprocess and BN fold stay float32)",
    )
    ap.add_argument(
        "--transfer-dtype", default=None, choices=("float16", "float32"),
        help="host->device wire dtype for raw windows; float16 halves "
        "transfer bytes (upcast to float32 on-device before the IIR)",
    )
    ap.add_argument(
        "--decode-worker-budget-mb", type=float, default=0.0,
        help="run the decode program in a CHILD process recycled when its "
        "RSS crosses this budget (runtime/worker.py) — bounds server memory "
        "under the remote-tunnel per-transfer leak; 0 = in-process decode",
    )
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from .train import load_config
    from ..data import ChineseCharTokenizer
    from ..data.regions import RegionSpec, load_montage
    from ..runtime import (
        DecodePipeline,
        RingBuffer,
        SessionRegistry,
        ThresholdWakeGate,
        Windower,
    )
    from ..runtime.server import WssService
    from ..config import replace_nested

    if args.data_parallel > 1 and args.max_batch % args.data_parallel:
        ap.error("--max-batch must be divisible by --data-parallel")

    # host-only context the SERVER needs (no device touched here)
    cfg = load_config(args.config, None)
    tokenizer = ChineseCharTokenizer.from_vocab_file(args.vocab)
    if tokenizer.vocab_size != cfg.model.bart.vocab_size:
        cfg = replace_nested(cfg, "model.bart.vocab_size", tokenizer.vocab_size)
    spec = RegionSpec.from_channel_names(load_montage(args.montage))
    T = cfg.data.n_timepoints
    n_ch = spec.gather_indices.max() + 1  # raw montage channels expected

    fargs = dict(
        vocab=args.vocab, montage=args.montage, config=args.config,
        checkpoint=args.checkpoint, random_init=args.random_init,
        data_parallel=args.data_parallel, compute_dtype=args.compute_dtype,
        transfer_dtype=args.transfer_dtype, max_batch=args.max_batch,
        platform=args.platform,
    )
    worker = None
    if args.decode_worker_budget_mb > 0:
        from ..runtime.worker import DecodeWorker

        worker = DecodeWorker(
            functools.partial(build_decode_fn_from_args, **fargs),
            rss_budget_mb=args.decode_worker_budget_mb,
        )
        worker.start()  # spawns the child, builds + warms the program there
        decode_fn = worker
    else:
        if args.platform:
            import jax

            jax.config.update("jax_platforms", args.platform)
        decode_fn = build_decode_fn_from_args(**fargs)

    scheduler = None
    if args.max_batch > 1:
        from ..runtime import BatchScheduler, BatchingDecodePipeline

        scheduler = BatchScheduler(
            decode_fn, max_batch=args.max_batch,
            max_delay_ms=args.max_delay_ms,
        )

    def pipeline_factory(key: str):
        ring = RingBuffer(int(n_ch), capacity=4 * T)
        hop = args.window_hop or T
        gate = ThresholdWakeGate(args.wake_threshold) if args.wake_threshold else None
        if scheduler is not None:
            return BatchingDecodePipeline(
                windower=Windower(ring, window=T, hop=hop),
                scheduler=scheduler,
                wake_gate=gate,
            )
        return DecodePipeline(
            windower=Windower(ring, window=T, hop=hop),
            decode_fn=decode_fn,
            wake_gate=gate,
            max_batch=1,
        )

    # the full reference command table (wss/wss.js:52-68) rides alongside the
    # decode pipeline so companion clients get the complete control plane
    from ..runtime.commands import build_command_registry
    from ..runtime.services import ServiceBundle

    bundle = ServiceBundle()
    registry = build_command_registry(bundle, registry=SessionRegistry())

    @registry.command("latency")
    async def latency(session, a):
        out = {}
        if scheduler is not None:
            out["pooled"] = scheduler.stats()
        else:
            out.update(
                {k: p.latency.summary() for k, p in service._pipelines.items()}
            )
        if worker is not None:
            out["decode_worker"] = worker.stats()
        return out

    service = WssService(
        registry,
        pipeline_factory=pipeline_factory,
        n_channels=int(n_ch),
        services=bundle,
    )
    logger.info("serving on %s:%d (window=%d, channels=%d)", args.host,
                args.port, T, n_ch)

    async def amain():
        if scheduler is not None:
            async with scheduler:
                await service.serve(args.host, args.port)
        else:
            await service.serve(args.host, args.port)

    try:
        asyncio.run(amain())
    finally:
        if worker is not None:
            worker.stop()


if __name__ == "__main__":
    main()
