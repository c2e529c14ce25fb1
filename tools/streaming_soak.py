"""Streaming-server soak: hours of synthetic device EEG through the REAL
websocket service, recording memory/latency stability.

What runs: a ``WssService`` (the same class ``cli/serve.py`` deploys) on a
localhost websocket, with a real jitted tiny EEG→text decode pipeline (CPU),
and a client task that streams binary ``eeg`` frames continuously —
utterance boundaries via ``eeg_end`` — plus periodic text commands, for
``--minutes``.  Every 10 s the RSS and cumulative counters are sampled.

Pass criteria (written to the report, rc 1 on violation):
* zero protocol/stream errors;
* bounded memory: linear-fit RSS slope over the second half < 32 MB/h;
* stable latency: second-half p95 ≤ 3x first-half p95.

Usage::

    python tools/streaming_soak.py --minutes 120 --out runs/soak
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _rss_mb() -> float:
    for line in Path("/proc/self/status").read_text().splitlines():
        if line.startswith("VmRSS"):
            return int(line.split()[1]) / 1024.0
    return float("nan")


def _full_size_ctx(cfg=None):
    """Host-only context (no device touched): cfg, region spec, tokenizer."""
    import tempfile

    from imagined_speech_translation_tpu.config import default_config
    from imagined_speech_translation_tpu.data.regions import RegionSpec
    from imagined_speech_translation_tpu.data.synthetic import (
        make_synthetic_montage,
    )
    from imagined_speech_translation_tpu.data.tokenizer import (
        ChineseCharTokenizer,
    )

    if cfg is None:
        cfg = default_config().validate()
    with tempfile.TemporaryDirectory() as td:
        labels = make_synthetic_montage(Path(td) / "montage.csv")
    spec = RegionSpec.from_channel_names(labels)
    n_channels = int(spec.gather_indices.max()) + 1
    # synthetic vocab at the real size: ids/specials match the data contract,
    # surface forms don't matter for timing
    base = (
        ["[PAD]"]
        + [f"[unused{i}]" for i in range(99)]
        + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    )
    vocab = base + [
        f"[w{i}]" for i in range(cfg.model.bart.vocab_size - len(base))
    ]
    tok = ChineseCharTokenizer(vocab)
    return cfg, spec, n_channels, tok


def full_size_decode_factory(
    max_batch: int, cfg=None, transfer_dtype=None, platform=None
):
    """Build + WARM the shipped full-size decode_fn (BN-folded, bf16).

    Module-level + picklable args so it can run inside a
    ``runtime.worker.DecodeWorker`` child — the process that owns the
    PJRT/tunnel client and its per-transfer leak (round-4 attribution).
    Random weights: decode timing is weight-independent; the program is
    identical to what ``cli/serve`` deploys.  ``platform`` pins the jax
    backend in the child (env vars don't survive the TPU-tunnel site hook).
    """
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from imagined_speech_translation_tpu.cli.serve import build_decode_fn
    from imagined_speech_translation_tpu.models import EEGDecodingModel

    cfg, spec, n_channels, tok = _full_size_ctx(cfg)
    window = cfg.data.n_timepoints
    model = EEGDecodingModel(cfg.model)
    mask = jnp.asarray(spec.channel_mask)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, *spec.channel_mask.shape, window), jnp.float32),
        jnp.zeros((1, spec.channel_mask.shape[0]), jnp.int32),
        mask,
    )
    decode_fn = build_decode_fn(
        cfg, tok, spec, variables, compute_dtype=jnp.bfloat16,
        transfer_dtype=transfer_dtype,
    )
    print("backend:", jax.default_backend(), "window:", window, flush=True)
    t0 = time.time()
    decode_fn(np.zeros((max_batch, n_channels, window), np.float32))
    print(f"warmup compile: {time.time() - t0:.1f}s", flush=True)
    return decode_fn


def build_full_size_service(
    pooled: bool, max_batch: int, cfg=None, transfer_dtype=None,
    worker_budget_mb: float = 0.0,
):
    """WssService over the SHIPPED serving path at full size, on the default
    platform (the TPU chip when present): ``cli/serve.build_decode_fn`` with
    the default config, BN folding, and bfloat16 compute — the configuration
    ``cli/serve --max-batch 16 --compute-dtype bfloat16`` deploys.

    ``cfg`` overrides the model config (tests inject tiny dims; the real
    soak uses ``default_config()``).  ``worker_budget_mb > 0`` runs the
    decode program in a recycled child process (``runtime/worker.py``,
    ``cli/serve --decode-worker-budget-mb``) so the SERVER process never
    owns the leaky tunnel client.

    Returns (service, registry, scheduler, window_length, n_channels,
    worker-or-None).
    """
    import functools

    from imagined_speech_translation_tpu.runtime.batcher import (
        BatchScheduler,
        BatchingDecodePipeline,
    )
    from imagined_speech_translation_tpu.runtime.server import WssService
    from imagined_speech_translation_tpu.runtime.session import SessionRegistry
    from imagined_speech_translation_tpu.runtime.streaming import (
        DecodePipeline,
        RingBuffer,
        ThresholdWakeGate,
        Windower,
    )

    cfg, spec, n_channels, _ = _full_size_ctx(cfg)
    window = cfg.data.n_timepoints
    worker = None
    if worker_budget_mb > 0:
        import jax

        from imagined_speech_translation_tpu.runtime.worker import DecodeWorker

        # carry THIS process's platform pin into the child (the tunnel site
        # hook overrides JAX_PLATFORMS env, so env inheritance is not enough)
        platform = getattr(jax.config, "jax_platforms", None) or None
        worker = DecodeWorker(
            functools.partial(
                full_size_decode_factory, max_batch, cfg, transfer_dtype,
                platform,
            ),
            rss_budget_mb=worker_budget_mb,
            # the tunnel transport admits fresh clients slowly after
            # connection churn (docs/PERFORMANCE.md "known tunnel
            # limitation"): a cold spawn can sit minutes in its first
            # device op even with a warm compile cache.  The soak pays
            # one spawn for the whole run, so wait it out rather than
            # erroring every utterance for 10 minutes.
            start_timeout_s=1800.0,
        )
        worker.start()
        decode_fn = worker
    else:
        decode_fn = full_size_decode_factory(max_batch, cfg, transfer_dtype)

    scheduler = None
    if pooled:
        scheduler = BatchScheduler(
            decode_fn, max_batch=max_batch, max_delay_ms=25.0
        )

        def pipeline_factory(key):
            rb = RingBuffer(n_channels, window * 8)
            return BatchingDecodePipeline(
                windower=Windower(rb, window=window, hop=window),
                scheduler=scheduler,
                wake_gate=ThresholdWakeGate(0.05),
            )

    else:

        def pipeline_factory(key):
            rb = RingBuffer(n_channels, window * 8)
            return DecodePipeline(
                windower=Windower(rb, window=window, hop=window),
                decode_fn=decode_fn,
                wake_gate=ThresholdWakeGate(0.05),
                max_batch=max_batch,
            )

    reg = SessionRegistry()

    @reg.command("speak")
    async def speak(session, args):
        return {"spoken": args[0] if args else ""}

    svc = WssService(reg, pipeline_factory=pipeline_factory, n_channels=n_channels)
    return svc, reg, scheduler, window, n_channels, worker


def build_service(n_channels: int, window: int, pooled: bool = False):
    """WssService with a REAL jitted tiny-model decode pipeline (CPU).

    ``pooled=True`` routes every session through one shared
    ``BatchScheduler`` (``runtime/batcher.py``) instead of per-session
    ``DecodePipeline`` batching — the multi-tenant serving configuration of
    ``cli/serve --max-batch``."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from imagined_speech_translation_tpu.config import (
        BartConfig,
        BrainEncoderConfig,
        Config,
        DataConfig,
        ModelConfig,
        RegionEncoderConfig,
    )
    from imagined_speech_translation_tpu.decode import (
        DecodeParams,
        build_generate_fn,
    )
    from imagined_speech_translation_tpu.models import EEGDecodingModel
    from imagined_speech_translation_tpu.runtime.server import WssService
    from imagined_speech_translation_tpu.runtime.session import SessionRegistry
    from imagined_speech_translation_tpu.runtime.streaming import (
        DecodePipeline,
        RingBuffer,
        ThresholdWakeGate,
        Windower,
    )

    h = 48
    cfg = Config(
        data=DataConfig(n_timepoints=window, max_length=8),
        model=ModelConfig(
            hidden_dim=h,
            max_region_channels=16,
            region_channel_counts=(16, 9, 11, 12),
            brain_encoder=BrainEncoderConfig(
                hidden_dim=h, fusion_heads=4, cross_region_heads=4,
                region_encoder=RegionEncoderConfig(
                    conv_channels=(8, 16, 24, 32, 48),
                    attn_heads=(4, 2, 2), se_reduction=4,
                ),
            ),
            bart=BartConfig(
                vocab_size=128, d_model=h, encoder_layers=3, decoder_layers=2,
                num_heads=4, ffn_dim=96, max_position_embeddings=32,
            ),
        ),
    ).validate()
    model = EEGDecodingModel(cfg.model)
    mask = np.zeros((4, 16), bool)
    for r, c in enumerate(cfg.model.region_channel_counts):
        mask[r, :c] = True
    channel_mask = jnp.asarray(mask)
    gather = []
    counts = cfg.model.region_channel_counts
    offs = np.cumsum([0] + list(counts))
    for r in range(4):
        row = list(range(offs[r], offs[r + 1])) + [0] * (16 - counts[r])
        gather.append(row)
    gather = np.asarray(gather)

    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((2, 4, 16, window), jnp.float32),
        jnp.zeros((2, 4), jnp.int32),
        channel_mask,
    )
    dp = DecodeParams(
        max_length=8, min_length=2, num_beams=1,
        pad_token_id=cfg.model.bart.pad_token_id,
        eos_token_id=cfg.model.bart.eos_token_id,
        decoder_start_token_id=cfg.model.bart.decoder_start_token_id,
    )
    generate = build_generate_fn(model, dp)
    max_batch = 4

    def decode_fn(batch):  # (N, C=48, T)
        n = batch.shape[0]
        padded = np.zeros((max_batch, 48, batch.shape[2]), np.float32)
        padded[:n] = batch
        stacked = padded[:, gather.reshape(-1), :].reshape(
            max_batch, 4, 16, batch.shape[2]
        )
        stacked = np.where(mask[None, :, :, None], stacked, 0.0)
        toks = np.asarray(
            generate(variables, jnp.asarray(stacked), channel_mask)
        )
        return [" ".join(map(str, row[row > 0])) for row in toks[:n]]

    # warm the decode program before the clock starts: the first call
    # compiles (tens of seconds on a busy CPU) and would otherwise be
    # charged to the soak's latency series
    decode_fn(np.zeros((1, 48, window), np.float32))

    scheduler = None
    if pooled:
        from imagined_speech_translation_tpu.runtime.batcher import (
            BatchScheduler,
            BatchingDecodePipeline,
        )

        scheduler = BatchScheduler(
            decode_fn, max_batch=max_batch, max_delay_ms=25.0
        )

        def pipeline_factory(key):
            rb = RingBuffer(n_channels, window * 8)
            return BatchingDecodePipeline(
                windower=Windower(rb, window=window, hop=window),
                scheduler=scheduler,
                wake_gate=ThresholdWakeGate(0.05),
            )

    else:

        def pipeline_factory(key):
            rb = RingBuffer(n_channels, window * 8)
            return DecodePipeline(
                windower=Windower(rb, window=window, hop=window),
                decode_fn=decode_fn,
                wake_gate=ThresholdWakeGate(0.05),
                max_batch=max_batch,
            )

    reg = SessionRegistry()

    @reg.command("speak")
    async def speak(session, args):
        return {"spoken": args[0] if args else ""}

    svc = WssService(reg, pipeline_factory=pipeline_factory, n_channels=n_channels)
    return svc, reg, scheduler


async def client_sessions(
    port: int,
    sessions: int,
    t_end: float,
    n_channels: int,
    window: int,
    *,
    t0: float | None = None,
):
    """Drive ``sessions`` device connections against a running soak server
    until ``t_end``; returns (counters, latencies) with latencies as
    (elapsed-seconds, utterance-ms) pairs.  Runs either in the server
    process (legacy mode) or as the body of the isolated client process."""
    import websockets

    from imagined_speech_translation_tpu.runtime.protocol import (
        BinaryFrame,
        encode_binary_frame,
    )

    t0 = time.time() if t0 is None else t0
    counters = {
        "frames_sent": 0, "utterances": 0, "errors": 0, "text_cmds": 0,
    }
    latencies: list[tuple[float, float]] = []

    async def session_loop(s_idx: int):
        s_rng = np.random.default_rng(s_idx)
        # loopback soak: keepalive pings off — a long decode compile or a
        # co-tenant hogging the core must not read as a dead peer
        async with websockets.connect(
            f"ws://127.0.0.1:{port}", max_size=None,
            ping_interval=None, ping_timeout=None,
        ) as ws:
            await ws.send(f"authentication¬soak-token-{s_idx}")
            reply = await ws.recv()
            key = json.loads(reply.split("¬")[2])
            last_end = [time.time()]

            async def reader():
                async for msg in ws:
                    if isinstance(msg, str):
                        if msg.startswith("utterance"):
                            counters["utterances"] += 1
                            latencies.append(
                                (time.time() - t0,
                                 (time.time() - last_end[0]) * 1e3)
                            )
                        elif msg.startswith("error"):
                            counters["errors"] += 1
                            if counters["errors"] < 5:
                                print("ERR:", msg[:200], flush=True)

            rtask = asyncio.create_task(reader())
            i = 0
            while time.time() < t_end:
                chunk = s_rng.normal(
                    0, 1, (n_channels, window // 2)
                ).astype(np.float32)
                await ws.send(
                    encode_binary_frame(
                        BinaryFrame("eeg", key, chunk.tobytes())
                    )
                )
                counters["frames_sent"] += 1
                i += 1
                if i % 16 == 0:  # utterance boundary every 8 windows
                    last_end[0] = time.time()
                    await ws.send(
                        encode_binary_frame(BinaryFrame("eeg_end", key, b""))
                    )
                if i % 64 == 0:
                    await ws.send(f"speak¬{key}¬soak check {i}")
                    counters["text_cmds"] += 1
                # keep the AGGREGATE frame rate constant as sessions scale
                await asyncio.sleep(0.02 * sessions)
            # drain
            await ws.send(encode_binary_frame(BinaryFrame("eeg_end", key, b"")))
            await asyncio.sleep(1.0)
            rtask.cancel()

    await asyncio.gather(*(session_loop(i) for i in range(sessions)))
    return counters, latencies


def _client_main(argv) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--_client", action="store_true")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--sessions", type=int, required=True)
    ap.add_argument("--minutes", type=float, required=True)
    ap.add_argument("--channels", type=int, required=True)
    ap.add_argument("--window", type=int, required=True)
    ap.add_argument("--out", required=True)
    a = ap.parse_args(argv)
    counters, latencies = asyncio.run(
        client_sessions(
            a.port, a.sessions, time.time() + a.minutes * 60.0,
            a.channels, a.window,
        )
    )
    Path(a.out).write_text(
        json.dumps({"counters": counters, "latencies": latencies})
    )
    return 0


async def soak(
    minutes: float,
    out_dir: Path,
    port: int,
    sessions: int = 1,
    pooled: bool = False,
    full_size: bool = False,
    max_batch: int = 4,
    cfg=None,
    transfer_dtype=None,
    rss_budget_mb_per_h: float = 32.0,
    isolate_clients: bool = False,
    worker_budget_mb: float = 0.0,
) -> dict:
    import websockets

    from imagined_speech_translation_tpu.runtime.protocol import (
        encode_binary_frame,
        encode_text_frame,
    )
    from imagined_speech_translation_tpu.runtime.protocol import BinaryFrame, TextFrame

    worker = None
    if full_size:
        svc, reg, scheduler, window, n_channels, worker = (
            build_full_size_service(
                pooled=pooled, max_batch=max_batch, cfg=cfg,
                transfer_dtype=transfer_dtype,
                worker_budget_mb=worker_budget_mb,
            )
        )
    else:
        n_channels, window = 48, 128
        svc, reg, scheduler = build_service(n_channels, window, pooled=pooled)

    counters = {
        "frames_sent": 0, "utterances": 0, "errors": 0, "text_cmds": 0,
    }
    latencies: list[tuple[float, float]] = []  # (t, ms)
    rss: list[tuple[float, float]] = []

    async def handler(ws):
        import websockets as _ws

        try:
            async for message in ws:
                if isinstance(message, bytes):
                    try:
                        texts = await svc.handle_binary(message)
                        for t in texts:
                            await ws.send(
                                encode_text_frame(
                                    TextFrame("utterance", "", (t,))
                                )
                            )
                    except Exception as e:  # noqa: BLE001 - counted, not fatal
                        await ws.send(
                            encode_text_frame(
                                TextFrame("error", "stream", (str(e),))
                            )
                        )
                else:
                    await ws.send(await svc.handle_text(message))
        except _ws.exceptions.ConnectionClosed:
            pass  # client hung up mid-reply (drain) — not a soak error

    t_end = time.time() + minutes * 60.0
    t0 = time.time()

    child_rss: list[tuple[float, float]] = []

    def _sample():
        rss.append((time.time() - t0, _rss_mb()))
        if worker is not None and worker._proc is not None:
            from imagined_speech_translation_tpu.runtime.worker import (
                _rss_mb as _pid_rss,
            )

            child_rss.append((time.time() - t0, _pid_rss(worker._proc.pid)))

    async def rss_sampler():
        while time.time() < t_end:
            _sample()
            await asyncio.sleep(10.0)
        _sample()

    async def run_clients_inproc():
        c, lat = await client_sessions(
            port, sessions, t_end, n_channels, window, t0=t0
        )
        counters.update(c)
        latencies.extend(lat)

    async def run_clients_subproc():
        """Load generation in its OWN process: the client loops do not
        share the server's event loop or GIL — utterance latency then
        measures the SERVER, not client starvation (and matches the real
        topology, where devices are remote peers)."""
        import subprocess
        import sys
        import tempfile

        out = tempfile.NamedTemporaryFile(suffix=".json", delete=False)
        out.close()
        proc = await asyncio.create_subprocess_exec(
            sys.executable, os.path.abspath(__file__), "--_client",
            "--port", str(port), "--sessions", str(sessions),
            "--minutes", str(minutes), "--channels", str(n_channels),
            "--window", str(window), "--out", out.name,
        )
        rc = await proc.wait()
        if rc != 0:
            raise RuntimeError(f"client process failed rc={rc}")
        payload = json.loads(Path(out.name).read_text())
        os.unlink(out.name)
        counters.update(payload["counters"])
        latencies.extend(tuple(x) for x in payload["latencies"])

    run_clients = run_clients_subproc if isolate_clients else run_clients_inproc
    async with websockets.serve(
        handler, "127.0.0.1", port, ping_interval=None
    ):
        sampler = asyncio.create_task(rss_sampler())
        if scheduler is not None:
            async with scheduler:
                await run_clients()
        else:
            await run_clients()
        sampler.cancel()

    # ---- analysis ----------------------------------------------------
    dur_s = time.time() - t0
    lat_ms = [m for _, m in latencies]
    half = len(lat_ms) // 2 or 1

    def p95(xs):
        if not xs:
            return None
        s = sorted(xs)
        return s[min(len(s) - 1, int(0.95 * len(s)))]

    rss_half = [(t, m) for t, m in rss if t >= dur_s / 2]
    slope_mb_per_h = 0.0
    if len(rss_half) >= 3:
        ts = np.array([t for t, _ in rss_half])
        ms = np.array([m for _, m in rss_half])
        slope_mb_per_h = float(np.polyfit(ts, ms, 1)[0] * 3600.0)

    # host->device accounting: every pooled launch moves one padded
    # (max_batch, C, W) batch to the device.  A transport that leaks per
    # transfer (the remote TPU tunnel does; local PJRT does not) shows up
    # as rss_growth ~= h2d_total -- the ratio attributes it.
    wire_bytes = 2 if transfer_dtype is not None else 4
    n_launches = scheduler.batches if scheduler is not None else None
    h2d_mb = (
        round(n_launches * max_batch * n_channels * window * wire_bytes / 2**20, 1)
        if n_launches is not None and full_size
        else None
    )
    report = {
        "duration_min": round(dur_s / 60.0, 1),
        **counters,
        "windows_per_utterance": 8,
        "latency_p50_ms": (
            round(sorted(lat_ms)[len(lat_ms) // 2], 1) if lat_ms else None
        ),
        "latency_p95_first_half_ms": p95(lat_ms[:half]),
        "latency_p95_second_half_ms": p95(lat_ms[half:]),
        "rss_start_mb": round(rss[0][1], 1) if rss else None,
        "rss_end_mb": round(rss[-1][1], 1) if rss else None,
        "rss_slope_second_half_mb_per_h": round(slope_mb_per_h, 2),
        "rss_budget_mb_per_h": rss_budget_mb_per_h,
        "h2d_total_mb": h2d_mb,
        "rss_growth_per_h2d_mb": (
            round((rss[-1][1] - rss[0][1]) / h2d_mb, 3)
            if h2d_mb and rss
            else None
        ),
        "rss_series": [(round(t, 1), round(m, 1)) for t, m in rss],
        "sessions": sessions,
        "pooled": pooled,
        "full_size": full_size,
        "window": window,
        "max_batch": max_batch if full_size else 4,
        "pipeline_latency": (
            scheduler.stats()
            if scheduler is not None
            else next(iter(svc._pipelines.values())).latency.summary()
            if svc._pipelines
            else None
        ),
        "decode_worker": worker.stats() if worker is not None else None,
        "child_rss_max_mb": (
            round(max(m for _, m in child_rss), 1) if child_rss else None
        ),
        "child_rss_series": [
            (round(t, 1), round(m, 1)) for t, m in child_rss
        ] or None,
    }
    # DERIVED verdict booleans (round-4 verdict 6c: the pass claims are
    # computed from the measurements and surfaced by name, so a commit
    # message can quote them instead of asserting prose the rows refute)
    report["latency_stable"] = bool(
        report["latency_p95_second_half_ms"] is None
        or report["latency_p95_first_half_ms"] is None
        or report["latency_p95_second_half_ms"]
        <= 3.0 * max(report["latency_p95_first_half_ms"], 1.0)
    )
    report["rss_bounded"] = bool(slope_mb_per_h < rss_budget_mb_per_h)
    ok = (
        counters["errors"] == 0
        and counters["utterances"] > 0
        and report["rss_bounded"]
        and report["latency_stable"]
    )
    report["ok"] = ok
    if worker is not None:
        worker.stop()
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "soak_report.json").write_text(json.dumps(report, indent=2))
    return report


def main():
    if "--_client" in sys.argv:
        return _client_main(sys.argv[1:])
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=120.0)
    ap.add_argument("--out", default="runs/soak")
    ap.add_argument("--port", type=int, default=41414)
    ap.add_argument("--sessions", type=int, default=1)
    ap.add_argument(
        "--pooled", action="store_true",
        help="route all sessions through one shared BatchScheduler",
    )
    ap.add_argument(
        "--full-size", action="store_true",
        help="serve the SHIPPED full-size model (default config, BN-folded, "
        "bfloat16) on the default platform — the on-chip serving soak",
    )
    ap.add_argument(
        "--max-batch", type=int, default=4,
        help="pooled/pipeline decode batch in --full-size mode",
    )
    ap.add_argument(
        "--transfer-dtype", default=None, choices=("float16",),
        help="half-precision host->device wire for --full-size decode",
    )
    ap.add_argument(
        "--isolate-clients", action="store_true",
        help="run the load-generating sessions in their own process so "
        "utterance latency measures the server, not client starvation",
    )
    ap.add_argument(
        "--rss-budget-mb-per-h", type=float, default=32.0,
        help="RSS-slope pass budget; raise ONLY with an attributed "
        "transport leak (see rss_growth_per_h2d_mb in the report)",
    )
    ap.add_argument(
        "--decode-worker-budget-mb", type=float, default=0.0,
        help="full-size mode: run the decode program in a child process "
        "recycled at this RSS (runtime/worker.py) — the SERVER process "
        "then stays flat under the tunnel per-transfer leak; 0 = in-process",
    )
    args = ap.parse_args()
    report = asyncio.run(
        soak(
            args.minutes, Path(args.out), args.port,
            sessions=args.sessions, pooled=args.pooled,
            full_size=args.full_size, max_batch=args.max_batch,
            transfer_dtype=np.float16 if args.transfer_dtype else None,
            rss_budget_mb_per_h=args.rss_budget_mb_per_h,
            isolate_clients=args.isolate_clients,
            worker_budget_mb=args.decode_worker_budget_mb,
        )
    )
    slim = {
        k: v for k, v in report.items()
        if k not in ("rss_series", "child_rss_series")
    }
    print(json.dumps(slim))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
