"""Cross-session batch scheduler tests: fill/deadline launch policy, static
batch shapes, padding, error propagation, drain-on-stop, and pooling windows
from many sessions into one decode program (``runtime/batcher.py``).

The reference has no equivalent component (its Dart plane decodes
per-message, ``dart_wss``); these tests pin the TPU-native serving behavior:
ONE compiled batch shape regardless of fill, bounded added latency.
"""

import asyncio

import numpy as np
import pytest

from imagined_speech_translation_tpu.runtime import (
    BatchScheduler,
    BatchingDecodePipeline,
    RingBuffer,
    Windower,
)


def run(coro):
    return asyncio.run(coro)


class RecordingDecoder:
    """decode_fn that records every batch shape it is handed."""

    def __init__(self, fail=False):
        self.batches: list[np.ndarray] = []
        self.fail = fail

    def __call__(self, batch: np.ndarray) -> list[str]:
        if self.fail:
            raise ValueError("model exploded")
        self.batches.append(np.array(batch))
        # text encodes the row's mean so each submitter can check it got
        # ITS window's decode back
        return [f"t{batch[i].mean():.3f}" for i in range(batch.shape[0])]


def _window(seed: float) -> np.ndarray:
    return np.full((2, 8), seed, np.float32)


def test_fill_triggered_launch_static_shape():
    dec = RecordingDecoder()

    async def flow():
        async with BatchScheduler(dec, max_batch=4, max_delay_ms=10_000) as s:
            texts = await asyncio.gather(
                *(s.submit(_window(float(i))) for i in range(4))
            )
            return texts, s.fills

    texts, fills = run(flow())
    # a full batch launches immediately (deadline was 10 s away)
    assert list(fills) == [4]
    assert dec.batches[0].shape == (4, 2, 8)
    # each submitter got its OWN window's decode, in submission order
    assert texts == ["t0.000", "t1.000", "t2.000", "t3.000"]


def test_deadline_launch_pads_to_static_shape():
    dec = RecordingDecoder()

    async def flow():
        async with BatchScheduler(dec, max_batch=8, max_delay_ms=30) as s:
            t0 = asyncio.get_running_loop().time()
            texts = await asyncio.gather(
                s.submit(_window(1.0)), s.submit(_window(2.0))
            )
            waited = asyncio.get_running_loop().time() - t0
            return texts, waited, s.fills

    texts, waited, fills = run(flow())
    assert texts == ["t1.000", "t2.000"]
    assert list(fills) == [2]
    # the program still saw the ONE compiled shape, padded with row 0
    assert dec.batches[0].shape == (8, 2, 8)
    np.testing.assert_array_equal(dec.batches[0][2], dec.batches[0][0])
    # launched by the deadline, not hung waiting for fill
    assert waited < 5.0


def test_zeros_pad_mode():
    dec = RecordingDecoder()

    async def flow():
        async with BatchScheduler(
            dec, max_batch=4, max_delay_ms=10, pad_mode="zeros"
        ) as s:
            await s.submit(_window(3.0))

    run(flow())
    assert dec.batches[0].shape == (4, 2, 8)
    assert np.all(dec.batches[0][1:] == 0)


def test_rolling_launches_under_load():
    """More windows than max_batch: every window still decodes, batches
    stay at the static shape, and mean fill ~ max_batch."""
    dec = RecordingDecoder()

    async def flow():
        async with BatchScheduler(dec, max_batch=4, max_delay_ms=20) as s:
            texts = await asyncio.gather(
                *(s.submit(_window(float(i))) for i in range(10))
            )
            return texts, s.fills

    texts, fills = run(flow())
    assert texts == [f"t{float(i):.3f}" for i in range(10)]
    assert all(b.shape == (4, 2, 8) for b in dec.batches)
    assert sum(fills) == 10


def test_decode_error_propagates_to_submitters():
    dec = RecordingDecoder(fail=True)

    async def flow():
        async with BatchScheduler(dec, max_batch=2, max_delay_ms=10) as s:
            with pytest.raises(RuntimeError, match="decode failed"):
                await s.submit(_window(1.0))
            # the scheduler survives a failed batch and serves the next one
            dec.fail = False
            return await s.submit(_window(2.0))

    assert run(flow()) == "t2.000"


def test_stop_drains_pending():
    dec = RecordingDecoder()

    async def flow():
        s = BatchScheduler(dec, max_batch=8, max_delay_ms=60_000)
        s.start()
        futs = [
            asyncio.ensure_future(s.submit(_window(float(i))))
            for i in range(3)
        ]
        await asyncio.sleep(0)  # let submissions enqueue
        await s.stop()  # deadline is a minute away; stop must not wait it out
        return await asyncio.gather(*futs), s.fills

    texts, fills = run(flow())
    assert texts == ["t0.000", "t1.000", "t2.000"]
    assert list(fills) == [3]


def test_lifecycle_errors():
    async def flow():
        s = BatchScheduler(RecordingDecoder(), max_batch=2)
        with pytest.raises(RuntimeError, match="not started"):
            await s.submit(_window(0.0))
        s.start()
        await s.stop()
        with pytest.raises(RuntimeError):
            await s.submit(_window(0.0))

    run(flow())
    with pytest.raises(ValueError):
        BatchScheduler(RecordingDecoder(), max_batch=0)
    with pytest.raises(ValueError):
        BatchScheduler(RecordingDecoder(), pad_mode="wat")


def _session_pipeline(scheduler):
    rb = RingBuffer(2, 64)
    return BatchingDecodePipeline(
        windower=Windower(rb, window=8, hop=8), scheduler=scheduler
    )


def test_cross_session_pooling_one_program():
    """Two sessions' simultaneous windows ride ONE decode launch."""
    dec = RecordingDecoder()

    async def flow():
        async with BatchScheduler(dec, max_batch=2, max_delay_ms=5_000) as s:
            a, b = _session_pipeline(s), _session_pipeline(s)
            ta, tb = await asyncio.gather(
                a.feed(_window(1.0)), b.feed(_window(2.0))
            )
            return ta, tb, s.fills

    ta, tb, fills = run(flow())
    assert ta == ["t1.000"] and tb == ["t2.000"]
    assert list(fills) == [2]  # one full launch, not two half-empty ones
    assert len(dec.batches) == 1


def test_batching_pipeline_windowing_and_gate():
    dec = RecordingDecoder()

    async def flow():
        async with BatchScheduler(dec, max_batch=4, max_delay_ms=10) as s:
            pipe = BatchingDecodePipeline(
                windower=Windower(RingBuffer(2, 64), window=8, hop=8),
                scheduler=s,
                wake_gate=lambda w: float(w.mean()) > 0.5,
            )
            quiet = await pipe.feed(np.zeros((2, 8), np.float32))
            loud = await pipe.feed(np.ones((2, 8), np.float32))
            # two hops of samples at once -> two windows, both decoded
            two = await pipe.feed(np.full((2, 16), 2.0, np.float32))
            flushed = await pipe.flush()
            return quiet, loud, two, flushed, s.stats()

    quiet, loud, two, flushed, stats = run(flow())
    assert quiet == []  # gated out: no decode launch at all
    assert loud == ["t1.000"]
    assert two == ["t2.000", "t2.000"]
    assert flushed == []
    assert stats["count"] == 3 and stats["mean_fill"] is not None


def test_wss_service_with_batching_pipeline():
    """The websocket service awaits async pipelines transparently."""
    from imagined_speech_translation_tpu.runtime import SessionRegistry
    from imagined_speech_translation_tpu.runtime.protocol import (
        BinaryFrame,
        encode_binary_frame,
    )
    from imagined_speech_translation_tpu.runtime.server import WssService

    dec = RecordingDecoder()

    async def flow():
        async with BatchScheduler(dec, max_batch=2, max_delay_ms=5_000) as s:
            reg = SessionRegistry()
            svc = WssService(
                reg,
                pipeline_factory=lambda key: BatchingDecodePipeline(
                    windower=Windower(RingBuffer(4, 256), window=16, hop=16),
                    scheduler=s,
                ),
                n_channels=4,
            )
            keys = []
            for tok in ("tokA", "tokB"):
                reply = await svc.handle_text(f"authentication¬{tok}")
                keys.append(reply.split("¬")[2].strip('"'))
            frames = [
                encode_binary_frame(
                    BinaryFrame(
                        "eeg",
                        key,
                        np.full((4, 16), float(i + 1), np.float32).tobytes(),
                    )
                )
                for i, key in enumerate(keys)
            ]
            # both sessions stream concurrently -> pooled into one batch
            ta, tb = await asyncio.gather(
                svc.handle_binary(frames[0]), svc.handle_binary(frames[1])
            )
            ends = [
                await svc.handle_binary(
                    encode_binary_frame(BinaryFrame("eeg_end", key, b""))
                )
                for key in keys
            ]
            return ta, tb, ends, s.fills

    ta, tb, ends, fills = run(flow())
    assert ta == ["t1.000"] and tb == ["t2.000"]
    assert ends == [[], []]
    assert list(fills) == [2] and len(dec.batches) == 1


def test_mismatched_window_shape_rejected_at_submit():
    """A rogue session's oddly-shaped window errors ONLY its own submit;
    innocent windows already pooled decode normally."""
    dec = RecordingDecoder()

    async def flow():
        async with BatchScheduler(dec, max_batch=2, max_delay_ms=10) as s:
            good = asyncio.ensure_future(s.submit(_window(1.0)))
            await asyncio.sleep(0)  # good window enqueued, shape learned
            with pytest.raises(ValueError, match="scheduler shape"):
                await s.submit(np.zeros((3, 5), np.float32))
            return await good

    assert run(flow()) == "t1.000"


def test_short_decode_output_errors_instead_of_hanging():
    class ShortDecoder:
        def __call__(self, batch):
            return ["only-one"]  # fewer texts than real rows

    async def flow():
        async with BatchScheduler(ShortDecoder(), max_batch=2, max_delay_ms=10) as s:
            return await asyncio.gather(
                s.submit(_window(1.0)), s.submit(_window(2.0)),
                return_exceptions=True,
            )

    res = run(flow())
    assert all(isinstance(r, RuntimeError) for r in res)


def test_feed_delivers_partial_successes():
    """One failed batch must not discard sibling windows' decoded text."""

    class FlakyDecoder(RecordingDecoder):
        def __call__(self, batch):
            if not self.batches:  # fail only the FIRST launch
                self.batches.append(None)
                raise ValueError("transient")
            return super().__call__(batch)

    async def flow():
        async with BatchScheduler(
            FlakyDecoder(), max_batch=1, max_delay_ms=5
        ) as s:
            pipe = BatchingDecodePipeline(
                windower=Windower(RingBuffer(2, 64), window=8, hop=8),
                scheduler=s,
            )
            # one chunk spanning two hops -> two windows -> two batches
            # (max_batch=1); the first decode launch fails, the second works
            return await pipe.feed(np.full((2, 16), 2.0, np.float32))

    assert run(flow()) == ["t2.000"]
