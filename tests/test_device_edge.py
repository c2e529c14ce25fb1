"""Edge wake gating: device transmits only while awake (paper ¶170-171).

Drives the native firmware twin through the EdgeDevice state machine with
a deterministic RMS scorer: silence produces no radio traffic, signal
produces ``eeg`` frames starting with the look-back window, and the
falling edge emits exactly one ``eeg_end`` utterance boundary — then the
full uplink lands in the real ``WssService``."""

import asyncio

import numpy as np
import pytest

from imagined_speech_translation_tpu.device.native import find_native_library

pytestmark = pytest.mark.skipif(
    find_native_library() is None, reason="libistdevice.so not built"
)


def make_edge(window=128, hop=32, threshold=5.0, key="K"):
    from imagined_speech_translation_tpu.device import NativeBoard
    from imagined_speech_translation_tpu.device.edge import (
        EdgeDevice,
        rms_scorer,
    )

    board = NativeBoard()  # silent synthetic source
    board.bring_up()
    return EdgeDevice(
        board,
        rms_scorer(threshold),
        auth_key=key,
        window=window,
        hop=hop,
    )


def test_silence_produces_no_traffic():
    edge = make_edge()
    frames = edge.poll(512)
    assert frames == []
    assert not edge.awake


def test_wake_cycle_emits_window_then_hops_then_end():
    edge = make_edge(window=128, hop=32)
    # 256 samples of strong signal at the electrodes
    edge.board.feed(np.full((48, 256), 50.0, np.float32))
    frames = edge.poll(256)
    assert edge.awake
    assert all(f.startswith(b"eeg|K|") for f in frames)
    # first frame is the look-back window (onset included)
    payload0 = np.frombuffer(frames[0][len(b"eeg|K|"):], np.float32)
    assert payload0.size == 48 * 128
    # steady state streams hop-sized chunks
    for f in frames[1:]:
        n = np.frombuffer(f[len(b"eeg|K|"):], np.float32).size
        assert n == 48 * 32
    # back to silence -> one falling edge with an utterance terminator
    frames = edge.poll(512)
    assert b"eeg_end|K|" in frames
    assert frames.count(b"eeg_end|K|") == 1
    assert not edge.awake
    # silence stays silent afterwards
    assert edge.poll(256) == []


def test_edge_uplink_through_real_server():
    from imagined_speech_translation_tpu.runtime import (
        DecodePipeline,
        RingBuffer,
        SessionRegistry,
        Windower,
    )
    from imagined_speech_translation_tpu.runtime.server import WssService

    decoded = []

    def decode_fn(batch):
        decoded.append(batch.shape)
        return ["你好"] * batch.shape[0]

    svc = WssService(
        SessionRegistry(),
        pipeline_factory=lambda key: DecodePipeline(
            windower=Windower(RingBuffer(48, 1024), window=128, hop=128),
            decode_fn=decode_fn,
            max_batch=1,
        ),
        n_channels=48,
    )

    async def flow():
        reply = await svc.handle_text("authentication¬edge-tok")
        key = reply.split("¬")[2].strip('"')
        edge = make_edge(window=128, hop=32, key=key)
        # one awake utterance surrounded by silence
        edge.board.feed(np.full((48, 384), 50.0, np.float32))
        texts = []
        for _ in range(4):
            for frame in edge.poll(192):
                texts += await svc.handle_binary(frame)
        assert texts and all(t == "你好" for t in texts)
        assert decoded and all(s[1] == 48 for s in decoded)

    asyncio.run(flow())


def test_rms_and_model_scorers():
    from imagined_speech_translation_tpu.device.edge import (
        rms_scorer,
        wake_model_scorer,
    )

    s = rms_scorer(10.0)
    assert s(np.full((48, 64), 20.0, np.float32))
    assert not s(np.zeros((48, 64), np.float32))

    class FakeModel:
        def forward(self, x):
            return (1 if x.mean() > 0 else 0), np.array([0.5, 0.5])

    ws = wake_model_scorer(FakeModel(), features=lambda w: w.mean(axis=0))
    assert ws(np.ones((48, 64), np.float32))
    assert not ws(-np.ones((48, 64), np.float32))
