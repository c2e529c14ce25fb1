"""Acquisition-firmware twin: ctypes binding + hardware->server contract.

Drives the native 6x-ADS1299 board simulator (``device_native/``) from
Python: bring-up, analog injection with sub-LSB quantization roundtrip,
and the full uplink path — firmware-built binary wire frames consumed by
the REAL ``WssService.handle_binary`` into decoded utterances (the
device<->server contract in docs/HARDWARE.md)."""

import asyncio

import numpy as np
import pytest

from imagined_speech_translation_tpu.device.native import find_native_library


def _native_available() -> bool:
    if find_native_library() is not None:
        return True
    try:
        from imagined_speech_translation_tpu.device.native import (
            build_native_library,
        )

        build_native_library()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _native_available(), reason="libistdevice.so not built"
)


def make_board(**kw):
    from imagined_speech_translation_tpu.device import NativeBoard

    return NativeBoard(**kw)


def test_bring_up_and_rates():
    with make_board(data_rate_sps=500) as b:
        b.bring_up()
        assert b.n_channels == 48
        assert b.data_rate_sps == 500
    with make_board(data_rate_sps=1000) as b:
        b.bring_up()
        assert b.data_rate_sps == 1000


def test_quantization_roundtrip_sub_lsb():
    with make_board(gain=24) as b:
        b.bring_up()
        rng = np.random.default_rng(0)
        analog = rng.normal(0.0, 50.0, size=(48, 32)).astype(np.float32)
        b.feed(analog)
        assert b.pump(32) == 32
        assert b.queued == 32
        digital = b.drain(32)
        # 24-bit ADC at gain 24: LSB = 2*(4.5e6/24)/2^24 ~ 22.4 nV... in µV
        lsb = 2 * (4.5e6 / 24) / 2**24
        assert digital.shape == (48, 32)
        np.testing.assert_allclose(digital, analog, atol=lsb)
        assert b.queued == 0


def test_no_samples_without_bring_up():
    with make_board() as b:
        # AFEs power up in RDATAC but START was never issued
        assert b.pump(8) == 0
        assert b.queued == 0


def test_wire_frame_format():
    with make_board(noise_seed=3, noise_uv=1.0) as b:
        b.bring_up()
        b.pump(16)
        frame = b.wire_frame("KEY", 16)
        assert frame.startswith(b"eeg|KEY|")
        payload = frame[len(b"eeg|KEY|"):]
        arr = np.frombuffer(payload, np.float32).reshape(48, 16)
        assert np.abs(arr).max() > 0  # synthetic alpha-band content
        assert b.end_frame("KEY") == b"eeg_end|KEY|"
        assert b.status_frame("ip", "K", "10.0.0.2") == "ip|K|10.0.0.2"
        assert b.status_frame("volume", "K", "7") == "volume|K|7"
        assert b.status_frame("battery", "K", "93") == "battery|K|93"
        with pytest.raises(ValueError):
            b.status_frame("nope", "K", "x")


def test_firmware_frames_drive_the_real_server():
    """Uplink contract end-to-end: the firmware twin's bytes through
    ``WssService.handle_binary`` -> windowed decode -> utterances."""
    from imagined_speech_translation_tpu.runtime import (
        DecodePipeline,
        RingBuffer,
        SessionRegistry,
        Windower,
    )
    from imagined_speech_translation_tpu.runtime.server import WssService

    seen_windows = []

    def decode_fn(batch):
        seen_windows.append(batch.shape)
        return [f"w{i}" for i in range(batch.shape[0])]

    def pipeline_factory(key):
        rb = RingBuffer(48, 4 * 64)
        return DecodePipeline(
            windower=Windower(rb, window=64, hop=64),
            decode_fn=decode_fn,
            max_batch=1,  # decode-on-window, as cli/serve.py deploys
        )

    svc = WssService(
        SessionRegistry(), pipeline_factory=pipeline_factory, n_channels=48
    )

    async def flow():
        reply = await svc.handle_text("authentication¬device-token")
        key = reply.split("¬")[2].strip('"')
        with make_board(noise_seed=11, noise_uv=5.0) as b:
            b.bring_up()
            texts = []
            # stream 3 chunks of 48 samples: 144 samples -> 2 full windows
            for _ in range(3):
                b.pump(48)
                texts += await svc.handle_binary(b.wire_frame(key, 48))
            assert len(texts) == 2
            # eeg_end flushes pending (none left; partial stays in the ring)
            texts += await svc.handle_binary(b.end_frame(key))
            assert len(texts) == 2
        assert all(s[1] == 48 and s[2] == 64 for s in seen_windows)

    asyncio.run(flow())


def test_short_drain_preserves_channel_alignment():
    """Draining MORE than is queued must return each channel's own samples
    (regression: the C library packed rows at the short stride while the
    binding's buffer used the requested stride, interleaving channels)."""
    with make_board(gain=1) as b:
        b.bring_up()
        analog = np.tile(
            np.arange(48, dtype=np.float32)[:, None] * 100.0, (1, 10)
        )
        b.feed(analog)
        assert b.pump(10) == 10
        out = b.drain(20)  # request twice what is queued
        assert out.shape == (48, 10)
        lsb = 2 * 4.5e6 / 2**24
        np.testing.assert_allclose(out, analog, atol=lsb)
