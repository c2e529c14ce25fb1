"""Conversational-loop, reminder, and media tests."""

import asyncio

import numpy as np
import pytest

from imagined_speech_translation_tpu.runtime import (
    BinaryFrame,
    ServiceBundle,
    SessionRegistry,
    TextFrame,
    encode_binary_frame,
)
from imagined_speech_translation_tpu.runtime.media import VideoAssembler, write_ppm
from imagined_speech_translation_tpu.runtime.reminders import ReminderLoop
from imagined_speech_translation_tpu.runtime.server import WssService


def run(coro):
    return asyncio.run(coro)


def test_audio_conversation_loop():
    bundle = ServiceBundle()
    reg = SessionRegistry()
    svc = WssService(reg, services=bundle, n_channels=4)

    async def flow():
        key = await reg.dispatch(TextFrame("authentication", "u@example.com"))
        session = reg.get(key)
        frame = encode_binary_frame(BinaryFrame("audio", key, b"\x01\x02\x03"))
        results = await svc.handle_binary(frame)
        # EchoSTT -> "<audio:3b>", EchoLLM -> speak(|...|) -> executed
        assert results and "<audio:3b>" in results[0]
        # text path directly
        out = await svc.converse_text(session, "你好")
        assert out == ["你好"]

    run(flow())


def test_conversation_bad_dsl_degrades_to_speech():
    class WeirdLLM:
        async def chat(self, sid, prompt):
            return "this is not a dsl program"

        async def generate(self, prompt):
            return ""

    bundle = ServiceBundle(llm=WeirdLLM())
    reg = SessionRegistry()
    svc = WssService(reg, services=bundle)

    async def flow():
        key = await reg.dispatch(TextFrame("authentication", "u"))
        out = await svc.converse_text(reg.get(key), "hi")
        assert out == ["this is not a dsl program"]  # spoken raw

    run(flow())


def test_reminder_loop_fires_within_lead():
    from datetime import datetime, timedelta

    bundle = ServiceBundle()
    spoken = []

    async def announce(text):
        spoken.append(text)

    now = datetime(2026, 8, 16, 12, 0, 0)
    loop = ReminderLoop(
        bundle.personal, announce, lead_seconds=300,
        clock=lambda: now.timestamp(),
    )

    async def flow():
        soon = (now + timedelta(minutes=3)).isoformat()
        later = (now + timedelta(hours=2)).isoformat()
        await bundle.personal.add_event("Soon", soon, soon)
        await bundle.personal.add_event("Later", later, later)
        fired = await loop.check_once()
        assert len(fired) == 1 and "Soon" in spoken[0]
        # no double announcement
        assert await loop.check_once() == []

    run(flow())


def test_ppm_and_mux_fallback(tmp_path, monkeypatch):
    frame = np.zeros((4, 6, 3), np.uint8)
    frame[..., 0] = 255
    write_ppm(tmp_path / "f.ppm", frame)
    data = (tmp_path / "f.ppm").read_bytes()
    assert data.startswith(b"P6\n6 4\n255\n") and len(data) == 11 + 4 * 6 * 3

    va = VideoAssembler()
    va.add_frame(frame)
    va.add_audio(b"\x00\x00" * 100)
    monkeypatch.setattr(VideoAssembler, "ffmpeg_available", staticmethod(lambda: False))
    out = va.mux(tmp_path / "video.mp4")
    assert out.suffix == ".raw"
    assert (out / "frame_000000.ppm").exists()
    assert (out / "audio.pcm").stat().st_size == 200


@pytest.mark.skipif(not VideoAssembler.ffmpeg_available(), reason="no ffmpeg")
def test_mux_with_ffmpeg(tmp_path):
    va = VideoAssembler(fps=5)
    rng = np.random.default_rng(0)
    for _ in range(5):
        va.add_frame(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
    out = va.mux(tmp_path / "video.mp4")
    assert out.exists() and out.stat().st_size > 0
