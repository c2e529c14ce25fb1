"""Runtime tests: protocol framing, DSL parser/executor, session auth gate,
ring buffer/windower, decode pipeline, websocket service handlers."""

import asyncio

import numpy as np
import pytest

from imagined_speech_translation_tpu.runtime import (
    BinaryFrame,
    DecodePipeline,
    DslError,
    Parser,
    RingBuffer,
    SessionRegistry,
    TextFrame,
    ThresholdWakeGate,
    Windower,
    decode_binary_frame,
    decode_text_frame,
    encode_binary_frame,
    encode_text_frame,
)


def run(coro):
    return asyncio.run(coro)


# ---------------------------------------------------------------------------
# protocol
# ---------------------------------------------------------------------------


def test_text_frame_roundtrip():
    f = TextFrame("send_data", "key123", ("hello", "世界"))
    assert decode_text_frame(encode_text_frame(f)) == f
    f2 = decode_text_frame("authentication¬token")
    assert f2.command == "authentication" and f2.access_key == "token"
    with pytest.raises(ValueError):
        decode_text_frame("")


def test_binary_frame_roundtrip():
    payload = bytes(range(256))  # includes b'|' bytes in the payload
    f = BinaryFrame("eeg", "key", payload)
    assert decode_binary_frame(encode_binary_frame(f)) == f
    with pytest.raises(ValueError):
        decode_binary_frame(b"nodelimiters")
    with pytest.raises(ValueError):
        encode_binary_frame(BinaryFrame("a|b", "k", b""))


# ---------------------------------------------------------------------------
# DSL
# ---------------------------------------------------------------------------


def _registry(log):
    def speak(text):
        log.append(("speak", text))
        return f"spoke:{text}"

    async def get_name():
        return "Alex"

    def send_email(to, body):
        log.append(("email", to, body))
        return "sent"

    return {"speak": speak, "get_name": get_name, "send_email": send_email}


def test_dsl_parse_structure():
    p = Parser()
    calls = p.parse("speak(|hello|)¬send_email(|a@b.c|,|hi|)")
    assert [c.name for c in calls] == ["speak", "send_email"]
    assert len(calls[1].args) == 2


def test_dsl_execute_with_nesting_and_concat():
    log = []
    p = Parser(_registry(log))
    results = run(p.execute("speak(|hello |^get_name())"))
    assert results == ["spoke:hello Alex"]
    assert log == [("speak", "hello Alex")]


def test_dsl_nested_call_as_argument():
    log = []
    p = Parser(_registry(log))
    results = run(p.execute("send_email(|x@y.z|,speak(|msg|))"))
    assert results == ["sent"]
    assert log == [("speak", "msg"), ("email", "x@y.z", "spoke:msg")]


def test_dsl_errors():
    p = Parser({})
    with pytest.raises(DslError):
        p.parse("speak(|unterminated")
    with pytest.raises(DslError):
        p.parse("(|no name|)")
    with pytest.raises(DslError):
        run(p.execute("unknown_fn()"))


def test_dsl_separator_inside_string():
    log = []
    p = Parser(_registry(log))
    run(p.execute("speak(|contains ¬ inside|)"))
    assert log == [("speak", "contains ¬ inside")]


# ---------------------------------------------------------------------------
# sessions
# ---------------------------------------------------------------------------


def test_session_auth_gate_and_dispatch():
    reg = SessionRegistry()

    @reg.command("echo")
    async def echo(session, args):
        return list(args)

    async def flow():
        # unauthenticated command rejected
        with pytest.raises(PermissionError):
            await reg.dispatch(TextFrame("echo", "badkey", ("x",)))
        key = await reg.dispatch(TextFrame("authentication", "user-token"))
        assert isinstance(key, str) and reg.get(key).authenticated
        out = await reg.dispatch(TextFrame("echo", key, ("a", "b")))
        assert out == ["a", "b"]
        with pytest.raises(KeyError):
            await reg.dispatch(TextFrame("nope", key))
        await reg.drop(key)
        assert reg.get(key) is None

    run(flow())


def test_session_rejects_empty_token():
    reg = SessionRegistry()

    async def flow():
        with pytest.raises(PermissionError):
            await reg.dispatch(TextFrame("authentication", ""))

    run(flow())


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------


def test_ring_buffer_wraparound():
    rb = RingBuffer(2, 10)
    rb.push(np.arange(8, dtype=np.float32).reshape(2, 4))
    assert rb.filled == 4
    np.testing.assert_array_equal(rb.latest(2), [[2, 3], [6, 7]])
    rb.push(np.arange(100, 116, dtype=np.float32).reshape(2, 8))
    assert rb.filled == 10
    last = rb.latest(10)
    np.testing.assert_array_equal(last[0, -3:], [105, 106, 107])
    # oversized push keeps the newest capacity samples
    rb.push(np.arange(40, dtype=np.float32).reshape(2, 20))
    np.testing.assert_array_equal(rb.latest(10)[0], np.arange(10, 20))


def test_windower_emits_on_hop():
    rb = RingBuffer(1, 64)
    w = Windower(rb, window=16, hop=8)
    rb.push(np.arange(15, dtype=np.float32)[None])
    assert w.poll() == []
    rb.push(np.arange(15, 18, dtype=np.float32)[None])
    wins = w.poll()
    assert len(wins) == 1 and wins[0].shape == (1, 16)
    rb.push(np.zeros((1, 8), np.float32))
    assert len(w.poll()) == 1


def test_decode_pipeline_gating_and_latency():
    rb = RingBuffer(2, 128)
    windower = Windower(rb, window=32, hop=32)
    calls = []

    def decode_fn(batch):
        calls.append(batch.shape)
        return [f"text{i}" for i in range(batch.shape[0])]

    pipe = DecodePipeline(
        windower=windower,
        decode_fn=decode_fn,
        wake_gate=ThresholdWakeGate(0.5),
        max_batch=2,
    )
    # quiet signal: gated out
    out = pipe.feed(np.zeros((2, 64), np.float32))
    assert out == [] and pipe.flush() == []
    # loud signal: two windows -> one batch of 2
    out = pipe.feed(np.ones((2, 64), np.float32) * 2.0)
    assert out == ["text0", "text1"]
    assert calls == [(2, 2, 32)]
    stats = pipe.latency.summary()
    assert stats["count"] == 2 and stats["p50_ms"] is not None


# ---------------------------------------------------------------------------
# websocket service handlers (in-process)
# ---------------------------------------------------------------------------


def test_wss_service_text_and_binary():
    from imagined_speech_translation_tpu.runtime.server import WssService
    from imagined_speech_translation_tpu.runtime.protocol import (
        encode_binary_frame,
    )

    reg = SessionRegistry()

    @reg.command("speak")
    async def speak(session, args):
        return {"spoken": args[0]}

    def pipeline_factory(key):
        rb = RingBuffer(4, 256)
        return DecodePipeline(
            windower=Windower(rb, window=64, hop=64),
            decode_fn=lambda b: ["你好"] * b.shape[0],
            max_batch=1,
        )

    svc = WssService(reg, pipeline_factory=pipeline_factory, n_channels=4)

    async def flow():
        key = (await svc.handle_text("authentication¬tok")).split("¬")[2]
        key = key.strip('"')
        reply = await svc.handle_text(f"speak¬{key}¬你好")
        assert reply.startswith("ok¬speak")
        # binary EEG stream -> decoded utterance
        samples = np.random.default_rng(0).normal(size=(4, 64)).astype(np.float32)
        frame = encode_binary_frame(BinaryFrame("eeg", key, samples.tobytes()))
        texts = await svc.handle_binary(frame)
        assert texts == ["你好"]
        # bad auth
        bad = encode_binary_frame(BinaryFrame("eeg", "nope", samples.tobytes()))
        with pytest.raises(PermissionError):
            await svc.handle_binary(bad)
        # malformed text frame -> error response, not crash
        err = await svc.handle_text("¬¬")
        assert err.startswith("error")

    run(flow())
