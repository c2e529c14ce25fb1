"""Command-plane + action-registry tests: the reference's 15 wss commands and
34-function DSL registry against the in-memory service bundle."""

import asyncio

import pytest

from imagined_speech_translation_tpu.runtime import (
    COMMAND_NAMES,
    DeviceChannel,
    Parser,
    ServiceBundle,
    TextFrame,
    UserActions,
    build_action_registry,
    build_command_registry,
)
from imagined_speech_translation_tpu.runtime.actions import REGISTRY_NAMES


def run(coro):
    return asyncio.run(coro)


@pytest.fixture()
def bundle():
    return ServiceBundle()


@pytest.fixture()
def registry(bundle):
    return build_command_registry(bundle)


async def _auth(reg):
    return await reg.dispatch(TextFrame("authentication", "user@example.com"))


def test_all_reference_commands_registered(registry):
    assert set(COMMAND_NAMES) <= set(registry._handlers)
    assert len(COMMAND_NAMES) == 15


def test_onboarding_flow(registry):
    async def flow():
        key = await _auth(registry)
        first = await registry.dispatch(TextFrame("first_time", key))
        assert first == {"first_time": True}
        # first_time is a pure READ (reference session.js:15-18): it stays
        # true until the client explicitly marks not_first_time
        again = await registry.dispatch(TextFrame("first_time", key))
        assert again == {"first_time": True}
        await registry.dispatch(TextFrame("not_first_time", key))
        done = await registry.dispatch(TextFrame("first_time", key))
        assert done == {"first_time": False}
        ble = await registry.dispatch(TextFrame("ble_id", key, ("AA:BB",)))
        assert ble["ble_id"] == "AA:BB"
        assert (await registry.dispatch(TextFrame("ble_id", key)))["ble_id"] == "AA:BB"

    run(flow())


def test_token_and_profile_commands(registry):
    async def flow():
        key = await _auth(registry)
        await registry.dispatch(TextFrame("auth_code", key, ("server-code",)))
        rt = await registry.dispatch(TextFrame("get_refresh_token", key))
        assert rt["refresh_token"].startswith("rt_")
        name = await registry.dispatch(TextFrame("get_display_name", key))
        assert name["display_name"] == "user@example.com"
        out = await registry.dispatch(TextFrame("add_query", key, ("my emails...",)))
        assert out["stored_chars"] > 0
        # send_data now includes the stored profile context
        resp = await registry.dispatch(TextFrame("send_data", key, ("你好",)))
        assert "你好" in resp["response"]

    run(flow())


def test_media_and_maps_commands(registry):
    async def flow():
        key = await _auth(registry)
        spoken = await registry.dispatch(TextFrame("speak", key, ("hello",)))
        assert spoken["pcm_bytes"] > 0
        song = await registry.dispatch(TextFrame("stream_song", key, ("song",)))
        assert song["audio_bytes"] > 0
        steps = await registry.dispatch(
            TextFrame("directions", key, ("Home", "Work"))
        )
        assert len(steps["steps"]) == 2
        place = await registry.dispatch(TextFrame("get_place", key, ("cafe",)))
        assert place["place"]["name"] == "cafe"
        vision = await registry.dispatch(TextFrame("vision", key, ("aGk=", "what")))
        assert "response" in vision

    run(flow())


# ---------------------------------------------------------------------------
# action registry (the DSL surface)
# ---------------------------------------------------------------------------


def test_registry_matches_reference_names(bundle):
    actions = UserActions(bundle, user_id="u1")
    registry = build_action_registry(actions)
    assert set(registry) == set(REGISTRY_NAMES)
    assert len(REGISTRY_NAMES) == 34


def test_dsl_drives_actions_end_to_end(bundle):
    device = DeviceChannel()
    actions = UserActions(bundle, device, user_id="u1")
    parser = Parser(build_action_registry(actions))

    async def flow():
        # the canonical LLM output shape: chained calls with nesting
        results = await parser.execute(
            "add_calendar_event(|Standup|,|2026-08-17T09:00|,|2026-08-17T09:15|)"
            "¬speak(|added |^get_calendar_events(|2026-08-17|))"
        )
        assert results[0].startswith("ev")
        assert "Standup" in results[1]
        # device got the audio
        kinds = [k for k, _ in device.sent]
        assert "audio" in kinds

        # tasks + email CRUD
        tid = (await parser.execute("add_task(|buy milk|)"))[0]
        assert "buy milk" in (await parser.execute("get_tasks()"))[0]
        await parser.execute(f"update_task(|{tid}|,|buy oat milk|)")
        assert "oat" in (await parser.execute("get_tasks()"))[0]
        assert (await parser.execute(f"delete_task(|{tid}|)"))[0] == "deleted"

        mid = (await parser.execute(
            "send_email(|a@b.c|,|Hi|,|body text|)"
        ))[0]
        assert mid in (await parser.execute("search_emails(|body|)"))[0]
        assert "body text" in (await parser.execute(f"read_email(|{mid}|)"))[0]

        # docs / sheets roundtrip
        await parser.execute("write_document(|notes|,|第一行|)")
        assert (await parser.execute("get_document(|notes|)"))[0] == "第一行"
        await parser.execute("write_sheet(|data|,|a,b\nc,d|)")
        assert (await parser.execute("get_sheet(|data|)"))[0] == "a,b\nc,d"

        # device controls
        assert (await parser.execute("change_volume(|80|)"))[0] == "volume 80"
        assert ("volume", 80) in device.sent
        assert (await parser.execute("call(|Mom|)"))[0] == "calling Mom"

    run(flow())


def test_calendar_update_delete(bundle):
    actions = UserActions(bundle, user_id="u1")
    parser = Parser(build_action_registry(actions))

    async def flow():
        eid = (await parser.execute(
            "add_calendar_event(|Gym|,|2026-08-18T18:00|,|2026-08-18T19:00|)"
        ))[0]
        await parser.execute(f"update_calendar_event(|{eid}|,|Gym + Sauna|)")
        assert "Sauna" in (await parser.execute("get_calendar_events()"))[0]
        assert (await parser.execute(f"delete_calendar_event(|{eid}|)"))[0] == "deleted"
        assert (await parser.execute("get_calendar_events()"))[0] == "no events"

    run(flow())


# ---------------------------------------------------------------------------
# round 2: TTS cache, real vision path, JWT auth, DSL fuzz
# ---------------------------------------------------------------------------


def test_tts_cache_per_user(bundle):
    from imagined_speech_translation_tpu.runtime.services import CachingTTS

    assert isinstance(bundle.tts, CachingTTS)  # default mirrors audio.js

    async def flow():
        a1 = await bundle.tts.synthesize("hello", "alice")
        a2 = await bundle.tts.synthesize("hello", "alice")
        b1 = await bundle.tts.synthesize("hello", "bob")
        assert a1 == a2 == b1
        info = bundle.tts.cache_info()
        assert info["hits"] == 1 and info["misses"] == 2 and info["users"] == 2

    run(flow())


def test_speak_command_hits_cache(registry, bundle):
    async def flow():
        key = await _auth(registry)
        await registry.dispatch(TextFrame("speak", key, ("same text",)))
        await registry.dispatch(TextFrame("speak", key, ("same text",)))
        assert bundle.tts.cache_info()["hits"] == 1

    run(flow())


def test_vision_decodes_real_image(registry):
    import base64
    import struct

    # minimal valid PNG header: 8-byte signature + IHDR with 32x16 dims
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", 32, 16, 8, 6, 0, 0, 0)
    )

    async def flow():
        key = await _auth(registry)
        out = await registry.dispatch(
            TextFrame("vision", key, (base64.b64encode(png).decode(), "what"))
        )
        assert "png 32x16" in out["response"]
        bad = await registry.dispatch(TextFrame("vision", key, ("@@not-b64@@",)))
        assert "error" in bad

    run(flow())


def test_jwt_authenticator_accept_and_reject():
    from imagined_speech_translation_tpu.runtime import (
        SessionRegistry,
        make_token_authenticator,
        sign_token,
        verify_token,
    )

    secret = "test-secret"
    token = sign_token({"email": "a@b.com"}, secret)
    assert verify_token(token, secret)["email"] == "a@b.com"
    # tampered signature / wrong secret / expired / malformed all rejected
    assert verify_token(token + "x", secret) is None
    assert verify_token(token, "other") is None
    expired = sign_token({"email": "a@b.com", "exp": 1}, secret, ttl_s=None)
    assert verify_token(expired, secret) is None
    assert verify_token("not.a.jwt", secret) is None
    assert verify_token("a.b", secret) is None

    reg = SessionRegistry(authenticator=make_token_authenticator(secret))

    async def flow():
        key = await reg.dispatch(TextFrame("authentication", token))
        assert reg.get(key).user_id == "a@b.com"
        with pytest.raises(PermissionError):
            await reg.dispatch(TextFrame("authentication", "garbage"))

    run(flow())


def _rsa_test_keypair():
    """Local RS256 keypair via the stdlib-adjacent cryptography package
    (test-side only — the verifier itself is pure Python)."""
    from cryptography.hazmat.primitives.asymmetric import rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pub = key.public_key().public_numbers()
    return key, pub.n, pub.e


def _b64u(raw: bytes) -> str:
    import base64 as _b64

    return _b64.urlsafe_b64encode(raw).decode().rstrip("=")


def _rs256_sign(key, claims: dict, *, kid: str, alg: str = "RS256") -> str:
    import json as _json

    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding

    header = {"alg": alg, "typ": "JWT", "kid": kid}
    signing_input = (
        _b64u(_json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64u(_json.dumps(claims, separators=(",", ":")).encode())
    )
    sig = key.sign(signing_input.encode(), padding.PKCS1v15(), hashes.SHA256())
    return signing_input + "." + _b64u(sig)


def _jwk(n: int, e: int, kid: str) -> dict:
    nlen = (n.bit_length() + 7) // 8
    return {
        "kty": "RSA",
        "kid": kid,
        "use": "sig",
        "n": _b64u(n.to_bytes(nlen, "big")),
        "e": _b64u(e.to_bytes((e.bit_length() + 7) // 8, "big")),
    }


def test_rs256_jwks_verifier():
    """Google id-token shape (wss/func/auth.js:14-19): RS256 signature via
    kid→JWKS lookup plus iss/aud/exp — accept, wrong-key, expiry, unknown
    kid, downgrade, and claim-mismatch paths."""
    import time as _time

    from imagined_speech_translation_tpu.runtime import JwksVerifier

    key, n, e = _rsa_test_keypair()
    other_key, n2, e2 = _rsa_test_keypair()
    jwks = {"keys": [_jwk(n, e, "kid-1"), _jwk(n2, e2, "kid-2")]}
    now = _time.time()
    claims = {
        "email": "a@b.com",
        "iss": "https://accounts.google.com",
        "aud": "client-123",
        "exp": now + 3600,
    }
    v = JwksVerifier(
        jwks, issuer="https://accounts.google.com", audience="client-123"
    )
    tok = _rs256_sign(key, claims, kid="kid-1")
    assert v.verify(tok)["email"] == "a@b.com"
    # signature by the WRONG key under the right kid
    assert v.verify(_rs256_sign(other_key, claims, kid="kid-1")) is None
    # tampered payload
    h, p, s = tok.split(".")
    assert v.verify(h + "." + p[:-2] + "xx" + "." + s) is None
    # expired / missing exp (id tokens must expire)
    assert v.verify(_rs256_sign(key, dict(claims, exp=now - 10), kid="kid-1")) is None
    no_exp = {k: x for k, x in claims.items() if k != "exp"}
    assert v.verify(_rs256_sign(key, no_exp, kid="kid-1")) is None
    # unknown kid / missing kid
    assert v.verify(_rs256_sign(key, claims, kid="kid-404")) is None
    # alg downgrade: HS256 token using the JWKS modulus as a shared secret
    # (the classic key-confusion attack) must be rejected by alg pinning
    from imagined_speech_translation_tpu.runtime import sign_token

    nbytes = n.to_bytes((n.bit_length() + 7) // 8, "big")
    assert v.verify(sign_token(claims, nbytes)) is None
    # wrong issuer / wrong audience
    assert v.verify(
        _rs256_sign(key, dict(claims, iss="https://evil.example"), kid="kid-1")
    ) is None
    assert v.verify(
        _rs256_sign(key, dict(claims, aud="other-client"), kid="kid-1")
    ) is None
    # aud as a list containing the client id is accepted (JWT allows lists)
    assert v.verify(
        _rs256_sign(key, dict(claims, aud=["x", "client-123"]), kid="kid-1")
    ) is not None


def test_rs256_jwks_rotation_and_authenticator():
    import time as _time

    from imagined_speech_translation_tpu.runtime import (
        JwksVerifier,
        SessionRegistry,
        make_token_authenticator,
    )

    key, n, e = _rsa_test_keypair()
    claims = {"email": "rot@b.com", "exp": _time.time() + 60}
    sets = [{"keys": []}, {"keys": [_jwk(n, e, "kid-new")]}]
    calls = []

    def fetch():
        calls.append(1)
        return sets[0] if len(calls) == 1 else sets[1]

    v = JwksVerifier(fetch)
    # first verify: kid unknown in the cached (empty) set -> one refetch
    tok = _rs256_sign(key, claims, kid="kid-new")
    assert v.verify(tok)["email"] == "rot@b.com"
    assert len(calls) == 2
    # cached now: no further fetches
    assert v.verify(tok) is not None
    assert len(calls) == 2

    reg = SessionRegistry(authenticator=make_token_authenticator(verifier=v))

    async def flow():
        k = await reg.dispatch(TextFrame("authentication", tok))
        assert reg.get(k).user_id == "rot@b.com"
        with pytest.raises(PermissionError):
            await reg.dispatch(TextFrame("authentication", "garbage"))

    run(flow())
    # exactly one of secret=/verifier=
    with pytest.raises(ValueError):
        make_token_authenticator("sec", verifier=v)
    with pytest.raises(ValueError):
        make_token_authenticator()


def test_dsl_fuzz_never_crashes_parser(bundle):
    """1k generated programs (valid grammar + mutated garbage): the parser
    either parses or raises DslError — no other exception escapes
    (reference behavior: graceful degradation, speak the raw LLM output)."""
    import random

    from imagined_speech_translation_tpu.runtime.dsl import DslError

    rng = random.Random(42)
    names = list(REGISTRY_NAMES)[:12] + ["unknown_fn"]
    parser = Parser()

    def gen_expr(depth=0):
        r = rng.random()
        if depth > 2 or r < 0.5:
            chars = "abc ,()|^¬\\"
            return "|" + "".join(
                rng.choice(chars[:4]) for _ in range(rng.randint(0, 6))
            ) + "|"
        if r < 0.8:
            return gen_call(depth + 1)
        return gen_expr(depth + 1) + "^" + gen_expr(depth + 1)

    def gen_call(depth=0):
        n = rng.randint(0, 3)
        return rng.choice(names) + "(" + ",".join(
            gen_expr(depth) for _ in range(n)
        ) + ")"

    for i in range(1000):
        prog = "¬".join(gen_call() for _ in range(rng.randint(1, 4)))
        if i % 3 == 0:  # mutate into likely-garbage
            pos = rng.randrange(max(len(prog), 1))
            prog = prog[:pos] + rng.choice("()|^¬,x") + prog[pos + 1:]
        try:
            parser.parse(prog)
        except DslError:
            pass  # graceful reject is the contract


def test_command_registry_keeps_caller_authenticator():
    """Regression: SessionRegistry.__len__ makes an empty registry falsy;
    `registry or SessionRegistry()` silently replaced the caller's registry
    and its authenticator with an accept-all default."""
    from imagined_speech_translation_tpu.runtime import (
        SessionRegistry,
        make_token_authenticator,
    )
    from imagined_speech_translation_tpu.runtime.commands import (
        build_command_registry,
    )
    from imagined_speech_translation_tpu.runtime.services import ServiceBundle

    reg0 = SessionRegistry(authenticator=make_token_authenticator("s"))
    reg = build_command_registry(ServiceBundle(), registry=reg0)
    assert reg is reg0

    async def flow():
        with pytest.raises(PermissionError):
            await reg.dispatch(TextFrame("authentication", "garbage-token"))

    run(flow())


def test_personalization_crawler_batches_of_50(registry, bundle):
    """Client-side crawler parity: uploads in batches of 50 documents
    (app/lib/helper/query.dart:19-136), summarized + appended to the user
    profile server-side."""
    from imagined_speech_translation_tpu.runtime import PersonalizationCrawler

    async def flow():
        key = await _auth(registry)
        crawler = PersonalizationCrawler(key, registry.dispatch)
        docs = [f"doc {i}" for i in range(120)] + ["", "  "]  # blanks dropped
        batches = await crawler.upload(docs)
        assert batches == 3  # 50 + 50 + 20
        assert crawler.uploaded_docs == 120
        profile = await bundle.store.get(
            f"profile:{registry.get(key).user_id or key}"
        )
        assert profile and profile.count("summary:") == 3

    run(flow())


def test_wifi_qr_roundtrip():
    from imagined_speech_translation_tpu.runtime import (
        parse_wifi_qr,
        wifi_qr_payload,
    )

    payload = wifi_qr_payload('my;ssid:1', 'p,a"ss\\word')
    got = parse_wifi_qr(payload)
    assert got == {
        "ssid": 'my;ssid:1', "password": 'p,a"ss\\word', "security": "WPA",
    }
    open_net = parse_wifi_qr(wifi_qr_payload("cafe", "", security="nopass"))
    assert open_net["password"] == "" and open_net["security"] == "nopass"
    with pytest.raises(ValueError):
        parse_wifi_qr("HTTP://not-wifi")
    with pytest.raises(ValueError):
        wifi_qr_payload("x", "y", security="WPA3")


def test_jwks_bogus_kid_spray_is_throttled():
    """Unknown-kid tokens trigger at most one JWKS refetch per backoff
    window; a real rotation after the window still verifies."""
    import time as _time

    from imagined_speech_translation_tpu.runtime import JwksVerifier

    key, n, e = _rsa_test_keypair()
    calls = []
    current = {"keys": []}

    def fetch():
        calls.append(1)
        return current

    v = JwksVerifier(fetch, refresh_min_interval=60.0)
    claims = {"email": "a@b.c", "exp": _time.time() + 60}
    for i in range(25):  # spray 25 bogus kids
        assert v.verify(_rs256_sign(key, claims, kid=f"bogus-{i}")) is None
    # initial lazy load + ONE throttled refetch, not 25
    assert len(calls) == 2
    # rotation lands; backoff window passes -> refetch resolves the new kid
    current = {"keys": [_jwk(n, e, "kid-rot")]}
    v._last_miss = _time.monotonic() - 61.0
    assert v.verify(_rs256_sign(key, claims, kid="kid-rot"))["email"] == "a@b.c"
