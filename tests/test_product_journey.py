"""One-process product journey: the full reference user story end-to-end.

Drives every client-visible surface in a single asyncio flow against the
REAL runtime service objects (no fakes on the server side): Google
sign-in with first-login personalization upload (``app/lib/pages/
sign_in.dart:83-188``), BLE pairing + device state push (``helper/
ble.dart:17-127``), WiFi liveness (``helper/wifi.dart``) and QR WiFi
provisioning (``pages/device.dart``), the blind-support toggle
(``pages/device.dart:376-385``), phone relays (``helper/commands.dart``),
the EEG uplink decoding utterances through the streaming pipeline
(``dart_wss`` binary plane), and the audio conversation loop
(STT -> LLM -> DSL -> action, ``wss`` §3.5).

Individual behaviors are covered unit-style in test_companion.py /
test_runtime*.py; this test asserts they COMPOSE — one registry, one
service bundle, one preferences store, state flowing across planes.
"""

import asyncio

import numpy as np

from imagined_speech_translation_tpu.companion import (
    CompanionClient,
    Contact,
    InMemoryBle,
    InMemoryPhone,
    InProcessTransport,
    PhoneActions,
    Preferences,
    is_online,
)
from imagined_speech_translation_tpu.companion.ble import pair
from imagined_speech_translation_tpu.runtime import (
    DecodePipeline,
    RingBuffer,
    SessionRegistry,
    Windower,
)
from imagined_speech_translation_tpu.runtime.commands import (
    build_command_registry,
)
from imagined_speech_translation_tpu.runtime.personalization import (
    parse_wifi_qr,
    wifi_qr_payload,
)
from imagined_speech_translation_tpu.runtime.server import WssService
from imagined_speech_translation_tpu.runtime.services import ServiceBundle

N_CH = 48
WINDOW = 128


def make_service(decoded_log):
    """Real command registry + service bundle + streaming pipeline."""
    bundle = ServiceBundle()
    registry = build_command_registry(bundle, registry=SessionRegistry())

    def decode_fn(batch):
        decoded_log.append(batch.shape)
        return ["我想喝水"] * batch.shape[0]

    svc = WssService(
        registry,
        services=bundle,
        pipeline_factory=lambda key: DecodePipeline(
            windower=Windower(
                RingBuffer(N_CH, 8 * WINDOW), window=WINDOW, hop=WINDOW
            ),
            decode_fn=decode_fn,
            max_batch=4,
        ),
        n_channels=N_CH,
    )
    return svc, bundle


def test_full_product_journey(tmp_path):
    decoded_log = []
    svc, bundle = make_service(decoded_log)

    prefs = Preferences(path=tmp_path / "prefs.json")
    # the BLE link exists only after pairing; route device writes lazily so
    # the client can be built first (the app wires this the same way: the
    # singleton socket exists before the BLE session does)
    link_box = {}

    async def device_write(frame: str):
        await link_box["link"].write_data(frame)

    client = CompanionClient(
        InProcessTransport(svc), prefs, device_write=device_write
    )

    async def journey():
        # -- 1. first sign-in uploads the personalization corpus ----------
        docs = [f"document {i} 关于用户" for i in range(120)]
        key = await client.sign_in(
            "google-id-token",
            server_auth_code="sac-1",
            email="user@example.com",
            documents=docs,
        )
        assert key
        assert prefs.get_bool("logged") and client.auto_login()
        # 120 docs -> 3 batches of <=50, summarized into the profile store
        profile = next(
            (
                v
                for k, v in bundle.store.data.items()
                if k.startswith("profile:")
            ),
            None,
        )
        assert profile and profile.count("summary:") == 3
        # oauth plumbing round-trips through the real store
        assert (await client.get_refresh_token() or "").startswith("rt_")

        # -- 2. provision the glasses: BLE id + pairing -------------------
        await client.set_ble_id("GLASSES-42")
        assert await client.get_ble_id() == "GLASSES-42"

        radio = InMemoryBle(devices={"GLASSES-42": object()})
        phone_backend = InMemoryPhone(
            contacts=(Contact("Ada Lovelace", ("+44 20 7946 0000",)),)
        )
        link = await pair(
            radio, ble_id="GLASSES-42", auth_key=key, prefs=prefs
        )
        assert link is not None and link.connected
        link.phone = PhoneActions(
            phone_backend, auth_key=key, write_data=link.write_data
        )
        link_box["link"] = link

        # -- 3. glasses push their state over BLE -------------------------
        await radio.emit_notify(f"ip|{key}|192.168.1.77".encode())
        await radio.emit_notify(f"battery|{key}|83".encode())
        await radio.emit_notify(f"volume|{key}|6".encode())
        assert prefs.get_string("ip") == "192.168.1.77"
        assert (link.battery, link.volume) == (83, 6)

        # WiFi liveness hits the pushed LAN ip
        seen_urls = []

        async def fake_get(url, timeout):
            seen_urls.append(url)
            return 200

        assert await is_online(prefs, http_get=fake_get)
        assert seen_urls == ["http://192.168.1.77"]

        # QR WiFi provisioning: companion renders, device parses
        payload = wifi_qr_payload("Home;Net", "pa,ss:word")
        assert parse_wifi_qr(payload) == {
            "ssid": "Home;Net",
            "password": "pa,ss:word",
            "security": "WPA",
        }

        # -- 4. settings toggle rides the BLE channel to the device -------
        await client.set_blind_support(True)
        assert radio.written[-1] == f"blind|{key}|true".encode()
        assert prefs.get_bool("blind_support")

        # -- 5. glasses-requested phone relay (contacts lookup) -----------
        await radio.emit_notify(f"contacts|{key}|Ada Lovelace".encode())
        assert radio.written[-1] == (
            f"contacts|{key}|+44 20 7946 0000".encode()
        )

        # -- 6. EEG uplink: binary frames -> windows -> utterances --------
        eeg = np.random.default_rng(0).normal(
            size=(N_CH, 3 * WINDOW)
        ).astype(np.float32)
        texts = await svc.handle_binary(
            b"eeg|" + key.encode() + b"|" + eeg.tobytes()
        )
        texts += await svc.handle_binary(b"eeg_end|" + key.encode() + b"|")
        assert texts == ["我想喝水"] * 3
        assert all(shape[1] == N_CH for shape in decoded_log)

        # -- 6b. the RENDERED device page rides the same planes -----------
        # (companion/webui.py): same prefs store, same BLE write channel
        import json as _json
        import threading
        import urllib.request

        from imagined_speech_translation_tpu.companion import DeviceUI
        from imagined_speech_translation_tpu.companion.webui import serve

        ui = DeviceUI(
            prefs, tmp_path / "drive", device_write=device_write,
            auth_key=key,
        )
        ui.ble, ui.battery, ui.volume = link.connected, link.battery, link.volume
        httpd = serve(ui, "127.0.0.1", 0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"

        def _get(path):
            with urllib.request.urlopen(base + path, timeout=10) as r:
                return _json.loads(r.read())

        def _post(path, obj=None):
            req = urllib.request.Request(
                base + path, data=_json.dumps(obj or {}).encode(),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=10) as r:
                return _json.loads(r.read())

        state = await asyncio.to_thread(_get, "/api/state")
        # the page sees the BLE-pushed state: LAN ip -> wifi + cast URL,
        # battery/volume meters, the signed-in email, the blind toggle
        assert state["wifi"] and state["cast_url"] == "https://192.168.1.77:81/"
        assert (state["battery"], state["volume"]) == (83, 6)
        assert state["email"] == "user@example.com"
        assert state["blind_support"] is True

        # WiFi form pushes credentials over the REAL BLE link (and renders
        # the provisioning QR)
        out = await asyncio.to_thread(
            _post, "/api/wifi", {"ssid": "Home", "password": "pw"}
        )
        assert out["pushed"] and out["qr_svg"].startswith("<svg")
        assert radio.written[-1] == f"wifi|{key}|Home|pw".encode()

        # a decoded utterance saved as a recording shows up in the browser
        import base64 as _b64

        await asyncio.to_thread(
            _post, "/api/recordings/save",
            {"name": "utterance-1.txt",
             "content_b64": _b64.b64encode(texts[0].encode()).decode()},
        )
        recs = await asyncio.to_thread(_get, "/api/recordings")
        assert [f["name"] for f in recs["recordings"]] == ["utterance-1.txt"]
        httpd.shutdown()

        # -- 7. audio conversation loop: STT -> LLM -> DSL -> action ------
        replies = await svc.handle_binary(
            b"audio|" + key.encode() + b"|" + b"\x00\x01" * 800
        )
        # EchoSTT -> "<audio:1600b>"; EchoLLM wraps it in speak(|...|);
        # the DSL executes the speak action against the shared bundle
        assert len(replies) == 1 and "<audio:1600b>" in replies[0]

        # -- 8. sign-out clears the resumable session ---------------------
        client.sign_out()
        assert not client.auto_login() and client.access_key == ""

    asyncio.run(journey())


def test_journey_rejects_streaming_before_auth():
    """The binary plane is gated by the same session registry: frames with
    an unknown key never reach the pipeline (dart_wss auth gate)."""
    decoded_log = []
    svc, _ = make_service(decoded_log)

    async def flow():
        payload = np.zeros((N_CH, WINDOW), np.float32).tobytes()
        try:
            await svc.handle_binary(b"eeg|stolen-key|" + payload)
        except PermissionError:
            return True
        return False

    assert asyncio.run(flow())
    assert decoded_log == []
