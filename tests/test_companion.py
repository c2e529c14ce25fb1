"""Companion-client tests: sign-in state machine, BLE dispatch, phone
relays, WiFi liveness, preferences — the app behaviors from ``app/lib``
(sign_in.dart, ble.dart, commands.dart, wifi.dart) driven end-to-end
against the real runtime service + command registry, no sockets."""

import asyncio
import json

import pytest

from imagined_speech_translation_tpu.companion import (
    AuthenticationError,
    BleLink,
    CompanionClient,
    CompanionError,
    Contact,
    InMemoryBle,
    InMemoryPhone,
    InProcessTransport,
    PhoneActions,
    Preferences,
    is_online,
)
from imagined_speech_translation_tpu.companion.ble import pair
from imagined_speech_translation_tpu.companion.client import (
    NOT_PURCHASED_MESSAGE,
)
from imagined_speech_translation_tpu.runtime.commands import (
    build_command_registry,
)
from imagined_speech_translation_tpu.runtime.server import WssService
from imagined_speech_translation_tpu.runtime.services import ServiceBundle
from imagined_speech_translation_tpu.runtime.session import SessionRegistry


def run(coro):
    return asyncio.run(coro)


def make_client(authenticator=None, prefs=None):
    bundle = ServiceBundle()
    reg = build_command_registry(
        bundle, registry=SessionRegistry(authenticator=authenticator)
    )
    service = WssService(reg, services=bundle)
    client = CompanionClient(InProcessTransport(service), prefs)
    return client, bundle


# ---------------------------------------------------------------------------
# sign-in state machine (sign_in.dart:83-188)
# ---------------------------------------------------------------------------


def test_sign_in_full_flow_first_login():
    client, bundle = make_client()
    docs = [f"doc {i}" for i in range(120)]  # 3 add_query batches of 50

    key = run(
        client.sign_in(
            "id-token-alice",
            server_auth_code="4/abc",
            email="alice@example.com",
            documents=docs,
        )
    )
    assert key and client.access_key == key
    # prefs persisted exactly like the app (sign_in.dart:185-186)
    assert client.prefs.get_bool("logged") is True
    assert client.prefs.get_bool("first_time", default=True) is False
    assert client.auto_login() is True
    # auth-code exchange stored a refresh token server-side
    assert run(client.get_refresh_token())
    # the personalization upload reached the profile store
    profile = run(bundle.store.get("profile:id-token-alice"))
    assert profile


def test_sign_in_second_login_skips_upload():
    client, bundle = make_client()
    run(client.sign_in("tok", email="a@b.c", documents=["d1"]))
    first_profile = run(bundle.store.get("profile:tok"))

    client2 = CompanionClient(client.transport, Preferences())
    run(client2.sign_in("tok", email="a@b.c", documents=["d2"]))
    # not first_time for the same user -> no second upload
    assert run(bundle.store.get("profile:tok")) == first_profile
    assert client2.prefs.get_bool("logged") is True


def test_sign_in_rejected_rolls_back():
    async def deny(token):
        return None

    prefs = Preferences()
    prefs.set("logged", True)  # a stale session that must be rolled back
    client, _ = make_client(authenticator=deny, prefs=prefs)
    with pytest.raises(AuthenticationError) as ei:
        run(client.sign_in("bad-token"))
    # the reference surfaces the "hasn't purchased" message and signs the
    # session back out (sign_in.dart:125-132)
    assert NOT_PURCHASED_MESSAGE in str(ei.value)
    assert client.access_key == ""
    assert prefs.get_bool("logged") is False
    assert client.auto_login() is False


def test_sign_out_clears_logged():
    client, _ = make_client()
    run(client.sign_in("tok"))
    client.sign_out()
    assert client.access_key == ""
    assert client.auto_login() is False


def test_unknown_key_is_protocol_error():
    client, _ = make_client()
    client.access_key = "forged"
    with pytest.raises(AuthenticationError):
        run(client.request("get_display_name"))


# ---------------------------------------------------------------------------
# token / profile helpers (helper/helper.dart)
# ---------------------------------------------------------------------------


def test_profile_helpers_and_ble_id_roundtrip():
    client, _ = make_client()
    run(client.sign_in("tok-u1"))
    assert run(client.get_display_name()) == "tok-u1"
    assert run(client.get_auth_code()) is None  # never stored
    run(client.set_ble_id("AA:BB:CC"))
    assert run(client.get_ble_id()) == "AA:BB:CC"


def test_send_data_conversation():
    client, _ = make_client()
    run(client.sign_in("tok"))
    reply = run(client.request("send_data", ("hello there",)))
    assert isinstance(reply, dict) and reply.get("response")


def test_interleaved_async_frames_are_buffered():
    """An ``utterance`` frame arriving before the reply must not be
    consumed as the reply (socket.dart single-request discipline)."""

    class Interleaving:
        def __init__(self):
            self.queue = []

        async def send(self, message):
            self.queue.append("utterance¬¬decoded words")
            self.queue.append('ok¬speak¬{"spoken": "hi"}')

        async def receive(self):
            return self.queue.pop(0)

        async def close(self):
            pass

    client = CompanionClient(Interleaving())
    result = run(client.request("speak", ("hi",)))
    assert result == {"spoken": "hi"}
    assert [e.command for e in client.events] == ["utterance"]
    assert client.events[0].args == ("decoded words",)


# ---------------------------------------------------------------------------
# BLE pairing + dispatch (helper/ble.dart)
# ---------------------------------------------------------------------------


def _link(prefs=None, phone_services=None):
    radio = InMemoryBle(devices={"glasses-1": object()})
    prefs = prefs or Preferences()
    link = BleLink(radio, ble_id="glasses-1", auth_key="K", prefs=prefs)
    if phone_services is not None:
        link.phone = PhoneActions(phone_services, "K", link.write_data)
    return link, radio, prefs


def test_ble_scan_connects_matching_id():
    link, radio, _ = _link()
    assert run(link.scan_devices()) is True
    assert link.connected and radio.connected_to is not None


def test_ble_scan_no_match():
    radio = InMemoryBle(devices={"other": object()})
    link = BleLink(radio, ble_id="glasses-1", auth_key="K", prefs=Preferences())
    assert run(link.scan_devices()) is False
    assert not link.connected


def test_ble_pair_retry_returns_none_when_absent():
    radio = InMemoryBle()
    link = run(
        pair(radio, ble_id="x", auth_key="K", prefs=Preferences(), retries=2)
    )
    assert link is None


def test_ble_dispatch_state_frames():
    link, radio, prefs = _link()
    run(radio.emit_notify(b"ip|K|192.168.4.7"))
    run(radio.emit_notify(b"volume|K|7"))
    run(radio.emit_notify(b"battery|K|83"))
    assert prefs.get_string("ip") == "192.168.4.7"
    assert link.volume == 7 and link.battery == 83


def test_ble_drops_bad_auth_and_malformed():
    link, radio, prefs = _link()
    run(radio.emit_notify(b"ip|WRONGKEY|10.0.0.1"))  # ble.dart:87
    run(radio.emit_notify(b"justonepart"))  # ble.dart:83
    run(radio.emit_notify(b"\xff\xfe|K|x"))  # non-ascii
    run(radio.emit_notify(b"volume|K|not-an-int"))
    assert prefs.get_string("ip") is None
    assert link.volume == 0


def test_ble_auto_reconnect_on_disconnect():
    link, radio, _ = _link()
    run(link.scan_devices())
    run(radio.emit_state("disconnected"))  # ble.dart:46-53
    assert link.connected is True  # immediately re-connected


# ---------------------------------------------------------------------------
# phone relays (helper/commands.dart)
# ---------------------------------------------------------------------------


def _phone(contacts=(), permission=True):
    services = InMemoryPhone(
        contacts=tuple(contacts), contacts_permission=permission
    )
    writes = []

    async def write(data):
        writes.append(data)

    return PhoneActions(services, "K", write), services, writes


def test_contacts_found():
    actions, _, writes = _phone([Contact("Ada Lovelace", ("+44123",))])
    run(actions.contacts("ada lovelace"))  # case-insensitive match
    assert writes == ["contacts|K|+44123"]


def test_contacts_no_phone_number():
    actions, _, writes = _phone([Contact("Ada Lovelace")])
    run(actions.contacts("Ada Lovelace"))
    assert writes == [
        "contacts|K|I couldn't find any matching phone number with Ada Lovelace"
    ]


def test_contacts_no_match_replies_instead_of_throwing():
    # the reference's firstWhere without orElse throws StateError here
    # (commands.dart:17) — we reply with the intended not-found message
    actions, _, writes = _phone([Contact("Bob", ("+1",))])
    run(actions.contacts("Carol"))
    assert writes == ["contacts|K|I couldn't find any matching contact with Carol"]


def test_contacts_permission_denied():
    actions, _, writes = _phone(permission=False)
    run(actions.contacts("Anyone"))
    assert writes == ["contacts|K|Please grant me permission to access your contacts"]


def test_call_and_text_relays():
    actions, services, writes = _phone()
    run(actions.call("+15550100"))
    run(actions.text("+15550100", "on my way"))
    assert services.calls == ["+15550100"]
    assert services.sms == [("on my way", ("+15550100",))]
    assert writes == ["call|K|", "text|K|"]


def test_ble_routes_phone_commands():
    services = InMemoryPhone(contacts=(Contact("Eve", ("+49",)),))
    link, radio, _ = _link(phone_services=services)
    run(radio.emit_notify(b"contacts|K|Eve"))
    run(radio.emit_notify(b"call|K|+49"))
    run(radio.emit_notify(b"text|K|+49|hello"))
    assert services.calls == ["+49"]
    assert services.sms == [("hello", ("+49",))]
    # replies ride the same characteristic back to the glasses
    assert radio.written[0] == b"contacts|K|+49"


# ---------------------------------------------------------------------------
# blind-support toggle (pages/device.dart:376-385)
# ---------------------------------------------------------------------------


def test_set_blind_support_pref_and_device_frame():
    writes = []

    async def device_write(data):
        writes.append(data)

    client, _ = make_client()
    client._device_write = device_write
    run(client.sign_in("tok"))
    run(client.set_blind_support(True))
    assert client.prefs.get_bool("blind_support") is True
    assert writes == [f"blind|{client.access_key}|true"]
    run(client.set_blind_support(False))
    assert writes[-1] == f"blind|{client.access_key}|false"


# ---------------------------------------------------------------------------
# WiFi liveness (helper/wifi.dart)
# ---------------------------------------------------------------------------


def test_wifi_no_ip_is_offline():
    assert run(is_online(Preferences())) is False


def test_wifi_status_codes():
    prefs = Preferences()
    prefs.set("ip", "10.0.0.9")
    calls = []

    def getter(status=200, raise_exc=None):
        async def get(url, timeout):
            calls.append(url)
            if raise_exc:
                raise raise_exc
            return status

        return get

    assert run(is_online(prefs, http_get=getter(200))) is True
    assert run(is_online(prefs, http_get=getter(503))) is False
    assert run(is_online(prefs, http_get=getter(raise_exc=OSError()))) is False
    assert calls[0] == "http://10.0.0.9"


def test_wifi_timeout_is_offline():
    prefs = Preferences()
    prefs.set("ip", "10.0.0.9")

    async def hang(url, timeout):
        await asyncio.sleep(30)
        return 200

    assert run(is_online(prefs, http_get=hang, timeout=0.05)) is False


# ---------------------------------------------------------------------------
# preferences (shared_preferences equivalent)
# ---------------------------------------------------------------------------


def test_prefs_roundtrip_and_types(tmp_path):
    p = tmp_path / "prefs.json"
    prefs = Preferences(p)
    prefs.set("logged", True)
    prefs.set("ip", "1.2.3.4")
    prefs.set("volume", 7)

    again = Preferences(p)  # fresh load from disk
    assert again.get_bool("logged") is True
    assert again.get_string("ip") == "1.2.3.4"
    assert again.get_int("volume") == 7
    # typed getters reject cross-type reads
    assert again.get_string("logged") is None
    assert again.get_int("logged") == 0
    again.remove("ip")
    assert Preferences(p).get_string("ip") is None


def test_prefs_corrupt_file_recovers(tmp_path):
    p = tmp_path / "prefs.json"
    p.write_text("{not json")
    prefs = Preferences(p)
    assert prefs.get_bool("logged") is False
    prefs.set("logged", True)
    assert json.loads(p.read_text()) == {"logged": True}


def test_prefs_memory_only():
    prefs = Preferences()  # no path: in-memory, no crash on flush
    prefs.set("k", "v")
    assert prefs.get_string("k") == "v"


# ---------------------------------------------------------------------------
# error taxonomy
# ---------------------------------------------------------------------------


def test_unknown_command_is_companion_error():
    client, _ = make_client()
    run(client.sign_in("tok"))
    with pytest.raises(CompanionError):
        run(client.request("no_such_command"))


def test_sign_in_without_documents_keeps_first_login_pending():
    """Signing in with no personalization corpus must NOT mark the account
    not_first_time — the one-shot upload stays available for a later
    sign-in that does carry documents (sign_in.dart:150-189 order)."""
    client, bundle = make_client()
    run(client.sign_in("tok-pending", email="p@x.y"))  # no documents
    assert run(bundle.store.get("profile:tok-pending")) in (None, [], "")

    client2 = CompanionClient(client.transport, Preferences())
    run(client2.sign_in("tok-pending", email="p@x.y", documents=["memo"]))
    # the corpus finally uploaded on the documents-bearing login
    assert run(bundle.store.get("profile:tok-pending"))

    client3 = CompanionClient(client.transport, Preferences())
    run(client3.sign_in("tok-pending", email="p@x.y", documents=["other"]))
    # ...and only that once
    profile = run(bundle.store.get("profile:tok-pending"))
    assert "other" not in str(profile)


def test_pair_retries_when_connect_fails():
    """A device found but failing to connect counts as a miss: pair()
    retries and succeeds once the transport recovers, never returning a
    dead link."""
    from imagined_speech_translation_tpu.companion.ble import pair

    ble = InMemoryBle(devices={"AA:BB": object()})
    fails = [2]  # first two connect attempts explode
    orig_connect = ble.connect

    async def flaky_connect(device):
        if fails[0] > 0:
            fails[0] -= 1
            raise OSError("gatt error")
        await orig_connect(device)

    ble.connect = flaky_connect
    link = run(
        pair(ble, ble_id="AA:BB", auth_key="k", prefs=Preferences(), retries=3)
    )
    assert link is not None and link.connected

    ble2 = InMemoryBle(devices={"AA:BB": object()})

    async def always_fail(device):
        raise OSError("gatt error")

    ble2.connect = always_fail
    assert (
        run(pair(ble2, ble_id="AA:BB", auth_key="k", prefs=Preferences(),
                 retries=2))
        is None
    )


# ---------------------------------------------------------------------------
# recordings browser over Drive (device.dart:87-117)
# ---------------------------------------------------------------------------


def test_recordings_find_or_create_and_crud():
    from imagined_speech_translation_tpu.companion import (
        InMemoryDrive,
        RecordingsBrowser,
    )

    drive = InMemoryDrive()
    b = RecordingsBrowser(drive)

    async def flow():
        folder = await b.ensure_media_folder()
        assert folder["name"] == "Gemini Sight Media"
        # second call FINDS instead of creating (device.dart:112-115)
        b2 = RecordingsBrowser(drive)
        assert (await b2.ensure_media_folder())["id"] == folder["id"]
        assert len([
            f for f in drive.files.values()
            if f["mimeType"].endswith("folder")
        ]) == 1
        url = await b.folder_url()
        assert url == (
            "https://drive.google.com/drive/u/2/folders/" + folder["id"]
        )
        # save / list (newest first) / download / delete
        m1 = await b.save_recording("a.avi", b"AAAA")
        m2 = await b.save_recording("b.avi", b"BB")
        drive.files[m2["id"]]["createdTime"] = "2030-01-01T00:00:00Z"
        names = [f["name"] for f in await b.list_recordings()]
        assert names == ["b.avi", "a.avi"]
        assert await drive.download(m1["id"]) == b"AAAA"
        await b.delete(m1["id"])
        assert [f["name"] for f in await b.list_recordings()] == ["b.avi"]

    run(flow())


def test_google_drive_wire_format():
    """Pin the Drive v3 request shapes the real adapter emits."""
    from imagined_speech_translation_tpu.companion import (
        GoogleDrive,
        RecordingsBrowser,
    )

    calls = []

    async def http(method, url, headers=None, body=None):
        calls.append((method, url, headers or {}, body))
        if method == "GET" and "files?q=" in url:
            return 200, json.dumps({"files": []}).encode()
        if method == "POST":
            return 200, json.dumps({"id": "fid1", "name": "x"}).encode()
        if method == "DELETE":
            return 204, b""
        if url.endswith("alt=media"):
            return 200, b"MEDIA"
        return 404, b"?"

    drive = GoogleDrive(http, token="tok123")
    b = RecordingsBrowser(drive)

    async def flow():
        await b.ensure_media_folder()
        await b.save_recording("clip.avi", b"BYTES", mime="video/avi")
        assert await drive.download("fid9") == b"MEDIA"
        await drive.delete("fid9")

    run(flow())
    # 1: the exact find query from device.dart:89-91, URL-encoded
    m, url, hdrs, _ = calls[0]
    assert m == "GET" and url.startswith(
        "https://www.googleapis.com/drive/v3/files?q="
    )
    import urllib.parse

    q = urllib.parse.parse_qs(urllib.parse.urlsplit(url).query)["q"][0]
    assert q == (
        "mimeType='application/vnd.google-apps.folder' and "
        "name='Gemini Sight Media' and trashed=false and 'root' in parents"
    )
    assert hdrs["Authorization"] == "Bearer tok123"
    # 2: folder create (metadata-only JSON POST)
    m, url, hdrs, body = calls[1]
    assert m == "POST" and url.endswith("/drive/v3/files")
    assert json.loads(body)["mimeType"].endswith("folder")
    # 3: multipart upload with parents + content
    m, url, hdrs, body = calls[2]
    assert url.endswith("/upload/drive/v3/files?uploadType=multipart")
    assert b'"parents": ["fid1"]' in body and b"BYTES" in body
    assert "multipart/related" in hdrs["Content-Type"]
    # 4: media download, 5: delete
    assert calls[3][1].endswith("/files/fid9?alt=media")
    assert calls[4][0] == "DELETE" and calls[4][1].endswith("/files/fid9")


def test_local_dir_drive_persists(tmp_path):
    from imagined_speech_translation_tpu.companion import (
        LocalDirDrive,
        RecordingsBrowser,
    )

    async def flow():
        b = RecordingsBrowser(LocalDirDrive(tmp_path / "drv"))
        meta = await b.save_recording("c.avi", b"XYZ")
        # a NEW process (fresh instance) sees the same store
        b2 = RecordingsBrowser(LocalDirDrive(tmp_path / "drv"))
        got = await b2.list_recordings()
        assert [f["id"] for f in got] == [meta["id"]]
        assert await b2.drive.download(meta["id"]) == b"XYZ"
        await b2.delete(meta["id"])
        assert await b2.list_recordings() == []

    run(flow())


# ---------------------------------------------------------------------------
# settings panel (settings.dart:22-182)
# ---------------------------------------------------------------------------


def test_settings_panel_surface(tmp_path):
    from imagined_speech_translation_tpu.companion import SettingsPanel

    prefs = Preferences(tmp_path / "p.json")
    client, bundle = make_client(prefs=prefs)
    written = []

    async def device_write(frame):
        written.append(frame)

    client._device_write = device_write
    panel = SettingsPanel(client)

    async def flow():
        key = await client.sign_in(
            "tok", email="user@example.com", documents=[]
        )
        info = await panel.user_info()
        assert info["email"] == "user@example.com"
        # wifi creds ride BLE with the page's exact frame (settings.dart:177)
        await panel.connect_wifi("HomeNet", "hunter2")
        assert written == [f"wifi|{key}|HomeNet|hunter2"]
        assert panel.device_info()["model"]
        panel.set("ip", "192.168.1.7")
        assert panel.get("ip") == "192.168.1.7"
        assert panel.all()["logged"] is True
        panel.sign_out()
        assert prefs.get_bool("logged") is False

    run(flow())


def test_settings_panel_wifi_requires_device(tmp_path):
    from imagined_speech_translation_tpu.companion import SettingsPanel

    client, _ = make_client(prefs=Preferences(tmp_path / "p.json"))
    panel = SettingsPanel(client)
    with pytest.raises(RuntimeError, match="no device"):
        run(panel.connect_wifi("x", "y"))
