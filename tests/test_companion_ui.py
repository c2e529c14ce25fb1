"""Rendered device page (companion/webui.py) + QR encoder tests.

The QR matrices are round-tripped through OpenCV's independent decoder
(skipped if cv2 is absent); the page is driven over real HTTP against a
live ``ThreadingHTTPServer`` — the same surface a browser hits.
"""

import base64
import json
import threading
import urllib.request

import pytest

from imagined_speech_translation_tpu.companion import DeviceUI, Preferences
from imagined_speech_translation_tpu.companion import qr
from imagined_speech_translation_tpu.companion.webui import serve


# ---------------------------------------------------------------------------
# QR encoder
def test_qr_structure():
    m = qr.encode("HELLO")
    assert len(m) == 21 and all(len(r) == 21 for r in m)  # version 1
    # finder cores
    for r, c in ((3, 3), (3, 17), (17, 3)):
        assert m[r][c] == 1
    # dark module
    assert m[len(m) - 8][8] == 1
    svg = qr.to_svg(m)
    assert svg.startswith("<svg") and "rect" in svg
    assert "██" in qr.to_ascii(m)


def test_qr_version_scaling():
    assert len(qr.encode("x" * 10)) == 21        # v1
    assert len(qr.encode("x" * 100)) == 41       # v6
    assert len(qr.encode("x" * 213)) == 57       # v10
    with pytest.raises(ValueError):
        qr.encode("x" * 214)


def test_qr_cv2_roundtrip():
    cv2 = pytest.importorskip("cv2")
    np = pytest.importorskip("numpy")
    det = cv2.QRCodeDetector()
    payloads = [
        "WIFI:T:WPA;S:glasses-net;P:secret123;;",
        "https://example.com/pair?device=ist-0001",
        "x" * 120,   # exercises v7+: version-info blocks
        "中文字符串测试 one two three",
    ]
    for p in payloads:
        m = qr.encode(p)
        arr = 255 * (1 - np.array(m, dtype=np.uint8))
        big = np.kron(np.pad(arr, 4, constant_values=255),
                      np.ones((8, 8), np.uint8))
        txt, _, _ = det.detectAndDecode(big)
        assert txt == p, f"cv2 could not decode {p[:30]!r}"


# ---------------------------------------------------------------------------
# Device page over live HTTP
@pytest.fixture()
def ui_server(tmp_path):
    prefs = Preferences(tmp_path / "prefs.json")
    prefs.set("email", "user@example.com")
    ui = DeviceUI(prefs, tmp_path / "drive")
    srv = serve(ui, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield ui, base
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get_content_type(), r.read()


def _post(url, obj=None):
    req = urllib.request.Request(
        url, data=json.dumps(obj or {}).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def test_page_and_state(ui_server):
    ui, base = ui_server
    status, ctype, body = _get(base + "/")
    assert status == 200 and ctype == "text/html"
    assert b"Imagined Speech Glasses" in body
    assert b"Blind Support" in body

    status, _, body = _get(base + "/api/state")
    s = json.loads(body)
    # not connected: no BLE link, no pushed ip (device.dart connection banner)
    assert s["ble"] is False and s["wifi"] is False
    assert s["email"] == "user@example.com"

    # glasses push their LAN ip over BLE -> wifi liveness + cast URL
    ui.prefs.set("ip", "192.168.4.21")
    s = json.loads(_get(base + "/api/state")[2])
    assert s["wifi"] is True
    assert s["cast_url"] == "https://192.168.4.21:81/"


def test_blind_toggle_persists(ui_server):
    ui, base = ui_server
    assert _post(base + "/api/blind")["blind_support"] is True
    assert _post(base + "/api/blind")["blind_support"] is False
    assert ui.prefs.get_bool("blind_support") is False


def test_settings_roundtrip(ui_server):
    _, base = ui_server
    out = _post(base + "/api/settings", {"key": "volume_step", "value": "5"})
    assert out["settings"]["volume_step"] == "5"
    s = json.loads(_get(base + "/api/settings")[2])
    assert s["device"]["model"]
    assert s["settings"]["volume_step"] == "5"


def test_wifi_qr_surface(ui_server):
    _, base = ui_server
    out = _post(base + "/api/wifi", {"ssid": "lab", "password": "pw123"})
    assert out["pushed"] is False  # no BLE link in this fixture
    assert out["payload"].startswith("WIFI:T:WPA;S:lab;")
    assert out["qr_svg"].startswith("<svg")
    status, ctype, body = _get(base + "/api/qr?text=hello")
    assert status == 200 and ctype == "image/svg+xml" and b"<svg" in body


def test_wifi_pushes_over_ble_when_paired(tmp_path):
    writes = []

    async def write(frame):
        writes.append(frame)

    prefs = Preferences(tmp_path / "p.json")
    ui = DeviceUI(prefs, tmp_path / "d", device_write=write, auth_key="k1")
    out = ui.wifi("lab", "pw")
    assert out["pushed"] is True
    assert writes == ["wifi|k1|lab|pw"]  # settings.dart:177 frame


def test_recordings_browser_surface(ui_server):
    _, base = ui_server
    saved = _post(
        base + "/api/recordings/save",
        {"name": "a.avi", "content_b64": base64.b64encode(b"xyz").decode()},
    )["saved"]
    recs = json.loads(_get(base + "/api/recordings")[2])
    assert [f["name"] for f in recs["recordings"]] == ["a.avi"]
    assert recs["url"].startswith("https://drive.google.com/")
    from urllib.parse import quote

    status, _, body = _get(
        base + "/api/recordings/download?id=" + quote(saved["id"])
    )
    assert status == 200 and body == b"xyz"
    _post(base + "/api/recordings/delete", {"id": saved["id"]})
    recs = json.loads(_get(base + "/api/recordings")[2])
    assert recs["recordings"] == []
