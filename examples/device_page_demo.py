"""Drive the rendered companion device page end-to-end over real HTTP.

Starts ``ist-companion-ui``'s server in-process on an ephemeral port, then
walks the reference app's device-page journey (``app/lib/pages/device.dart``
/ ``settings.dart``): read state → glasses push their LAN ip (wifi goes
live, Cast appears) → toggle Blind Support → settings panel → WiFi
provisioning (renders the real QR the glasses camera scans) → recordings
browser (save/list/download/delete).

Writes ``examples/device_page_transcript.json`` and the rendered
``examples/wifi_provision_qr.svg``.

Run: ``python examples/device_page_demo.py``
"""

import base64
import json
import sys
import threading
import urllib.request
from pathlib import Path
from urllib.parse import quote

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from imagined_speech_translation_tpu.companion import DeviceUI, Preferences
from imagined_speech_translation_tpu.companion.webui import serve


def get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def post(url, obj=None):
    req = urllib.request.Request(
        url, data=json.dumps(obj or {}).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    root = Path(__file__).resolve().parent
    tmp = root / "_device_demo_state"
    tmp.mkdir(exist_ok=True)
    prefs = Preferences(tmp / "prefs.json")
    prefs.set("email", "user@example.com")
    ui = DeviceUI(prefs, tmp / "drive")
    srv = serve(ui, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    t: list = []

    page = get(base + "/").decode()
    t.append(["GET /", f"{len(page)} bytes of device page HTML"])

    t.append(["GET /api/state (fresh)", json.loads(get(base + "/api/state"))])
    prefs.set("ip", "192.168.4.21")  # the glasses push their LAN ip over BLE
    t.append(["glasses push ip over BLE", "prefs['ip'] = 192.168.4.21"])
    t.append(["GET /api/state (online)", json.loads(get(base + "/api/state"))])

    t.append(["POST /api/blind", post(base + "/api/blind")])
    t.append(["GET /api/settings", json.loads(get(base + "/api/settings"))])

    wifi = post(base + "/api/wifi", {"ssid": "glasses-net", "password": "secret123"})
    (root / "wifi_provision_qr.svg").write_text(wifi.pop("qr_svg"))
    wifi["qr_svg"] = "-> examples/wifi_provision_qr.svg"
    t.append(["POST /api/wifi", wifi])

    saved = post(
        base + "/api/recordings/save",
        {"name": "morning-walk.avi",
         "content_b64": base64.b64encode(b"demo recording bytes").decode()},
    )["saved"]
    t.append(["POST /api/recordings/save", saved])
    t.append(["GET /api/recordings", json.loads(get(base + "/api/recordings"))])
    body = get(base + "/api/recordings/download?id=" + quote(saved["id"]))
    t.append(["GET /api/recordings/download", f"{len(body)} bytes"])
    t.append(["POST /api/recordings/delete", post(base + "/api/recordings/delete", {"id": saved["id"]})])
    t.append(["POST /api/signout", post(base + "/api/signout")])

    srv.shutdown()
    out = root / "device_page_transcript.json"
    out.write_text(json.dumps(t, indent=1, ensure_ascii=False))
    print(json.dumps(t, indent=1, ensure_ascii=False))
    print(f"\ntranscript -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
