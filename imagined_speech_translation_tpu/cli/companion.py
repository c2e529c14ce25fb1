"""Headless companion CLI — the app's user journey without the widgets.

Drives the full client flow from ``app/lib`` against a running control
plane (``ist-serve`` / :mod:`..runtime.server`): sign in with an id token,
persist the auth-code exchange, first-login personalization upload from a
directory of text files, then report device status (BLE pref'd id, WiFi
liveness, blind-support toggle) and optionally hold a short conversation
via ``send_data``.

Usage::

    ist-companion --url ws://127.0.0.1:4040 --token <id-token> \
        [--auth-code CODE] [--email you@example.com] \
        [--personalize-dir DIR] [--prefs ~/.ist_companion.json] \
        [--blind on|off] [--say "hello"]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
from pathlib import Path

from ..companion import (
    AuthenticationError,
    CompanionClient,
    Preferences,
    WebsocketTransport,
    is_online,
)


def iter_documents(directory: Path):
    for p in sorted(directory.rglob("*.txt")):
        yield p.read_text(errors="replace")


async def run(args) -> int:
    prefs = Preferences(args.prefs)
    transport = WebsocketTransport(args.url)
    client = CompanionClient(transport, prefs)
    try:
        documents = (
            iter_documents(Path(args.personalize_dir))
            if args.personalize_dir
            else None
        )
        try:
            key = await client.sign_in(
                args.token,
                server_auth_code=args.auth_code,
                email=args.email,
                documents=documents,
            )
        except AuthenticationError as e:
            print(f"sign-in rejected: {e}", file=sys.stderr)
            return 1
        status = {
            "signed_in": True,
            "access_key": key[:8] + "...",
            "display_name": await client.get_display_name(),
            "ble_id": await client.get_ble_id(),
            "device_online": await is_online(prefs),
            "blind_support": prefs.get_bool("blind_support"),
        }
        if args.blind is not None:
            await client.set_blind_support(args.blind == "on")
            status["blind_support"] = args.blind == "on"
        if args.say:
            reply = await client.request("send_data", (args.say,))
            status["reply"] = reply
        print(json.dumps(status))
        return 0
    finally:
        await transport.close()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--url", default="ws://127.0.0.1:4040")
    ap.add_argument("--token", required=True, help="id token for sign-in")
    ap.add_argument("--auth-code", default="", help="server auth code")
    ap.add_argument("--email", default="")
    ap.add_argument(
        "--personalize-dir",
        default=None,
        help="directory of .txt documents for the first-login upload",
    )
    ap.add_argument("--prefs", default=str(Path.home() / ".ist_companion.json"))
    ap.add_argument("--blind", choices=("on", "off"), default=None)
    ap.add_argument("--say", default=None, help="send one message and print the reply")
    args = ap.parse_args(argv)
    return asyncio.run(run(args))


if __name__ == "__main__":
    raise SystemExit(main())
