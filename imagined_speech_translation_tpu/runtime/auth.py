"""Token verification for the session auth gate.

The reference verifies a Google id token via ``OAuth2Client.verifyIdToken``
and keys the session on the account email (``wss/func/auth.js:14-19``).
That is an environment binding (Google's RS256 certs); the offline-capable
equivalent shipped here is a compact-JWT HS256 verifier with the same
contract — ``token -> user id or None`` — so `SessionRegistry` gets a real
reject path out of the box, and deployments swap in a Google/RS256 verifier
behind the same hook.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
from typing import Awaitable, Callable


def _b64url_decode(part: str) -> bytes:
    pad = "=" * (-len(part) % 4)
    return base64.urlsafe_b64decode(part + pad)


def _b64url_encode(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).decode().rstrip("=")


def sign_token(
    claims: dict, secret: str | bytes, *, ttl_s: int | None = 3600
) -> str:
    """Mint an HS256 compact JWT (test/dev helper; the phone app normally
    brings a provider-issued token)."""
    secret = secret.encode() if isinstance(secret, str) else secret
    header = {"alg": "HS256", "typ": "JWT"}
    payload = dict(claims)
    if ttl_s is not None and "exp" not in payload:
        payload["exp"] = int(time.time()) + ttl_s
    signing_input = (
        _b64url_encode(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64url_encode(json.dumps(payload, separators=(",", ":")).encode())
    )
    sig = hmac.new(secret, signing_input.encode(), hashlib.sha256).digest()
    return signing_input + "." + _b64url_encode(sig)


def verify_token(
    token: str, secret: str | bytes, *, audience: str | None = None,
    now: float | None = None,
) -> dict | None:
    """Verify an HS256 compact JWT; returns the claims dict or None.

    Checks: structure, alg pinning (HS256 only — no ``none`` downgrade),
    signature (constant-time), ``exp``/``nbf`` windows, optional ``aud``.
    """
    secret = secret.encode() if isinstance(secret, str) else secret
    parts = token.split(".")
    if len(parts) != 3:
        return None
    try:
        header = json.loads(_b64url_decode(parts[0]))
        payload = json.loads(_b64url_decode(parts[1]))
        sig = _b64url_decode(parts[2])
    except (ValueError, json.JSONDecodeError):
        return None
    if not isinstance(header, dict) or header.get("alg") != "HS256":
        return None
    if not isinstance(payload, dict):
        return None  # validly-signed but non-object claims: reject, not raise
    expected = hmac.new(
        secret, f"{parts[0]}.{parts[1]}".encode(), hashlib.sha256
    ).digest()
    if not hmac.compare_digest(sig, expected):
        return None
    t = time.time() if now is None else now
    try:
        if "exp" in payload and t >= float(payload["exp"]):
            return None
        if "nbf" in payload and t < float(payload["nbf"]):
            return None
    except (TypeError, ValueError):
        return None  # non-numeric exp/nbf: malformed -> reject
    if audience is not None and payload.get("aud") != audience:
        return None
    return payload


def make_token_authenticator(
    secret: str | bytes, *, audience: str | None = None
) -> Callable[[str], Awaitable[str | None]]:
    """Authenticator for ``SessionRegistry``: verified token -> user id
    (``email`` claim first, like the reference, else ``sub``)."""

    async def authenticate(token: str) -> str | None:
        claims = verify_token(token, secret, audience=audience)
        if claims is None:
            return None
        return claims.get("email") or claims.get("sub")

    return authenticate
