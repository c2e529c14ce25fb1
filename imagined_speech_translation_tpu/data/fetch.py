"""Chisco corpus fetcher (reference: ``main_model/data/dataset.sh``).

The reference ships 224 hardcoded ``curl`` commands against pinned S3
object versions of OpenNeuro **ds005170** (subjects 01–05, preprocessed
imagined-speech pickles).  This is the tool-shaped equivalent: it LISTS the
public bucket prefix via the S3 REST API (no credentials), filters to the
``*_task-imagine_*_eeg.pkl`` derivatives the training pipeline consumes
(``data/chisco.py``), and downloads with skip-of-complete-files + size
verification + a manifest, so the corpus definition tracks the dataset
rather than a frozen URL snapshot.  (Whole files are buffered in memory;
no byte-range resume — an interrupted file restarts.)

Network-free by construction for tests: the HTTP transport is injectable
(``http(method, url) -> (status, bytes)``); the CLI wires ``urllib``.

Usage::

    python -m imagined_speech_translation_tpu.data.fetch --out data/chisco
    # or: ist-fetch-chisco --out data/chisco [--subjects 01 02]
"""

from __future__ import annotations

import argparse
import json
import sys
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Callable, Tuple

HttpFn = Callable[[str, str], Tuple[int, bytes]]

BUCKET = "https://s3.amazonaws.com/openneuro.org"
DATASET = "ds005170"
PREFIX = f"{DATASET}/derivatives/preprocessed_pkl"
SUBJECTS = ("01", "02", "03", "04", "05")
_S3_NS = "{http://s3.amazonaws.com/doc/2006-03-01/}"


def _urllib_http(method: str, url: str) -> Tuple[int, bytes]:
    import urllib.request

    req = urllib.request.Request(url, method=method)
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:  # pragma: no cover - network path
        return e.code, e.read()


def list_subject_files(
    subject: str, http: HttpFn = _urllib_http
) -> list[dict]:
    """List ``sub-<N>`` imagine-task pickles via the public S3 list API
    (paginated ``list-type=2``); returns [{key, size}]."""
    out: list[dict] = []
    token = None
    prefix = f"{PREFIX}/sub-{subject}/eeg/"
    while True:
        url = f"{BUCKET}/?list-type=2&prefix={prefix}"
        if token:
            from urllib.parse import quote

            url += f"&continuation-token={quote(token)}"
        status, body = http("GET", url)
        if status != 200:
            raise RuntimeError(f"S3 list failed ({status}) for {prefix}")
        root = ET.fromstring(body)
        for item in root.iter(f"{_S3_NS}Contents"):
            key = item.find(f"{_S3_NS}Key").text
            size = int(item.find(f"{_S3_NS}Size").text)
            if "_task-imagine_" in key and key.endswith("_eeg.pkl"):
                out.append({"key": key, "size": size})
        trunc = root.find(f"{_S3_NS}IsTruncated")
        if trunc is None or trunc.text != "true":
            break
        token = root.find(f"{_S3_NS}NextContinuationToken").text
    return out


def fetch_corpus(
    out_dir: str | Path,
    *,
    subjects=SUBJECTS,
    http: HttpFn = _urllib_http,
    log=print,
) -> dict:
    """Download all subjects' pickles into ``out_dir`` (flat layout the
    dataset loader scans); files already present at the expected size are
    skipped (interrupted partial files re-download from byte 0).
    Writes ``manifest.json`` and returns it."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest = {"dataset": DATASET, "files": []}
    for subject in subjects:
        files = list_subject_files(subject, http)
        log(f"sub-{subject}: {len(files)} imagine-task pickles")
        for f in files:
            name = f["key"].rsplit("/", 1)[-1]
            dest = out / name
            if dest.exists() and dest.stat().st_size == f["size"]:
                manifest["files"].append({**f, "name": name, "cached": True})
                continue
            status, body = http("GET", f"{BUCKET}/{f['key']}")
            if status != 200:
                raise RuntimeError(f"download failed ({status}): {f['key']}")
            if len(body) != f["size"]:
                raise RuntimeError(
                    f"size mismatch for {name}: got {len(body)}, "
                    f"expected {f['size']}"
                )
            dest.write_bytes(body)
            manifest["files"].append({**f, "name": name, "cached": False})
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    log(f"{len(manifest['files'])} files in {out}")
    return manifest


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--out", default="data/chisco")
    ap.add_argument("--subjects", nargs="*", default=list(SUBJECTS))
    args = ap.parse_args(argv)
    try:
        fetch_corpus(args.out, subjects=args.subjects)
    except Exception as e:
        print(f"fetch failed: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
