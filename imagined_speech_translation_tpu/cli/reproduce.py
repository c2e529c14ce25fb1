"""``ist-reproduce`` — one-command real-artifact reproduction.

The BASELINE north star is exact decoded-text parity with the real
``fnlp/bart-base-chinese`` weights (reference
``main_model/src/models/bart_decoder.py:20``) on the real Chisco corpus
(``main_model/data/dataset.sh:1``).  Everything is staged offline
(converter, fetcher, parity recipe in ``docs/PARITY.md``); this command
chains it the day egress exists:

1. probe egress (OpenNeuro S3 + huggingface.co, bounded timeouts);
2. fetch the Chisco imagine-task pickles (``data/fetch.py``, resumable);
3. snapshot ``fnlp/bart-base-chinese`` (weights + vocab);
4. convert the HF checkpoint into framework BART params (``cli/convert_hf``);
5. decode-parity report: greedy + beam-3 token identity of the JAX decode
   stack vs HF ``generate`` ON THE REAL WEIGHTS, written to
   ``<work-dir>/parity_report.json``;
6. optionally (``--train``) launch the reference-shaped fine-tune.

With no egress it fails FAST and STRUCTURED: one JSON line
``{"status": "blocked", "reason": "no-egress", ...}``, exit code 3 —
never a stack trace.  ``--dry-run`` validates the whole plan offline
(imports, entry points, disk) and exits 0.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
import urllib.request
from pathlib import Path

HF_REPO = "fnlp/bart-base-chinese"
PROBE_URLS = (
    # the fetcher's S3 list endpoint (data/fetch.py) and the HF hub
    "https://s3.amazonaws.com/openneuro.org?list-type=2&max-keys=1&prefix=ds005170/",
    "https://huggingface.co/api/models/fnlp/bart-base-chinese",
)
BLOCKED_EXIT = 3


def _probe_url(url: str, timeout: float = 8.0) -> dict:
    t0 = time.monotonic()
    try:
        req = urllib.request.Request(url, method="GET")
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return {"url": url, "ok": True, "status": r.status,
                    "elapsed_s": round(time.monotonic() - t0, 2)}
    except Exception as e:  # noqa: BLE001 — any transport failure = no egress
        return {"url": url, "ok": False, "error": str(e)[:200],
                "elapsed_s": round(time.monotonic() - t0, 2)}


def probe_egress(urls=PROBE_URLS) -> list[dict]:
    return [_probe_url(u) for u in urls]


def _have_pickles(d: Path) -> bool:
    return d.is_dir() and any(d.glob("*_task-imagine_*.pkl"))


def _have_hf_checkpoint(d: Path) -> bool:
    return d.is_dir() and (
        (d / "model.safetensors").exists() or (d / "pytorch_model.bin").exists()
    )


def build_plan(args) -> list[dict]:
    work = Path(args.work_dir)
    data_dir = Path(args.data_dir) if args.data_dir else work / "chisco"
    hf_dir = Path(args.hf_checkpoint) if args.hf_checkpoint else work / "hf"
    plan = [
        {"step": "fetch-chisco", "dest": str(data_dir),
         "skipped": _have_pickles(data_dir)},
        {"step": "fetch-hf", "repo": HF_REPO, "dest": str(hf_dir),
         "skipped": _have_hf_checkpoint(hf_dir)},
        {"step": "convert-hf", "out": str(work / "bart_params"),
         "skipped": (work / "bart_params").is_dir()},
        {"step": "parity-report", "out": str(work / "parity_report.json"),
         "skipped": False},
    ]
    if args.train:
        plan.append({"step": "train", "out": str(work / "train"),
                     "skipped": False})
    return plan


def check_tools() -> dict:
    """Offline sanity: every import and entry point the plan needs."""
    checks = {}
    for mod in ("jax", "torch", "transformers", "numpy", "orbax.checkpoint"):
        try:
            __import__(mod)
            checks[mod] = True
        except ImportError:
            checks[mod] = False
    from . import convert_hf, train  # noqa: F401 — resolvable entry points
    from ..data import fetch  # noqa: F401
    from ..models import hf_convert  # noqa: F401

    checks["entry_points"] = True
    checks["free_disk_gb"] = round(
        shutil.disk_usage(".").free / 1e9, 1
    )
    return checks


def fetch_hf_snapshot(dest: Path, log=print) -> None:
    """Materialize the HF checkpoint + vocab into ``dest`` (reference model:
    bart_decoder.py:20; tokenizer: BertTokenizer over the same repo)."""
    import transformers

    dest.mkdir(parents=True, exist_ok=True)
    log(f"downloading {HF_REPO} ...")
    model = transformers.BartForConditionalGeneration.from_pretrained(HF_REPO)
    tok = transformers.BertTokenizer.from_pretrained(HF_REPO)
    model.save_pretrained(dest)
    tok.save_vocabulary(str(dest))
    log(f"saved to {dest}")


def parity_report(hf_dir: Path, params_dir: Path, out_path: Path,
                  n_cases: int = 6, log=print) -> dict:
    """Greedy + beam-3 token identity vs HF generate on the REAL weights.

    Conditioning follows the reference scheme exactly: decode against
    pseudo-encoder states (bart_decoder.py:29-48).  Identity must be 1.0;
    the report records per-case mismatch positions otherwise.
    """
    import numpy as np
    import torch
    import transformers

    import jax.numpy as jnp

    from ..config import BartConfig
    from ..decode import DecodeParams
    from ..decode.generate import build_bart_generate_fn
    from ..models import BartDecoderModel
    from ..models.hf_convert import convert_hf_bart_state_dict
    from .convert_hf import infer_decoder_layers, load_state_dict

    hf = transformers.BartForConditionalGeneration.from_pretrained(hf_dir)
    hf.eval()
    c = hf.config
    sd = load_state_dict(Path(hf_dir))
    params = convert_hf_bart_state_dict(
        {k: np.asarray(v) for k, v in sd.items()},
        decoder_layers=infer_decoder_layers(sd),
    )
    cfg = BartConfig(
        vocab_size=c.vocab_size, d_model=c.d_model,
        encoder_layers=c.encoder_layers, decoder_layers=c.decoder_layers,
        num_heads=c.decoder_attention_heads, ffn_dim=c.decoder_ffn_dim,
        max_position_embeddings=c.max_position_embeddings,
        pad_token_id=c.pad_token_id, bos_token_id=c.bos_token_id,
        eos_token_id=c.eos_token_id,
        decoder_start_token_id=c.decoder_start_token_id,
    )
    model = BartDecoderModel(cfg)
    variables = {"params": params}

    from transformers.modeling_outputs import BaseModelOutput

    B, S = 2, 3
    report = {"repo": str(hf_dir), "cases": [], "identity": None}
    matches = 0
    for case in range(n_cases):
        rng = np.random.default_rng(case)
        enc = rng.normal(size=(B, S, c.d_model)).astype(np.float32)
        beams = 1 if case % 2 == 0 else 3
        with torch.no_grad():
            ref = hf.generate(
                encoder_outputs=BaseModelOutput(
                    last_hidden_state=torch.from_numpy(enc)
                ),
                attention_mask=torch.ones(B, S, dtype=torch.long),
                do_sample=False, max_length=16, min_length=3,
                num_beams=beams, early_stopping=beams > 1,
            ).numpy()
        dp = DecodeParams(
            max_length=16, min_length=3, num_beams=beams,
            early_stopping=beams > 1, pad_token_id=c.pad_token_id,
            eos_token_id=c.eos_token_id,
            decoder_start_token_id=c.decoder_start_token_id,
        )
        gen = build_bart_generate_fn(model, dp, jit=False)
        got = np.asarray(gen(variables, jnp.asarray(enc)))
        padded = np.full_like(got, c.pad_token_id)
        padded[:, : ref.shape[1]] = ref[:, : got.shape[1]]
        same = bool(np.array_equal(got, padded))
        matches += same
        report["cases"].append({
            "seed": case, "num_beams": beams, "identical": same,
            "mismatches": [] if same else
            np.argwhere(got != padded).tolist(),
        })
        log(f"case {case} (beam {beams}): {'OK' if same else 'MISMATCH'}")
    report["identity"] = matches / n_cases
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(report, indent=2))
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--work-dir", default="runs/reproduce")
    ap.add_argument("--data-dir", default=None,
                    help="existing Chisco pickles (skips the download)")
    ap.add_argument("--hf-checkpoint", default=None,
                    help="existing fnlp/bart-base-chinese dir (skips the hub)")
    ap.add_argument("--train", action="store_true",
                    help="after parity, launch the reference-shaped fine-tune")
    ap.add_argument("--dry-run", action="store_true",
                    help="validate the plan offline and exit")
    ap.add_argument("--subjects", nargs="*", default=None,
                    help="restrict the Chisco fetch (e.g. 01 02)")
    ap.add_argument("--parity-cases", type=int, default=6)
    args = ap.parse_args(argv)

    work = Path(args.work_dir)
    plan = build_plan(args)
    checks = check_tools()

    if args.dry_run:
        print(json.dumps({
            "status": "dry-run-ok", "plan": plan, "tools": checks,
            "note": "no network touched; run without --dry-run to execute",
        }))
        return 0

    # ---- egress gate: every non-skipped network step needs it ----------
    need_net = any(
        not s["skipped"] for s in plan if s["step"].startswith("fetch")
    )
    if need_net:
        probes = probe_egress()
        if not any(p["ok"] for p in probes):
            print(json.dumps({
                "status": "blocked", "reason": "no-egress",
                "probes": probes, "plan": plan,
                "next": "re-run when the environment has network access; "
                        "or pass --data-dir/--hf-checkpoint for local "
                        "artifacts",
            }))
            return BLOCKED_EXIT

    work.mkdir(parents=True, exist_ok=True)
    data_dir = Path(args.data_dir) if args.data_dir else work / "chisco"
    hf_dir = Path(args.hf_checkpoint) if args.hf_checkpoint else work / "hf"

    if not _have_pickles(data_dir):
        from ..data.fetch import SUBJECTS, fetch_corpus

        fetch_corpus(data_dir,
                     subjects=tuple(args.subjects) if args.subjects
                     else SUBJECTS)
    if not _have_hf_checkpoint(hf_dir):
        fetch_hf_snapshot(hf_dir)

    params_dir = work / "bart_params"
    if not params_dir.is_dir():
        from .convert_hf import main as convert_main

        convert_main(["--checkpoint", str(hf_dir), "--out", str(params_dir)])

    report = parity_report(hf_dir, params_dir, work / "parity_report.json",
                           n_cases=args.parity_cases)
    if report["identity"] < 1.0:
        print(json.dumps({"status": "parity-failed", **report}))
        return 1

    if args.train:
        from .train import main as train_main

        train_main([
            "--data-dir", str(data_dir),
            "--montage", str(data_dir / "montage.csv"),
            "--vocab", str(hf_dir / "vocab.txt"),
            "--out-dir", str(work / "train"),
            "--bart-params", str(params_dir),
        ])

    print(json.dumps({"status": "ok", "identity": report["identity"],
                      "report": str(work / "parity_report.json")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
