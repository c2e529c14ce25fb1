"""Ablation sweep: paper Table 24 variants through the REAL ``cli/train.py``.

The reference paper (``Toward Restoring Communication in ALS.docx`` Table 24)
ablates the architecture: no cross-region attention, uniform region weights,
no positional embedding, CNN-only region encoder, no fusion transformer, and
pure CNN.  The config flags for all six exist in this framework
(``RegionEncoderConfig.cnn_only`` / ``use_positional_embedding``,
``BrainEncoderConfig.disable_cross_region_attn`` / ``uniform_region_weight``
/ ``fusion_layers``); this tool trains each variant on the ECHO
synthetic corpus (``data/synthetic.py``: pair-local spectral signatures +
per-slot anchor/echo burst pairs whose ±π/2 ordered-sign lag code is
provably invisible to permutation-invariant pooling of local features and
XOR-randomized per slot so single regions carry nothing) and asserts the
paper's orderings directionally: the full model beats every ablation, and
the CNN-family variants (CNN-only region encoder, pure CNN) land at the
bottom.  Exact paper numbers need the real Chisco data
(env-blocked).

Usage::

    python tools/ablation_sweep.py [--out runs/ablations] [--epochs 8]

Writes ``runs/ablations/results.json`` + ``runs/ablations/TABLE.md``.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.train_proof import build_corpus, run_stage  # noqa: E402

# (name, paper label, paper BLEU-1, overrides)
VARIANTS = [
    ("full", "Ours (full)", 49.6, []),
    (
        "no_cross_region_attn", "no cross-region attn", 43.8,
        ["model.brain_encoder.disable_cross_region_attn=true"],
    ),
    (
        "uniform_region_weight", "uniform region weights", 46.1,
        ["model.brain_encoder.uniform_region_weight=true"],
    ),
    (
        "no_pos_emb", "no positional embedding", 47.5,
        ["model.brain_encoder.region_encoder.use_positional_embedding=false"],
    ),
    (
        "cnn_only_region", "CNN-only region encoder", 38.2,
        ["model.brain_encoder.region_encoder.cnn_only=true"],
    ),
    (
        "no_fusion_transformer", "no fusion transformer", 42.2,
        ["model.brain_encoder.fusion_layers=0"],
    ),
    (
        "pure_cnn", "pure CNN", 33.9,
        [
            "model.brain_encoder.region_encoder.cnn_only=true",
            "model.brain_encoder.disable_cross_region_attn=true",
            "model.brain_encoder.uniform_region_weight=true",
        ],
    ),
]


def summarize_run(out_dir: Path) -> dict:
    records = [
        json.loads(line)
        for line in (out_dir / "metrics.jsonl").read_text().splitlines()
        if line.strip()
    ]
    losses = [r["train/loss"] for r in records if "train/loss" in r]
    val = [r for r in records if "val/bleu_1" in r]
    # non-overlapping head/tail windows: at most a quarter of the series
    # each, so sparse logs (log_every_steps > steps/epoch) can't alias the
    # two means into equality
    w = max(1, min(10, len(losses) // 4))
    return {
        "first_loss": round(sum(losses[:w]) / max(len(losses[:w]), 1), 4),
        "last_loss": round(sum(losses[-w:]) / max(len(losses[-w:]), 1), 4),
        "best_bleu1": round(max(r["val/bleu_1"] for r in val), 3) if val else 0.0,
        "best_bleu4": round(
            max(r.get("val/bleu_4", 0.0) for r in val), 3
        ) if val else 0.0,
        "final_diversity": round(
            val[-1].get("val/diversity_score", 0.0), 3
        ) if val else 0.0,
        "n_evals": len(val),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/ablations")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--timepoints", type=int, default=384)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--only", nargs="*", default=None, help="variant names")
    ap.add_argument(
        "--hidden", type=int, default=384,
        help="model width (CPU pilots shrink this; conv stack scales with it)",
    )
    ap.add_argument("--samples-per-file", type=int, default=64)
    ap.add_argument(
        "--no-assert", action="store_true",
        help="table only — skip the ordering asserts (pilot runs)",
    )
    args = ap.parse_args()

    out_root = Path(args.out)
    out_root.mkdir(parents=True, exist_ok=True)
    root = Path(tempfile.mkdtemp(prefix="ist_ablate_"))
    # echo corpus: classes come in pairs sharing one region-local spectral
    # signature; the pair member is coded by the SIGN of each region's
    # anchor->echo ±π/2 phase offset at a 64-sample lag (beyond the conv
    # stem's receptive field), XOR'd with a fresh random bit per slot so a
    # single region is coin-flip noise.  Position-blind pooled statistics
    # are blind to the sign by symmetry (probe test_echo_corpus_class_coding:
    # pooled conv bank + cross-region products -> chance; ordered lagged
    # readout -> ~100%), so reading the member NEEDS in-region token
    # attention (ablated by cnn_only) + cross-region integration.  30% of
    # samples corrupt one region, rewarding dynamic gating.
    data_dir, montage, vocab = build_corpus(
        root, args.timepoints, mode="echo",
        samples_per_file=args.samples_per_file,
    )
    h = args.hidden
    convs = [max(8, h * f // 384) for f in (64, 96, 128, 192, 384)]

    results = {}
    for name, label, paper_bleu1, extra in VARIANTS:
        if args.only and name not in args.only:
            continue
        run_dir = out_root / name
        if run_dir.exists():
            shutil.rmtree(run_dir)
        print(f"=== ablation: {name} ({label}) ===", flush=True)
        cli = [
            "--data-dir", str(data_dir), "--montage", str(montage),
            "--vocab", str(vocab), "--out-dir", str(run_dir),
            "--set", f"data.n_timepoints={args.timepoints}",
            "--set", f"model.hidden_dim={h}",
            "--set", f"model.brain_encoder.hidden_dim={h}",
            "--set",
            "model.brain_encoder.region_encoder.conv_channels="
            + str(convs).replace(" ", ""),
            "--set", f"model.bart.d_model={h}",
            "--set", f"model.bart.ffn_dim={h * 4}",
            "--set", "model.bart.encoder_layers=3",
            "--set", "model.bart.decoder_layers=3",
            "--set", "training.mixed_precision=true",
            # the reference's 3e-5 BART group LR assumes a PRETRAINED
            # decoder being fine-tuned; this sweep trains from scratch, so
            # the decoder/projection groups get the encoder's LR or the
            # full model never converges inside the sweep budget
            "--set", "training.optimizer.bart_lr=3e-4",
            "--set", "training.optimizer.projection_lr=3e-4",
            "--set", "training.optimizer.warmup_steps=60",
            "--set", "training.checkpoint.save_interval_epochs=100",
            "--set", "training.log_every_steps=8",
            "--set", "training.patience=30",
            "--set", f"training.num_epochs={args.epochs}",
        ]
        for ov in extra:
            cli += ["--set", ov]
        if args.platform:
            cli += ["--platform", args.platform]
        run_stage(cli)
        results[name] = {
            "label": label,
            "paper_bleu1": paper_bleu1,
            "overrides": extra,
            **summarize_run(run_dir),
        }
        # keep the sweep light on disk: metrics only, no checkpoints
        shutil.rmtree(run_dir / "checkpoints", ignore_errors=True)
        (out_root / "results.json").write_text(json.dumps(results, indent=2))

    # ---- table ------------------------------------------------------------
    lines = [
        "# Ablation sweep (synthetic corpus, cli/train.py, "
        f"{args.epochs} epochs)",
        "",
        "Paper Table 24 gives the real-data orderings; this sweep reproduces",
        "them DIRECTIONALLY on the echo synthetic corpus: class pairs share",
        "a region-local spectral signature (easy half); the pair member is",
        "coded by the SIGN of each region's anchor->echo ±π/2 lag-64 phase",
        "offset, XOR-randomized per slot.  Position-blind pooled statistics",
        "are provably blind to the sign and single regions are coin-flip",
        "noise (probe: pooled conv bank + cross-region products -> chance;",
        "ordered lagged readout -> ~100%), so the member needs in-region",
        "token attention + cross-region integration.  30% of samples corrupt",
        "one region (3x noise), rewarding dynamic gating.  Expected: full",
        "beats",
        "every ablation; CNN-only and pure CNN at the bottom.  From-scratch",
        "LRs (bart/projection 3e-4) — the reference's 3e-5 BART LR assumes a",
        "pretrained decoder.",
        "",
        "| variant | paper BLEU-1 | synth best BLEU-1 | synth best BLEU-4 |"
        " loss first→last | diversity |",
        "|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(
            f"| {r['label']} | {r['paper_bleu1']} | {r['best_bleu1']} |"
            f" {r['best_bleu4']} | {r['first_loss']}→{r['last_loss']} |"
            f" {r['final_diversity']} |"
        )
    (out_root / "TABLE.md").write_text("\n".join(lines) + "\n")
    print(json.dumps(results, indent=2))

    if not args.only and not args.no_assert:
        # Directional reproduction of paper Table 24 on the echo corpus
        # (round-3 verdict item 4): full beats EVERY ablation, and the two
        # CNN-family variants land at the bottom.  The echo corpus makes
        # this enforceable: the member bit is an ordered-sign lag code that
        # permutation-invariant pooling provably cannot read, so CNN-family
        # variants (no in-region token attention, receptive field 25 < lag
        # 64) cannot ride a pooled-feature shortcut to the top the way they
        # could on the relational and coupled corpora.
        assert all(r["last_loss"] < r["first_loss"] for r in results.values()), (
            "some variant failed to train"
        )
        full = results["full"]["best_bleu1"]
        for name, r in results.items():
            if name == "full":
                continue
            assert full >= r["best_bleu1"], (
                f"ablation {name} beat full: {r['best_bleu1']} > {full}"
            )
        ranked = sorted(results, key=lambda n: results[n]["best_bleu1"])
        assert set(ranked[:2]) == {"cnn_only_region", "pure_cnn"}, (
            f"CNN-family variants not at the bottom: {ranked}"
        )
        bleus = [r["best_bleu1"] for r in results.values()]
        assert max(bleus) - min(bleus) > 5.0, (
            "ablation variants produced undifferentiated outcomes"
        )
    print("ABLATION SWEEP OK")


if __name__ == "__main__":
    main()
