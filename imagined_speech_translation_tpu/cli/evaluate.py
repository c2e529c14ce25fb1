"""Standalone evaluation of a trained checkpoint on a dataset split
(reference: the final test eval of ``scripts/train.py:350-363`` and
``EEGTrainer.evaluate``).

Usage::

    python -m imagined_speech_translation_tpu.cli.evaluate \
        --data-dir ... --montage ... --vocab ... \
        --checkpoint runs/latest/checkpoints/best_model [--split test]
"""

from __future__ import annotations

import argparse
import json
import logging

import jax
import numpy as np

from ..config import Config, default_config, replace_nested
from ..data import ChineseCharTokenizer, EEGTextDataset, split_indices
from ..training import (
    AdaptiveLossScheduler,
    EEGTrainer,
    get_top_k_vocab_indices,
)
from .train import load_config

logger = logging.getLogger(__name__)


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--montage", required=True)
    ap.add_argument("--platform", default=None, help="jax platform override (cpu/tpu)")
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", action="append", dest="overrides")
    ap.add_argument("--split", choices=("val", "test", "train"), default="test")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from ..utils.cache import enable_persistent_cache
    enable_persistent_cache()

    cfg = load_config(args.config, args.overrides)
    tokenizer = ChineseCharTokenizer.from_vocab_file(args.vocab)
    if tokenizer.vocab_size != cfg.model.bart.vocab_size:
        cfg = replace_nested(cfg, "model.bart.vocab_size", tokenizer.vocab_size)
    dataset = EEGTextDataset(
        args.data_dir, args.montage, tokenizer, cfg.data, augment=False,
        seed=cfg.training.seed,
    )
    tr, va, te = split_indices(
        len(dataset),
        (cfg.data.train_split, cfg.data.val_split, cfg.data.test_split),
        cfg.training.seed,
    )
    eval_idx = {"train": tr, "val": va, "test": te}[args.split]

    bow = get_top_k_vocab_indices(tokenizer, cfg.training.loss.bow_vocab_size)
    from pathlib import Path

    ckpt_path = Path(args.checkpoint)
    trainer = EEGTrainer(
        cfg, dataset, tokenizer, bow_indices=bow,
        train_indices=tr, val_indices=eval_idx,
        checkpoint_dir=str(ckpt_path.parent),
    )
    state = trainer.init_state(jax.random.key(cfg.training.seed))
    state, meta = trainer.ckpt.restore(ckpt_path.name, state)
    logger.info("restored %s (epoch %s)", ckpt_path.name, meta.get("epoch"))

    metrics = trainer.evaluate(state)
    printable = {
        k: v for k, v in metrics.items() if not isinstance(v, (list, tuple))
    }
    print(json.dumps(printable, default=float))
    for pred, tgt in zip(metrics["predictions"][:5], metrics["targets"][:5]):
        logger.info("target: %s | pred: %s", tgt, pred)
    return metrics


if __name__ == "__main__":
    main()
