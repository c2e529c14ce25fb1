"""End-to-end training driver (reference: ``main_model/scripts/train.py:280``).

Flow: validate config → seed → tokenizer → dataset + splits → BoW indices →
trainer → train → final test eval.  Unlike the reference (flat dict, no CLI),
config comes from JSON with dotted-path overrides, and every stage is
resumable (``--resume``).

Usage::

    python -m imagined_speech_translation_tpu.cli.train \
        --data-dir data/eeg_data --montage data/montage.csv \
        --vocab vocab.txt [--config cfg.json] [--set training.seed=7] ...
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np

from ..config import Config, default_config, replace_nested
from ..data import ChineseCharTokenizer, EEGTextDataset, split_indices
from ..evaluation import prediction_diversity
from ..training import EEGTrainer, get_top_k_vocab_indices
from ..utils import seed_everything
from ..utils.metrics import get_logger

logger = logging.getLogger(__name__)


def parse_override(cfg: Config, expr: str) -> Config:
    path, _, raw = expr.partition("=")
    try:
        value = json.loads(raw)
    except json.JSONDecodeError:
        value = raw
    return replace_nested(cfg, path, value)


def load_config(path: str | None, overrides) -> Config:
    cfg = Config.from_json(Path(path).read_text()) if path else default_config()
    for expr in overrides or ():
        cfg = parse_override(cfg, expr)
    return cfg.validate()


def main(argv=None) -> float:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--montage", required=True)
    ap.add_argument("--platform", default=None, help="jax platform override (cpu/tpu)")
    ap.add_argument("--vocab", required=True, help="BERT-style vocab.txt")
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", action="append", dest="overrides", metavar="PATH=VAL")
    ap.add_argument("--out-dir", default="runs/latest")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument(
        "--bart-params", default=None,
        help="orbax dir from ist-convert-hf: initialize the decoder from the"
             " pretrained fnlp/bart-base-chinese weights (the reference's"
             " fine-tune setup, bart_decoder.py:20)",
    )
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    if args.platform:
        import os

        import jax

        os.environ["JAX_PLATFORMS"] = args.platform
        jax.config.update("jax_platforms", args.platform)
    from ..parallel.distributed import initialize_distributed

    initialize_distributed()  # no-op unless IST_COORDINATOR/IST_DISTRIBUTED set
    from ..utils.cache import enable_persistent_cache
    enable_persistent_cache()
    cfg = load_config(args.config, args.overrides)
    tc = cfg.training

    rng_key = seed_everything(tc.seed, impl=tc.rng_impl)
    tokenizer = ChineseCharTokenizer.from_vocab_file(args.vocab)
    logger.info("Tokenizer vocab: %d (pad=%d eos=%d bos=%d)",
                tokenizer.vocab_size, tokenizer.pad_token_id,
                tokenizer.eos_token_id, tokenizer.bos_token_id)
    if tokenizer.vocab_size != cfg.model.bart.vocab_size:
        logger.warning(
            "resizing model vocab %d -> tokenizer vocab %d",
            cfg.model.bart.vocab_size, tokenizer.vocab_size,
        )
        cfg = replace_nested(cfg, "model.bart.vocab_size", tokenizer.vocab_size)

    dataset = EEGTextDataset(
        args.data_dir, args.montage, tokenizer, cfg.data,
        augment=not args.no_augment, seed=tc.seed,
    )
    train_idx, val_idx, test_idx = split_indices(
        len(dataset),
        (cfg.data.train_split, cfg.data.val_split, cfg.data.test_split),
        tc.seed,
    )
    logger.info("samples: %d -> %d/%d/%d", len(dataset), len(train_idx),
                len(val_idx), len(test_idx))

    texts = []
    for i in train_idx[:2000]:
        s = dataset.corpus.get(int(i))
        if s:
            texts.append(s.get("text", ""))
    bow = get_top_k_vocab_indices(tokenizer, tc.loss.bow_vocab_size, texts=texts)
    logger.info("Selected %d BoW indices from vocabulary of size %d",
                len(bow), tokenizer.vocab_size)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    mlog = get_logger(out_dir, config=cfg.to_dict())
    trainer = EEGTrainer(
        cfg, dataset, tokenizer,
        bow_indices=bow,
        train_indices=train_idx,
        val_indices=val_idx,
        metric_logger=mlog,
        checkpoint_dir=str(out_dir / "checkpoints"),
    )
    state = trainer.init_state(rng_key)
    if args.bart_params:
        from ..training.pretrained import graft_bart_params

        state = graft_bart_params(state, args.bart_params)
    if args.resume:
        state = trainer.resume(state)

    try:
        state, best_bleu4 = trainer.train(state)
    finally:
        mlog.log({"train/finished": True})

    # final test evaluation (reference: scripts/train.py:350-363)
    trainer.val_indices = test_idx
    test_metrics = trainer.evaluate(state)
    mlog.log({f"test/{k}": v for k, v in test_metrics.items()
              if not isinstance(v, (list, tuple))})
    mlog.finish()
    logger.info("best BLEU-4 %.3f; test BLEU-4 %.3f", best_bleu4,
                test_metrics.get("bleu_4", 0.0))
    return best_bleu4


if __name__ == "__main__":
    main()
