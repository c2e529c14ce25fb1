"""Slow end-to-end learning proof: a tiny model memorizes four sentences and
beam decode reproduces them exactly — exercising data plane, composite loss,
BN statistics, optimizer groups, KV-cached beam search, and the tokenizer in
one flow.  Run with ``pytest -m slow`` (excluded by default via -m)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagined_speech_translation_tpu.config import replace_nested
from imagined_speech_translation_tpu.decode import DecodeParams, build_generate_fn
from imagined_speech_translation_tpu.models import EEGDecodingModel
from imagined_speech_translation_tpu.training import (
    AdaptiveLossScheduler,
    TrainModule,
    build_optimizer,
    create_train_state,
    get_top_k_vocab_indices,
    make_train_step,
)

from tests.helpers import build_dataset, tiny_config, tiny_tokenizer

pytestmark = pytest.mark.slow


def test_memorize_and_decode_exact(tmp_path):
    tok = tiny_tokenizer()
    cfg = tiny_config(tok.vocab_size)
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, batch_size=4, grad_accum_steps=1)
    )
    for p in ("bart_lr", "encoder_lr", "projection_lr"):
        cfg = replace_nested(cfg, f"training.optimizer.{p}", 1e-3)
    ds = build_dataset(tmp_path, tok, cfg, n_files=1, samples_per_file=4)
    bow = get_top_k_vocab_indices(tok, cfg.training.loss.bow_vocab_size)
    module = TrainModule(cfg, bow_k=len(bow))
    sample = ds.get_batch(np.arange(4))
    opt = build_optimizer(
        jax.eval_shape(
            lambda: module.init(
                jax.random.key(0),
                jnp.asarray(sample["eeg"]),
                jnp.asarray(sample["decoder_input_ids"]),
                jnp.asarray(sample["channel_mask"]),
                method="init_all",
            )
        )["params"],
        cfg.training.optimizer,
        total_steps=2000,
    )
    state = create_train_state(
        module, jax.random.key(0), sample, opt,
        AdaptiveLossScheduler(cfg.training.loss).initial_weights(),
    )
    step = jax.jit(make_train_step(module, opt, cfg, bow))
    batch = {
        k: jnp.asarray(v if k == "channel_mask" else v.reshape((1,) + v.shape))
        for k, v in sample.items()
    }
    for i in range(600):
        state, metrics = step(state, batch, jax.random.key(i))
    assert float(metrics["loss_ce"]) < 0.8

    model = EEGDecodingModel(cfg.model)
    dp = DecodeParams(
        max_length=cfg.data.max_length, min_length=2, num_beams=3,
        pad_token_id=tok.pad_token_id, eos_token_id=tok.sep_token_id,
        decoder_start_token_id=tok.bos_token_id,
    )
    gen = build_generate_fn(model, dp)
    out = np.asarray(gen(state.model_variables(), batch["eeg"][0], batch["channel_mask"]))
    preds = [t.strip() for t in tok.batch_decode(out)]
    targets = [
        tok.decode(r[r != -100]).strip() for r in np.asarray(batch["labels"][0])
    ]
    assert preds == targets
