"""Token-identical parity of the JAX BART decoder + decode loops against the
HF torch implementation (SURVEY.md §7 hard parts 1-2).

A tiny random ``BartForConditionalGeneration`` is built locally (no download),
its state dict converted via ``convert_hf_bart_state_dict``, and logits /
greedy / beam-3 outputs compared on random pseudo-encoder states — the exact
conditioning scheme the reference uses (bart_decoder.py:29-48)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from imagined_speech_translation_tpu.config import BartConfig
from imagined_speech_translation_tpu.decode import DecodeParams, build_generate_fn
from imagined_speech_translation_tpu.decode.generate import build_bart_generate_fn
from imagined_speech_translation_tpu.models import (
    BartDecoderModel,
    convert_hf_bart_state_dict,
)

VOCAB, D, HEADS, LAYERS, FFN, MAXPOS = 59, 32, 4, 2, 64, 24
PAD, BOS, EOS, START = 0, 1, 2, 2
B, S = 3, 3  # batch, pseudo-encoder length


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.BartConfig(
        vocab_size=VOCAB,
        d_model=D,
        encoder_layers=LAYERS,
        decoder_layers=LAYERS,
        encoder_attention_heads=HEADS,
        decoder_attention_heads=HEADS,
        encoder_ffn_dim=FFN,
        decoder_ffn_dim=FFN,
        max_position_embeddings=MAXPOS,
        activation_function="gelu",
        dropout=0.1,
        attention_dropout=0.0,
        pad_token_id=PAD,
        bos_token_id=BOS,
        eos_token_id=EOS,
        decoder_start_token_id=START,
        forced_eos_token_id=None,
        scale_embedding=False,
    )
    model = transformers.BartForConditionalGeneration(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_model(hf_model):
    cfg = BartConfig(
        vocab_size=VOCAB,
        d_model=D,
        encoder_layers=LAYERS,
        decoder_layers=LAYERS,
        num_heads=HEADS,
        ffn_dim=FFN,
        max_position_embeddings=MAXPOS,
        pad_token_id=PAD,
        bos_token_id=BOS,
        eos_token_id=EOS,
        decoder_start_token_id=START,
    )
    params = convert_hf_bart_state_dict(
        {k: v.detach().numpy() for k, v in hf_model.state_dict().items()},
        decoder_layers=LAYERS,
    )
    return BartDecoderModel(cfg), {"params": params}, cfg


def _enc_states(seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(B, S, D)).astype(np.float32)


def _hf_forward(hf_model, enc, ids):
    from transformers.modeling_outputs import BaseModelOutput

    with torch.no_grad():
        out = hf_model(
            input_ids=None,
            attention_mask=torch.ones(B, S, dtype=torch.long),
            encoder_outputs=BaseModelOutput(
                last_hidden_state=torch.from_numpy(enc)
            ),
            decoder_input_ids=torch.from_numpy(ids),
            return_dict=True,
        )
    return out.logits.numpy()


def test_logits_parity(hf_model, jax_model):
    model, variables, _ = jax_model
    enc = _enc_states(0)
    ids = np.random.default_rng(1).integers(0, VOCAB, (B, 7)).astype(np.int64)
    ref = _hf_forward(hf_model, enc, ids)
    got = model.apply(
        variables,
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(enc),
        jnp.ones((B, S), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-4)


def _hf_generate(hf_model, enc, **kw):
    from transformers.modeling_outputs import BaseModelOutput

    with torch.no_grad():
        out = hf_model.generate(
            encoder_outputs=BaseModelOutput(last_hidden_state=torch.from_numpy(enc)),
            attention_mask=torch.ones(B, S, dtype=torch.long),
            decoder_start_token_id=START,
            do_sample=False,
            **kw,
        )
    return out.numpy()


def _pad_to(arr, length, value):
    out = np.full((arr.shape[0], length), value, arr.dtype)
    out[:, : arr.shape[1]] = arr[:, :length]
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_greedy_parity(hf_model, jax_model, seed):
    model, variables, cfg = jax_model
    enc = _enc_states(seed)
    ref = _hf_generate(
        hf_model, enc, max_length=12, min_length=3, num_beams=1
    )
    dp = DecodeParams(
        max_length=12, min_length=3, num_beams=1,
        pad_token_id=PAD, eos_token_id=EOS, decoder_start_token_id=START,
    )
    gen = build_bart_generate_fn(model, dp, jit=False)
    got = np.asarray(gen(variables, jnp.asarray(enc)))
    np.testing.assert_array_equal(got, _pad_to(ref, 12, PAD), err_msg=f"seed={seed}")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_beam3_parity(hf_model, jax_model, seed):
    model, variables, cfg = jax_model
    enc = _enc_states(seed + 10)
    ref = _hf_generate(
        hf_model, enc, max_length=12, min_length=3, num_beams=3,
        early_stopping=True, length_penalty=1.0,
    )
    dp = DecodeParams(
        max_length=12, min_length=3, num_beams=3, early_stopping=True,
        length_penalty=1.0, pad_token_id=PAD, eos_token_id=EOS,
        decoder_start_token_id=START,
    )
    gen = build_bart_generate_fn(model, dp, jit=False)
    got = np.asarray(gen(variables, jnp.asarray(enc)))
    np.testing.assert_array_equal(got, _pad_to(ref, 12, PAD), err_msg=f"seed={seed}")


def test_beam_with_length_penalty_and_forced_eos(hf_model, jax_model):
    model, variables, cfg = jax_model
    enc = _enc_states(42)
    ref = _hf_generate(
        hf_model, enc, max_length=10, min_length=2, num_beams=3,
        early_stopping=True, length_penalty=2.0, forced_eos_token_id=EOS,
    )
    dp = DecodeParams(
        max_length=10, min_length=2, num_beams=3, early_stopping=True,
        length_penalty=2.0, pad_token_id=PAD, eos_token_id=EOS,
        decoder_start_token_id=START, forced_eos_token_id=EOS,
    )
    gen = build_bart_generate_fn(model, dp, jit=False)
    got = np.asarray(gen(variables, jnp.asarray(enc)))
    np.testing.assert_array_equal(got, _pad_to(ref, 10, PAD))
