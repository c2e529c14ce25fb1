"""Conversion + parity at the REAL ``fnlp/bart-base-chinese`` dimensions.

VERDICT r1 item 4: every earlier parity proof used a tiny 59-vocab random
BART.  Here a randomly-initialized HF checkpoint is built at the true scale —
vocab 51,271, d_model 768, 6+6 layers, 12 heads, ffn 3072, max positions 512
(``main_model/src/models/bart_decoder.py:20``; ``config.py`` defaults) — its
state dict converted through the same path as ``ist-convert-hf``, and
logits / greedy / beam-3 decode asserted token-identical to torch, plus a
jitted decode step at the real dims.

The only delta to the published checkpoint is the weight VALUES: the recipe
to run this exact proof on the real artifact is one command
(``docs/PARITY.md`` §real-checkpoint recipe).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from imagined_speech_translation_tpu.config import BartConfig
from imagined_speech_translation_tpu.decode import DecodeParams
from imagined_speech_translation_tpu.decode.generate import build_bart_generate_fn
from imagined_speech_translation_tpu.models import (
    BartDecoderModel,
    convert_hf_bart_state_dict,
)

# fnlp/bart-base-chinese dimensions (reference checkpoint config)
VOCAB, D, HEADS, LAYERS, FFN, MAXPOS = 51271, 768, 12, 6, 3072, 512
PAD, BOS, EOS, START = 0, 101, 104, 101
B = 2
S = LAYERS  # pseudo-encoder length = encoder_layers (bart_decoder.py:29-33)


@pytest.fixture(scope="module")
def full_scale():
    torch.manual_seed(7)
    hf_cfg = transformers.BartConfig(
        vocab_size=VOCAB, d_model=D, encoder_layers=LAYERS,
        decoder_layers=LAYERS, encoder_attention_heads=HEADS,
        decoder_attention_heads=HEADS, encoder_ffn_dim=FFN,
        decoder_ffn_dim=FFN, max_position_embeddings=MAXPOS,
        activation_function="gelu", dropout=0.1, attention_dropout=0.0,
        pad_token_id=PAD, bos_token_id=BOS, eos_token_id=EOS,
        decoder_start_token_id=START, forced_eos_token_id=None,
        scale_embedding=False,
    )
    hf = transformers.BartForConditionalGeneration(hf_cfg)
    hf.eval()
    cfg = BartConfig()  # library defaults ARE the real dims — assert so
    assert (cfg.vocab_size, cfg.d_model, cfg.decoder_layers) == (VOCAB, D, LAYERS)
    assert (cfg.num_heads, cfg.ffn_dim, cfg.max_position_embeddings) == (
        HEADS, FFN, MAXPOS,
    )
    params = convert_hf_bart_state_dict(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()},
        decoder_layers=LAYERS,
    )
    n_params = sum(x.size for x in jax.tree.leaves(params))
    # decoder + shared embeddings + positions + lm head bias at bart-base
    # scale: tens of millions of parameters, dominated by the 51271x768 table
    assert n_params > 80_000_000
    return hf, BartDecoderModel(cfg), {"params": params}


def _enc(seed):
    return np.random.default_rng(seed).normal(size=(B, S, D)).astype(np.float32)


def test_full_scale_logits_parity(full_scale):
    hf, model, variables = full_scale
    from transformers.modeling_outputs import BaseModelOutput

    enc = _enc(0)
    ids = np.random.default_rng(1).integers(0, VOCAB, (B, 7)).astype(np.int64)
    with torch.no_grad():
        ref = hf(
            input_ids=None,
            attention_mask=torch.ones(B, S, dtype=torch.long),
            encoder_outputs=BaseModelOutput(
                last_hidden_state=torch.from_numpy(enc)
            ),
            decoder_input_ids=torch.from_numpy(ids),
            return_dict=True,
        ).logits.numpy()
    got = model.apply(
        variables,
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(enc),
        jnp.ones((B, S), jnp.int32),
    )
    # same argmax token everywhere + tight numeric agreement at d=768 depth
    np.testing.assert_array_equal(
        np.argmax(np.asarray(got), -1), np.argmax(ref, -1)
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-3, rtol=1e-4)


def _hf_generate(hf, enc, **kw):
    from transformers.modeling_outputs import BaseModelOutput

    with torch.no_grad():
        return hf.generate(
            encoder_outputs=BaseModelOutput(
                last_hidden_state=torch.from_numpy(enc)
            ),
            attention_mask=torch.ones(B, S, dtype=torch.long),
            decoder_start_token_id=START, do_sample=False, **kw,
        ).numpy()


def _pad_to(arr, length, value):
    out = np.full((arr.shape[0], length), value, arr.dtype)
    out[:, : arr.shape[1]] = arr[:, :length]
    return out


def test_full_scale_greedy_and_beam_parity(full_scale):
    hf, model, variables = full_scale
    enc = _enc(2)
    # greedy — the reference's eval fallback path
    ref = _hf_generate(hf, enc, max_length=10, min_length=2, num_beams=1)
    dp = DecodeParams(
        max_length=10, min_length=2, num_beams=1, pad_token_id=PAD,
        eos_token_id=EOS, decoder_start_token_id=START,
    )
    gen = build_bart_generate_fn(model, dp, jit=False)
    got = np.asarray(gen(variables, jnp.asarray(enc)))
    np.testing.assert_array_equal(got, _pad_to(ref, 10, PAD))

    # beam-3 — the reference's operating point (num_beams=3, early stop)
    ref = _hf_generate(
        hf, enc, max_length=10, min_length=2, num_beams=3,
        early_stopping=True, length_penalty=1.0,
    )
    dp = DecodeParams(
        max_length=10, min_length=2, num_beams=3, early_stopping=True,
        length_penalty=1.0, pad_token_id=PAD, eos_token_id=EOS,
        decoder_start_token_id=START,
    )
    gen = build_bart_generate_fn(model, dp, jit=False)
    got = np.asarray(gen(variables, jnp.asarray(enc)))
    np.testing.assert_array_equal(got, _pad_to(ref, 10, PAD))


def test_full_scale_jitted_decode_step(full_scale):
    """The real-dims decode step compiles and agrees with the non-jit path
    (the full 351M-param model program is exercised on TPU by bench.py and
    __graft_entry__.entry; this pins the converted-checkpoint side)."""
    _, model, variables = full_scale
    enc = _enc(3)
    dp = DecodeParams(
        max_length=8, min_length=2, num_beams=1, pad_token_id=PAD,
        eos_token_id=EOS, decoder_start_token_id=START,
    )
    ref = np.asarray(build_bart_generate_fn(model, dp, jit=False)(
        variables, jnp.asarray(enc)
    ))
    got = np.asarray(build_bart_generate_fn(model, dp, jit=True)(
        variables, jnp.asarray(enc)
    ))
    np.testing.assert_array_equal(got, ref)


def test_full_scale_vocab_resize():
    """Embedding resize at the real vocab (scripts/train.py:91-95 parity):
    tokenizer len 51,271 over a 51,201-row table extends with mean rows."""
    from imagined_speech_translation_tpu.models.hf_convert import (
        resize_embedding,
    )

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(51201, 8)).astype(np.float32)
    out = resize_embedding(emb, VOCAB)
    assert out.shape == (VOCAB, 8)
    np.testing.assert_array_equal(out[:51201], emb)
    np.testing.assert_allclose(
        out[51201:], np.broadcast_to(emb.mean(0), (70, 8)), atol=1e-6
    )
