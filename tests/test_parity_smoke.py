"""Default-tier decode-parity smoke (seconds, not minutes).

The load-bearing parity suites (``test_bart_parity``, ``test_parallel``,
``test_full_scale_parity``) live in the heavy tier, so a decode regression
could previously land without plain ``pytest tests/`` noticing.  This module
keeps one cheap instance of each guarantee in the DEFAULT tier:

* greedy HF token identity through the weight converter (tiny dims, 1 seed);
* beam-3 HF token identity with a non-trivial length penalty — deliberately
  breaking the ``sum_logprob / n**length_penalty`` normalization in
  ``decode/search.py`` fails here (reference semantics:
  ``main_model/src/models/bart_decoder.py:66-78``);
* DP-decode identity: the mesh-sharded serving program equals the unsharded
  one, windows → text.
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

VOCAB, D, HEADS, LAYERS, FFN, MAXPOS = 61, 32, 4, 2, 64, 24
PAD, BOS, EOS, START = 0, 1, 2, 2
B, S = 2, 3


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(7)
    hf_cfg = transformers.BartConfig(
        vocab_size=VOCAB, d_model=D,
        encoder_layers=LAYERS, decoder_layers=LAYERS,
        encoder_attention_heads=HEADS, decoder_attention_heads=HEADS,
        encoder_ffn_dim=FFN, decoder_ffn_dim=FFN,
        max_position_embeddings=MAXPOS,
        activation_function="gelu", dropout=0.1, attention_dropout=0.0,
        pad_token_id=PAD, bos_token_id=BOS, eos_token_id=EOS,
        decoder_start_token_id=START, forced_eos_token_id=None,
        scale_embedding=False,
    )
    hf = transformers.BartForConditionalGeneration(hf_cfg)
    hf.eval()
    cfg = BartConfig(
        vocab_size=VOCAB, d_model=D,
        encoder_layers=LAYERS, decoder_layers=LAYERS,
        num_heads=HEADS, ffn_dim=FFN, max_position_embeddings=MAXPOS,
        pad_token_id=PAD, bos_token_id=BOS, eos_token_id=EOS,
        decoder_start_token_id=START,
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
            encoder_outputs=BaseModelOutput(last_hidden_state=torch.from_numpy(enc)),
            attention_mask=torch.ones(B, S, dtype=torch.long),
            decoder_start_token_id=START, do_sample=False, **kw,
        )
    return out.numpy()


def _pad_to(arr, length, value):
    out = np.full((arr.shape[0], length), value, arr.dtype)
    out[:, : arr.shape[1]] = arr[:, :length]
    return out


def test_greedy_hf_identity_smoke(models):
    hf, model, variables = models
    enc = np.random.default_rng(0).normal(size=(B, S, D)).astype(np.float32)
    ref = _hf_generate(hf, enc, max_length=10, min_length=2, num_beams=1)
    dp = DecodeParams(
        max_length=10, min_length=2, num_beams=1,
        pad_token_id=PAD, eos_token_id=EOS, decoder_start_token_id=START,
    )
    gen = build_bart_generate_fn(model, dp, jit=False)
    got = np.asarray(gen(variables, jnp.asarray(enc)))
    np.testing.assert_array_equal(got, _pad_to(ref, 10, PAD))


def test_beam_length_penalty_hf_identity_smoke(models):
    """Beam-3 with length_penalty=2.0: the finished-hypothesis score
    normalization and early-stopping comparison must match HF exactly."""
    hf, model, variables = models
    enc = np.random.default_rng(3).normal(size=(B, S, D)).astype(np.float32)
    ref = _hf_generate(
        hf, enc, max_length=10, min_length=2, num_beams=3,
        early_stopping=True, length_penalty=2.0,
    )
    dp = DecodeParams(
        max_length=10, min_length=2, num_beams=3, early_stopping=True,
        length_penalty=2.0, pad_token_id=PAD, eos_token_id=EOS,
        decoder_start_token_id=START,
    )
    gen = build_bart_generate_fn(model, dp, jit=False)
    got = np.asarray(gen(variables, jnp.asarray(enc)))
    np.testing.assert_array_equal(got, _pad_to(ref, 10, PAD))


def test_beam_length_penalty_flips_winner():
    """Direct pin on the finished-hypothesis normalization
    ``sum_logprob / n_generated**length_penalty`` (decode/search.py): a
    handcrafted position-dependent LM yields a short (n=2) and a long (n=4)
    finished hypothesis whose ranking provably flips between
    length_penalty 1.0 and 2.0.  Any perturbation of the exponent or the
    length bookkeeping changes one of the two outcomes.

    HF-parity tests can miss this: untrained models finish all beams at the
    same length, making the penalty decision-irrelevant.
    """
    from imagined_speech_translation_tpu.decode.search import beam_search

    PAD_, START_, EOS_, A_, B_, C_ = 0, 1, 2, 3, 4, 5
    V, K, L = 6, 3, 6
    NEG = -30.0
    table = np.full((L, V), NEG, np.float32)
    table[0, [A_, B_]] = [-0.30, -0.35]          # gen1: A or B
    table[1, [EOS_, A_]] = [-0.70, -0.60]        # gen2: finish short, or extend
    table[2, [A_, B_, C_]] = [-0.9, -1.0, -1.1]  # gen3: costly continuation
    table[3, [EOS_, A_, B_]] = [-0.9, -1.0, -1.1]  # gen4: finish long
    table[4, EOS_] = 0.0                         # drain leftovers
    table[5, EOS_] = 0.0
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(table), axis=-1))

    # Sanity on the construction: short wins raw-per-length, long wins under
    # a strong penalty (both margins > 0.1 nats).
    short = logp[0, A_] + logp[1, EOS_]               # A EOS, n=2
    long = logp[0, A_] + logp[1, A_] + logp[2, A_] + logp[3, EOS_]  # n=4
    assert short / 2**1.0 > long / 4**1.0 + 0.1
    assert long / 4**2.0 > short / 2**2.0 + 0.1

    jtable = jnp.asarray(table)

    def step_fn(last, pos, caches):
        return jtable[pos[:, 0]][:, None, :], caches

    def run(lp):
        p = DecodeParams(
            max_length=L, min_length=2, num_beams=K, early_stopping=True,
            length_penalty=lp, pad_token_id=PAD_, eos_token_id=EOS_,
            decoder_start_token_id=START_,
        )
        caches = jnp.zeros((1 * K, 1))
        return np.asarray(beam_search(step_fn, caches, 1, p))[0].tolist()

    assert run(2.0) == [START_, A_, A_, A_, EOS_, PAD_]
    assert run(1.0) == [START_, A_, EOS_, PAD_, PAD_, PAD_]


def test_dp_decode_identity_smoke(tmp_path, eight_devices):
    """Mesh-sharded serving decode (windows → text) equals unsharded."""
    from imagined_speech_translation_tpu.cli.serve import build_decode_fn
    from imagined_speech_translation_tpu.data.regions import RegionSpec
    from imagined_speech_translation_tpu.data.synthetic import (
        make_synthetic_montage,
    )
    from imagined_speech_translation_tpu.parallel import make_mesh
    from tests.helpers import tiny_config, tiny_tokenizer

    from imagined_speech_translation_tpu.models import EEGDecodingModel

    import dataclasses

    tok = tiny_tokenizer()
    cfg = tiny_config(tok.vocab_size)
    # Compile cost rules the default tier: 1-layer BART + greedy, short
    # horizon keeps the two full-pipeline compiles (sharded + unsharded)
    # within seconds while still covering the mesh fan-out path.
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            bart=dataclasses.replace(
                cfg.model.bart, encoder_layers=1, decoder_layers=1
            ),
        ),
        generation=dataclasses.replace(
            cfg.generation, num_beams=1, max_length=6
        ),
    )
    labels = make_synthetic_montage(tmp_path / "m.csv")
    spec = RegionSpec.from_channel_names(labels)

    model = EEGDecodingModel(cfg.model)
    mask = jnp.asarray(spec.channel_mask)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((2, 4, 16, cfg.data.n_timepoints), jnp.float32),
        jnp.zeros((2, 4), jnp.int32),
        mask,
    )

    ref_fn = build_decode_fn(cfg, tok, spec, variables)
    dp_fn = build_decode_fn(cfg, tok, spec, variables, mesh=make_mesh(8, 1))

    n_ch = int(spec.gather_indices.max() + 1)
    windows = (
        np.random.default_rng(5)
        .normal(size=(8, n_ch, cfg.data.n_timepoints))
        .astype(np.float32)
    )
    ref_out = ref_fn(windows)
    assert dp_fn(windows) == ref_out

    # compute_dtype plumbing: float32 is exactly the default path; bfloat16
    # (the serving config for the chip) builds, runs, and keeps the IIR
    # preprocess + fold in f32 so outputs stay sane on a tiny random model.
    f32_fn = build_decode_fn(
        cfg, tok, spec, variables, compute_dtype=jnp.float32
    )
    assert f32_fn(windows) == ref_out
    bf16_fn = build_decode_fn(
        cfg, tok, spec, variables, compute_dtype=jnp.bfloat16
    )
    bf16_out = bf16_fn(windows)
    assert len(bf16_out) == len(ref_out)
    assert all(isinstance(t, str) for t in bf16_out)
