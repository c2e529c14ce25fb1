"""High-level generate: bind an ``EEGDecodingModel`` + decode params into one
jittable EEG→tokens function (the reference's ``model.generate`` /
``generate_from_eeg`` surface, ``main_model/src/models/eeg_model.py:39`` and
``bart_decoder.py:59-78``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .search import DecodeParams, beam_search, greedy_search


def build_generate_fn(model, dparams: DecodeParams, *, jit: bool = True):
    """Returns ``generate(variables, eeg, channel_mask) -> (B, max_length)``.

    Beam search when ``dparams.num_beams > 1`` (reference default beam-3),
    greedy otherwise.  The returned callable is jitted over static shapes.
    """
    K = dparams.num_beams

    def generate(variables, eeg, channel_mask=None):
        b = eeg.shape[0]
        _, enc = model.apply(variables, eeg, channel_mask, method="encode")
        if K > 1:
            enc_x = jnp.repeat(enc, K, axis=0)  # (B*K, S, d)
            caches = model.init_cache(b * K, dparams.max_length, enc.dtype)
        else:
            enc_x = enc
            caches = model.init_cache(b, dparams.max_length, enc.dtype)
        # the pseudo-encoder is tiled: hoist the whole cross-attention out of
        # the decode loop as per-layer constants (exact-by-construction — see
        # bart.py decode-path specialization notes)
        consts = model.apply(variables, enc_x, method="cross_consts")

        def step(tokens, positions, caches):
            return model.apply(
                variables, tokens, positions, consts, caches,
                method="decode_step_const",
            )

        if K > 1:
            return beam_search(step, caches, b, dparams)
        return greedy_search(step, caches, b, dparams)

    return jax.jit(generate) if jit else generate


def build_bart_generate_fn(model, dparams: DecodeParams, *, jit: bool = True):
    """Same, for a bare ``BartDecoderModel`` conditioned on precomputed
    encoder states — used by parity tests and serving."""
    K = dparams.num_beams

    def generate(variables, encoder_hidden, encoder_mask=None):
        b = encoder_hidden.shape[0]
        if encoder_mask is None:
            encoder_mask = jnp.ones(encoder_hidden.shape[:2], jnp.int32)
        if K > 1:
            enc_x = jnp.repeat(encoder_hidden, K, axis=0)
            mask_x = jnp.repeat(encoder_mask, K, axis=0)
            caches = model.init_cache(b * K, dparams.max_length, encoder_hidden.dtype)
        else:
            enc_x, mask_x = encoder_hidden, encoder_mask
            caches = model.init_cache(b, dparams.max_length, encoder_hidden.dtype)
        # cross-attention K/V are projections of the fixed encoder states:
        # compute once, not once per decode step (bit-identical outputs)
        cross_kvs = model.apply(variables, enc_x, method="cross_attn_kv")

        def step(tokens, positions, caches):
            return model.apply(
                variables, tokens, enc_x, mask_x, positions=positions,
                caches=caches, cross_kvs=cross_kvs,
            )

        if K > 1:
            return beam_search(step, caches, b, dparams)
        return greedy_search(step, caches, b, dparams)

    return jax.jit(generate) if jit else generate
