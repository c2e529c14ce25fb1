"""Assembled EEG→text model (reference: ``main_model/src/models/eeg_model.py``).

``BrainRegionEncoder`` → Linear+LayerNorm projection (``eeg_to_bart``,
bart_decoder.py:24-27) → pseudo-encoder tiling → ``BartDecoderModel``.
The forward returns logits (and optionally the fused EEG feature, which the
composite anti-collapse loss consumes); the loss lives in ``training.losses``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .bart import BartDecoderModel, pseudo_encoder_sequence
from .brain_encoder import BrainRegionEncoder


class EEGDecodingModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        self.brain_encoder = BrainRegionEncoder(self.cfg.brain_encoder)
        self.eeg_to_bart_fc = nn.Dense(self.cfg.bart.d_model, name="eeg_to_bart_fc")
        self.eeg_to_bart_ln = nn.LayerNorm(name="eeg_to_bart_ln")
        self.bart = BartDecoderModel(self.cfg.bart)

    # ------------------------------------------------------------------
    def encode(self, eeg, channel_mask=None, *, train: bool = False):
        """EEG → (fused feature (B, h), pseudo-encoder states (B, S, d))."""
        feat = self.brain_encoder(eeg, channel_mask, train=train)
        proj = self.eeg_to_bart_ln(self.eeg_to_bart_fc(feat))
        enc = pseudo_encoder_sequence(proj, self.cfg.bart.encoder_layers)
        return feat, enc

    def __call__(
        self,
        eeg,
        decoder_input_ids,
        channel_mask=None,
        *,
        train: bool = False,
        return_features: bool = False,
        return_aux: bool = False,
    ):
        feat, enc = self.encode(eeg, channel_mask, train=train)
        mask = jnp.ones(enc.shape[:2], dtype=jnp.int32)
        if return_aux:
            logits, hidden = self.bart(
                decoder_input_ids, enc, mask, train=train, return_hidden=True
            )
            return logits, {"features": feat, "hidden": hidden}
        logits = self.bart(decoder_input_ids, enc, mask, train=train)
        if return_features:
            return logits, feat
        return logits

    # ------------------------------------------------------------------
    def decode_step(self, token, positions, enc, caches, *, train: bool = False):
        """One incremental decode step: ``token`` (B,1) → (logits (B,1,V), caches)."""
        mask = jnp.ones(enc.shape[:2], dtype=jnp.int32)
        return self.bart(
            token, enc, mask, positions=positions, caches=caches, train=train
        )

    def cross_consts(self, enc):
        """Per-layer constant cross-attention outputs for the TILED
        pseudo-encoder ``enc`` (B, S, d) — softmax attention over identical
        positions is the identity on V, so the whole cross-attention block
        is a per-generate constant (bart.py specialization notes)."""
        return self.bart.cross_attn_const(enc[:, 0])

    def decode_step_const(self, token, positions, cross_consts, caches,
                          *, train: bool = False):
        """Decode step with hoisted cross-attention constants: no
        cross-attention (or encoder states) inside the decode loop at all."""
        return self.bart(
            token, positions=positions, caches=caches,
            cross_consts=cross_consts, train=train,
        )

    def init_cache(self, batch: int, max_length: int, dtype=jnp.float32):
        # built from config (setup fields are unavailable outside apply)
        bc = self.cfg.bart
        hd = bc.d_model // bc.num_heads
        return [
            {
                "k": jnp.zeros((batch, bc.num_heads, max_length, hd), dtype),
                "v": jnp.zeros((batch, bc.num_heads, max_length, hd), dtype),
                "index": 0,
            }
            for _ in range(bc.decoder_layers)
        ]
