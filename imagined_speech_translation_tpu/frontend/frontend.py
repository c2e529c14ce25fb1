"""The fused signal chain: bandpass → notch → common-average re-reference →
(optional robust scaling) → STFT log-spectrogram, one jitted program.

This replaces the preprocessing the reference delegates to the upstream
Chisco pipeline (SURVEY.md §2.8) and is the numerator of the BASELINE
"EEG windows/sec/chip" metric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FrontendConfig
from .filters import (
    design_bandpass,
    design_notch,
    sosfilt_channels,
    sosfilt_pallas,
)
from .stft import log_spectrogram


def common_average_reference(x: jax.Array, channel_mask=None) -> jax.Array:
    """Subtract the cross-channel mean at each timepoint; ``channel_mask``
    (over the -2 axis) excludes padded channels from the average."""
    if channel_mask is None:
        return x - x.mean(axis=-2, keepdims=True)
    m = channel_mask.astype(x.dtype)[..., :, None]
    mean = (x * m).sum(axis=-2, keepdims=True) / jnp.maximum(
        m.sum(axis=-2, keepdims=True), 1.0
    )
    return jnp.where(m > 0, x - mean, x)


class SignalFrontend:
    """Host-designed filters + device-side fused preprocessing.

    ``preprocess``: (..., C, T) float32 → filtered, re-referenced signal.
    ``features``:   adds the STFT log-spectrogram → (..., C, F, bins).
    Both are jittable and vmap/pjit-friendly (pure functions of arrays).
    """

    def __init__(self, cfg: FrontendConfig | None = None):
        self.cfg = cfg or FrontendConfig()
        c = self.cfg
        self.sos_bandpass = design_bandpass(
            c.bandpass_low_hz, c.bandpass_high_hz, c.sample_rate_hz, c.bandpass_order
        ).astype(np.float32)
        self.sos_notch = design_notch(c.notch_hz, c.notch_q, c.sample_rate_hz).astype(
            np.float32
        )

    # ------------------------------------------------------------------
    def preprocess(self, x: jax.Array, channel_mask=None) -> jax.Array:
        # TPU: one-pass sequential Pallas IIR (channels on lanes) — the
        # associative scan's (T,2,2) transition traffic cost 195 of the
        # 368 ms decode batch (docs/PERFORMANCE.md); other backends keep
        # the depth-parallel scan.
        if jax.default_backend() in ("tpu", "axon"):
            y = sosfilt_pallas([self.sos_bandpass, self.sos_notch], x)
        else:
            y = sosfilt_channels([self.sos_bandpass, self.sos_notch], x)
        if self.cfg.car:
            y = common_average_reference(y, channel_mask)
        return y

    def features(self, x: jax.Array, channel_mask=None) -> jax.Array:
        y = self.preprocess(x, channel_mask)
        c = self.cfg
        return log_spectrogram(
            y, nperseg=c.stft_nperseg, hop=c.stft_hop, window=c.stft_window,
            eps=c.log_eps,
        )

    def jit_preprocess(self):
        return jax.jit(self.preprocess)

    def jit_features(self):
        return jax.jit(self.features)
