"""STFT log-spectrogram featurization (device-side, batched).

Framing + Hann window + rFFT over the last axis; magnitude/log features.
Numerics are validated in tests against a float64 numpy oracle and
``scipy.signal.stft`` (boundary=None, padded=False, scaling-free window).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sps


def get_window(name: str, nperseg: int) -> np.ndarray:
    return sps.get_window(name, nperseg, fftbins=True).astype(np.float64)


def frame_signal(x: jax.Array, nperseg: int, hop: int) -> jax.Array:
    """``(..., T)`` → ``(..., F, nperseg)`` frames with hop ``hop``
    (no padding: F = 1 + (T - nperseg)//hop)."""
    t = x.shape[-1]
    n_frames = 1 + (t - nperseg) // hop
    if n_frames <= 0:
        raise ValueError(f"signal length {t} < nperseg {nperseg}")
    idx = (
        jnp.arange(n_frames)[:, None] * hop + jnp.arange(nperseg)[None, :]
    )  # (F, nperseg)
    return x[..., idx]


def stft_magnitude(
    x: jax.Array, *, nperseg: int, hop: int, window: str = "hann"
) -> jax.Array:
    """``(..., T)`` → ``(..., F, nperseg//2 + 1)`` magnitude spectrogram."""
    win = jnp.asarray(get_window(window, nperseg), x.dtype)
    frames = frame_signal(x, nperseg, hop) * win
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.abs(spec)


def log_spectrogram(
    x: jax.Array, *, nperseg: int, hop: int, window: str = "hann", eps: float = 1e-10
) -> jax.Array:
    """Log-power spectrogram: ``log(|STFT|^2 + eps)``."""
    mag = stft_magnitude(x, nperseg=nperseg, hop=hop, window=window)
    return jnp.log(jnp.square(mag) + eps)
