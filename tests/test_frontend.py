"""Signal-frontend parity tests against scipy float64 oracles
(SURVEY.md §7 hard part 3: IIR numerics on TPU)."""

import numpy as np
import pytest
from scipy import signal as sps

import jax
import jax.numpy as jnp

from imagined_speech_translation_tpu.config import FrontendConfig
from imagined_speech_translation_tpu.frontend import (
    SignalFrontend,
    common_average_reference,
    design_bandpass,
    design_notch,
    frame_signal,
    log_spectrogram,
    sosfilt,
    stft_magnitude,
)


def _sig(shape, seed=0, fs=500.0):
    rng = np.random.default_rng(seed)
    t = np.arange(shape[-1]) / fs
    base = (
        np.sin(2 * np.pi * 10 * t)
        + 0.5 * np.sin(2 * np.pi * 50 * t)  # mains component
        + 0.2 * rng.normal(size=shape)
    )
    return base.astype(np.float32)


def test_sosfilt_matches_scipy_bandpass():
    sos = design_bandpass(0.5, 40.0, 500.0, order=4)
    x = _sig((8, 1651), seed=1)
    ref = sps.sosfilt(sos, x.astype(np.float64), axis=-1)
    got = np.asarray(sosfilt(sos.astype(np.float32), jnp.asarray(x)))
    # float32 vs float64 recurrence: relative tolerance on the signal scale
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-3 * scale)


def test_sosfilt_matches_scipy_notch():
    sos = design_notch(50.0, 30.0, 500.0)
    x = _sig((4, 1651), seed=2)
    ref = sps.sosfilt(sos, x.astype(np.float64), axis=-1)
    got = np.asarray(sosfilt(sos.astype(np.float32), jnp.asarray(x)))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=5e-3 * scale)


def test_notch_removes_mains():
    fs = 500.0
    t = np.arange(2048) / fs
    x = np.sin(2 * np.pi * 50 * t).astype(np.float32)[None]
    sos = design_notch(50.0, 30.0, fs)
    y = np.asarray(sosfilt(sos.astype(np.float32), jnp.asarray(x)))
    # steady-state mains power should drop by >20 dB
    assert np.abs(y[:, 1024:]).max() < 0.1 * np.abs(x[:, 1024:]).max()


def test_sosfilt_jits_and_batches():
    sos = design_bandpass(0.5, 40.0, 500.0).astype(np.float32)
    x = jnp.asarray(_sig((2, 48, 256), seed=3))
    f = jax.jit(lambda x: sosfilt(sos, x))
    y = f(x)
    assert y.shape == x.shape
    # per-row independence: same as filtering rows separately (float32 scan
    # reassociation differs slightly between batch shapes)
    y0 = np.asarray(sosfilt(sos, x[0, :1]))
    scale = np.abs(y0).max()
    np.testing.assert_allclose(np.asarray(y)[0, :1], y0, atol=2e-3 * scale)


def test_car_with_mask():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4))
    y = np.asarray(common_average_reference(x))
    np.testing.assert_allclose(y.sum(axis=1), np.zeros((1, 4)), atol=1e-5)
    mask = jnp.asarray([True, True, False])
    y2 = np.asarray(common_average_reference(x, mask))
    np.testing.assert_allclose(
        y2[:, :2].sum(axis=1), np.zeros((1, 4)), atol=1e-5
    )
    np.testing.assert_array_equal(y2[:, 2], np.asarray(x)[:, 2])  # untouched


def test_frame_signal_oracle():
    x = jnp.asarray(np.arange(20, dtype=np.float32))
    frames = np.asarray(frame_signal(x, nperseg=8, hop=4))
    assert frames.shape == (4, 8)
    np.testing.assert_array_equal(frames[0], np.arange(8))
    np.testing.assert_array_equal(frames[1], np.arange(4, 12))


def test_stft_matches_numpy_oracle():
    x = _sig((3, 512), seed=4)
    nperseg, hop = 128, 64
    win = sps.get_window("hann", nperseg, fftbins=True)
    # float64 oracle
    frames = np.stack(
        [x[:, i * hop : i * hop + nperseg] for i in range(1 + (512 - nperseg) // hop)],
        axis=1,
    ).astype(np.float64)
    ref = np.abs(np.fft.rfft(frames * win, axis=-1))
    got = np.asarray(stft_magnitude(jnp.asarray(x), nperseg=nperseg, hop=hop))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_stft_matches_scipy():
    x = _sig((2, 512), seed=5).astype(np.float64)
    nperseg, hop = 128, 64
    f, t, Z = sps.stft(
        x, fs=1.0, window="hann", nperseg=nperseg, noverlap=nperseg - hop,
        boundary=None, padded=False,
    )
    win = sps.get_window("hann", nperseg, fftbins=True)
    ref = np.abs(Z) * win.sum()  # undo scipy's 1/win.sum() scaling
    got = np.asarray(
        stft_magnitude(jnp.asarray(x, jnp.float32), nperseg=nperseg, hop=hop)
    )
    np.testing.assert_allclose(got, ref.transpose(0, 2, 1), atol=2e-3)


def test_full_frontend_pipeline():
    cfg = FrontendConfig(stft_nperseg=128, stft_hop=64)
    fe = SignalFrontend(cfg)
    x = jnp.asarray(_sig((2, 48, 1651), seed=6))
    y = fe.jit_preprocess()(x)
    assert y.shape == x.shape
    feats = fe.jit_features()(x)
    f_frames = 1 + (1651 - 128) // 64
    assert feats.shape == (2, 48, f_frames, 65)
    assert np.isfinite(np.asarray(feats)).all()
    # mains suppression: 50 Hz band power reduced vs raw
    raw_feats = np.asarray(
        log_spectrogram(x, nperseg=128, hop=64)
    )
    proc = np.asarray(feats)
    bin50 = round(50.0 / (500.0 / 128))
    assert proc[..., bin50].mean() < raw_feats[..., bin50].mean() - 2.0


def test_sosfilt_pallas_matches_scipy_interpret():
    """Sequential Pallas IIR kernel (interpret) vs scipy.sosfilt float64 —
    the TPU fast path for SignalFrontend.preprocess."""
    from scipy import signal as sps

    from imagined_speech_translation_tpu.frontend.filters import (
        design_bandpass,
        design_notch,
        sosfilt_channels,
        sosfilt_pallas,
    )

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 333)).astype(np.float32)
    bp = design_bandpass(0.5, 40.0, 500.0, 4)
    nt = design_notch(50.0, 30.0, 500.0)
    got = np.asarray(sosfilt_pallas([bp, nt], jnp.asarray(x), interpret=True))
    ref = sps.sosfilt(np.vstack([bp, nt]), x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(got, ref, atol=2e-4)
    # and agrees with the associative-scan path within float32 tolerance
    scan = np.asarray(sosfilt_channels([bp, nt], jnp.asarray(x)))
    np.testing.assert_allclose(got, scan, atol=2e-3)
