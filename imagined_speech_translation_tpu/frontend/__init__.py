"""On-chip EEG signal frontend.

The reference consumes Chisco's already-preprocessed derivatives
(SURVEY.md §2.8); the BASELINE north star makes the signal chain ours:
bandpass/notch IIR filtering, common-average re-referencing, windowing and
STFT log-spectrogram featurization run batched on the TPU as one fused XLA
program."""

from .filters import (  # noqa: F401
    design_bandpass,
    design_notch,
    sosfilt,
    sosfilt_channels,
)
from .stft import frame_signal, log_spectrogram, stft_magnitude  # noqa: F401
from .frontend import SignalFrontend, common_average_reference  # noqa: F401
