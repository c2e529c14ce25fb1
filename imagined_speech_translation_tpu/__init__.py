"""imagined_speech_translation_tpu — a TPU-native imagined-speech (EEG -> text) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`alexsteinerr/imagined-speech-translation` (see /root/reference):

* ``data``       — Chisco pickle data plane, montage/region mapping, robust
                   normalization, augmentation, host->device feed
                   (reference: main_model/src/data/*).
* ``frontend``   — fused Pallas signal frontend: IIR bandpass/notch, common
                   average re-reference, STFT/log-spectrogram (the reference
                   consumes pre-processed Chisco derivatives; here the signal
                   chain is on-chip).
* ``models``     — brain-region CNN+attention encoder, cross-region fusion,
                   from-scratch JAX BART seq2seq decoder and tokenizer
                   (reference: main_model/src/models/*).
* ``ops``        — Pallas TPU kernels (flash attention, fused norm) with jnp
                   reference fallbacks.
* ``decode``     — XLA-compiled greedy and beam-search decoding
                   (reference: HF `generate`, main_model/src/models/bart_decoder.py:59).
* ``training``   — optax multi-group optimizer, composite anti-collapse loss,
                   pjit data-parallel train step, orbax checkpoints
                   (reference: main_model/src/training/*, scripts/train.py).
* ``evaluation`` — Chinese BLEU/ROUGE/token-overlap evaluator
                   (reference: main_model/src/evaluation/evaluator.py).
* ``parallel``   — device mesh + sharding rules (the reference is single-GPU;
                   this is the TPU-native scale-out layer).
* ``runtime``    — serving stack: websocket framing, function-call DSL parser,
                   session registry, streaming wake->window->decode pipeline
                   (reference: wss/, dart_wss/).
* ``wake``       — bindings to the native C++ wake-event detector library
                   (reference: wake_model/) plus a JAX twin.
"""

__version__ = "0.1.0"

from . import config as config  # noqa: F401

__all__ = ["config", "__version__"]
