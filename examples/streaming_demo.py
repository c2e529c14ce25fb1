"""Streaming end-to-end demo: synthetic EEG device stream → wake gate →
windowed preprocess → beam decode → text, with latency stats.

Runs entirely in-process with a tiny random-weight model (no data downloads);
shows the product path of SURVEY.md §3.5 on whatever backend is active.

    python examples/streaming_demo.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument(
        "--source",
        choices=("noise", "device"),
        default="noise",
        help="'device' streams from the native 6x-ADS1299 firmware twin "
        "(device_native/) instead of host-side numpy noise",
    )
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from imagined_speech_translation_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from imagined_speech_translation_tpu.config import (
        BartConfig, BrainEncoderConfig, Config, DataConfig, FrontendConfig,
        ModelConfig, RegionEncoderConfig,
    )
    from imagined_speech_translation_tpu.data import ChineseCharTokenizer
    from imagined_speech_translation_tpu.data.regions import RegionSpec
    from imagined_speech_translation_tpu.data.synthetic import make_synthetic_montage
    from imagined_speech_translation_tpu.runtime import (
        DecodePipeline, RingBuffer, ThresholdWakeGate, Windower,
    )
    from imagined_speech_translation_tpu.cli.serve import build_decode_fn
    import tempfile, os

    vocab = (
        ["[PAD]"] + [f"[unused{i}]" for i in range(99)]
        + ["[UNK]", "[CLS]", "[SEP]", "[MASK]", "[EOS]"]
        + list("我想喝水请帮打开窗户今天气很好")
    )
    tok = ChineseCharTokenizer(list(dict.fromkeys(vocab)), eos_token="[EOS]")
    T = 256
    h = 64
    cfg = Config(
        data=DataConfig(n_timepoints=T, max_length=12),
        frontend=FrontendConfig(stft_nperseg=64, stft_hop=32),
        model=ModelConfig(
            hidden_dim=h,
            brain_encoder=BrainEncoderConfig(
                hidden_dim=h, fusion_heads=4, cross_region_heads=4,
                region_encoder=RegionEncoderConfig(
                    conv_channels=(16, 24, 32, 48, 64), attn_heads=(4, 2, 2),
                    se_reduction=4,
                ),
            ),
            bart=BartConfig(
                vocab_size=tok.vocab_size, d_model=h, encoder_layers=3,
                decoder_layers=2, num_heads=4, ffn_dim=128,
                max_position_embeddings=32, pad_token_id=tok.pad_token_id,
                bos_token_id=tok.bos_token_id, eos_token_id=tok.sep_token_id,
                decoder_start_token_id=tok.bos_token_id,
            ),
        ),
    ).validate()

    with tempfile.TemporaryDirectory() as d:
        # the device twin exposes exactly the 48 electrode channels, so its
        # montage has no filler rows; the noise source mimics the Chisco
        # 125-row layout (48 mapped, interleaved)
        n_rows = 48 if args.source == "device" else 125
        labels = make_synthetic_montage(os.path.join(d, "m.csv"), n_rows)
    spec = RegionSpec.from_channel_names(labels)
    n_ch = int(spec.gather_indices.max() + 1)

    from imagined_speech_translation_tpu.models import EEGDecodingModel

    model = EEGDecodingModel(cfg.model)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, 4, 16, T), jnp.float32),
        jnp.zeros((1, 4), jnp.int32),
        jnp.asarray(spec.channel_mask),
    )
    decode_fn = build_decode_fn(cfg, tok, spec, variables)

    print("warming up the decode program (first compile)...")
    t0 = time.time()
    decode_fn(np.zeros((1, n_ch, T), np.float32))
    print(f"  compiled in {time.time() - t0:.1f}s")

    ring = RingBuffer(n_ch, capacity=4 * T)
    pipe = DecodePipeline(
        windower=Windower(ring, window=T, hop=T),
        decode_fn=decode_fn,
        wake_gate=ThresholdWakeGate(0.05),
        max_batch=1,
    )

    board = None
    if args.source == "device":
        from imagined_speech_translation_tpu.device import NativeBoard

        board = NativeBoard(data_rate_sps=500, noise_seed=7, noise_uv=5.0)
        board.bring_up()
        print(
            f"device twin up: {board.n_channels}ch @ "
            f"{board.data_rate_sps} SPS (6x ADS1299, gain 24)"
        )

    print(f"streaming {args.chunks} chunks of ({n_ch}ch x {T // 4} samples)...")
    rng = np.random.default_rng(0)
    t0 = time.time()
    utterances = []
    for chunk in range(args.chunks):
        # alternate quiet (gated out) and active segments
        quiet = chunk % 4 == 3
        if board is not None:
            if quiet:  # inject near-silence at the electrodes
                board.feed(np.zeros((48, T // 4), np.float32))
            board.pump(T // 4)
            samples = board.drain(T // 4) / 100.0  # µV -> model input scale
        else:
            scale = 0.001 if quiet else 1.0
            samples = (rng.normal(size=(n_ch, T // 4)) * scale).astype(
                np.float32
            )
        for text in pipe.feed(samples):
            utterances.append(text)
            print(f"  [{time.time() - t0:6.2f}s] utterance: {text!r}")
    for text in pipe.flush():
        utterances.append(text)
        print(f"  [{time.time() - t0:6.2f}s] utterance (flush): {text!r}")

    stats = pipe.latency.summary()
    print(f"\ndecoded {len(utterances)} utterances")
    print(
        f"latency p50={stats['p50_ms']:.1f}ms p95={stats['p95_ms']:.1f}ms "
        f"mean={stats['mean_ms']:.1f}ms (n={stats['count']})"
    )


if __name__ == "__main__":
    main()
