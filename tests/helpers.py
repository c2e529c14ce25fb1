"""Shared tiny fixtures: tokenizer, config, synthetic dataset."""

import numpy as np

from imagined_speech_translation_tpu.config import (
    AugmentationConfig,
    BartConfig,
    BrainEncoderConfig,
    Config,
    DataConfig,
    GenerationConfig,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    RegionEncoderConfig,
    TrainingConfig,
)
from imagined_speech_translation_tpu.data import (
    ChineseCharTokenizer,
    EEGTextDataset,
    make_synthetic_corpus,
    make_synthetic_montage,
)

TINY_VOCAB = (
    ["[PAD]"]
    + [f"[unused{i}]" for i in range(99)]
    + ["[UNK]", "[CLS]", "[SEP]", "[MASK]", "[EOS]"]
    + list(
        "我想喝水请帮打开窗户今天气很好需要休息一下谢的助们去公园散步把音乐关掉晚饭吃什么数据样本"
    )
    + ["hello", "##llo", "he", "world", ",", "。"]
)


def tiny_tokenizer() -> ChineseCharTokenizer:
    vocab = list(dict.fromkeys(TINY_VOCAB))
    return ChineseCharTokenizer(vocab, eos_token="[EOS]")


def tiny_config(vocab_size: int, *, n_timepoints: int = 64, max_length: int = 10) -> Config:
    h = 48
    tok = tiny_tokenizer()
    return Config(
        data=DataConfig(
            n_timepoints=n_timepoints,
            max_length=max_length,
            augmentation=AugmentationConfig(enabled=False),
        ),
        model=ModelConfig(
            hidden_dim=h,
            max_region_channels=16,
            region_channel_counts=(16, 9, 11, 12),
            brain_encoder=BrainEncoderConfig(
                hidden_dim=h,
                fusion_heads=4,
                cross_region_heads=4,
                region_encoder=RegionEncoderConfig(
                    conv_channels=(8, 16, 24, 32, 48),
                    attn_heads=(4, 2, 2),
                    se_reduction=4,
                ),
            ),
            bart=BartConfig(
                vocab_size=vocab_size,
                d_model=h,
                encoder_layers=3,
                decoder_layers=2,
                num_heads=4,
                ffn_dim=96,
                max_position_embeddings=32,
                pad_token_id=tok.pad_token_id,
                bos_token_id=tok.bos_token_id,
                eos_token_id=tok.eos_token_id,
                decoder_start_token_id=tok.bos_token_id,
            ),
        ),
        generation=GenerationConfig(max_length=max_length, min_length=2, num_beams=2),
        training=TrainingConfig(
            num_epochs=2,
            batch_size=2,
            grad_accum_steps=2,
            eval_batch_size=2,
            log_every_steps=1,
            mixed_precision=False,  # fp32 CPU oracle (bf16 is the TPU default)
            optimizer=OptimizerConfig(warmup_steps=2),
            loss=LossConfig(bow_vocab_size=16),
        ),
    ).validate()


def build_dataset(tmp_path, tokenizer, cfg: Config, *, n_files=3, samples_per_file=4):
    make_synthetic_corpus(
        tmp_path / "data",
        n_files=n_files,
        samples_per_file=samples_per_file,
        n_timepoints=cfg.data.n_timepoints,
    )
    make_synthetic_montage(tmp_path / "montage.csv")
    return EEGTextDataset(
        str(tmp_path / "data"),
        str(tmp_path / "montage.csv"),
        tokenizer,
        cfg.data,
        augment=False,
        seed=42,
    )
