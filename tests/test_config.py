import dataclasses

import pytest

from imagined_speech_translation_tpu.config import (
    Config,
    default_config,
    replace_nested,
)


def test_default_config_validates():
    cfg = default_config()
    assert cfg.model.hidden_dim == 768
    assert cfg.data.n_timepoints == 1651
    assert cfg.model.region_channel_counts == (16, 9, 11, 12)
    assert sum(cfg.model.region_channel_counts) == 48
    assert cfg.model.bart.vocab_size == 51271
    # reference tokenizer key ids: pad=0, eos=104, bos=101
    assert cfg.model.bart.pad_token_id == 0
    assert cfg.model.bart.eos_token_id == 104
    assert cfg.model.bart.bos_token_id == 101


def test_config_roundtrip_json():
    cfg = default_config()
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg == cfg2


def test_replace_nested():
    cfg = default_config()
    cfg2 = replace_nested(cfg, "training.seed", 7)
    assert cfg2.training.seed == 7
    assert cfg.training.seed == 42
    cfg3 = replace_nested(cfg, "model.brain_encoder.disable_cross_region_attn", True)
    assert cfg3.model.brain_encoder.disable_cross_region_attn


def test_invalid_splits_rejected():
    cfg = default_config()
    bad = replace_nested(cfg, "data.train_split", 0.5)
    with pytest.raises(ValueError):
        bad.validate()


def test_config_is_hashable_static_arg():
    cfg = default_config()
    assert hash(cfg) == hash(dataclasses.replace(cfg))
