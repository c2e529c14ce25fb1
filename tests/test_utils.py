import json

import jax
import jax.numpy as jnp
import numpy as np

from imagined_speech_translation_tpu.utils import (
    JsonlLogger,
    RngStream,
    label_params_by_substring,
    param_count,
    seed_everything,
    tree_flatten_with_names,
)
from imagined_speech_translation_tpu.utils.trees import cast_floating, global_norm


def test_rng_stream_deterministic():
    a = RngStream(42)
    b = RngStream(42)
    ka = [a.next() for _ in range(3)]
    kb = [b.next() for _ in range(3)]
    for x, y in zip(ka, kb):
        assert jnp.array_equal(jax.random.key_data(x), jax.random.key_data(y))
    assert a.count == 3


def test_seed_everything_reproducible():
    k1 = seed_everything(42)
    n1 = np.random.rand(3)
    k2 = seed_everything(42)
    n2 = np.random.rand(3)
    np.testing.assert_array_equal(n1, n2)
    assert jnp.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))


def test_tree_flatten_with_names():
    tree = {"a": {"b": jnp.zeros(2)}, "c": jnp.ones(3)}
    named = dict(tree_flatten_with_names(tree))
    assert set(named) == {"a/b", "c"}


def test_label_params_by_substring():
    params = {
        "brain_encoder": {"w": jnp.zeros(2)},
        "eeg_to_bart": {"w": jnp.zeros(2)},
        "bart": {"decoder": {"w": jnp.zeros(2)}},
        "other": jnp.zeros(1),
    }
    labels = label_params_by_substring(
        params,
        [
            ("encoder", ["brain_encoder"]),
            ("projection", ["eeg_to_bart"]),
            ("bart", ["bart"]),
        ],
        default="encoder",
    )
    assert labels["brain_encoder"]["w"] == "encoder"
    assert labels["eeg_to_bart"]["w"] == "projection"
    assert labels["bart"]["decoder"]["w"] == "bart"
    assert labels["other"] == "encoder"


def test_param_count_and_norm():
    params = {"a": jnp.ones((2, 3)), "b": jnp.ones(4)}
    assert param_count(params) == 10
    assert float(global_norm(params)) == np.sqrt(10.0).astype(np.float32)


def test_cast_floating():
    tree = {"f": jnp.ones(2, jnp.float32), "i": jnp.ones(2, jnp.int32)}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["f"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32


def test_jsonl_logger(tmp_path):
    lg = JsonlLogger(tmp_path / "m.jsonl", config={"x": 1})
    lg.log({"loss": 1.5}, step=3)
    lg.log_summary({"bleu": jnp.float32(2.0)})
    lg.finish()
    lines = [json.loads(l) for l in (tmp_path / "m.jsonl").read_text().splitlines()]
    assert lines[0]["_config"] == {"x": 1}
    assert lines[1]["loss"] == 1.5 and lines[1]["_step"] == 3
    assert lines[2]["_summary"] is True
