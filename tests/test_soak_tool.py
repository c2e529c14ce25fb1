"""The soak harness itself (tools/streaming_soak.py) stays drivable.

Short (seconds-scale) runs of both service builders through the REAL
websocket loop: the tiny CPU service and the full-size builder with an
injected tiny config — the same path the on-chip soak
(``--full-size --pooled``) deploys. Marked heavy: each run spends ~1-2 min
compiling + streaming on CPU.
"""

import asyncio
import dataclasses
from pathlib import Path

import pytest

pytestmark = pytest.mark.heavy

websockets = pytest.importorskip("websockets")


def _tiny_cfg():
    from tests.helpers import tiny_config, tiny_tokenizer

    tok = tiny_tokenizer()
    cfg = tiny_config(tok.vocab_size)
    return cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            bart=dataclasses.replace(
                cfg.model.bart, encoder_layers=1, decoder_layers=1
            ),
        ),
        generation=dataclasses.replace(
            cfg.generation, num_beams=1, max_length=6
        ),
    )


def test_pooled_soak_short(tmp_path):
    from tools.streaming_soak import soak

    report = asyncio.run(
        soak(0.15, Path(tmp_path), 41881, sessions=2, pooled=True)
    )
    assert report["ok"], report
    assert report["errors"] == 0 and report["utterances"] > 0
    assert report["pipeline_latency"]["batches"] > 0


def test_full_size_soak_short(tmp_path):
    """The --full-size builder (cli/serve.build_decode_fn: BN fold + bf16)
    serves utterances through the pooled scheduler end-to-end."""
    from tools.streaming_soak import soak

    report = asyncio.run(
        soak(
            0.15, Path(tmp_path), 41882, sessions=2, pooled=True,
            full_size=True, max_batch=4, cfg=_tiny_cfg(),
        )
    )
    assert report["ok"], report
    assert report["full_size"] is True
    assert report["errors"] == 0 and report["utterances"] > 0
    assert report["pipeline_latency"]["mean_fill"] >= 1.0
    # derived verdict fields (round-4 verdict 6c): computed from the rows
    assert report["latency_stable"] in (True, False)
    assert report["rss_bounded"] in (True, False)


def test_full_size_soak_with_decode_worker(tmp_path):
    """--decode-worker-budget-mb: the decode program runs in a recycled
    CHILD process (runtime/worker.py) and still serves utterances through
    the pooled scheduler end-to-end; the report carries worker stats and
    the child RSS series."""
    from tools.streaming_soak import soak

    report = asyncio.run(
        soak(
            0.15, Path(tmp_path), 41883, sessions=2, pooled=True,
            full_size=True, max_batch=4, cfg=_tiny_cfg(),
            worker_budget_mb=1e6,  # no recycle inside a seconds-scale run
        )
    )
    assert report["ok"], report
    assert report["errors"] == 0 and report["utterances"] > 0
    assert report["decode_worker"]["calls"] > 0
    assert report["decode_worker"]["recycles"] == 0
    assert report["child_rss_max_mb"] and report["child_rss_max_mb"] > 0
