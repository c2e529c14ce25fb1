"""``ist-reproduce`` — the one-command real-artifact reproduction chain.

The network legs (Chisco fetch, HF hub snapshot) are env-blocked here, so
the tests drive (a) the offline dry-run plan, (b) the structured
``blocked: no-egress`` fast-fail, and (c) the full convert → decode-parity
chain end-to-end against a LOCAL tiny HF checkpoint (no network), plus the
``--bart-params`` graft into a train state."""

import dataclasses
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from imagined_speech_translation_tpu.cli import reproduce

VOCAB, D, HEADS, LAYERS, FFN, MAXPOS = 70, 32, 4, 2, 64, 32


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    torch.manual_seed(11)
    cfg = transformers.BartConfig(
        vocab_size=VOCAB, d_model=D,
        encoder_layers=LAYERS, decoder_layers=LAYERS,
        encoder_attention_heads=HEADS, decoder_attention_heads=HEADS,
        encoder_ffn_dim=FFN, decoder_ffn_dim=FFN,
        max_position_embeddings=MAXPOS,
        activation_function="gelu", dropout=0.1, attention_dropout=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=2, forced_eos_token_id=None,
        scale_embedding=False,
    )
    model = transformers.BartForConditionalGeneration(cfg)
    d = tmp_path_factory.mktemp("hf_ckpt")
    model.save_pretrained(d, safe_serialization=False)
    return d


def test_dry_run_plan(tmp_path, capsys):
    rc = reproduce.main(["--dry-run", "--work-dir", str(tmp_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "dry-run-ok"
    assert [s["step"] for s in out["plan"]] == [
        "fetch-chisco", "fetch-hf", "convert-hf", "parity-report",
    ]
    assert out["tools"]["jax"] and out["tools"]["torch"]
    assert out["tools"]["entry_points"]


def test_blocked_without_egress(tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(
        reproduce, "probe_egress",
        lambda urls=None: [{"url": "x", "ok": False, "error": "unreachable"}],
    )
    rc = reproduce.main(["--work-dir", str(tmp_path)])
    assert rc == reproduce.BLOCKED_EXIT
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "blocked"
    assert out["reason"] == "no-egress"
    assert out["probes"][0]["error"] == "unreachable"


def test_local_chain_convert_and_parity(tmp_path, hf_dir, capsys):
    """With local artifacts supplied, the chain needs NO network: convert
    the checkpoint, then the decode stack must be token-identical to HF
    generate on the real (here: tiny random) weights."""
    data = tmp_path / "chisco"
    data.mkdir()
    (data / "sub-01_task-imagine_run-1_eeg.pkl").write_bytes(b"\x80\x04N.")
    rc = reproduce.main([
        "--work-dir", str(tmp_path / "work"),
        "--data-dir", str(data),
        "--hf-checkpoint", str(hf_dir),
        "--parity-cases", "2",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0, out
    assert out["status"] == "ok"
    assert out["identity"] == 1.0
    report = json.loads(
        (tmp_path / "work" / "parity_report.json").read_text()
    )
    assert all(c["identical"] for c in report["cases"])
    assert {c["num_beams"] for c in report["cases"]} == {1, 3}


@pytest.mark.heavy
def test_bart_params_graft(tmp_path, hf_dir):
    """``--bart-params``: the converted pretrained tree splices into a fresh
    train state (overlap-copying vocab rows) with shardings preserved."""
    import jax
    import jax.numpy as jnp

    from imagined_speech_translation_tpu.cli.convert_hf import main as conv
    from imagined_speech_translation_tpu.training import (
        AdaptiveLossScheduler,
        TrainModule,
        build_optimizer,
        create_train_state,
    )
    from imagined_speech_translation_tpu.training.pretrained import (
        graft_bart_params,
    )
    from tests.helpers import tiny_config, tiny_tokenizer

    out = conv(["--checkpoint", str(hf_dir), "--out", str(tmp_path / "bp")])

    tok = tiny_tokenizer()
    cfg = tiny_config(tok.vocab_size, n_timepoints=32, max_length=8)
    # align the bart architecture with the converted checkpoint (the vocab
    # intentionally differs: tokenizer vocab vs the checkpoint's 70)
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            bart=dataclasses.replace(
                cfg.model.bart, d_model=D, encoder_layers=LAYERS,
                decoder_layers=LAYERS, num_heads=HEADS, ffn_dim=FFN,
                max_position_embeddings=MAXPOS,
            ),
        )
    )
    rng = np.random.default_rng(0)
    mask = np.zeros((4, 16), bool)
    for r, c in enumerate(cfg.model.region_channel_counts):
        mask[r, :c] = True
    sample = {
        "eeg": rng.normal(size=(2, 4, 16, 32)).astype(np.float32),
        "decoder_input_ids": rng.integers(0, 8, (2, 8)).astype(np.int32),
        "labels": rng.integers(0, 8, (2, 8)).astype(np.int32),
        "attention_mask": np.ones((2, 8), np.int32),
        "channel_mask": mask,
    }
    module = TrainModule(cfg, bow_k=8)
    params_shape = jax.eval_shape(
        lambda: module.init(
            jax.random.key(0), sample["eeg"], sample["decoder_input_ids"],
            sample["channel_mask"], method="init_all",
        )
    )["params"]
    optimizer = build_optimizer(
        params_shape, cfg.training.optimizer, total_steps=4
    )
    weights = AdaptiveLossScheduler(cfg.training.loss).initial_weights()
    state = create_train_state(
        module, jax.random.key(0), sample, optimizer, weights
    )

    before = jax.device_get(state.params["model"]["bart"])
    state2 = graft_bart_params(state, out)
    after = jax.device_get(state2.params["model"]["bart"])

    # same tree structure, values actually replaced
    assert jax.tree.structure(before) == jax.tree.structure(after)
    # biases/LN params are zeros/ones on BOTH sides (HF init == flax init);
    # every matrix-valued leaf (kernels, embeddings) must have new values
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        if np.ndim(b) >= 2:
            assert not np.array_equal(b, a)
    # vocab overlap-copy: the first min(V) embedding rows come from the
    # checkpoint, the rest keep their fresh init
    emb_new = after["shared"]["embedding"]
    emb_old = before["shared"]["embedding"]
    n = min(VOCAB, emb_new.shape[0])
    assert not np.array_equal(emb_new[:n], emb_old[:n])
    if emb_new.shape[0] > n:
        np.testing.assert_array_equal(emb_new[n:], emb_old[n:])
    # the grafted state still runs a forward pass
    logits, _ = module.apply(
        {"params": state2.params, "batch_stats": state2.batch_stats},
        jnp.asarray(sample["eeg"]),
        jnp.asarray(sample["decoder_input_ids"]),
        jnp.asarray(sample["channel_mask"]),
    )
    assert np.isfinite(np.asarray(logits)).all()
