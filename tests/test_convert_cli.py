"""Checkpoint-conversion CLI: torch .bin → orbax params roundtrip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_convert_hf_cli_roundtrip(tmp_path):
    import orbax.checkpoint as ocp

    from imagined_speech_translation_tpu.cli.convert_hf import main

    torch.manual_seed(0)
    cfg = transformers.BartConfig(
        vocab_size=61, d_model=16, encoder_layers=1, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=32, decoder_ffn_dim=32, max_position_embeddings=20,
    )
    model = transformers.BartForConditionalGeneration(cfg)
    ckpt_dir = tmp_path / "hf"
    ckpt_dir.mkdir()
    torch.save(model.state_dict(), ckpt_dir / "pytorch_model.bin")

    out = tmp_path / "params"
    main(["--checkpoint", str(ckpt_dir), "--out", str(out), "--vocab-size", "64"])

    restored = ocp.StandardCheckpointer().restore(out.absolute())
    # vocab resized 61 -> 64, new rows = mean of old embeddings
    emb = np.asarray(restored["shared"]["embedding"])
    assert emb.shape == (64, 16)
    ref = model.get_input_embeddings().weight.detach().numpy()
    np.testing.assert_allclose(emb[:61], ref, atol=1e-6)
    np.testing.assert_allclose(emb[61], ref.mean(axis=0), atol=1e-5)
    # layer weights transposed into flax layout
    fc1 = np.asarray(restored["layer0"]["fc1"]["kernel"])
    ref_fc1 = model.model.decoder.layers[0].fc1.weight.detach().numpy()
    np.testing.assert_allclose(fc1, ref_fc1.T, atol=1e-6)
