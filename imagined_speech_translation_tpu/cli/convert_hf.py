"""Convert an HF ``BartForConditionalGeneration`` checkpoint (the reference
fine-tunes ``fnlp/bart-base-chinese``, bart_decoder.py:20) into this
framework's BART decoder params.

Input: a local checkpoint directory containing ``pytorch_model.bin`` or
``model.safetensors`` (+ ``vocab.txt``).  Output: an orbax checkpoint of the
``BartDecoderModel`` param tree, ready to graft into
``EEGDecodingModel`` params under ``bart``.

Usage::

    python -m imagined_speech_translation_tpu.cli.convert_hf \
        --checkpoint /path/to/fnlp-bart-base-chinese --out bart_params \
        [--vocab-size 51271]
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from ..models.hf_convert import convert_hf_bart_state_dict

logger = logging.getLogger(__name__)


def load_state_dict(checkpoint_dir: Path) -> dict:
    """Load tensors from safetensors or a torch .bin without needing CUDA."""
    st = checkpoint_dir / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        return load_file(st)
    bin_path = checkpoint_dir / "pytorch_model.bin"
    if bin_path.exists():
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"no model.safetensors or pytorch_model.bin under {checkpoint_dir}"
    )


def infer_decoder_layers(sd: dict) -> int:
    layers = set()
    for k in sd:
        parts = k.split(".")
        if "decoder" in parts and "layers" in parts:
            layers.add(int(parts[parts.index("layers") + 1]))
    if not layers:
        raise ValueError("no decoder layers found in state dict")
    return max(layers) + 1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--vocab-size", type=int, default=None,
                    help="resize embeddings to this vocab (scripts/train.py:91-95)")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    ckpt = Path(args.checkpoint)
    sd = load_state_dict(ckpt)
    n_layers = infer_decoder_layers(sd)
    logger.info("loaded %d tensors; %d decoder layers", len(sd), n_layers)
    params = convert_hf_bart_state_dict(
        sd, decoder_layers=n_layers, vocab_size=args.vocab_size
    )

    import jax
    import orbax.checkpoint as ocp

    out = Path(args.out).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, jax.tree.map(np.asarray, params))
    ckptr.wait_until_finished()
    logger.info("saved params to %s", out)
    vocab = ckpt / "vocab.txt"
    if vocab.exists():
        logger.info("tokenizer vocab available at %s", vocab)
    return str(out)


if __name__ == "__main__":
    main()
