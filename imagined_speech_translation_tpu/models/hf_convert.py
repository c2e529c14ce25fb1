"""HF → JAX weight conversion for the BART decoder.

Ports a ``BartForConditionalGeneration`` torch ``state_dict`` (e.g. the
``fnlp/bart-base-chinese`` checkpoint the reference fine-tunes,
``main_model/src/models/bart_decoder.py:20``) into the
``BartDecoderModel`` param tree.  Only the components that actually run in
the reference are converted — shared embedding, decoder stack, lm head bias;
the BART text encoder is bypassed by the pseudo-encoder-sequence trick and
has no counterpart here.

Also implements the embedding-resize logic of ``scripts/train.py:91-95``
(tokenizer/model vocab mismatch → resize with mean-init of new rows).
"""

from __future__ import annotations

import numpy as np


def _t(w) -> np.ndarray:
    """torch Linear stores (out, in); flax Dense kernel is (in, out)."""
    return np.asarray(w).T


def _ln(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _dense(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _attn(sd, prefix):
    return {
        name: _dense(sd, f"{prefix}.{name}")
        for name in ("q_proj", "k_proj", "v_proj", "out_proj")
    }


def convert_hf_bart_state_dict(
    state_dict, *, decoder_layers: int, vocab_size: int | None = None
) -> dict:
    """``state_dict``: mapping of HF param names → array-likes (torch tensors
    work; they are converted via ``np.asarray``).  Returns the params dict for
    ``BartDecoderModel.apply({'params': ...})``."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    # strip optional leading "model." used by BartForConditionalGeneration
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):] if k.startswith("model.") else k: v for k, v in sd.items()}

    embedding = sd.get("shared.weight", sd.get("decoder.embed_tokens.weight"))
    if embedding is None:
        raise KeyError("no shared/decoder embedding in state dict")
    embedding = np.asarray(embedding)

    if vocab_size is not None and embedding.shape[0] != vocab_size:
        embedding = resize_embedding(embedding, vocab_size)

    params: dict = {
        "shared": {"embedding": embedding},
        "embed_positions": np.asarray(sd["decoder.embed_positions.weight"]),
        "layernorm_embedding": _ln(sd, "decoder.layernorm_embedding"),
    }
    for i in range(decoder_layers):
        p = f"decoder.layers.{i}"
        params[f"layer{i}"] = {
            "self_attn": _attn(sd, f"{p}.self_attn"),
            "self_attn_layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
            "encoder_attn": _attn(sd, f"{p}.encoder_attn"),
            "encoder_attn_layer_norm": _ln(sd, f"{p}.encoder_attn_layer_norm"),
            "fc1": _dense(sd, f"{p}.fc1"),
            "fc2": _dense(sd, f"{p}.fc2"),
            "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
        }
    bias = sd.get("final_logits_bias")
    if bias is None:
        bias = np.zeros((embedding.shape[0],), np.float32)
    else:
        bias = np.asarray(bias).reshape(-1)
        if bias.shape[0] != embedding.shape[0]:
            out = np.zeros((embedding.shape[0],), bias.dtype)
            out[: min(bias.shape[0], embedding.shape[0])] = bias[: embedding.shape[0]]
            bias = out
    params["final_logits_bias"] = bias
    return params


def resize_embedding(embedding: np.ndarray, new_size: int) -> np.ndarray:
    """HF ``resize_token_embeddings`` semantics: truncate, or append rows
    initialized to the mean of existing embeddings (scripts/train.py:91-95
    triggers this when tokenizer vocab ≠ model vocab)."""
    old, d = embedding.shape
    if new_size == old:
        return embedding
    if new_size < old:
        return embedding[:new_size]
    mean = embedding.mean(axis=0, keepdims=True)
    extra = np.repeat(mean, new_size - old, axis=0)
    return np.concatenate([embedding, extra], axis=0)
