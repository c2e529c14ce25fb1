"""Graft converted pretrained BART params into a fresh train state.

The reference fine-tunes from ``fnlp/bart-base-chinese``
(``main_model/src/models/bart_decoder.py:20``) rather than training the
decoder from scratch; ``cli/convert_hf.py`` converts the HF checkpoint into
this framework's ``BartDecoderModel`` param tree, and this module splices
that tree into ``TrainState.params['model']['bart']``:

* structure must match exactly (the converter is parity-tested);
* vocab-sized leaves (embeddings / ``final_logits_bias``) may be LARGER or
  SMALLER than the run's tokenizer vocab — overlapping rows are copied and
  any extra rows keep their fresh initialization, matching the reference's
  ``resize_token_embeddings`` semantics (``scripts/train.py:91-95``);
* each new leaf is ``device_put`` with the OLD leaf's sharding, so grafting
  composes with a mesh-committed state (DP/TP shardings survive).
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _splice(old, new, path: str):
    old_np = np.asarray(jax.device_get(old))
    new = np.asarray(new)
    if new.shape == old_np.shape:
        out = new
    elif new.shape[1:] == old_np.shape[1:] and new.ndim >= 1:
        # vocab-dim mismatch: overlap-copy (reference resize semantics)
        n = min(new.shape[0], old_np.shape[0])
        out = old_np.copy()
        out[:n] = new[:n]
        logger.warning(
            "%s: vocab rows %d -> %d (overlap-copied %d)",
            path, new.shape[0], old_np.shape[0], n,
        )
    else:
        raise ValueError(
            f"pretrained leaf {path} has shape {new.shape}, "
            f"model expects {old_np.shape}"
        )
    out = out.astype(old_np.dtype)
    sharding = getattr(old, "sharding", None)
    return jax.device_put(out, sharding) if sharding is not None else out


def graft_bart_params(state, path: str | Path):
    """Return ``state`` with the BART subtree replaced by the converted
    checkpoint at ``path`` (an orbax dir written by ``ist-convert-hf``)."""
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(Path(path).absolute())
    bart = state.params["model"]["bart"]

    old_flat = jax.tree.leaves_with_path(bart)
    new_flat = jax.tree.leaves_with_path(restored)
    old_keys = [jax.tree_util.keystr(k) for k, _ in old_flat]
    new_keys = [jax.tree_util.keystr(k) for k, _ in new_flat]
    if old_keys != new_keys:
        missing = sorted(set(old_keys) - set(new_keys))
        extra = sorted(set(new_keys) - set(old_keys))
        raise ValueError(
            "converted BART tree does not match the model: "
            f"missing={missing[:5]} extra={extra[:5]}"
        )
    spliced = [
        _splice(o, n, k)
        for k, (_, o), (_, n) in zip(old_keys, old_flat, new_flat)
    ]
    new_bart = jax.tree.unflatten(jax.tree.structure(bart), spliced)
    params = dict(state.params)
    params["model"] = dict(params["model"])
    params["model"]["bart"] = new_bart
    logger.info("grafted %d pretrained BART leaves from %s",
                len(spliced), path)
    return state.replace(params=params)
