"""Train module (model + loss heads) and functional train state.

``TrainModule`` nests the EEG→text model with the composite-loss heads so
everything trains under one param tree; the optimizer group labeling
(optimizer.py) sees the reference's substrings (``brain_encoder`` /
``eeg_to_bart`` / ``bart``) in the nested paths.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from ..config import Config
from ..models.eeg_model import EEGDecodingModel
from .losses import CompositeLossHeads


class TrainModule(nn.Module):
    """model + composite loss heads under one param tree
    (params: ``{'model': ..., 'loss_heads': ...}``)."""

    cfg: Config
    bow_k: int

    def setup(self):
        self.model = EEGDecodingModel(self.cfg.model)
        self.loss_heads = CompositeLossHeads(
            hidden_dim=self.cfg.model.hidden_dim,
            bart_dim=self.cfg.model.bart.d_model,
            bow_k=self.bow_k,
        )

    def __call__(self, eeg, decoder_input_ids, channel_mask=None, *, train=False):
        logits, aux = self.model(
            eeg, decoder_input_ids, channel_mask, train=train, return_aux=True
        )
        return logits, aux

    def loss_heads_apply(self, eeg_feat, text_feat):
        return self.loss_heads(eeg_feat, text_feat)

    def init_all(self, eeg, decoder_input_ids, channel_mask=None):
        """Initialization entry: touches model AND loss heads so both param
        subtrees exist in one tree."""
        logits, aux = self(eeg, decoder_input_ids, channel_mask)
        text_feat = aux["hidden"].mean(axis=1)
        self.loss_heads(aux["features"], text_feat)
        return logits


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # traced loss weights — updated by the adaptive scheduler without recompile
    loss_weights: dict[str, jax.Array]

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def model_variables(self):
        """Variables for the bare EEGDecodingModel (generation/eval)."""
        return {
            "params": self.params["model"],
            "batch_stats": self.batch_stats.get("model", {}),
        }


def create_train_state(
    module: TrainModule,
    rng: jax.Array,
    sample_batch: dict,
    optimizer: optax.GradientTransformation,
    loss_weights: dict[str, float],
) -> TrainState:
    # jit the whole init: un-jitted flax init dispatches thousands of tiny
    # ops eagerly (minutes over a remote-TPU tunnel), and XLA can only
    # dead-code-eliminate the traced forward pass inside a compiled program
    # (init runs the model forward for shape inference; only the variables
    # are needed).  One cacheable executable instead.
    init_fn = jax.jit(
        lambda r, eeg, ids, mask: module.init(
            r, eeg, ids, mask, method="init_all"
        )
    )
    variables = init_fn(
        rng,
        jnp.asarray(sample_batch["eeg"]),
        jnp.asarray(sample_batch["decoder_input_ids"]),
        jnp.asarray(sample_batch["channel_mask"]),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=jax.jit(optimizer.init)(params),
        loss_weights={k: jnp.float32(v) for k, v in loss_weights.items()},
    )
