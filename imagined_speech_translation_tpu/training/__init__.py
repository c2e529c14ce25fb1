"""Training subsystem: composite anti-collapse loss, multi-group optimizer,
data-parallel train step, trainer loop, orbax checkpointing
(reference: ``main_model/src/training/``, ``main_model/scripts/train.py``)."""

from .losses import (  # noqa: F401
    AdaptiveLossScheduler,
    CompositeLossHeads,
    composite_loss,
    get_top_k_vocab_indices,
    label_smoothed_ce,
)
from .optimizer import build_optimizer, learning_rates_at  # noqa: F401
from .train_state import TrainState, TrainModule, create_train_state  # noqa: F401
from .train_step import make_eval_step, make_train_step  # noqa: F401
from .checkpoint import CheckpointManager  # noqa: F401
from .trainer import EEGTrainer  # noqa: F401
