"""Three-group AdamW with warmup-cosine schedules + global-norm clipping.

Reference: per-group learning rates by param-name substring
(``main_model/config/training_config.py:55-77``: brain_encoder 3e-4,
eeg_to_bart projection 1e-4, bart 3e-5) with a shared warmup(500)+cosine
schedule and clip-norm 1.0 applied before the step
(``scripts/train.py:199-241``, ``trainer.py:101-113``).

JAX mapping: ``optax.multi_transform`` over a label pytree derived from param
paths; clipping composes in front so the global norm covers ALL params (as
``clip_grad_norm_`` does).  Loss-head params that match no substring train in
the projection group.
"""

from __future__ import annotations

import optax

from ..config import OptimizerConfig
from ..utils.trees import label_params_by_substring

GROUP_RULES = (
    ("encoder", ("brain_encoder",)),
    ("projection", ("eeg_to_bart",)),
    ("bart", ("bart",)),
)


def make_schedule(base_lr: float, cfg: OptimizerConfig, total_steps: int):
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=base_lr,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(total_steps, cfg.warmup_steps + 1),
            end_value=0.0,
        )
    if cfg.schedule == "linear":
        warm = optax.linear_schedule(0.0, base_lr, cfg.warmup_steps)
        decay = optax.linear_schedule(
            base_lr, 0.0, max(total_steps - cfg.warmup_steps, 1)
        )
        return optax.join_schedules([warm, decay], [cfg.warmup_steps])
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def group_lrs(cfg: OptimizerConfig) -> dict[str, float]:
    return {
        "encoder": cfg.encoder_lr,
        "projection": cfg.projection_lr,
        "bart": cfg.bart_lr,
    }


def build_optimizer(
    params, cfg: OptimizerConfig, total_steps: int
) -> optax.GradientTransformation:
    if cfg.fused:
        from .fused_optimizer import build_fused_adamw

        return build_fused_adamw(
            params,
            cfg,
            total_steps,
            rules=GROUP_RULES,
            default_group="projection",
            make_schedule=make_schedule,
            group_lrs=group_lrs,
        )
    labels = label_params_by_substring(params, GROUP_RULES, default="projection")
    transforms = {
        name: optax.adamw(
            make_schedule(lr, cfg, total_steps),
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
            # narrow first-moment storage (math stays f32 — optax casts the
            # stored mu only); halves the m-state HBM traffic on chip
            mu_dtype=cfg.mu_dtype,
        )
        for name, lr in group_lrs(cfg).items()
    }
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.multi_transform(transforms, labels),
    )


def learning_rates_at(cfg: OptimizerConfig, total_steps: int, step) -> dict[str, float]:
    """Current LR per group for logging (reference logs param_groups[0] lr,
    trainer.py:121)."""
    return {
        name: float(make_schedule(lr, cfg, total_steps)(step))
        for name, lr in group_lrs(cfg).items()
    }
