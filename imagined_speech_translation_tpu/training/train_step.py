"""Jitted train/eval steps with gradient accumulation.

Reference semantics (``main_model/src/training/trainer.py:69-151``): micro
batches of 4 accumulated ×8 (effective 32), loss scaled by accumulation
steps, clip-by-global-norm 1.0, one optimizer+scheduler step per
accumulation window.  Here the whole window is one XLA program: a
``lax.scan`` over the accumulation axis accumulates grads on device (no
host round-trips), then clip + update.  Under ``pjit`` with a batch sharded
over the ``data`` mesh axis, the mean over the global batch IS the
cross-replica gradient reduction — no explicit psum needed.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from .losses import composite_loss, label_smoothed_ce
from .train_state import TrainModule, TrainState


def make_loss_fn(module: TrainModule, cfg: Config, bow_indices):
    loss_cfg = cfg.training.loss
    bow_indices = jnp.asarray(bow_indices, jnp.int32)
    mixed = cfg.training.mixed_precision

    def _cast(tree, dtype):
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def loss_fn(params, batch_stats, micro_batch, rng, loss_weights):
        # under mixed precision ``params`` arrive ALREADY cast to bf16 (the
        # cast is hoisted out of the accumulation scan — one cast per window,
        # not per micro-step); gradients are taken wrt the bf16 copy and
        # accumulated in f32, the standard master-weights scheme
        if mixed:
            fwd_stats = _cast(batch_stats, jnp.bfloat16)
            eeg = micro_batch["eeg"].astype(jnp.bfloat16)
        else:
            fwd_stats, eeg = batch_stats, micro_batch["eeg"]
        variables = {"params": params, "batch_stats": fwd_stats}
        (logits, aux), mutated = module.apply(
            variables,
            eeg,
            micro_batch["decoder_input_ids"],
            micro_batch["channel_mask"],
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        if mixed:
            # keep the running BN stats in f32 so the scan carry dtype is
            # stable and stats don't accumulate bf16 rounding
            mutated = {"batch_stats": _cast(mutated["batch_stats"], jnp.float32)}
        labels = micro_batch["labels"]
        if loss_cfg.composite:
            def heads_apply(eeg_feat, text_feat):
                return module.apply(
                    {"params": params},
                    eeg_feat,
                    text_feat,
                    method="loss_heads_apply",
                )

            total, comps = composite_loss(
                logits=logits,
                labels=labels,
                eeg_feat=aux["features"],
                decoder_hidden=aux["hidden"],
                decoder_mask=micro_batch["attention_mask"],
                heads_apply=heads_apply,
                bow_indices=bow_indices,
                weights=loss_weights,
                cfg=loss_cfg,
            )
        else:
            total, _ = label_smoothed_ce(logits, labels)
            comps = {"loss_ce": total}
        return total, (mutated["batch_stats"], comps)

    return loss_fn


def make_train_step(
    module: TrainModule,
    optimizer: optax.GradientTransformation,
    cfg: Config,
    bow_indices,
) -> Callable:
    """Returns ``train_step(state, batch, rng) -> (state, metrics)``.

    ``batch`` leaves are shaped ``(accum, micro_batch, ...)`` except
    ``channel_mask`` which is shared."""
    loss_fn = make_loss_fn(module, cfg, bow_indices)
    grad_fn = jax.grad(loss_fn, has_aux=True)
    accum = cfg.training.grad_accum_steps
    mixed = cfg.training.mixed_precision
    accum_dtype = (
        jnp.dtype(cfg.training.grad_accum_dtype) if mixed else jnp.float32
    )

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        channel_mask = batch["channel_mask"]
        if mixed:
            # one bf16 copy per window, shared across all micro-steps
            fwd_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                state.params,
            )
        else:
            fwd_params = state.params

        def accum_body(carry, micro):
            grads_acc, batch_stats, comps_acc, i = carry
            micro = dict(micro, channel_mask=channel_mask)
            step_rng = jax.random.fold_in(rng, i)
            grads, (batch_stats, comps) = grad_fn(
                fwd_params, batch_stats, micro, step_rng, state.loss_weights
            )
            # bf16 grads upcast into the f32 accumulator by the add itself
            grads_acc = jax.tree.map(
                lambda a, g: a + g.astype(a.dtype), grads_acc, grads
            )
            comps_acc = jax.tree.map(jnp.add, comps_acc, comps)
            return (grads_acc, batch_stats, comps_acc, i + 1), None

        zero_grads = jax.tree.map(
            lambda x: jnp.zeros(
                x.shape,
                accum_dtype if jnp.issubdtype(x.dtype, jnp.floating) else x.dtype,
            ),
            state.params,
        )
        zero_comps = {
            k: jnp.zeros((), jnp.float32)
            for k in (
                ("loss_ce", "loss_align", "loss_bow", "loss_div", "loss_var")
                if cfg.training.loss.composite
                else ("loss_ce",)
            )
        }
        micro_batches = {
            k: v for k, v in batch.items() if k != "channel_mask"
        }
        (grads, batch_stats, comps, _), _ = jax.lax.scan(
            accum_body,
            (zero_grads, state.batch_stats, zero_comps, jnp.int32(0)),
            micro_batches,
            length=accum,
        )
        # optimizer math stays f32 regardless of the accumulation carry
        grads = jax.tree.map(
            lambda g: (g / accum).astype(jnp.float32)
            if jnp.issubdtype(g.dtype, jnp.floating)
            else g,
            grads,
        )
        comps = jax.tree.map(lambda c: c / accum, comps)

        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        w = state.loss_weights
        total = sum(
            w[k.removeprefix("loss_")] * v if k.removeprefix("loss_") in w else v
            for k, v in comps.items()
        )
        metrics = dict(comps)
        metrics["loss"] = total
        metrics["grad_norm"] = grad_norm
        return new_state, metrics

    return train_step


def make_eval_step(module: TrainModule, cfg: Config, bow_indices) -> Callable:
    """Teacher-forced validation loss (reference: trainer.py:173-177)."""
    loss_cfg = cfg.training.loss
    bow_indices = jnp.asarray(bow_indices, jnp.int32)

    def eval_step(state: TrainState, batch: dict):
        variables = state.variables()
        (logits, aux) = module.apply(
            variables,
            batch["eeg"],
            batch["decoder_input_ids"],
            batch["channel_mask"],
            train=False,
        )
        if loss_cfg.composite:
            def heads_apply(eeg_feat, text_feat):
                return module.apply(
                    {"params": state.params}, eeg_feat, text_feat,
                    method="loss_heads_apply",
                )

            total, comps = composite_loss(
                logits=logits,
                labels=batch["labels"],
                eeg_feat=aux["features"],
                decoder_hidden=aux["hidden"],
                decoder_mask=batch["attention_mask"],
                heads_apply=heads_apply,
                bow_indices=bow_indices,
                weights=state.loss_weights,
                cfg=loss_cfg,
            )
        else:
            total, _ = label_smoothed_ce(logits, batch["labels"])
            comps = {"loss_ce": total}
        return dict(comps, loss=total)

    return eval_step
