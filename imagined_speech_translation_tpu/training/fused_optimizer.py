"""Single-pass fused AdamW: clip + 3-group AdamW in one tree traversal.

The stock path (``optimizer.py:build_optimizer``) composes
``optax.chain(clip_by_global_norm, multi_transform({adamw × 3}))``: each
link is its own sequence of per-leaf tree passes (clip scale, mu, nu,
bias-corrected update, weight decay, lr scale, apply), which XLA fuses
only partially because ``optax.adamw`` materialises intermediate update
trees between links.  At 310M params every extra materialised tree is
~1.2 GB of HBM write+read traffic per window.

This module computes the ENTIRE update for a leaf — clip scale, first/
second moment, bias correction, decoupled weight decay, group learning
rate, and the new parameter value — inside ONE ``jax.tree.map`` body, so
XLA sees a single producer→consumer elementwise chain per leaf and emits
one fused kernel reading {grad, mu, nu, param} and writing {mu, nu,
param} with no intermediate trees.

Numerics are kept EXACTLY aligned with the optax chain (verified by
``tests/test_training.py::test_fused_optimizer_matches_optax``):

* clip: ``scale = 1 if g_norm < max_norm else max_norm / g_norm``
  (``optax.clip_by_global_norm`` semantics);
* Adam: ``mu' = b1·mu + (1-b1)·g``; ``nu' = b2·nu + (1-b2)·g²``; bias
  correction with ``t = count + 1`` (optax ``scale_by_adam`` increments
  before correcting);
* schedule: evaluated at the PRE-increment count (optax
  ``scale_by_schedule`` reads ``state.count`` then increments);
* weight decay: decoupled, added to the update before the lr scale
  (``optax.add_decayed_weights`` inside ``optax.adamw``).

Reference parity context: the reference's single optimizer step per
accumulation window with per-group LRs is
``main_model/scripts/train.py:199-241`` + ``trainer.py:101-113``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import OptimizerConfig
from ..utils.trees import label_params_by_substring


class FusedAdamWState(NamedTuple):
    count: jax.Array   # int32 scalar, number of completed steps
    mu: optax.Params   # first moment, zeros_like(params)
    nu: optax.Params   # second moment, zeros_like(params)


def build_fused_adamw(
    params,
    cfg: OptimizerConfig,
    total_steps: int,
    rules,
    default_group: str,
    make_schedule,
    group_lrs,
) -> optax.GradientTransformation:
    """Drop-in ``GradientTransformation`` matching the stock chain's math.

    ``rules``/``default_group``/``make_schedule``/``group_lrs`` are passed
    in from ``optimizer.py`` so the grouping and schedule definitions have
    a single source of truth.
    """
    labels = label_params_by_substring(params, rules, default=default_group)
    schedules = {
        name: make_schedule(lr, cfg, total_steps)
        for name, lr in group_lrs(cfg).items()
    }
    b1, b2, eps = cfg.adam_b1, cfg.adam_b2, cfg.adam_eps
    wd, max_norm = cfg.weight_decay, cfg.max_grad_norm
    # optax adamw mu_dtype semantics: the Adam math runs in the grad dtype;
    # only the STORED first moment is cast narrow
    mu_dtype = jnp.dtype(cfg.mu_dtype) if cfg.mu_dtype else None

    def init(params):
        def mu_like(p):
            if mu_dtype is not None and jnp.issubdtype(p.dtype, jnp.floating):
                return jnp.zeros(p.shape, mu_dtype)
            return jnp.zeros_like(p)

        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(mu_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state: FusedAdamWState, params=None):
        if params is None:
            raise ValueError("fused adamw requires params (weight decay)")
        g_norm = optax.global_norm(grads)
        clip_scale = jnp.where(
            g_norm < max_norm, jnp.float32(1.0), max_norm / g_norm
        )
        count_inc = state.count + 1
        # optax scale_by_adam corrects with the post-increment count…
        bc1 = 1.0 - b1 ** count_inc.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count_inc.astype(jnp.float32)
        # …while scale_by_schedule reads the pre-increment count
        lr = {name: s(state.count) for name, s in schedules.items()}

        def leaf(g, mu, nu, p, label):
            if not jnp.issubdtype(jnp.asarray(g).dtype, jnp.floating):
                return g * 0, mu, nu
            gc = g * clip_scale.astype(g.dtype)
            mu_n = b1 * mu.astype(gc.dtype) + (1.0 - b1) * gc
            nu_n = b2 * nu + (1.0 - b2) * jnp.square(gc)
            upd = (mu_n / bc1) / (jnp.sqrt(nu_n / bc2) + eps) + wd * p
            if mu_dtype is not None:
                mu_n = mu_n.astype(mu_dtype)
            return (-lr[label] * upd).astype(p.dtype), mu_n, nu_n

        fused = jax.tree.map(leaf, grads, state.mu, state.nu, params, labels)
        is_triple = lambda x: isinstance(x, tuple) and len(x) == 3  # noqa: E731
        pick = lambda i: jax.tree.map(  # noqa: E731
            lambda t: t[i], fused, is_leaf=is_triple
        )
        updates = pick(0)
        new_state = FusedAdamWState(count=count_inc, mu=pick(1), nu=pick(2))
        return updates, new_state

    return optax.GradientTransformation(init, update)
