"""Inference-time BatchNorm folding for the region-encoder conv stems.

Eval-mode BatchNorm is a per-channel affine: ``y = g·(x−m)/√(v+ε) + c``.
For a preceding convolution it folds algebraically into the weights —
``W' = W·g/√(v+ε)`` (per output channel), ``b' = (b−m)·g/√(v+ε) + c`` —
leaving a *neutralized* BN behind (scale 1, bias 0/residual shift, stats
``m=0, v=1−ε`` so ``√(v+ε) = 1`` exactly).  The module graph is untouched,
so folded variables drop into the same ``model.apply``; only the decode /
serving path should use this (training updates the running stats).

Why on TPU: the conv stems dominate the encoder's decode-time cost
(ROADMAP round-3 profile: encoder fwd 85 of 106 ms/batch16) and the
eval-BN affine rides the VPU between MXU convs in mixed precision,
forcing f32 param broadcasts against bf16 activations.  Folding removes
the multiply entirely and turns the shift into the conv bias the MXU
epilogue already applies.

Fold sites (see ``models/layers.py`` RegionConvAttentionEncoder):
* ``stage{i}_convbn/{conv,bn}``   — conv has a bias → full fold;
* ``stage{i}_residual/{conv,bn}`` — bias-less 1×1 conv → multiplicative
  part into the kernel, shift stays in the neutralized BN's bias;
* ``stage{i}_depthwise``+``_pointwise``+``stage{i}_bn`` — fold into the
  pointwise conv.

Reference counterpart: the torch model runs BN live even at eval
(``main_model/src/models/layers.py:146-161``); folding is a net-new
inference optimization.
"""

from __future__ import annotations

import copy
import re

import jax.numpy as jnp

_BN_EPS = 1e-5  # _make_norm(epsilon=1e-5)


def _fold_one(conv: dict, bn_params: dict, bn_stats: dict) -> None:
    """Fold ``bn`` into ``conv`` in place; neutralize ``bn``."""
    g = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _BN_EPS)
    shift = bn_params["bias"] - bn_stats["mean"] * g
    # kernel (..., k, in, out) · g (..., out): broadcast over the last axis
    conv["kernel"] = conv["kernel"] * g[..., None, None, :]
    if "bias" in conv:
        conv["bias"] = conv["bias"] * g + shift
        shift = jnp.zeros_like(shift)
    bn_params["scale"] = jnp.ones_like(bn_params["scale"])
    bn_params["bias"] = shift
    bn_stats["mean"] = jnp.zeros_like(bn_stats["mean"])
    # v = 1−ε makes the neutralized normalization √(v+ε) == 1 EXACTLY
    bn_stats["var"] = jnp.full_like(bn_stats["var"], 1.0 - _BN_EPS)


def fold_batch_norm(variables: dict) -> dict:
    """Return a new variables dict with every region-encoder BatchNorm
    folded into its preceding conv.  No-op when there are no batch stats
    (e.g. ``norm='group'`` configs).  INFERENCE ONLY."""
    if not variables.get("batch_stats"):
        return variables
    variables = {
        "params": copy.deepcopy(dict(variables["params"])),
        "batch_stats": copy.deepcopy(dict(variables["batch_stats"])),
        **{
            k: v for k, v in variables.items()
            if k not in ("params", "batch_stats")
        },
    }

    def _walk(params: dict, stats: dict) -> None:
        for name in list(stats.keys()):
            sub_s = stats[name]
            sub_p = params.get(name)
            if sub_p is None:
                continue
            if (
                isinstance(sub_s, dict)
                and "bn" in sub_s
                and "mean" in sub_s["bn"]
                and "conv" in sub_p
            ):
                # stage{i}_convbn / stage{i}_residual
                _fold_one(sub_p["conv"], sub_p["bn"], sub_s["bn"])
            elif (
                isinstance(sub_s, dict)
                and "mean" in sub_s
                and re.fullmatch(r"stage\d+_bn", name)
            ):
                # depthwise stage: fold into the POINTWISE conv
                pw = params.get(name.replace("_bn", "_pointwise"))
                if pw is not None:
                    _fold_one(pw, sub_p, sub_s)
            elif isinstance(sub_s, dict):
                _walk(sub_p, sub_s)

    _walk(variables["params"], variables["batch_stats"])
    return variables
