"""Pytree helpers: named flattening, substring labeling for param groups.

The reference groups optimizer params by name substring
(``main_model/config/training_config.py:55-77``: ``brain_encoder`` /
``eeg_to_bart`` / ``bart``).  In JAX the analogue is a label pytree for
``optax.multi_transform``, derived from parameter paths.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

import jax
import jax.numpy as jnp


def tree_flatten_with_names(tree) -> list[tuple[str, Any]]:
    """Flatten a pytree to ``[('a/b/c', leaf), ...]`` with slash-joined paths."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        out.append(("/".join(_key_str(k) for k in path), leaf))
    return out


def _key_str(k) -> str:
    if isinstance(k, jax.tree_util.DictKey):
        return str(k.key)
    if isinstance(k, jax.tree_util.SequenceKey):
        return str(k.idx)
    if isinstance(k, jax.tree_util.GetAttrKey):
        return str(k.name)
    if isinstance(k, jax.tree_util.FlattenedIndexKey):
        return str(k.key)
    return str(k)


def path_matches(path: str, substrings: Sequence[str]) -> bool:
    return any(s in path for s in substrings)


def label_params_by_substring(
    params, rules: Sequence[tuple[str, Sequence[str]]], default: str
):
    """Build a label pytree: first rule whose substring appears in the path wins.

    ``rules = [('encoder', ['brain_encoder']), ('proj', ['eeg_to_bart']), ...]``
    mirrors ``get_optimizer_groups`` (training_config.py:55-77).
    """

    def label_of(path_keys, _leaf):
        path = "/".join(_key_str(k) for k in path_keys)
        for label, subs in rules:
            if path_matches(path, subs):
                return label
        return default

    return jax.tree_util.tree_map_with_path(label_of, params)


def param_count(params) -> int:
    return sum(int(jnp.size(x)) for x in jax.tree_util.tree_leaves(params))


def cast_floating(tree, dtype):
    """Cast floating-point leaves to ``dtype``, leave ints/bools untouched."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))
