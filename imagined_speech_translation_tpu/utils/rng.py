"""Deterministic randomness.

The reference seeds python/numpy/torch + cuDNN-deterministic at startup
(``main_model/scripts/train.py:35-48``).  JAX is functionally random: a single
root ``jax.random.key`` is split and threaded explicitly.  ``RngStream`` is a
tiny host-side helper that hands out fresh keys in a reproducible order.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int, impl: str | None = None) -> jax.Array:
    """Seed python + numpy host RNGs and return the root JAX key.

    Mirrors ``set_random_seeds`` (scripts/train.py:35-48); there is no cuDNN
    equivalent — XLA compilation is deterministic given the same HLO.
    ``impl`` selects the PRNG ("rbg" = hardware RngBitGenerator, the fast
    training default via ``TrainingConfig.rng_impl``; None = jax default
    threefry2x32).
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed, impl=impl) if impl else jax.random.key(seed)


class RngStream:
    """Hands out a deterministic sequence of JAX PRNG keys.

    Host-side convenience for code outside ``jit`` (init, data order,
    augmentation seeds).  Inside jitted code, thread keys explicitly.
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            seed_or_key = jax.random.key(seed_or_key)
        self._key = seed_or_key
        self._count = 0

    def next(self) -> jax.Array:
        self._key, out = jax.random.split(self._key)
        self._count += 1
        return out

    def next_n(self, n: int):
        keys = jax.random.split(self._key, n + 1)
        self._key = keys[0]
        self._count += n
        return list(keys[1:])

    def fold(self, data: int) -> jax.Array:
        """A key deterministically derived from (stream state, data) without
        advancing the stream — e.g. per-sample augmentation keys."""
        return jax.random.fold_in(self._key, data)

    @property
    def count(self) -> int:
        return self._count
