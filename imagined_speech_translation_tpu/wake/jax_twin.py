"""JAX twin of the wake detector (BASELINE north star: "the hand-rolled C
wake_model ... reimplemented as a tiny JAX MLP sharing the same feature
frontend").

A small conv+MLP over frontend features, jit-compiled; used by the streaming
runtime when the native detector is not built, and batched for training on
TPU."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class WakeMLP(nn.Module):
    """(B, T, F) features → (B, n_classes) event-time logits."""

    n_classes: int
    hidden: int = 128

    @nn.compact
    def __call__(self, x):
        # temporal conv stem mirroring the native detector's receptive field
        x = nn.Conv(32, (9,), padding="SAME", name="conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2,), strides=(2,), padding="VALID")
        x = nn.Conv(64, (5,), padding="SAME", name="conv2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2,), strides=(2,), padding="VALID")
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        return nn.Dense(self.n_classes, name="fc2")(x)


def make_wake_train_step(model: WakeMLP, learning_rate: float = 1e-3):
    """Returns (init_fn, step_fn, predict_fn) for batched training."""
    tx = optax.adam(learning_rate)

    def init_fn(rng, sample_x):
        params = model.init(rng, sample_x)["params"]
        return params, tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, x, labels):
        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict_fn(params, x):
        return jnp.argmax(model.apply({"params": params}, x), axis=-1)

    return init_fn, step_fn, predict_fn
