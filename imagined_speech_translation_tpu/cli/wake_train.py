"""Train the JAX wake-detector twin on the CSV event corpus.

The native C++ path (``wake_native/build/wake_train``) reproduces the
reference CPU training exactly; this CLI is its TPU-era twin: the same data,
a batched conv/MLP in JAX, Adam, full-batch steps on the accelerator
(BASELINE.json config 1).

Usage::

    python -m imagined_speech_translation_tpu.cli.wake_train \
        <catalog.csv> <training_dir> [--epochs N] [--lr 1e-3] \
        [--out wake_twin.msgpack] [--platform cpu]
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np

logger = logging.getLogger(__name__)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("catalog")
    ap.add_argument("training_dir")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default="wake_twin.msgpack")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ..utils.cache import enable_persistent_cache
    from ..wake import WakeMLP, make_wake_train_step
    from ..wake.dataset import load_wake_dataset

    enable_persistent_cache()
    ds = load_wake_dataset(args.catalog, args.training_dir)
    labels = np.minimum(ds.labels(), ds.seq_len - 1)
    logger.info("samples=%d seq_len=%d", len(ds.data), ds.seq_len)
    # standardize features (the raw time column is in seconds and dwarfs
    # velocity; the reference feeds raw values into per-scalar neurons)
    mean = ds.data.reshape(-1, 2).mean(axis=0)
    std = ds.data.reshape(-1, 2).std(axis=0) + 1e-6
    ds.data = ((ds.data - mean) / std).astype(np.float32)

    model = WakeMLP(n_classes=ds.seq_len)
    init_fn, step_fn, predict_fn = make_wake_train_step(model, args.lr)
    params, opt_state = init_fn(jax.random.key(42), jnp.asarray(ds.data[:2]))

    n = len(ds.data)
    bs = min(args.batch, n)
    t0 = time.time()
    for epoch in range(args.epochs):
        order = np.random.default_rng(epoch).permutation(n)
        losses = []
        for s in range(0, n - bs + 1, bs):
            idx = order[s : s + bs]
            params, opt_state, loss = step_fn(
                params, opt_state, jnp.asarray(ds.data[idx]), jnp.asarray(labels[idx])
            )
            losses.append(float(loss))
        if epoch % max(args.epochs // 10, 1) == 0:
            preds = np.asarray(predict_fn(params, jnp.asarray(ds.data)))
            acc = float((preds == labels).mean())
            logger.info("epoch %d loss=%.4f acc=%.3f", epoch, np.mean(losses), acc)
    preds = np.asarray(predict_fn(params, jnp.asarray(ds.data)))
    acc = float((preds == labels).mean())
    logger.info("final acc=%.3f (%.1fs)", acc, time.time() - t0)

    with open(args.out, "wb") as fh:
        fh.write(serialization.to_bytes(params))
    logger.info("saved %s", args.out)
    return acc


if __name__ == "__main__":
    main()
