"""Batching and asynchronous host→device feed.

The reference trains with a synchronous ``DataLoader(num_workers=0)``
(``main_model/scripts/train.py:164-192``) so every batch blocks the GPU.
Here the host pipeline runs ahead: a background thread prepares numpy
batches while ``device_prefetch`` keeps ``size`` batches resident on device
(optionally laid out with a ``NamedSharding``), overlapping pickle I/O and
preprocessing with TPU compute (SURVEY.md §5 'distributed communication
backend' row).
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Callable, Iterable, Iterator

import jax
import numpy as np


def batch_iterator(
    dataset,
    indices,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
    drop_last: bool = True,
) -> Iterator[dict[str, np.ndarray]]:
    """Yield stacked numpy batches from ``dataset.get_batch``."""
    idx = np.asarray(indices)
    if shuffle:
        rng = np.random.default_rng((seed, epoch))
        idx = rng.permutation(idx)
    n_full = len(idx) // batch_size
    end = n_full * batch_size if drop_last else len(idx)
    for start in range(0, end, batch_size):
        chunk = idx[start : start + batch_size]
        if len(chunk) == 0:
            continue
        yield dataset.get_batch(chunk, epoch=epoch)


def threaded_producer(make_iter: Callable[[], Iterable], depth: int = 4):
    """Run an iterator in a background thread with a bounded queue."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    err: list[BaseException] = []

    def work():
        try:
            for item in make_iter():
                q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=work, daemon=True)
    t.start()

    def gen():
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item

    return gen()


def device_prefetch(
    iterator: Iterable,
    *,
    size: int = 2,
    sharding=None,
) -> Iterator:
    """Keep ``size`` batches in flight on device (double buffering by
    default).  ``sharding`` may be a ``jax.sharding.Sharding`` or a pytree of
    shardings matching the batch structure."""

    def place(batch):
        if sharding is None:
            return jax.device_put(batch)
        if isinstance(sharding, jax.sharding.Sharding):
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch, sharding)

    buf = collections.deque()
    it = iter(iterator)
    try:
        while len(buf) < size:
            buf.append(place(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(place(next(it)))
        except StopIteration:
            pass
        yield out
