"""Tracing/profiling facade (SURVEY.md §5: the reference has none beyond tqdm
timing; here ``jax.profiler`` traces are first-class)."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str | Path, *, create_perfetto_link: bool = False):
    """Capture an xplane trace viewable in TensorBoard/XProf::

        with trace("/tmp/trace"):
            train_step(...)
            jax.block_until_ready(state)
    """
    import jax

    jax.profiler.start_trace(str(log_dir), create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up in the xplane timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Rolling step-time statistics for steady-state throughput reporting."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._t0: float | None = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    @property
    def mean_s(self) -> float | None:
        return sum(self._times) / len(self._times) if self._times else None

    def throughput(self, items_per_step: int) -> float | None:
        m = self.mean_s
        return items_per_step / m if m else None
