"""Recycling decode worker (runtime/worker.py): the serving-RSS bound.

The round-4 on-chip soak attributed server RSS growth to the remote-TPU
tunnel transport leaking every transferred byte; the worker bounds it by
running the decode program in a child process recycled at an RSS budget.
These tests drive the full spawn/proxy/recycle/crash machinery with fake
decode functions (no device) — the factory contract, result fidelity
across recycles, budget-triggered recycling, and crash recovery.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from imagined_speech_translation_tpu.runtime.worker import DecodeWorker, _rss_mb

# module-level factories: DecodeWorker factories must be picklable (spawn)

_LEAK = []  # lives in the CHILD process only


def _echo_factory():
    def decode_fn(batch):
        return [f"w{i}:{float(batch[i].sum()):.0f}" for i in range(batch.shape[0])]

    return decode_fn


def _leaky_factory():
    def decode_fn(batch):
        _LEAK.append(np.ones(100 * 2**20 // 8))  # retain ~100 MB per call
        return ["leak"] * batch.shape[0]

    return decode_fn


def _crashy_factory():
    def decode_fn(batch):
        if float(batch[0, 0, 0]) == 42.0:
            os._exit(1)  # simulate the child dying mid-call
        return ["ok"] * batch.shape[0]

    return decode_fn


def test_worker_roundtrip_and_stats():
    with DecodeWorker(_echo_factory, rss_budget_mb=1e6) as w:
        batch = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
        assert w(batch) == ["w0:66", "w1:210"]
        assert w(np.zeros((1, 3, 4), np.float32)) == ["w0:0"]
        s = w.stats()
        assert s["calls"] == 2 and s["recycles"] == 0
        assert s["child_pid"] is not None
    assert w._proc is None  # context exit stopped the child


def test_worker_recycles_on_rss_budget():
    w = DecodeWorker(_leaky_factory, rss_budget_mb=1.0, check_every=1)
    w.start()
    try:
        pid0 = w._proc.pid
        baseline = _rss_mb(pid0)
        # real budget: baseline + ~250 MB, so ~3 leaky calls trip it
        w.rss_budget_mb = baseline + 250.0
        for _ in range(6):
            assert w(np.zeros((1, 2, 2), np.float32)) == ["leak"]
        assert w.recycles >= 1, w.stats()
        assert w._proc.pid != pid0  # fresh child after recycle
        # the fresh child serves correctly
        assert w(np.zeros((1, 2, 2), np.float32)) == ["leak"]
    finally:
        w.stop()


def test_worker_crash_recovery():
    w = DecodeWorker(_crashy_factory, rss_budget_mb=1e6)
    w.start()
    try:
        ok = np.zeros((1, 2, 2), np.float32)
        assert w(ok) == ["ok"]
        boom = np.zeros((1, 2, 2), np.float32)
        boom[0, 0, 0] = 42.0
        with pytest.raises(RuntimeError, match="crashed"):
            w(boom)
        # next call transparently respawns the child
        assert w(ok) == ["ok"]
        assert w.recycles == 1
    finally:
        w.stop()


def test_worker_rejects_bad_budget():
    with pytest.raises(ValueError):
        DecodeWorker(_echo_factory, rss_budget_mb=0)
