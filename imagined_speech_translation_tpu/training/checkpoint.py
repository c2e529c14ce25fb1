"""Orbax checkpointing with the reference's cadence semantics.

Reference (``main_model/src/training/trainer.py:339-453``, ``scripts/
train.py:365-368``): ``best_model`` on improvement, ``checkpoint_epoch_N``
every save-interval, ``interrupted_checkpoint`` on Ctrl-C; payload includes
model/optimizer/scheduler state, epoch, global step, best metrics, diversity
history and adaptive loss weights.  Here the train state (params, BN stats,
optax state, step, loss weights) plus host-side metadata (epoch, metrics,
scheduler/adaptive state, data-order epoch) are saved atomically per
checkpoint directory; unlike the reference, the data-iterator epoch makes
resume deterministic.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, *, max_epoch_keep: int = 3):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.max_epoch_keep = max_epoch_keep
        self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------------
    def _save(self, name: str, state, meta: dict[str, Any]):
        from ..parallel.distributed import is_primary, sync_hosts

        path = self.dir / name
        multihost = jax.process_count() > 1
        if is_primary() and path.exists():
            shutil.rmtree(path)
        sync_hosts("ckpt_clear")
        if multihost:
            # leave arrays on device: orbax gathers the shards of
            # jax.Arrays across processes (np.asarray would only see the
            # locally-addressable shards)
            tree = _as_pytree(state)
        else:
            tree = jax.tree.map(np.asarray, _as_pytree(state))
        self._ckptr.save(path / "state", tree)
        self._ckptr.wait_until_finished()
        if is_primary():
            (path / "meta.json").write_text(json.dumps(meta, default=_js))
        sync_hosts("ckpt_done")

    def save_best(self, state, meta):
        self._save("best_model", state, meta)

    def save_epoch(self, state, epoch: int, meta):
        self._save(f"checkpoint_epoch_{epoch + 1}", state, meta)
        self._gc_epochs()

    def save_interrupted(self, state, meta):
        self._save("interrupted_checkpoint", state, meta)

    def _gc_epochs(self):
        from ..parallel.distributed import is_primary

        if not is_primary():
            return
        epochs = sorted(
            (p for p in self.dir.glob("checkpoint_epoch_*")),
            key=lambda p: int(p.name.rsplit("_", 1)[1]),
        )
        for p in epochs[: -self.max_epoch_keep]:
            shutil.rmtree(p, ignore_errors=True)

    # ------------------------------------------------------------------
    def restore(self, name: str, target_state):
        """Restore into the structure of ``target_state``; returns
        (state, meta)."""
        path = self.dir / name
        if jax.process_count() > 1:
            # restore against the live (sharded) target so each process gets
            # its addressable shards back with the same NamedShardings
            template = _as_pytree(target_state)
        else:
            template = jax.tree.map(np.asarray, _as_pytree(target_state))
        restored = self._ckptr.restore(path / "state", template)
        meta = json.loads((path / "meta.json").read_text())
        return target_state.replace(**restored), meta

    def latest_epoch_checkpoint(self) -> str | None:
        epochs = sorted(
            (p for p in self.dir.glob("checkpoint_epoch_*")),
            key=lambda p: int(p.name.rsplit("_", 1)[1]),
        )
        return epochs[-1].name if epochs else None

    def exists(self, name: str) -> bool:
        return (self.dir / name).exists()


def _as_pytree(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "loss_weights": state.loss_weights,
    }


def _js(x):
    if isinstance(x, (np.integer,)):
        return int(x)
    if isinstance(x, (np.floating,)):
        return float(x)
    if hasattr(x, "item"):
        return x.item()
    return str(x)
