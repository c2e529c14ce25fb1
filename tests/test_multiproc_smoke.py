"""Seconds-scale two-process ``jax.distributed`` smoke (DEFAULT tier).

The full cluster proof (``tests/test_multiproc.py``, heavy tier, ~6 min:
sharded train step + multihost orbax roundtrip vs a single-process oracle)
is too expensive to run on every invocation, so cross-process regressions
used to surface only in the heavy tier.  This smoke keeps the load-bearing
part in the default tier at seconds scale: a REAL ``jax.process_count()==2``
rendezvous through ``initialize_distributed`` (the same ``IST_*`` env
contract production launchers use) plus one ``psum`` whose reduction crosses
the process boundary — each process holds half the array, so the asserted
global sum cannot be produced locally.

Reference scope note: the reference has no distributed machinery at all
(SURVEY.md §2.6); this covers the net-new TPU-native scale-out plane.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["IST_REPO"])
import numpy as np
import jax
# the axon site config overrides the JAX_PLATFORMS env var: pin the CPU
# backend explicitly (same as tools/multiproc_proof._pin_cpu) BEFORE any
# backend initialization
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagined_speech_translation_tpu.parallel.distributed import (
    host_barrier,
    initialize_distributed,
    is_primary,
)

assert initialize_distributed(), "coordinator env not picked up"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
x = jax.make_array_from_callback(
    (4,), NamedSharding(mesh, P("data")),
    lambda idx: np.arange(1.0, 5.0, dtype=np.float32)[idx],
)
f = jax.jit(jax.shard_map(
    lambda v: jnp.full_like(v, jax.lax.psum(v.sum(), "data")),
    mesh=mesh, in_specs=P("data"), out_specs=P("data"),
))
y = f(x)
# every local shard must carry the GLOBAL sum 1+2+3+4: this process only
# holds two of the four elements, so 10.0 proves the collective crossed
# the process boundary
local = np.asarray(y.addressable_shards[0].data)
assert float(local.ravel()[0]) == 10.0, local
host_barrier("smoke_done", timeout_s=120.0)
print("SMOKE_OK", jax.process_index(), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_psum_smoke():
    port = _free_port()
    base_env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "IST_COORDINATOR",
                     "IST_NUM_PROCESSES", "IST_PROCESS_ID", "IST_DISTRIBUTED")
    }
    base_env.update(
        IST_REPO=str(REPO),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        IST_COORDINATOR=f"localhost:{port}",
        IST_NUM_PROCESSES="2",
    )
    workers = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER],
            env=dict(base_env, IST_PROCESS_ID=str(i)),
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = [w.communicate(timeout=180) for w in workers]
    for i, (w, (so, se)) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f"worker {i} rc={w.returncode}:\n{se[-3000:]}"
        assert f"SMOKE_OK {i}" in so, so
