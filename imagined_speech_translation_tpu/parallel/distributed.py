"""Multi-host (DCN) runtime scaffolding.

The reference is strictly single-GPU (SURVEY.md §2.6: no DDP/NCCL/MPI
anywhere); this module is the net-new TPU-native scale-out story: one
process per host, `jax.distributed` for the coordination plane, a hybrid
ICI×DCN mesh (``parallel.mesh.make_mesh(n_dcn=...)``) for the data plane.
Gradients ride ICI within a slice and DCN across slices — XLA inserts the
hierarchical all-reduce from the sharding annotations alone (scaling-book
recipe), so no code here touches collectives.

Env-var driven so launchers (GKE/xpk-style) can configure without flags:
``IST_COORDINATOR`` / ``IST_NUM_PROCESSES`` / ``IST_PROCESS_ID``.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)

_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Initialize the multi-host runtime; returns True if distributed.

    No-op (returns False) when no coordinator is configured and the
    environment provides no cluster autodetection hints — the single-host
    path stays untouched.  Safe to call more than once.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get("IST_COORDINATOR")
    if num_processes is None and "IST_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["IST_NUM_PROCESSES"])
    if process_id is None and "IST_PROCESS_ID" in os.environ:
        process_id = int(os.environ["IST_PROCESS_ID"])

    # Three ways in: an explicit coordinator (env or args), or
    # IST_DISTRIBUTED=1 which calls jax.distributed.initialize() with no
    # arguments so TPU pod slices autodetect via the metadata server.
    # Without any of these the single-host path stays untouched (calling
    # initialize() unconditionally would hang on dev machines).
    autodetect = os.environ.get("IST_DISTRIBUTED", "") in ("1", "true")
    if coordinator_address is None and num_processes is None and not autodetect:
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    logger.info(
        "distributed runtime: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns host-side side effects (metrics files,
    checkpoint metadata, wandb)."""
    return jax.process_index() == 0


def sync_hosts(name: str = "ist_barrier") -> None:
    """Barrier across hosts (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def host_barrier(name: str = "ist_host_barrier", timeout_s: float = 600.0) -> None:
    """Coordination-service barrier: pure RPC, no device collective.

    Unlike :func:`sync_hosts` (which executes an XLA collective and therefore
    requires the communicator rendezvous to already be survivable), this rides
    the jax.distributed coordination client directly with an explicit timeout.
    Use it to line processes up BEFORE the first collective executes — e.g.
    after AOT-compiling a sharded program — so that slow, skewed compiles on
    oversubscribed hosts don't blow the Gloo/NCCL key-value rendezvous
    deadline (observed: Gloo ``GetKeyValue() timed out (30s)`` when two
    single-core processes compile a big program at different rates).

    No-op when the coordination client isn't up (single-process).
    """
    from jax._src import distributed as _jdist

    client = _jdist.global_state.client
    if client is not None and jax.process_count() > 1:
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))
