"""Mesh construction and sharding rules.

Design (scaling-book recipe): pick a mesh, annotate shardings on params and
batch, let XLA insert collectives.

* ``data`` axis: batch dimension of every batch leaf; params replicated →
  the global batch mean in the loss IS the gradient all-reduce.
* ``model`` axis (optional TP): BART decoder FFN and attention projections
  sharded column/row-wise (Megatron layout) — ``fc1`` column-parallel,
  ``fc2`` row-parallel, q/k/v column-parallel over heads, out_proj
  row-parallel.  The optax state (mu/nu mirror the param tree) picks up the
  same rules by path matching.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.trees import _key_str


def make_mesh(
    n_data: int = -1,
    n_model: int = 1,
    *,
    n_dcn: int = 1,
    axis_names: tuple[str, str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """(data, model) mesh over ICI; ``n_dcn > 1`` prepends a ``dcn`` axis for
    multi-slice data parallelism (axes become ``('dcn', data, model)``).

    On a real multi-host cluster the dcn axis maps across slices via
    ``mesh_utils.create_hybrid_device_mesh`` so intra-slice collectives ride
    ICI and only the dcn-axis gradient reduction crosses the data-center
    network; single-process (tests, virtual CPU meshes) falls back to a plain
    reshape with the same axis semantics."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data == -1:
        if n % (n_model * n_dcn):
            raise ValueError(
                f"{n} devices not divisible by model={n_model} x dcn={n_dcn}"
            )
        n_data = n // (n_model * n_dcn)
    if n_dcn * n_data * n_model > n:
        raise ValueError(
            f"mesh {n_dcn}x{n_data}x{n_model} needs more than {n} devices"
        )
    if n_dcn > 1:
        dcn_names = ("dcn",) + tuple(axis_names)
        if jax.process_count() > 1:
            from jax.experimental import mesh_utils

            # multi-slice TPU devices carry a slice_index (the DCN granule);
            # when slice indices don't actually partition the devices into
            # n_dcn granules (multi-host single-slice clusters, the CPU
            # cluster proof in tools/multiproc_proof.py — where every device
            # reports slice 0) group by process instead
            slice_ids = {getattr(d, "slice_index", None) for d in devices}
            use_slices = None not in slice_ids and len(slice_ids) == n_dcn
            grid = mesh_utils.create_hybrid_device_mesh(
                (n_data, n_model),
                dcn_mesh_shape=(n_dcn, 1),
                devices=devices,
                process_is_granule=not use_slices,
            ).reshape(n_dcn, n_data, n_model)
            return Mesh(grid, dcn_names)
        grid = np.asarray(devices[: n_dcn * n_data * n_model]).reshape(
            n_dcn, n_data, n_model
        )
        return Mesh(grid, dcn_names)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# (path regex, partition spec builder) — applied to params AND the mirrored
# optimizer-moment trees; first match wins.
_TP_RULES: tuple[tuple[str, P], ...] = (
    # BART decoder FFN: column- then row-parallel
    (r"bart/.*fc1/kernel$", P(None, "model")),
    (r"bart/.*fc1/bias$", P("model")),
    (r"bart/.*fc2/kernel$", P("model", None)),
    # attention projections: heads column-parallel, output row-parallel
    (r"bart/.*(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r"bart/.*(q_proj|k_proj|v_proj)/bias$", P("model")),
    (r"bart/.*out_proj/kernel$", P("model", None)),
    # region-encoder wide projections (leading region axis at dim 0)
    (r"region_encoders/.*cnn_to_attn_fc1/kernel$", P(None, None, "model")),
    (r"region_encoders/.*ffn\d/linear1/kernel$", P(None, None, "model")),
    (r"region_encoders/.*ffn\d/gate/kernel$", P(None, None, "model")),
    (r"region_encoders/.*ffn\d/linear2/kernel$", P(None, "model", None)),
)


def _spec_for(path: str, leaf, tp: bool) -> P:
    if tp:
        for pattern, spec in _TP_RULES:
            if re.search(pattern, path):
                if hasattr(leaf, "ndim") and leaf.ndim == len(
                    [s for s in spec]
                ):
                    return spec
    return P()


def state_sharding_tree(abstract_state, mesh: Mesh, *, tp: bool = False):
    """Build a NamedSharding pytree matching ``abstract_state`` (a TrainState
    or any pytree of arrays / ShapeDtypeStructs)."""

    def rule(path_keys, leaf):
        path = "/".join(_key_str(k) for k in path_keys)
        if not hasattr(leaf, "ndim"):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _spec_for(path, leaf, tp))

    return jax.tree_util.tree_map_with_path(rule, abstract_state)


def shard_train_state(state, mesh: Mesh, *, tp: bool = False):
    """Commit an existing (host/single-device) train state onto the mesh."""
    shardings = state_sharding_tree(state, mesh, tp=tp)
    return jax.device_put(state, shardings)


def batch_sharding(mesh: Mesh, batch: dict, *, batch_axis: int = 0):
    """Shardings for a batch dict: leading (or given) axis over ``data``
    (jointly over ``('dcn', 'data')`` on a hybrid mesh); ``channel_mask``
    replicated."""
    data_axes = (
        ("dcn", "data") if "dcn" in mesh.axis_names else "data"
    )

    def spec(k, v):
        if k == "channel_mask" or not hasattr(v, "ndim"):
            return NamedSharding(mesh, P())
        axes: list = [None] * v.ndim
        axes[batch_axis] = data_axes
        return NamedSharding(mesh, P(*axes))

    return {k: spec(k, v) for k, v in batch.items()}


def shard_batch(mesh: Mesh, batch: dict, *, batch_axis: int = 0):
    sh = batch_sharding(mesh, batch, batch_axis=batch_axis)
    return {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
