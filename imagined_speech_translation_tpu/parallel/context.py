"""Window-level context parallelism: ring attention over a ``seq`` mesh axis.

The reference handles its whole T=1651 window on one device — sequence /
context parallelism does not exist there (SURVEY.md §2.6: "CP across ICI
only if streaming windows grow").  This is the TPU-native scaling path for
when they do: shard the TIME axis of the per-region token sequence over a
``seq`` mesh axis, keep each device's Q block resident, and rotate the K/V
shards around the ring with ``lax.ppermute`` while an online-softmax
accumulator folds each visiting block:

* math: identical to one-device ``softmax(QKᵀ·scale)V`` — the online
  (max, sumexp, weighted-V) carry is the flash-attention recurrence, so
  no (S, S) score matrix ever exists globally OR locally;
* communication: each step moves one (B, H, S/n, D) K and V block to the
  ring neighbor — nearest-neighbor ICI traffic that XLA overlaps with the
  block einsums; total bytes = the all-gather volume, but peak memory per
  chip stays O(S/n);
* autodiff: the loop is a ``lax.scan`` whose only collective is
  ``ppermute`` (transpose = counter-rotation), so reverse-mode AD gives
  the ring-attention backward for free — training through a
  context-sharded window works without a hand-written VJP.

Scope matches the flash kernel's contract (``ops/pallas_attention.py``):
unmasked bidirectional attention (the encoder pattern); no attention-prob
dropout (per-block PRNG coordination across the ring is not worth it for
an eval/long-window path — train-time dropout stays on the single-chip
flash path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _ring_attention_local(q, k, v, *, axis_name: str, n_shards: int, scale):
    """Per-shard body (runs under shard_map): q/k/v are the LOCAL
    ``(B, H, S/n, D)`` blocks; returns the local output block."""
    q32 = q.astype(jnp.float32)

    def step(carry, _):
        k_cur, v_cur, m, l, acc = carry
        s = (
            jnp.einsum("bhqd,bhkd->bhqk", q32, k_cur.astype(jnp.float32))
            * scale
        )
        m_blk = s.max(axis=-1)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + p.sum(axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32)
        )
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, m_new, l_new, acc_new), None

    b, h, s_loc, _ = q.shape
    d = v.shape[-1]
    # accumulator init is device-varying over the ring axis (each shard
    # carries its own block statistics) — mark it so scan's carry types
    # match the varying outputs under shard_map's axis tracking
    if hasattr(jax.lax, "pcast"):  # jax >= 0.9
        def _vary(x):
            return jax.lax.pcast(x, axis_name, to="varying")
    else:
        def _vary(x):
            return jax.lax.pvary(x, axis_name)
    init = (
        k,
        v,
        _vary(jnp.full((b, h, s_loc), -jnp.inf, jnp.float32)),
        _vary(jnp.zeros((b, h, s_loc), jnp.float32)),
        _vary(jnp.zeros((b, h, s_loc, d), jnp.float32)),
    )
    (_, _, _, l, acc), _ = jax.lax.scan(step, init, None, length=n_shards)
    return (acc / l[..., None]).astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "seq",
    scale: float | None = None,
) -> jax.Array:
    """Context-parallel attention over ``(B, H, S, D)`` with S sharded on
    ``mesh``'s ``axis``.

    ``S`` must be divisible by the axis size; with axis size 1 this
    degrades to plain single-device attention (same math, no collectives).
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {axis!r}: {mesh.axis_names}")
    n = mesh.shape[axis]
    if q.shape[-2] % n:
        raise ValueError(f"seq {q.shape[-2]} not divisible by {n} shards")
    if scale is None:
        scale = q.shape[-1] ** -0.5

    spec = P(None, None, axis, None)
    body = functools.partial(
        _ring_attention_local, axis_name=axis, n_shards=n, scale=scale
    )
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)
