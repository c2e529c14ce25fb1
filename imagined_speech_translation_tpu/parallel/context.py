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
bidirectional attention (the encoder pattern), optionally with a key-
validity mask (``kv_valid``) so sequences padded to a shard multiple stay
mathematically identical to the unpadded single-device result; no
attention-prob dropout (per-block PRNG coordination across the ring is
not worth it — when ``RegionEncoderConfig.seq_shards > 1`` routes training
through here, attention-prob dropout is simply not applied; all other
dropouts are unaffected).

The model-side consumer is ``models/layers.py`` ``MultiHeadAttention``:
``RegionEncoderConfig.seq_shards > 1`` pads the region token sequence to a
shard multiple and routes all in-region attention through here, picking up
the concrete mesh from :func:`context_mesh`.
"""

from __future__ import annotations

import contextlib
import functools
import threading

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_ctx = threading.local()


@contextlib.contextmanager
def context_mesh(mesh: Mesh):
    """Expose ``mesh`` to model code traced inside this block.

    ``RegionEncoderConfig.seq_shards > 1`` makes the region encoder route
    its token attention through :func:`ring_attention`, which needs the
    concrete mesh for ``shard_map`` — but flax modules only carry static
    config.  The call-site (trainer / dryrun / test) wraps ``model.init`` /
    ``model.apply`` (or the ``jax.jit`` call that traces them) in this
    context manager; the mesh is only consulted at TRACE time, so a jitted
    program keeps working after the block exits."""
    prev = getattr(_ctx, "mesh", None)
    _ctx.mesh = mesh
    try:
        yield mesh
    finally:
        _ctx.mesh = prev


def get_context_mesh() -> Mesh | None:
    """The mesh installed by :func:`context_mesh`, or None."""
    return getattr(_ctx, "mesh", None)


def _ring_attention_local(
    q, k, v, kv_valid=None, *, axis_name: str, n_shards: int, scale
):
    """Per-shard body (runs under shard_map): q/k/v are the LOCAL
    ``(B, H, S/n, D)`` blocks, ``kv_valid`` the local ``(S/n,)`` key
    validity; returns the local output block."""
    q32 = q.astype(jnp.float32)
    masked = kv_valid is not None

    def step(carry, _):
        k_cur, v_cur, valid_cur, m, l, acc = carry
        s = (
            jnp.einsum("bhqd,bhkd->bhqk", q32, k_cur.astype(jnp.float32))
            * scale
        )
        if masked:
            s = jnp.where(valid_cur[None, None, None, :], s, -jnp.inf)
        m_blk = s.max(axis=-1)
        m_new = jnp.maximum(m, m_blk)
        if masked:
            # all-masked guards: a block with no valid keys keeps m at -inf;
            # exp(-inf - -inf) would be NaN, so shift by a finite stand-in
            # and zero the contributions explicitly
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            p = jnp.where(
                jnp.isfinite(s), jnp.exp(s - m_safe[..., None]), 0.0
            )
            corr = jnp.where(jnp.isfinite(m), jnp.exp(m - m_safe), 0.0)
        else:
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
        l_new = l * corr + p.sum(axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32)
        )
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        valid_nxt = (
            jax.lax.ppermute(valid_cur, axis_name, perm) if masked else valid_cur
        )
        return (k_nxt, v_nxt, valid_nxt, m_new, l_new, acc_new), None

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
        kv_valid if masked else jnp.zeros((), jnp.bool_),
        _vary(jnp.full((b, h, s_loc), -jnp.inf, jnp.float32)),
        _vary(jnp.zeros((b, h, s_loc), jnp.float32)),
        _vary(jnp.zeros((b, h, s_loc, d), jnp.float32)),
    )
    (_, _, _, _, l, acc), _ = jax.lax.scan(step, init, None, length=n_shards)
    # every query sees >= 1 globally-valid key (padding is keys-only), so
    # l > 0; the maximum() only guards the all-masked degenerate call
    return (acc / jnp.maximum(l, 1e-37)[..., None]).astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "seq",
    scale: float | None = None,
    kv_valid: jax.Array | None = None,
) -> jax.Array:
    """Context-parallel attention over ``(B, H, S, D)`` with S sharded on
    ``mesh``'s ``axis``.

    ``S`` must be divisible by the axis size; with axis size 1 this
    degrades to plain single-device attention (same math, no collectives).

    ``kv_valid`` (``(S,)`` bool, sharded like the sequence) excludes key
    positions from every query's softmax — the padding story: callers whose
    true S is not a shard multiple zero-pad keys/queries to one and mask
    the padded KEYS; padded query rows produce outputs the caller discards.
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
    if kv_valid is None:
        return jax.shard_map(
            body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
        )(q, k, v)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec, P(axis)),
        out_specs=spec,
    )(q, k, v, kv_valid)
