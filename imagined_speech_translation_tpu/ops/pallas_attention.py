"""Blocked online-softmax (flash) attention Pallas kernels for TPU.

Targets the reference's FLOPs hot spot: dense O(T²) self-attention over the
1655-token per-region sequences (``main_model/src/models/layers.py:230-251``;
SURVEY.md §3.2).  Instead of materializing the (S, S) probability matrix in
HBM, each q-block streams k/v blocks through VMEM with the online-softmax
recurrence (running max ``m``, normalizer ``l``, accumulator ``acc``), so HBM
traffic is O(S·D) and the matmuls stay on the MXU.

Round 2 additions (this is now the TRAINING path, not just eval/decode):

* **custom VJP** — FlashAttention-2 style backward: the forward also emits
  the per-row logsumexp; the backward recomputes probabilities blockwise so
  the (S, S) tensor is never materialized in either direction.  Two
  formulations, picked per config (measured on v5e): a fully FUSED kernel
  (grid over k-blocks, whole-q + f32 dq VMEM-resident, each tile's s/dp and
  dropout mask computed once for all three gradients) when dropout is on —
  the training hot path; split dq / dk+dv kernels with a single giant kv
  block when dropout is off.
* **in-kernel dropout** — attention-probability dropout (the reference's
  ``nn.MultiheadAttention(dropout=0.1)``) via the TPU PRNG.  Bits are drawn
  per (q-block, k-block) tile with a seed mixed from
  ``(seed, batch·head, q_block, k_block)``, so the forward and both backward
  kernels regenerate identical masks without storing them.
* **exp2 softmax** — log2(e) is folded into the q scaling so the inner loop's
  transcendental is a bare ``exp2`` (the VPU's native exponent), shaving the
  per-element multiply off the old ``exp`` path.

Layout: ``(batch, heads, seq, head_dim)``.  Arrays reach the kernels
UNPADDED: Pallas masks boundary blocks (a block dim must be an (8,128)
multiple or equal to the array dim, so head dims 96/192 ride as-is), the
key tail is masked by ``kv_len`` and the backward masks tail q rows — no
host-side pad/unpad copies touch HBM.  Unmasked (full) attention only —
exactly the encoder's pattern; masked/causal shapes fall back to the jnp
path in ``ops.attention``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30
LOG2E = math.log2(math.e)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dropout_threshold(rate: float) -> jnp.ndarray:
    """uint32 threshold t with P(bits < t) = rate for uniform uint32 bits."""
    return jnp.uint32(min(int(round(rate * 2.0**32)), 2**32 - 1))


def _hash_bits(seed, tile_id, shape):
    """Portable counter-based uint32 hash (xmur-style avalanche) over the
    tile's element indices.  Pure jnp, so it lowers everywhere — used in
    interpret mode (``pltpu.prng_seed`` has no interpret lowering) and by
    the host-side test oracle (:func:`dropout_keep_mask_reference`)."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = rows * jnp.uint32(shape[1]) + cols
    x = x + jnp.uint32(0x9E3779B9) * tile_id.astype(jnp.uint32)
    x = x + jnp.uint32(0x85EBCA6B) * seed.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _tile_keep_mask(seed_ref, bh, qi, ki, shape, rate: float, interpret: bool):
    """Regenerate the (q-tile, k-tile) dropout keep-mask.  Deterministic in
    (seed, bh, qi, ki) so forward and backward kernels agree bit-for-bit.
    The TPU PRNG accepts at most two seed words, so the tile coordinates are
    packed into one int32 (valid while qi, ki < 256 — i.e. S < 256·block).
    The seed rides a (1, 128) int32 VMEM row: scalar SMEM blocks fail the
    Mosaic block checks when vmap batches this kernel (the region encoders
    vmap it over the region axis), VMEM rows batch cleanly.

    Interpret mode swaps the hardware PRNG for the portable counter hash
    (same tile layout, different bits) so the dropout code paths are
    CPU-testable against a host-reconstructed mask."""
    tile_id = (bh * 256 + qi) * 256 + ki
    if interpret:
        bits = _hash_bits(seed_ref[0, 0], tile_id, shape)
        return bits >= _dropout_threshold(rate)
    pltpu.prng_seed(seed_ref[0, 0], tile_id)
    if shape[0] % 4 == 0:
        # Byte-packed draw: generate 4× fewer PRNG words and use each of a
        # word's four bytes as an independent uniform-u8 draw, unpacked
        # along sublanes.  PRNG word generation is the dominant cost of the
        # in-kernel dropout (~25% of the fused-bwd kernel time); the keep
        # probability quantizes to 1/256 (rate 0.1 → 26/256 ≈ 0.1016,
        # within the hardware gate's 5e-3 keep-fraction bound and
        # immaterial to training).  Deterministic in (seed, tile) exactly
        # like the full-word path, so forward and backward still agree.
        words = pltpu.bitcast(
            pltpu.prng_random_bits((shape[0] // 4, shape[1])), jnp.uint32
        )
        bytes_ = jnp.concatenate(
            [(words >> (8 * b)) & jnp.uint32(0xFF) for b in range(4)], axis=0
        )
        return bytes_ >= jnp.uint32(min(int(round(rate * 256.0)), 256))
    # prng_random_bits returns int32 on hardware; the keep comparison
    # must be UNSIGNED or the negative half of the bit space sorts below
    # every threshold (mixed int32>=uint32 promotes through int64 and,
    # with x64 disabled, truncates back to a SIGNED int32 compare —
    # silently dropping ~50% at any rate; caught by the round-3
    # fused_bwd_rate_to_zero hardware gate in tools/tpu_kernel_check.py).
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= _dropout_threshold(rate)


def dropout_keep_mask_reference(
    seed: int, b: int, h: int, s_q: int, s_kv: int,
    *, block_q: int, block_k: int, rate: float,
):
    """Host-side oracle: the exact keep-mask the INTERPRET-mode kernels draw,
    assembled as a dense (b, h, s_q, s_kv) boolean array.  Tests compare
    flash gradients (interpret) against a jnp attention masked with this."""
    q_pad = _round_up(s_q, block_q)
    kv_pad = _round_up(s_kv, block_k)
    seed_a = jnp.asarray(seed, jnp.int32)
    rows = []
    for bh in range(b * h):
        tiles_q = []
        for qi in range(q_pad // block_q):
            tiles_k = []
            for ki in range(kv_pad // block_k):
                tile_id = jnp.asarray((bh * 256 + qi) * 256 + ki, jnp.int32)
                bits = _hash_bits(seed_a, tile_id, (block_q, block_k))
                tiles_k.append(bits >= _dropout_threshold(rate))
            tiles_q.append(jnp.concatenate(tiles_k, axis=1))
        rows.append(jnp.concatenate(tiles_q, axis=0))
    mask = jnp.stack(rows).reshape(b, h, q_pad, kv_pad)
    return mask[:, :, :s_q, :s_kv]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
    *, block_k: int, kv_len: int, scale: float, dropout_rate: float,
    interpret: bool,
):
    # q_ref: (block_q, d); k_ref/v_ref: (kv_pad, d); o_ref: (block_q, d);
    # lse_ref: (1, block_q) — base-2 logsumexp of the scaled scores (rows
    # ride the lane dim; TPU blocks must stay 2-D).
    # Inputs stay in their storage dtype (bf16 rides the fast MXU path);
    # accumulation is always float32 via preferred_element_type.
    bh, qi = pl.program_id(0), pl.program_id(1)
    q = q_ref[:] * jnp.asarray(scale * LOG2E, q_ref.dtype)
    block_q, d = q.shape
    kv_pad = k_ref.shape[0]
    n_blocks = kv_pad // block_k
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[pl.ds(i * block_k, block_k), :]
        v = v_ref[pl.ds(i * block_k, block_k), :]
        # boundary tail rows are undefined (NaN in interpret mode) and ride
        # the p.v contraction where 0*NaN = NaN — zero them explicitly
        kv_row = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
        v = jnp.where(kv_row + i * block_k < kv_len, v, 0)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k), base-2 log domain
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col + i * block_k < kv_len, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1))
        p = jnp.exp2(s - m_new[:, None])
        alpha = jnp.exp2(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1)  # normalizer over PRE-dropout p
        if dropout_rate > 0.0:
            keep = _tile_keep_mask(seed_ref, bh, qi, i, p.shape, dropout_rate, interpret)
            p = jnp.where(keep, p * inv_keep, 0.0)
        acc_new = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))
    l = jnp.maximum(l, 1e-30)
    o_ref[:] = (acc / l[:, None]).astype(o_ref.dtype)
    lse_ref[0, :] = m + jnp.log2(l)


def _fwd_call(
    qp, kp, vp, seed, *, block_q: int, block_k: int, kv_len: int,
    scale: float, dropout_rate: float, interpret: bool,
):
    # Arrays are UNPADDED (bh, S, D): Pallas masks boundary blocks itself
    # (a block dim must be an (8,128) multiple OR equal to the array dim —
    # head dims 96/192 ride as-is), which removes the host-side pad/unpad
    # copies entirely.  Tail q rows may read garbage; their outputs are
    # clipped on write and the backward masks their contributions.
    bh, q_len, d = qp.shape
    q_ceil = _round_up(q_len, block_q)
    kv_ceil = _round_up(kv_len, block_k)
    kernel = functools.partial(
        _fwd_kernel, block_k=block_k, kv_len=kv_len, scale=scale,
        dropout_rate=dropout_rate, interpret=interpret,
    )
    grid = (bh, q_ceil // block_q)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bh, q_len, d), qp.dtype),
            jax.ShapeDtypeStruct((bh, 1, q_ceil), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 128), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (None, block_q, d), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, kv_ceil, d), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, kv_ceil, d), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (None, block_q, d), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 1, block_q), lambda b, i: (b, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * q_ceil * kv_ceil * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize
            + bh * q_len * d * qp.dtype.itemsize,
            transcendentals=bh * q_ceil * kv_ceil,
        ),
        interpret=interpret,
    )(seed, qp, kp, vp)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_fused_kernel(
    seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref,
    *, block_q: int, q_len: int, kv_len: int, scale: float,
    dropout_rate: float, interpret: bool,
):
    # One fused backward (FlashAttention-2 collapsed into a single kernel):
    # grid (bh, k-block), inner loop over q-blocks.  Each (q, k) tile's
    # s / p / dp — and its dropout mask — are computed ONCE and feed all
    # three gradients (the split dq / dkv formulation recomputed them twice):
    #   dV  = P̃ᵀ dO            (accumulated over the inner q loop)
    #   dS  = P ∘ (M/κ ∘ (dO Vᵀ) − Δ)
    #   dK  = dSᵀ (scale·Q)     (accumulated over the inner q loop)
    #   dQ += scale · dS K      (VMEM-resident full block, revisited
    #                            contiguously across the k grid axis)
    bh, ki = pl.program_id(0), pl.program_id(1)
    k = k_ref[:]
    v = v_ref[:]
    block_k, d = k.shape
    # zero undefined boundary rows: they ride contractions (0*NaN = NaN)
    kv_row = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
    kv_valid = kv_row + ki * block_k < kv_len
    k = jnp.where(kv_valid, k, 0)
    v = jnp.where(kv_valid, v, 0)
    q_pad = q_ref.shape[0]
    n_q = q_pad // block_q
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    col_valid = col + ki * block_k < kv_len
    scale2 = jnp.asarray(scale * LOG2E, q_ref.dtype)

    @pl.when(ki == 0)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    def body(qj, carry):
        dk_acc, dv_acc = carry
        q = q_ref[pl.ds(qj * block_q, block_q), :]
        do = do_ref[pl.ds(qj * block_q, block_q), :]
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        row_valid = row + qj * block_q < q_len
        q = jnp.where(row_valid, q, 0)
        do = jnp.where(row_valid, do, 0)
        lse = lse_ref[0, pl.ds(qj * block_q, block_q)]
        delta = delta_ref[0, pl.ds(qj * block_q, block_q)]
        s = jax.lax.dot_general(
            q * scale2, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(col_valid, s, NEG_INF)
        p = jnp.exp2(s - lse[:, None])
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if dropout_rate > 0.0:
            keep = _tile_keep_mask(seed_ref, bh, qj, ki, p.shape, dropout_rate, interpret)
            p_tilde = jnp.where(keep, p * inv_keep, 0.0)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        else:
            p_tilde = p
        ds = p * (dp - delta[:, None])
        # p/ds can still be NaN on tail rows via undefined lse/delta —
        # zero them before the transposed accumulations
        p_tilde = jnp.where(row_valid, p_tilde, 0.0)
        ds = jnp.where(row_valid, ds, 0.0)
        dv_acc = dv_acc + jax.lax.dot_general(
            p_tilde.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[pl.ds(qj * block_q, block_q), :] += scale * jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    zeros = jnp.zeros((block_k, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, n_q, body, (zeros, zeros))
    # dk accumulates dSᵀ·Q with Q unscaled in the matmul; fold scale here
    dk_ref[:] = dk_acc * scale
    dv_ref[:] = dv_acc


def _bwd_call_fused(
    qp, kp, vp, do, lse, delta, seed, *, block_q: int, block_k: int,
    kv_len: int, scale: float, dropout_rate: float, interpret: bool,
):
    bh, q_len, d = qp.shape
    q_ceil = _round_up(q_len, block_q)
    kv_ceil = _round_up(kv_len, block_k)
    full_q = pl.BlockSpec(
        (None, q_ceil, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    kv_block = pl.BlockSpec(
        (None, block_k, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    full_row = pl.BlockSpec(
        (None, 1, q_ceil), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    seed_spec = pl.BlockSpec(
        (1, 128), lambda b, i: (0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel, block_q=block_q, q_len=q_len, kv_len=kv_len,
            scale=scale, dropout_rate=dropout_rate, interpret=interpret,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, q_len, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, kv_len, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, kv_len, d), jnp.float32),
        ),
        grid=(bh, kv_ceil // block_k),
        in_specs=[seed_spec, full_q, kv_block, kv_block, full_q, full_row,
                  full_row],
        # dq: whole-q block revisited contiguously across the k axis (stays
        # VMEM-resident per bh, flushed once); dk/dv: one block per grid step
        out_specs=(full_q, kv_block, kv_block),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * q_ceil * kv_ceil * d,
            bytes_accessed=(2 * qp.size + 2 * kp.size) * qp.dtype.itemsize
            + (qp.size + 2 * kp.size) * 4,
            transcendentals=bh * q_ceil * kv_ceil,
        ),
        interpret=interpret,
    )(seed, qp, kp, vp, do, lse, delta)
    return dq.astype(qp.dtype), dk.astype(kp.dtype), dv.astype(vp.dtype)


def _bwd_dq_kernel(
    seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, block_k: int, kv_len: int, scale: float, dropout_rate: float,
    interpret: bool,
):
    # Per q-block: stream k/v blocks, recompute p from lse, accumulate
    #   dS = P ∘ (M/κ ∘ (dO Vᵀ) − Δ),  dQ = scale · dS K.
    bh, qi = pl.program_id(0), pl.program_id(1)
    q2 = q_ref[:] * jnp.asarray(scale * LOG2E, q_ref.dtype)  # base-2 domain
    do = do_ref[:]
    lse = lse_ref[0, :]
    delta = delta_ref[0, :]
    block_q, d = q2.shape
    kv_pad = k_ref.shape[0]
    n_blocks = kv_pad // block_k

    def body(i, acc):
        k = k_ref[pl.ds(i * block_k, block_k), :]
        v = v_ref[pl.ds(i * block_k, block_k), :]
        kv_row = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
        kv_valid = kv_row + i * block_k < kv_len
        k = jnp.where(kv_valid, k, 0)
        v = jnp.where(kv_valid, v, 0)
        s = jax.lax.dot_general(
            q2, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col + i * block_k < kv_len, s, NEG_INF)
        p = jnp.exp2(s - lse[:, None])
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, None])
        return acc + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(0, n_blocks, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[:] = (acc * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, q_len: int, kv_len: int, scale: float, dropout_rate: float,
    interpret: bool,
):
    # Grid (bh, k-block, q-block): the q axis rides the grid (Pallas streams
    # q/do blocks through VMEM) and dk/dv output blocks are revisited across
    # it, accumulating in f32:
    #   dV = P̃ᵀ dO,  dK = dSᵀ (scale·Q).
    bh, ki, qj = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    k = k_ref[:]
    v = v_ref[:]
    block_k, d = k.shape
    block_q = q_ref.shape[0]
    kv_row = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
    kv_valid_row = kv_row + ki * block_k < kv_len
    k = jnp.where(kv_valid_row, k, 0)
    v = jnp.where(kv_valid_row, v, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    col_valid = col + ki * block_k < kv_len

    @pl.when(qj == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    row = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    row_valid = row + qj * block_q < q_len
    q_s = jnp.where(row_valid, q_ref[:], 0) * jnp.asarray(scale, q_ref.dtype)
    do = jnp.where(row_valid, do_ref[:], 0)
    lse = lse_ref[0, :]
    delta = delta_ref[0, :]
    s = jax.lax.dot_general(
        q_s * jnp.asarray(LOG2E, q_s.dtype), k,
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    s = jnp.where(col_valid, s, NEG_INF)
    p = jnp.exp2(s - lse[:, None])
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p_tilde = p
    ds = p * (dp - delta[:, None])
    # tail rows can still be NaN via undefined lse/delta
    p_tilde = jnp.where(row_valid, p_tilde, 0.0)
    ds = jnp.where(row_valid, ds, 0.0)
    dv_ref[:] += jax.lax.dot_general(
        p_tilde.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[:] += jax.lax.dot_general(
        ds.astype(q_s.dtype), q_s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_call_split(
    qp, kp, vp, do, lse, delta, seed, *, block_q: int, block_k: int,
    kv_len: int, scale: float, dropout_rate: float, interpret: bool,
):
    # dropout routes to the FUSED backward (masks computed once); the split
    # kernels intentionally carry no mask regeneration
    assert dropout_rate == 0.0, "split backward is dropout-free by dispatch"
    bh, q_len, d = qp.shape
    q_ceil = _round_up(q_len, block_q)
    kv_ceil = _round_up(kv_len, block_k)
    qkv_spec_q = pl.BlockSpec(
        (None, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    full_kv = pl.BlockSpec(
        (None, kv_ceil, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    row_block = pl.BlockSpec(
        (None, 1, block_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
    )
    seed2 = pl.BlockSpec(
        (1, 128), lambda b, i: (0, 0), memory_space=pltpu.VMEM
    )
    seed3 = pl.BlockSpec(
        (1, 128), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM
    )

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, block_k=block_k, kv_len=kv_len, scale=scale,
            dropout_rate=dropout_rate, interpret=interpret,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, q_len, d), qp.dtype),
        grid=(bh, q_ceil // block_q),
        in_specs=[seed2, qkv_spec_q, full_kv, full_kv, qkv_spec_q, row_block,
                  row_block],
        out_specs=qkv_spec_q,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * q_ceil * kv_ceil * d,
            bytes_accessed=(2 * qp.size + 2 * kp.size) * qp.dtype.itemsize,
            transcendentals=bh * q_ceil * kv_ceil,
        ),
        interpret=interpret,
    )(seed, qp, kp, vp, do, lse, delta)

    # dk/dv: q rides the (innermost, sequential) grid axis; outputs are
    # revisited across it and accumulate in f32 for precision, cast outside.
    q_stream = pl.BlockSpec(
        (None, block_q, d), lambda b, i, j: (b, j, 0),
        memory_space=pltpu.VMEM,
    )
    kv_block3 = pl.BlockSpec(
        (None, block_k, d), lambda b, i, j: (b, i, 0),
        memory_space=pltpu.VMEM,
    )
    row_stream = pl.BlockSpec(
        (None, 1, block_q), lambda b, i, j: (b, 0, j), memory_space=pltpu.VMEM
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, q_len=q_len, kv_len=kv_len, scale=scale,
            dropout_rate=dropout_rate, interpret=interpret,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, kv_len, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, kv_len, d), jnp.float32),
        ),
        grid=(bh, kv_ceil // block_k, q_ceil // block_q),
        in_specs=[seed3, q_stream, kv_block3, kv_block3, q_stream, row_stream,
                  row_stream],
        out_specs=(kv_block3, kv_block3),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * q_ceil * kv_ceil * d,
            bytes_accessed=(2 * qp.size + 3 * kp.size) * qp.dtype.itemsize,
            transcendentals=bh * q_ceil * kv_ceil,
        ),
        interpret=interpret,
    )(seed, qp, kp, vp, do, lse, delta)
    return dq, dk.astype(kp.dtype), dv.astype(vp.dtype)


# ---------------------------------------------------------------------------
# custom-VJP core over padded (BH, S_pad, D_pad) arrays
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_core(
    qp, kp, vp, seed, kv_len, scale, block_q, block_k, dropout_rate, interpret
):
    out, _ = _fwd_call(
        qp, kp, vp, seed, block_q=block_q, block_k=block_k, kv_len=kv_len,
        scale=scale, dropout_rate=dropout_rate, interpret=interpret,
    )
    return out


def _flash_core_fwd(
    qp, kp, vp, seed, kv_len, scale, block_q, block_k, dropout_rate, interpret
):
    out, lse = _fwd_call(
        qp, kp, vp, seed, block_q=block_q, block_k=block_k, kv_len=kv_len,
        scale=scale, dropout_rate=dropout_rate, interpret=interpret,
    )
    return out, (qp, kp, vp, seed, out, lse)


def _flash_core_bwd(
    kv_len, scale, block_q, block_k, dropout_rate, interpret, residuals, g
):
    qp, kp, vp, seed, out, lse = residuals
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[:, None, :]  # (BH, 1, q_pad); Δ = rowsum(dO ∘ O) — padded rows are zero
    do = g.astype(qp.dtype)
    # fused (s/dp/mask computed once, PRNG 2x not 3x) wins when dropout is
    # on — the training hot path; the split two-kernel formulation with a
    # single giant kv block wins without dropout (measured on v5e,
    # tools/tpu_kernel_check.py)
    call = _bwd_call_fused if dropout_rate > 0.0 else _bwd_call_split
    dq, dk, dv = call(
        qp, kp, vp, do, lse, delta, seed, block_q=block_q, block_k=block_k,
        kv_len=kv_len, scale=scale, dropout_rate=dropout_rate,
        interpret=interpret,
    )
    return dq, dk, dv, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def flash_attention(
    q, k, v, *, mask=None, scale=None, dropout_rate: float = 0.0,
    dropout_seed=None, block_q: int | None = None, block_k: int | None = None,
    interpret: bool = False,
):
    """Unmasked flash attention over (B, H, S, D), differentiable, with
    optional attention-probability dropout.  Raises NotImplementedError for
    masked attention (the wrapper's jnp path handles those).

    ``dropout_seed`` is an int32 scalar (array or python int) consumed by the
    in-kernel PRNG; required when ``dropout_rate > 0``.

    Default blocks are tuned on v5e at the framework's native S≈1655
    (tools/tpu_kernel_check.py): q-block 256 (q-padding waste beats larger
    blocks' pipelining); without dropout the forward takes the whole (padded)
    kv in one block when the f32 score tile fits VMEM and the backward runs
    the split dq / dkv kernels at the same tiling; with dropout both kernels
    share (256, 512) tiles (f32: (256, 256) — whole-q + f32 dq resident in
    the fused backward caps the kv tile under the ~16 MB/core VMEM budget)
    so the masks regenerate identically.
    """
    if mask is not None:
        raise NotImplementedError("flash kernel is unmasked-only")
    if not 0.0 <= dropout_rate < 1.0:
        raise ValueError(f"dropout_rate {dropout_rate} outside [0, 1)")
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, s_q, d = q.shape
    s_kv = k.shape[2]
    if block_q is None:
        block_q = min(256, _round_up(s_q, 128))
    if block_k is None:
        if dropout_rate > 0.0:
            # fused-backward tiles (shared with fwd so masks regenerate
            # identically); 512 fits VMEM at 2-byte storage, f32 needs 256
            wide = jnp.dtype(q.dtype).itemsize <= 2
            block_k = min(512 if wide else 256, _round_up(s_kv, 128))
        else:
            kv_pad = _round_up(s_kv, 128)
            # single-block kv when the (block_q, kv) f32 score tile is ~<=4MB
            block_k = (
                kv_pad if block_q * kv_pad * 4 <= 4 * 1024 * 1024 else 512
            )
    if dropout_rate > 0.0:
        # tile ids pack (bh, qi, ki) as (bh*256 + qi)*256 + ki into one int32
        # (_tile_keep_mask): qi/ki must stay < 256 and bh < 2^15 or seeds
        # silently alias, correlating dropout masks across tiles.  Safe at the
        # framework's native S≈1655; fail loudly for exotic shapes instead.
        n_q_tiles = -(-s_q // block_q)
        n_k_tiles = -(-s_kv // block_k)
        if n_q_tiles >= 256 or n_k_tiles >= 256 or b * h >= 32768:
            raise ValueError(
                "dropout tile-id packing limit exceeded: need "
                f"q-tiles {n_q_tiles} < 256, k-tiles {n_k_tiles} < 256, "
                f"batch*heads {b * h} < 32768 (raise block_q/block_k or "
                "split the batch)"
            )
    if dropout_seed is None:
        seed = jnp.zeros((1, 128), jnp.int32)
    else:
        seed = jnp.tile(
            jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1), (1, 128)
        )
    # no host-side padding: Pallas masks boundary blocks (head dims 96/192
    # pass as block dims equal to the array dim), so the (b*h) flatten is
    # the only reshape and no pad/unpad copies hit HBM
    out = _flash_core(
        q.reshape(b * h, s_q, d), k.reshape(b * h, s_kv, d),
        v.reshape(b * h, s_kv, d), seed,
        s_kv, float(scale), block_q, block_k, float(dropout_rate), interpret,
    )
    return out.reshape(b, h, s_q, d)
