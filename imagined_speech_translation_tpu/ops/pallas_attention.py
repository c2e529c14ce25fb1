"""Blocked online-softmax (flash) attention Pallas kernel for TPU.

Targets the reference's FLOPs hot spot: dense O(T²) self-attention over the
1655-token per-region sequences (``main_model/src/models/layers.py:230-251``;
SURVEY.md §3.2).  Instead of materializing the (S, S) probability matrix in
HBM, each q-block streams k/v blocks through VMEM with the online-softmax
recurrence (running max ``m``, normalizer ``l``, accumulator ``acc``), so HBM
traffic is O(S·D) and the matmuls stay on the MXU.

Layout: ``(batch, heads, seq, head_dim)``.  The wrapper pads seq to the
q/k block size and head_dim to the 128-lane tile, and masks the padded key
tail inside the kernel.  Unmasked (full) attention only — exactly the
encoder's pattern; masked/causal shapes fall back to the jnp path in
``ops.attention``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, kv_len: int,
                  scale: float):
    # q_ref: (block_q, d); k_ref/v_ref: (kv_pad, d); o_ref: (block_q, d)
    # inputs stay in their storage dtype (bf16 rides the fast MXU path);
    # accumulation is always float32 via preferred_element_type
    q = q_ref[:] * jnp.asarray(scale, q_ref.dtype)
    block_q, d = q.shape
    kv_pad = k_ref.shape[0]
    n_blocks = kv_pad // block_k

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[pl.ds(i * block_k, block_k), :]
        v = v_ref[pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col + i * block_k < kv_len, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1)
        acc_new = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_attention_padded(
    q, k, v, *, scale: float, block_q: int, block_k: int, interpret: bool
):
    b, h, s_q, d = q.shape
    s_kv = k.shape[2]
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, kv_len=s_kv, scale=scale
    )
    q_pad = _round_up(s_q, block_q)
    kv_pad = _round_up(s_kv, block_k)
    d_pad = _round_up(d, 128)

    def pad(x, s_pad):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]), (0, d_pad - d))
        )

    qp = pad(q, q_pad).reshape(b * h, q_pad, d_pad)
    kp = pad(k, kv_pad).reshape(b * h, kv_pad, d_pad)
    vp = pad(v, kv_pad).reshape(b * h, kv_pad, d_pad)

    grid = (b * h, q_pad // block_q)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, q_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (None, block_q, d_pad), lambda bh, qi: (bh, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, kv_pad, d_pad), lambda bh, qi: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, kv_pad, d_pad), lambda bh, qi: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, block_q, d_pad), lambda bh, qi: (bh, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, q_pad, d_pad)[:, :, :s_q, :d]


def flash_attention(
    q, k, v, *, mask=None, scale=None, block_q: int | None = None,
    block_k: int | None = None, interpret: bool = False
):
    """Unmasked flash attention over (B, H, S, D).  Raises NotImplementedError
    for masked attention (the wrapper's jnp path handles those).

    Default blocks are tuned for v5e at the framework's native S≈1655:
    q-block 512 and the whole (padded) kv in one block when the f32 score
    tile fits VMEM (~19.9 TFLOP/s bf16 vs 13.5 for the XLA fused path);
    longer sequences fall back to the streaming online-softmax loop.
    """
    if mask is not None:
        raise NotImplementedError("flash kernel is unmasked-only")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s_q, s_kv = q.shape[2], k.shape[2]
    if block_q is None:
        block_q = min(512, _round_up(s_q, 128))
    if block_k is None:
        kv_pad = _round_up(s_kv, 128)
        # single-block kv when the (block_q, kv) f32 score tile is ~<=4MB
        block_k = kv_pad if block_q * kv_pad * 4 <= 4 * 1024 * 1024 else 512
    return _flash_attention_padded(
        q, k, v, scale=float(scale), block_q=block_q, block_k=block_k,
        interpret=interpret,
    )
