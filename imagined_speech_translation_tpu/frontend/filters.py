"""IIR filtering on TPU via parallel (associative) scan.

Filters are designed on the host with scipy (float64 Butterworth bandpass /
notch biquads in second-order-section form) and executed on device.  A naive
``sosfilt`` is a sequential recurrence over T=1651 samples — poison for a
TPU, which wants parallel work.  The TPU-native formulation: each biquad in
transposed direct-form II is the linear recurrence

    z[t] = A z[t-1] + c·x[t],   y[t] = b0·x[t] + z1[t-1]
    A = [[-a1, 1], [-a2, 0]],   c = [b1 - a1·b0, b2 - a2·b0]

which is associative in (A, u) with (A2,u2)∘(A1,u1) = (A2·A1, A2·u1 + u2),
so ``jax.lax.associative_scan`` evaluates it in O(log T) depth, fully
parallel over (batch × channel) lanes — this is the same scan trick used for
linear state-space models.  Numerics are checked against ``scipy.signal
.sosfilt`` (float64 oracle) in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from scipy import signal as sps


def design_bandpass(
    low_hz: float, high_hz: float, fs: float, order: int = 4
) -> np.ndarray:
    """Butterworth bandpass as (sections, 6) SOS, float64."""
    return sps.butter(
        order, [low_hz, high_hz], btype="bandpass", fs=fs, output="sos"
    )


def design_notch(freq_hz: float, q: float, fs: float) -> np.ndarray:
    """IIR notch as a single SOS section."""
    b, a = sps.iirnotch(freq_hz, q, fs=fs)
    return sps.tf2sos(b, a)


def _biquad_scan(x: jax.Array, section: jax.Array) -> jax.Array:
    """One biquad over the last axis of ``x`` (any leading batch dims)."""
    b0, b1, b2, a0, a1, a2 = [section[i] for i in range(6)]
    b0, b1, b2 = b0 / a0, b1 / a0, b2 / a0
    a1, a2 = a1 / a0, a2 / a0

    A = jnp.array([[-a1, 1.0], [-a2, 0.0]], x.dtype)  # (2, 2)
    c = jnp.array([b1 - a1 * b0, b2 - a2 * b0], x.dtype)  # (2,)

    # elements: (A_t, u_t) with A_t constant, u_t = c * x_t as a 2x1 column so
    # both leaves share the scanned axis position (-3)
    u = (x[..., None] * c)[..., None]  # (..., T, 2, 1)
    A_seq = jnp.broadcast_to(A, x.shape + (2, 2))  # (..., T, 2, 2)

    def combine(left, right):
        A1, u1 = left
        A2, u2 = right
        return A2 @ A1, A2 @ u1 + u2

    _, z = jax.lax.associative_scan(combine, (A_seq, u), axis=x.ndim - 1)
    z = z[..., 0]  # (..., T, 2)
    # y[t] = b0 x[t] + z1[t-1]  (state before this step's update)
    z1_prev = jnp.concatenate(
        [jnp.zeros_like(z[..., :1, 0]), z[..., :-1, 0]], axis=-1
    )
    return b0 * x + z1_prev


def sosfilt(sos, x: jax.Array) -> jax.Array:
    """Cascaded-biquad filtering over the last axis (zero initial state),
    matching ``scipy.signal.sosfilt`` semantics."""
    sos = jnp.asarray(sos, x.dtype)
    y = x
    for s in range(sos.shape[0]):
        y = _biquad_scan(y, sos[s])
    return y


def sosfilt_channels(sos_list, x: jax.Array) -> jax.Array:
    """Apply a chain of SOS filter banks (e.g. bandpass then notch) to
    ``(..., C, T)`` data."""
    y = x
    for sos in sos_list:
        y = sosfilt(sos, y)
    return y


# ---------------------------------------------------------------------------
# Pallas sequential-IIR kernel (the TPU fast path)
# ---------------------------------------------------------------------------
#
# The associative scan above is depth-parallel but traffic-bound: every
# biquad materializes (..., T, 2, 2) transition elements (>200 MB at the
# bench shape) and the log-depth combines re-stream them — measured 195 ms
# of the 368 ms decode batch.  An IIR is cheap ARITHMETIC (9 ops/sample
# /section); the right TPU mapping keeps the recurrence sequential in time
# and vectorizes across channels on the lanes: layout (T, batch·channels),
# one in-kernel fori over T, all sections cascaded in registers so the
# signal is read and written exactly once.  Same numerics as scipy sosfilt
# (zero initial state, float32) — tested against the float64 oracle.


def _sos_kernel(x_ref, o_ref, *, sections: tuple, t_len: int):
    # x_ref/o_ref: (T_pad, lane_block); recurrence over rows (time), all
    # biquad states live in the loop carry as (1, lane_block) rows.
    n = len(sections)
    lanes = x_ref.shape[1]
    zeros = jnp.zeros((1, lanes), jnp.float32)

    def body(t, carry):
        states = carry  # tuple of (s1, s2) per section
        y = x_ref[pl.ds(t, 1), :]
        new_states = []
        for i, (b0, b1, b2, a1, a2) in enumerate(sections):
            s1, s2 = states[2 * i], states[2 * i + 1]
            out = b0 * y + s1
            new_states.append(b1 * y - a1 * out + s2)
            new_states.append(b2 * y - a2 * out)
            y = out
        o_ref[pl.ds(t, 1), :] = y
        return tuple(new_states)

    # Mosaic supports only unroll=1 or full unroll for in-kernel fori loops
    jax.lax.fori_loop(0, t_len, body, tuple(zeros for _ in range(2 * n)))


def sosfilt_pallas(
    sos_list, x: jax.Array, *, lane_block: int = 256, interpret: bool = False
) -> jax.Array:
    """Cascaded ``sosfilt`` over the last axis of ``(..., T)`` via the
    sequential Pallas kernel (channels on lanes, time in-kernel).  All
    sections of all banks run fused in one pass over the data."""
    sections = []
    for sos in sos_list:
        arr = np.asarray(sos, np.float64)
        for s in range(arr.shape[0]):
            b0, b1, b2, a0, a1, a2 = arr[s]
            sections.append(
                (
                    np.float32(b0 / a0), np.float32(b1 / a0),
                    np.float32(b2 / a0), np.float32(a1 / a0),
                    np.float32(a2 / a0),
                )
            )
    sections = tuple(sections)

    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    bc = int(np.prod(batch_shape)) if batch_shape else 1
    bc_pad = _pad_to(bc, lane_block)
    t_pad = _pad_to(t, 8)
    # (T, BC) layout: time on the sublane axis, channels on lanes
    xt = jnp.swapaxes(x.reshape(bc, t), 0, 1)
    xt = jnp.pad(xt, ((0, t_pad - t), (0, bc_pad - bc)))

    out = pl.pallas_call(
        functools.partial(_sos_kernel, sections=sections, t_len=t),
        out_shape=jax.ShapeDtypeStruct((t_pad, bc_pad), jnp.float32),
        grid=(bc_pad // lane_block,),
        in_specs=[
            pl.BlockSpec(
                (t_pad, lane_block), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (t_pad, lane_block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xt.astype(jnp.float32))
    return jnp.swapaxes(out[:t, :bc], 0, 1).reshape(batch_shape + (t,))


def _pad_to(v: int, m: int) -> int:
    return -(-v // m) * m
