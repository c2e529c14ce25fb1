"""On-chip verification + timing for the Pallas flash-attention kernels.

Run on a real TPU (the CPU test suite covers interpret-mode parity; this
script is the hardware half): numerics vs the jnp oracle, dropout mask
statistics/determinism, fwd+bwd wall-clock and TFLOP/s at the framework's
native shape (B=4 regions·micro-batch, H=8, S=1655, D=96).

Usage:  python tools/tpu_kernel_check.py [--quick]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from imagined_speech_translation_tpu.ops.attention import _jnp_attention
from imagined_speech_translation_tpu.ops.pallas_attention import flash_attention


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--block-q", type=int, default=None)
    ap.add_argument("--block-k", type=int, default=None)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())

    # ---- numerics (f32, odd shape) -----------------------------------
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 4, 333, 96
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, d)) * 0.3, jnp.float32)
        for _ in range(3)
    )
    ref = _jnp_attention(q, k, v, None, d**-0.5)
    got = flash_attention(q, k, v)
    print("fwd max err (f32):", float(jnp.abs(ref - got).max()))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (_jnp_attention(q, k, v, None, d**-0.5) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gf, gr):
        print(
            f"d{name} max err: {float(jnp.abs(a - b_).max()):.3e}"
            f"  (ref scale {float(jnp.abs(b_).max()):.3e})"
        )

    # ---- dropout statistics ------------------------------------------
    rate = 0.1
    seed = jnp.int32(1234)
    f = jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, dropout_rate=rate, dropout_seed=seed
        )
    )
    o1, o2 = f(q, k, v), f(q, k, v)
    print("dropout deterministic given seed:", bool(jnp.allclose(o1, o2)))
    o3 = flash_attention(q, k, v, dropout_rate=rate, dropout_seed=jnp.int32(99))
    print("different seed differs:", bool(not jnp.allclose(o1, o3)))
    # E[dropout attention] = plain attention; check the mean over many seeds
    outs = jnp.stack(
        [
            flash_attention(q, k, v, dropout_rate=rate, dropout_seed=jnp.int32(s_))
            for s_ in range(2 if args.quick else 24)
        ]
    )
    err = float(jnp.abs(outs.mean(0) - ref).max())
    print(f"mean-over-seeds vs no-dropout max err: {err:.4f} (falls as 1/sqrt(n))")
    # gradient with dropout runs and is finite
    g = jax.grad(
        lambda q: (
            flash_attention(q, k, v, dropout_rate=rate, dropout_seed=seed) ** 2
        ).sum()
    )(q)
    print("dropout grad finite:", bool(jnp.isfinite(g).all()))

    # ---- timing at native shape --------------------------------------
    if args.quick:
        return
    B, H, S, D = 16, 8, 1655, 96
    flops_fwd = 4 * B * H * S * S * D
    for dtype in (jnp.bfloat16, jnp.float32):
        # generate ON DEVICE: host arrays of this size (3x40 MB) would ship
        # through the (slow) remote-TPU tunnel on every run
        kq, kk_, kv_ = jax.random.split(jax.random.key(0), 3)
        qq = (jax.random.normal(kq, (B, H, S, D), dtype) * 0.3)
        kk = (jax.random.normal(kk_, (B, H, S, D), dtype) * 0.3)
        vv = (jax.random.normal(kv_, (B, H, S, D), dtype) * 0.3)
        fwd = jax.jit(
            lambda q, k, v: flash_attention(
                q, k, v, block_q=args.block_q, block_k=args.block_k
            )
        )
        t = timeit(fwd, qq, kk, vv)
        print(
            f"[{dtype.__name__}] fwd  {t*1e3:7.2f} ms  "
            f"{flops_fwd/t/1e12:6.1f} TFLOP/s"
        )
        grad = jax.jit(
            jax.grad(
                lambda q, k, v: flash_attention(
                    q, k, v, block_q=args.block_q, block_k=args.block_k
                ).sum(),
                argnums=(0, 1, 2),
            )
        )
        t = timeit(grad, qq, kk, vv, iters=10)
        # bwd ≈ fwd recompute + dq + dkv ≈ 2.5x fwd flops (plus fwd itself)
        print(
            f"[{dtype.__name__}] grad {t*1e3:7.2f} ms  "
            f"{3.5*flops_fwd/t/1e12:6.1f} TFLOP/s (fwd+bwd)"
        )
        gradd = jax.jit(
            jax.grad(
                lambda q, k, v: flash_attention(
                    q, k, v, dropout_rate=0.1, dropout_seed=seed,
                    block_q=args.block_q, block_k=args.block_k,
                ).sum(),
                argnums=(0, 1, 2),
            )
        )
        t = timeit(gradd, qq, kk, vv, iters=10)
        print(
            f"[{dtype.__name__}] grad+dropout {t*1e3:7.2f} ms  "
            f"{3.5*flops_fwd/t/1e12:6.1f} TFLOP/s"
        )


if __name__ == "__main__":
    main()
