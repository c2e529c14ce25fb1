"""On-chip verification + timing for the Pallas flash-attention kernels.

The CPU test suite covers interpret-mode parity; this script is the hardware
half and it GATES: every numerics check carries a hard error bound and the
run fails (rc 1) if any bound is exceeded — a rearranged-but-wrong hardware
lowering cannot ship green.  Results (errors, bounds, pass flags, TFLOP/s)
are written as a JSON artifact for the round record.

Checks, on the real chip:
* flash fwd vs jnp oracle (f32 and bf16 storage);
* split backward (no dropout) dq/dk/dv vs jax.grad through the oracle;
* fused backward (dropout>0): determinism given seed, seed sensitivity,
  mean-over-seeds convergence to the no-dropout output, finite grads;
* timing at the framework's native shape (B=16, H=8, S=1655, D=96).

Usage:  python tools/tpu_kernel_check.py [--quick] [--json KERNELCHECK.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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


class Gate:
    """Collects named checks; each is (value, bound, ok)."""

    def __init__(self):
        self.checks: dict[str, dict] = {}

    def leq(self, name: str, value: float, bound: float):
        ok = bool(value <= bound)
        self.checks[name] = {"value": float(value), "bound": bound, "ok": ok}
        flag = "ok" if ok else "FAIL"
        print(f"[{flag}] {name}: {value:.3e} (bound {bound:.1e})")
        return ok

    def true(self, name: str, cond: bool):
        self.checks[name] = {"value": bool(cond), "bound": True, "ok": bool(cond)}
        print(f"[{'ok' if cond else 'FAIL'}] {name}: {bool(cond)}")
        return cond

    @property
    def ok(self) -> bool:
        return all(c["ok"] for c in self.checks.values())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--block-q", type=int, default=None)
    ap.add_argument("--block-k", type=int, default=None)
    ap.add_argument("--json", default=None, help="write results JSON here")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    gate = Gate()
    report: dict = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }

    # ---- numerics (odd shape exercises the boundary-masking paths) ----
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 4, 333, 96
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, d)) * 0.3, jnp.float32)
        for _ in range(3)
    )
    ref = _jnp_attention(q, k, v, None, d**-0.5)
    got = flash_attention(q, k, v)
    # TPU "f32" matmuls ride the MXU, which multiplies at bf16-passes
    # precision (DEFAULT) in BOTH the oracle einsum and the kernel, so the
    # achievable agreement on O(1) outputs is ~2e-4.  Bound ~3x measured.
    gate.leq("fwd_f32_max_err", float(jnp.abs(ref - got).max()), 5e-4)

    refb = _jnp_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        None, d**-0.5,
    ).astype(jnp.float32)
    gotb = flash_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    ).astype(jnp.float32)
    # bf16 storage: inputs quantized to 8-bit mantissa; outputs O(1)
    gate.leq("fwd_bf16_max_err", float(jnp.abs(refb - gotb).max()), 3e-2)

    # ---- numerics at the SHIPPED default head shape (d=128) -----------
    # The framework default is attn_heads=(6,6,6) -> head dim 128, filling
    # the MXU's 128 lanes exactly (README divergence table); the gate must
    # cover the config users actually run, not only the reference's d=96.
    q8, k8, v8 = (
        jnp.asarray(rng.normal(size=(2, 6, 333, 128)) * 0.3, jnp.float32)
        for _ in range(3)
    )
    gate.leq(
        "fwd_f32_d128_max_err",
        float(jnp.abs(
            _jnp_attention(q8, k8, v8, None, 128**-0.5)
            - flash_attention(q8, k8, v8)
        ).max()),
        5e-4,
    )
    gate.leq(
        "fwd_bf16_d128_max_err",
        float(jnp.abs(
            _jnp_attention(
                q8.astype(jnp.bfloat16), k8.astype(jnp.bfloat16),
                v8.astype(jnp.bfloat16), None, 128**-0.5,
            ).astype(jnp.float32)
            - flash_attention(
                q8.astype(jnp.bfloat16), k8.astype(jnp.bfloat16),
                v8.astype(jnp.bfloat16),
            ).astype(jnp.float32)
        ).max()),
        3e-2,
    )
    gf8 = jax.grad(
        lambda q, k, v: (flash_attention(q, k, v) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q8, k8, v8)
    gr8 = jax.grad(
        lambda q, k, v: (_jnp_attention(q, k, v, None, 128**-0.5) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q8, k8, v8)
    for name, a, b_ in zip("qkv", gf8, gr8):
        gate.leq(
            f"split_bwd_d128_d{name}_rel_err",
            float(jnp.abs(a - b_).max()) / float(jnp.abs(b_).max()),
            2e-2,
        )

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (_jnp_attention(q, k, v, None, d**-0.5) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    # backward recomputes probabilities from the stored logsumexp in the
    # exp2 log domain; with MXU bf16-pass multiplies on both sides the
    # gradients agree to ~5e-3 relative (measured: dq 5.6e-3, dk 3.4e-3,
    # dv 2.3e-4).  Exactness is pinned by the CPU interpret-mode tests;
    # this gate catches hardware-lowering breakage (order-of-magnitude
    # regressions), bound ~3x measured.
    for name, a, b_ in zip("qkv", gf, gr):
        scale = float(jnp.abs(b_).max())
        gate.leq(
            f"split_bwd_d{name}_rel_err",
            float(jnp.abs(a - b_).max()) / scale,
            2e-2,
        )

    # ---- dropout (fused backward path) --------------------------------
    # Direct keep-fraction gate on the HARDWARE PRNG: dumps _tile_keep_mask
    # from a minimal kernel and asserts mean(keep) ~= 1-rate.  This is the
    # check that catches signed/unsigned comparison bugs in the threshold
    # (int32 prng bits vs uint32 threshold gave keep=0.4 at rate 0.1 and
    # keep=1.0 at rate 0.5 before the round-3 bitcast fix).
    from functools import partial as _partial

    import jax.experimental.pallas as pl_
    from jax.experimental.pallas import tpu as pltpu_

    from imagined_speech_translation_tpu.ops.pallas_attention import (
        _tile_keep_mask,
    )

    def _mask_kernel(seed_ref, out_ref, *, rate_):
        keep = _tile_keep_mask(
            seed_ref, jnp.int32(3), jnp.int32(1), jnp.int32(2),
            out_ref.shape, rate_, False,
        )
        out_ref[:] = keep.astype(jnp.float32)

    seed_row = jnp.broadcast_to(jnp.int32(77), (1, 128))
    for rate_ in (0.1, 0.5):
        mask = pl_.pallas_call(
            _partial(_mask_kernel, rate_=rate_),
            out_shape=jax.ShapeDtypeStruct((256, 512), jnp.float32),
            in_specs=[pl_.BlockSpec(memory_space=pltpu_.VMEM)],
            out_specs=pl_.BlockSpec(memory_space=pltpu_.VMEM),
        )(seed_row)
        # n=131072 Bernoulli draws: sigma(mean) <= 9e-4; bound ~5 sigma
        gate.leq(
            f"dropout_keep_fraction_err_rate{rate_}",
            abs(float(mask.mean()) - (1.0 - rate_)),
            5e-3,
        )

    rate = 0.1
    seed = jnp.int32(1234)
    f = jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, dropout_rate=rate, dropout_seed=seed
        )
    )
    o1, o2 = f(q, k, v), f(q, k, v)
    gate.true("dropout_deterministic_given_seed", bool(jnp.allclose(o1, o2)))
    o3 = flash_attention(q, k, v, dropout_rate=rate, dropout_seed=jnp.int32(99))
    gate.true("dropout_seed_sensitivity", bool(not jnp.allclose(o1, o3)))
    # E[dropout attention] = plain attention; mean over n seeds converges as
    # 1/sqrt(n).  Empirical single-seed deviation is ~0.15 here; bound the
    # n-seed mean at 3x the 1/sqrt(n) prediction.
    n_seeds = 4 if args.quick else 24
    outs = jnp.stack(
        [
            flash_attention(q, k, v, dropout_rate=rate, dropout_seed=jnp.int32(s_))
            for s_ in range(n_seeds)
        ]
    )
    gate.leq(
        "dropout_mean_convergence",
        float(jnp.abs(outs.mean(0) - ref).max()),
        3 * 0.15 / np.sqrt(n_seeds),
    )
    g = jax.grad(
        lambda q: (
            flash_attention(q, k, v, dropout_rate=rate, dropout_seed=seed) ** 2
        ).sum()
    )(q)
    gate.true("dropout_grad_finite", bool(jnp.isfinite(g).all()))
    # fused-backward consistency: deterministic given the seed (forward and
    # backward regenerate the identical in-kernel mask), and continuous in
    # the rate — at rate→0 the fused kernel must reproduce the no-dropout
    # gradient (catches mask-regeneration or scaling bugs in the fused
    # formulation; an expectation-based check is invalid here because the
    # squared loss is nonlinear in the mask).
    grad_drop = jax.jit(
        jax.grad(
            lambda q, r: (
                flash_attention(q, k, v, dropout_rate=r, dropout_seed=seed)
                ** 2
            ).sum(),
            argnums=0,
        ),
        static_argnums=1,
    )
    g1, g2 = grad_drop(q, rate), grad_drop(q, rate)
    gate.true("fused_bwd_deterministic_given_seed", bool(jnp.array_equal(g1, g2)))
    # rate 1e-10 rounds to a zero drop-threshold: the FUSED kernel runs
    # (dropout path taken) but keeps every element, so it must match the
    # split no-dropout gradient up to the two formulations' rounding
    g_tiny = grad_drop(q, 1e-10)
    scale = float(jnp.abs(gf[0]).max())
    gate.leq(
        "fused_bwd_rate_to_zero_rel",
        float(jnp.abs(g_tiny - gf[0]).max()) / scale,
        2e-2,
    )

    report["checks"] = gate.checks
    report["ok"] = gate.ok

    # ---- timing: reference head shape AND the shipped default ----------
    # (6,6,6)-head default -> H=6, D=128 (MXU-lane aligned); the reference
    # architecture is H=8, D=96.  Both are part of the round record.
    TIMING_SHAPES = {
        "ref_h8_d96": (16, 8, 1655, 96),
        "default_h6_d128": (16, 6, 1655, 128),
    }
    if not args.quick:
        timing = {}
        for shape_tag, (B, H, S, D) in TIMING_SHAPES.items():
            flops_fwd = 4 * B * H * S * S * D
            print(f"--- timing {shape_tag}: (B,H,S,D)=({B},{H},{S},{D}) ---")
            _time_shape(
                timing, shape_tag, B, H, S, D, flops_fwd, args, seed
            )
        report["timing"] = timing

    if args.json:
        Path(args.json).write_text(json.dumps(report, indent=2))
    print("KERNELCHECK", "OK" if gate.ok else "FAILED")
    return 0 if gate.ok else 1


def _time_shape(timing, tag, B, H, S, D, flops_fwd, args, seed):
    if True:  # keep the original block's indentation shape
        for dtype in (jnp.bfloat16, jnp.float32):
            # generate ON DEVICE: host arrays of this size (3x40 MB) would
            # ship through the (slow) remote-TPU tunnel on every run
            kq, kk_, kv_ = jax.random.split(jax.random.key(0), 3)
            qq = jax.random.normal(kq, (B, H, S, D), dtype) * 0.3
            kk = jax.random.normal(kk_, (B, H, S, D), dtype) * 0.3
            vv = jax.random.normal(kv_, (B, H, S, D), dtype) * 0.3
            fwd = jax.jit(
                lambda q, k, v: flash_attention(
                    q, k, v, block_q=args.block_q, block_k=args.block_k
                )
            )
            t = timeit(fwd, qq, kk, vv)
            timing[f"{tag}_{dtype.__name__}_fwd_ms"] = round(t * 1e3, 2)
            timing[f"{tag}_{dtype.__name__}_fwd_tflops"] = round(flops_fwd / t / 1e12, 1)
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
            timing[f"{tag}_{dtype.__name__}_fwdbwd_ms"] = round(t * 1e3, 2)
            timing[f"{tag}_{dtype.__name__}_fwdbwd_tflops"] = round(
                3.5 * flops_fwd / t / 1e12, 1
            )
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
            timing[f"{tag}_{dtype.__name__}_fwdbwd_dropout_ms"] = round(t * 1e3, 2)
            timing[f"{tag}_{dtype.__name__}_fwdbwd_dropout_tflops"] = round(
                3.5 * flops_fwd / t / 1e12, 1
            )
            print(
                f"[{dtype.__name__}] grad+dropout {t*1e3:7.2f} ms  "
                f"{3.5*flops_fwd/t/1e12:6.1f} TFLOP/s"
            )


if __name__ == "__main__":
    raise SystemExit(main())
