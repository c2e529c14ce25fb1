"""Beam-decode internals profiler (TPU): where do the ~4 ms/step go?

Times, each as a 16-iteration fori_loop (mirroring the real decode loop's
structure so per-op overheads inside one compiled program are measured, not
dispatch):

* ``step``      — decode_step alone (6 BART layers + lm_head), no beam
                  bookkeeping, no cache gather;
* ``step_nolm`` — decode_step with the lm_head matmul removed (isolates the
                  768x51271 projection);
* ``topk``      — lax.top_k(2K) over (B, K*V) alone;
* ``gather``    — the per-step beam cache reorder alone;
* ``beam``      — the full beam_search program.

Scalar-sync timing with varying inputs (see tools/decode_profile.py notes).
"""

from __future__ import annotations

import json
import time


def _timed(fn, *args, iters=8):
    # arrays ride as jit args (closures overflow the remote-compile body);
    # trailing varying scalar defeats execution caching; scalar fetch = sync
    import jax.numpy as jnp

    float(fn(*args, jnp.float32(0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*args, jnp.float32(i + 1)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagined_speech_translation_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from imagined_speech_translation_tpu.config import default_config
    from imagined_speech_translation_tpu.decode import DecodeParams
    from imagined_speech_translation_tpu.decode.search import (
        _gather_beams,
        beam_search,
    )
    from imagined_speech_translation_tpu.models import EEGDecodingModel
    from imagined_speech_translation_tpu.utils.trees import cast_floating

    cfg = default_config()
    B = 16
    T = cfg.data.n_timepoints
    bart = cfg.model.bart
    gen = cfg.generation
    dp = DecodeParams(
        max_length=gen.max_length, min_length=gen.max_length,
        num_beams=gen.num_beams, pad_token_id=bart.pad_token_id,
        eos_token_id=bart.eos_token_id,
        decoder_start_token_id=bart.decoder_start_token_id,
    )
    K, L, V = dp.num_beams, dp.max_length, bart.vocab_size
    BK = B * K

    model = EEGDecodingModel(cfg.model)
    mask_np = np.zeros((4, 16), bool)
    for r, c in enumerate(cfg.model.region_channel_counts):
        mask_np[r, :c] = True
    channel_mask = jnp.asarray(mask_np)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((B, 4, 16, T), jnp.float32),
        jnp.zeros((B, 4), jnp.int32),
        channel_mask,
    )
    variables = cast_floating(variables, jnp.bfloat16)
    eeg = jax.random.normal(jax.random.key(1), (B, 4, 16, T), jnp.bfloat16)
    _, enc = jax.jit(
        lambda v, x, m: model.apply(v, x, m, method="encode")
    )(variables, eeg, channel_mask)
    enc_x = jnp.repeat(enc, K, axis=0)

    report = {}
    trivial = jax.jit(lambda i: jnp.sum(i))
    rt = _timed(trivial, iters=10)
    report["roundtrip_ms"] = round(rt * 1000, 2)

    def fresh_caches():
        return model.init_cache(BK, L, enc.dtype)

    # ---- decode_step x16, no bookkeeping ------------------------------
    @jax.jit
    def step_only(variables, enc_x, i):
        caches = fresh_caches()
        tokens0 = jnp.full((BK, 1), dp.decoder_start_token_id, jnp.int32)

        def body(cur, carry):
            tokens, caches, acc = carry
            pos = jnp.full((BK, 1), cur, jnp.int32)
            logits, caches = model.apply(
                variables, tokens, pos, enc_x + jnp.bfloat16(i * 1e-4),
                caches, method="decode_step",
            )
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return (nxt, caches, acc + logits.astype(jnp.float32).sum())

        _, _, acc = jax.lax.fori_loop(
            0, L, body, (tokens0, caches, jnp.float32(0))
        )
        return acc

    report["step16_ms"] = round(
        (_timed(step_only, variables, enc_x) - rt) * 1000, 2
    )

    # ---- lm_head matmul alone (768 x 51271 per step) ------------------
    emb = variables["params"]["bart"]["shared"]["embedding"]  # (V, d)

    @jax.jit
    def lmhead_only(emb, i):
        h0 = jax.random.normal(jax.random.key(2), (BK, emb.shape[1]), emb.dtype)

        def body(cur, acc):
            h = h0 + cur * jnp.asarray(1e-6, h0.dtype) + i.astype(h0.dtype)
            logits = h @ emb.T
            return acc + logits.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, L, body, jnp.float32(0))

    report["lmhead16_ms"] = round(
        (_timed(lmhead_only, emb) - rt) * 1000, 2
    )

    # ---- top_k alone ---------------------------------------------------
    @jax.jit
    def topk_only(i):
        scores = jax.random.normal(jax.random.key(0), (B, K * V), jnp.float32)

        def body(cur, acc):
            s = scores + cur * 1e-6 + i * 1e-6
            vals, idx = jax.lax.top_k(s, 2 * K)
            return acc + vals.sum() + idx.sum()

        return jax.lax.fori_loop(0, L, body, jnp.float32(0))

    report["topk16_ms"] = round(
        (_timed(topk_only) - rt) * 1000, 2
    )

    # ---- cache gather alone -------------------------------------------
    @jax.jit
    def gather_only(i):
        caches = fresh_caches()
        caches = jax.tree.map(
            lambda x: x + i * jnp.asarray(1e-4, x.dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            caches,
        )

        def body(cur, carry):
            caches, acc = carry
            parent = (
                jnp.tile(jnp.arange(K)[None], (B, 1)) + cur
            ) % K
            caches = _gather_beams(caches, parent, B, K)
            return caches, acc + caches[0]["k"].astype(jnp.float32).sum()

        _, acc = jax.lax.fori_loop(0, L, body, (caches, jnp.float32(0)))
        return acc

    report["gather16_ms"] = round(
        (_timed(gather_only) - rt) * 1000, 2
    )

    # ---- full beam ----------------------------------------------------
    @jax.jit
    def beam_full(variables, enc, i):
        e = enc + jnp.bfloat16(i * 1e-4)
        ex = jnp.repeat(e, K, axis=0)
        caches = model.init_cache(BK, L, e.dtype)

        def step(tokens, positions, caches):
            return model.apply(
                variables, tokens, positions, ex, caches, method="decode_step"
            )

        return jnp.sum(beam_search(step, caches, B, dp))

    report["beam_ms"] = round(
        (_timed(beam_full, variables, enc) - rt) * 1000, 2
    )

    print(json.dumps(report))


if __name__ == "__main__":
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
