"""Greedy and beam search as static-shape, static-trip-count XLA loops.

Semantics reproduce HF ``generate`` (the decode path the reference uses with
``num_beams=3, early_stopping=True`` — bart_decoder.py:66-78 and the eval
generation block of ``config/training_config.py:32-39``):

* sequences start at ``decoder_start_token_id``; total length counts that
  token; generation stops at ``max_length``;
* ``MinLengthLogitsProcessor``: EOS banned while ``cur_len < min_length``;
* beam bookkeeping matches the vectorized ``GenerationMixin._beam_search``
  (transformers ≥4.46): 2K candidates per step; a rank-<K candidate
  *finishes* when it selects EOS or when the step writes the final
  (``max_length``-th) position; finished score =
  ``sum_logprob / n_generated**length_penalty`` with ``n_generated``
  counting the finishing token but not the decoder start; the finished set
  is the running top-K of (old hyps ∪ finishing candidates) with ties kept
  by the incumbent; alive beams refill from the best non-finishing
  candidates; ``early_stopping=True`` freezes a row once K hypotheses
  exist, ``early_stopping=False`` freezes when the worst finished score
  can no longer be beaten by the best running beam finishing at the
  current length;
* token-identical to HF on the same logits — pinned by
  ``tests/test_bart_parity.py`` (reference operating point) and fuzzed
  across K/length-penalty/early-stopping in ``tests/test_beam_fuzz.py``.

The model is abstracted as ``step_fn(tokens, positions, caches) ->
(logits, caches)`` over flattened ``(batch*beams, 1)`` token slabs, with all
shapes static.  The scan caches live in device memory; beam reordering
gathers them by parent index each step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

# plain float (HF's -1e9 magic constant): a module-scope jnp constant would
# initialize the JAX backend at import time, breaking late platform pinning
# (e.g. cli --platform); jnp ops cast it where used
NEG_INF = -1.0e9


@dataclasses.dataclass(frozen=True)
class DecodeParams:
    max_length: int = 16
    min_length: int = 4
    num_beams: int = 3
    length_penalty: float = 1.0
    early_stopping: bool = True
    pad_token_id: int = 0
    eos_token_id: int = 104
    decoder_start_token_id: int = 102
    forced_bos_token_id: int | None = None
    forced_eos_token_id: int | None = None


def _apply_processors(logp: jax.Array, cur, p: "DecodeParams") -> jax.Array:
    """HF logits processors on log-probs ``(..., V)``: MinLength, ForcedBOS,
    ForcedEOS (cur = current sequence length including decoder start)."""
    V = logp.shape[-1]
    vocab = jnp.arange(V)
    eos_col = vocab == p.eos_token_id
    logp = jnp.where((cur < p.min_length) & eos_col, NEG_INF, logp)
    if p.forced_bos_token_id is not None:
        forced = jnp.where(vocab == p.forced_bos_token_id, 0.0, NEG_INF)
        logp = jnp.where(cur == 1, forced, logp)
    if p.forced_eos_token_id is not None:
        forced = jnp.where(vocab == p.forced_eos_token_id, 0.0, NEG_INF)
        logp = jnp.where(cur == p.max_length - 1, forced, logp)
    return logp


# ---------------------------------------------------------------------------
# Greedy
# ---------------------------------------------------------------------------


def greedy_search(
    step_fn: Callable,
    init_caches: Any,
    batch: int,
    params: DecodeParams,
) -> jax.Array:
    """Argmax decoding; returns ``(B, max_length)`` token ids padded with
    ``pad_token_id`` after EOS."""
    p = params
    L = p.max_length

    tokens = jnp.full((batch, L), p.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(p.decoder_start_token_id)
    finished = jnp.zeros((batch,), bool)

    def body(cur, state):
        tokens, finished, caches = state
        last = jax.lax.dynamic_slice_in_dim(tokens, cur - 1, 1, axis=1)
        pos = jnp.full((batch, 1), cur - 1, jnp.int32)
        logits, caches = step_fn(last, pos, caches)
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        logp = _apply_processors(logp, cur, p)
        nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, p.pad_token_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, cur))
        finished = finished | (nxt == p.eos_token_id)
        return tokens, finished, caches

    # STATIC trip count (no ~all(finished) early exit): iterations after all
    # rows finish only write pad — a no-op — and a known-trip-count loop
    # compiles to a far faster TPU program than a data-dependent while
    # (measured ~4 ms/step of overhead per dynamic-cond iteration on the
    # serving chip; docs/PERFORMANCE.md round-3 decode section)
    tokens, _, _ = jax.lax.fori_loop(
        1, L, body, (tokens, finished, init_caches)
    )
    return tokens


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------


def _exact_top_k(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact, stable top-k over the last axis of ``(B, N)`` — identical
    results to ``lax.top_k`` (descending values, ties broken by ascending
    index) but WITHOUT the full-sort lowering.

    On TPU, XLA lowers ``lax.top_k`` over the beam candidate matrix
    (B, K·V ≈ 150k) to a full variadic sort — profiled at ~3.2 ms/step,
    85% of the whole beam-decode cost (docs/PERFORMANCE.md round-3).  For
    the small static k of beam search, k passes of argmax+mask are k
    linear reduces instead: ~20x faster and bit-identical (argmax ties
    pick the lowest index, matching top_k's stable order; masking is by
    index, so duplicated values cannot collide)."""
    _, n = x.shape
    cols = jnp.arange(n)[None, :]
    masked = x
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(masked, axis=-1)
        vals.append(jnp.take_along_axis(x, i[:, None], axis=-1)[:, 0])
        idxs.append(i)
        masked = jnp.where(cols == i[:, None], -jnp.inf, masked)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1).astype(jnp.int32)


def _gather_beams(tree, parent: jax.Array, batch: int, k: int):
    """Reorder the (batch*k, ...) leading axis of a cache pytree by
    per-batch parent beam indices ``(batch, k)``."""

    def gather(x):
        y = x.reshape((batch, k) + x.shape[1:])
        y = jnp.take_along_axis(
            y, parent.reshape((batch, k) + (1,) * (x.ndim - 1)), axis=1
        )
        return y.reshape((batch * k,) + x.shape[1:])

    return jax.tree.map(
        lambda x: gather(x) if hasattr(x, "ndim") and x.ndim > 0 else x, tree
    )


def beam_search(
    step_fn: Callable,
    init_caches: Any,
    batch: int,
    params: DecodeParams,
) -> jax.Array:
    """HF-semantics beam search; returns best hypothesis per batch row,
    shape ``(B, max_length)``.

    ``init_caches`` must already have a ``batch*num_beams`` leading dim (the
    caller expands encoder states/caches; beam 0 is the live start beam).
    """
    p = params
    K = p.num_beams
    L = p.max_length
    BK = batch * K

    seqs = jnp.full((batch, K, L), p.pad_token_id, jnp.int32)
    seqs = seqs.at[:, :, 0].set(p.decoder_start_token_id)
    # HF init: only beam 0 live
    alive_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (K - 1), jnp.float32)[None], (batch, 1)
    )
    fin_seqs = jnp.full((batch, K, L), p.pad_token_id, jnp.int32)
    fin_scores = jnp.full((batch, K), NEG_INF, jnp.float32)
    fin_lens = jnp.zeros((batch, K), jnp.int32)
    fin_count = jnp.zeros((batch,), jnp.int32)
    done = jnp.zeros((batch,), bool)

    state = (seqs, alive_scores, fin_seqs, fin_scores, fin_lens,
             fin_count, done, init_caches)

    def body(cur, state):
        (seqs, alive_scores, fin_seqs, fin_scores, fin_lens, fin_count,
         done, caches) = state

        last = jax.lax.dynamic_slice_in_dim(seqs.reshape(BK, L), cur - 1, 1, axis=1)
        pos = jnp.full((BK, 1), cur - 1, jnp.int32)
        logits, caches = step_fn(last, pos, caches)
        V = logits.shape[-1]
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        logp = _apply_processors(logp, cur, p)
        logp = logp.reshape(batch, K, V)

        total = alive_scores[..., None] + logp  # (B, K, V)
        flat = total.reshape(batch, K * V)
        cand_scores, cand_idx = _exact_top_k(flat, 2 * K)  # (B, 2K)
        cand_beam = cand_idx // V
        cand_tok = (cand_idx % V).astype(jnp.int32)
        is_eos = cand_tok == p.eos_token_id

        # ---- finished-hypothesis updates ----------------------------------
        # HF _beam_search._update_finished_beams: a rank-<K candidate
        # finishes when it hits a stopping criterion — EOS, or the step that
        # writes the final (max_length-th) position.  The finished set is the
        # top-K of (old hyps ∪ finishing candidates); one vectorized
        # union→top-K merge reproduces it exactly (ties keep the incumbent:
        # the union lists old hyps first and top_k breaks ties by index,
        # matching HF's merged torch.topk over the same ordering).
        # Score = accumulated logprob / n_generated**lp, where n_generated
        # counts the finishing token but not the decoder start — i.e. `cur`.
        norm = cur.astype(jnp.float32) ** p.length_penalty
        is_final = cur == (L - 1)  # this step writes the last position
        finishing = is_eos[:, :K] | is_final  # candidates ranked ≥ K drop
        eligible = finishing & ~done[:, None]
        cand_fin_scores = jnp.where(
            eligible, cand_scores[:, :K] / norm, NEG_INF
        )  # (B, K)
        cand_fin_seqs = jnp.take_along_axis(
            seqs, cand_beam[:, :K, None], axis=1
        )  # (B, K, L) parent-beam tokens
        cand_fin_seqs = jax.lax.dynamic_update_slice(
            cand_fin_seqs, cand_tok[:, :K, None], (0, 0, cur)
        )  # finishing token (EOS or final token) stored in the hypothesis
        union_scores = jnp.concatenate([fin_scores, cand_fin_scores], axis=1)
        union_seqs = jnp.concatenate([fin_seqs, cand_fin_seqs], axis=1)
        union_lens = jnp.concatenate(
            [fin_lens, jnp.full((batch, K), cur + 1, jnp.int32)], axis=1
        )  # token count including decoder start and the finishing token
        fin_scores, keep = jax.lax.top_k(union_scores, K)  # (B, K)
        fin_seqs = jnp.take_along_axis(union_seqs, keep[:, :, None], axis=1)
        fin_lens = jnp.take_along_axis(union_lens, keep, axis=1)
        fin_count = jnp.minimum(
            fin_count + eligible.sum(axis=1, dtype=jnp.int32), K
        )

        # ---- refill alive beams from best non-finishing candidates --------
        alive_cand = jnp.where(
            is_eos | is_final, NEG_INF, cand_scores
        )
        new_scores, pick = jax.lax.top_k(alive_cand, K)  # (B, K) over 2K slots
        new_beam = jnp.take_along_axis(cand_beam, pick, axis=1)
        new_tok = jnp.take_along_axis(cand_tok, pick, axis=1)

        # frozen rows keep everything
        new_scores = jnp.where(done[:, None], alive_scores, new_scores)
        parent = jnp.where(
            done[:, None], jnp.tile(jnp.arange(K)[None], (batch, 1)), new_beam
        )
        new_tok = jnp.where(done[:, None], p.pad_token_id, new_tok)

        seqs = jnp.take_along_axis(seqs, parent[:, :, None], axis=1)
        seqs = jax.lax.dynamic_update_slice(
            seqs, new_tok[:, :, None], (0, 0, cur)
        )
        caches = _gather_beams(caches, parent, batch, K)

        # row freezing per HF: early_stopping=True freezes once all K slots
        # hold finished hyps; early_stopping=False applies the
        # _check_early_stop_heuristic — freeze when the best running beam,
        # finishing at the current generated length (`cur`), can no longer
        # beat the worst of K finished scores (strict `>` keeps going).
        if p.early_stopping:
            newly_done = fin_count >= K
        else:
            cur_best = jnp.max(new_scores, axis=1) / norm
            newly_done = (fin_count >= K) & (
                jnp.min(fin_scores, axis=1) >= cur_best
            )
        done = done | newly_done

        return (seqs, new_scores, fin_seqs, fin_scores, fin_lens,
                fin_count, done, caches)

    # STATIC trip count: iterations on an all-done state are no-ops (frozen
    # rows keep scores/seqs, finishing candidates score NEG_INF so the
    # finished top-K keeps its incumbents) — and dropping the data-dependent
    # ``~all(done)`` condition lets XLA compile a known-trip-count loop,
    # which removes ~4 ms/step of dynamic-while overhead on the serving
    # chip (docs/PERFORMANCE.md round-3 decode section).
    (seqs, alive_scores, fin_seqs, fin_scores, fin_lens, fin_count, done,
     _) = jax.lax.fori_loop(1, L, body, state)

    # ---- output: best hypothesis per row ----------------------------------
    # No post-loop finalize: the final step's in-loop merge already captured
    # the running beams (every rank-<K candidate finishes at max_length).
    # The finishing token (EOS or final token) is stored in the hypothesis;
    # positions past the stored length are padded (HF fills with pad_token).
    best = jnp.argmax(fin_scores, axis=1)
    out = fin_seqs[jnp.arange(batch), best]
    lens = fin_lens[jnp.arange(batch), best]
    col = jnp.arange(L)[None]
    # HF fills its static output buffer with `pad_token_id or eos_token_id`
    # — Python truthiness, so pad_token_id == 0 (the BERT-vocab pad) fills
    # with EOS — then crops at the longest selected hypothesis.  Rows
    # shorter than the batch max therefore carry EOS (not pad) up to the
    # crop point; positions past it are pad (the crop, under this module's
    # static (B, L) output shape).
    fill = p.pad_token_id if p.pad_token_id != 0 else p.eos_token_id
    batch_max = jnp.max(lens)
    return jnp.where(
        col >= lens[:, None],
        jnp.where(col < batch_max, fill, p.pad_token_id),
        out,
    )
