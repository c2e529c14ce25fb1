"""Greedy and beam search as static-shape ``lax.while_loop`` programs.

Semantics reproduce HF ``generate`` (the decode path the reference uses with
``num_beams=3, early_stopping=True`` — bart_decoder.py:66-78 and the eval
generation block of ``config/training_config.py:32-39``):

* sequences start at ``decoder_start_token_id``; total length counts that
  token; generation stops at ``max_length``;
* ``MinLengthLogitsProcessor``: EOS banned while ``cur_len < min_length``;
* beam bookkeeping matches ``BeamSearchScorer``: 2K candidates per step, EOS
  candidates ranked ≥ K are dropped, EOS candidates ranked < K move the beam
  into the finished set with score ``sum_logprob / len**length_penalty``
  (length excluding EOS), alive beams refilled from the best non-EOS
  candidates; ``early_stopping=True`` finishes a batch row once K finished
  hypotheses exist; at ``max_length`` alive beams are finalized in beam
  order; EOS is appended to finished sequences when it fits;
* token-identical to HF on the same logits — pinned by
  ``tests/test_bart_parity.py`` against torch BART.

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

NEG_INF = jnp.float32(-1.0e9)


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

    def cond(state):
        cur, _, finished, _ = state
        return (cur < L) & ~jnp.all(finished)

    def body(state):
        cur, tokens, finished, caches = state
        last = jax.lax.dynamic_slice_in_dim(tokens, cur - 1, 1, axis=1)
        pos = jnp.full((batch, 1), cur - 1, jnp.int32)
        logits, caches = step_fn(last, pos, caches)
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        logp = _apply_processors(logp, cur, p)
        nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, p.pad_token_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, cur))
        finished = finished | (nxt == p.eos_token_id)
        return cur + 1, tokens, finished, caches

    _, tokens, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), tokens, finished, init_caches)
    )
    return tokens


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------


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
        jnp.array([0.0] + [float(NEG_INF)] * (K - 1), jnp.float32)[None], (batch, 1)
    )
    fin_seqs = jnp.full((batch, K, L), p.pad_token_id, jnp.int32)
    fin_scores = jnp.full((batch, K), NEG_INF, jnp.float32)
    fin_lens = jnp.zeros((batch, K), jnp.int32)
    fin_count = jnp.zeros((batch,), jnp.int32)
    done = jnp.zeros((batch,), bool)

    state = (jnp.int32(1), seqs, alive_scores, fin_seqs, fin_scores, fin_lens,
             fin_count, done, init_caches)

    def cond(state):
        cur = state[0]
        done = state[7]
        return (cur < L) & ~jnp.all(done)

    def body(state):
        (cur, seqs, alive_scores, fin_seqs, fin_scores, fin_lens, fin_count,
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
        cand_scores, cand_idx = jax.lax.top_k(flat, 2 * K)  # (B, 2K)
        cand_beam = cand_idx // V
        cand_tok = (cand_idx % V).astype(jnp.int32)
        is_eos = cand_tok == p.eos_token_id

        # ---- finished-hypothesis updates ----------------------------------
        # BeamSearchScorer.process walks candidates in rank order, appending
        # while len < K and then replacing the worst when strictly better.
        # That tournament keeps exactly the K best of (old hyps ∪ eligible
        # candidates), so one vectorized union→top-K merge is equivalent
        # (ties keep the incumbent: the union lists old hyps first and top_k
        # breaks ties by index, matching HF's strict `score > worst`).
        norm = cur.astype(jnp.float32) ** p.length_penalty  # length excl. EOS
        eligible = is_eos[:, :K] & ~done[:, None]  # EOS ranked ≥ K is dropped
        cand_fin_scores = jnp.where(
            eligible, cand_scores[:, :K] / norm, NEG_INF
        )  # (B, K)
        cand_fin_seqs = jnp.take_along_axis(
            seqs, cand_beam[:, :K, None], axis=1
        )  # (B, K, L) parent-beam tokens (EOS not stored, HF hyp excludes it)
        union_scores = jnp.concatenate([fin_scores, cand_fin_scores], axis=1)
        union_seqs = jnp.concatenate([fin_seqs, cand_fin_seqs], axis=1)
        union_lens = jnp.concatenate(
            [fin_lens, jnp.full((batch, K), cur, jnp.int32)], axis=1
        )
        fin_scores, keep = jax.lax.top_k(union_scores, K)  # (B, K)
        fin_seqs = jnp.take_along_axis(union_seqs, keep[:, :, None], axis=1)
        fin_lens = jnp.take_along_axis(union_lens, keep, axis=1)
        fin_count = jnp.minimum(
            fin_count + eligible.sum(axis=1, dtype=jnp.int32), K
        )

        # ---- refill alive beams from best non-EOS candidates --------------
        alive_cand = jnp.where(is_eos, NEG_INF, cand_scores)
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

        # early stopping per HF (early_stopping=True): K finished hyps
        if p.early_stopping:
            newly_done = fin_count >= K
        else:
            # HF is_done(early_stopping=False): worst finished >= best alive
            # normalized at the current length
            cur_best = jnp.max(new_scores, axis=1) / (
                (cur + 1).astype(jnp.float32) ** p.length_penalty
            )
            newly_done = (fin_count >= K) & (
                jnp.min(fin_scores, axis=1) >= cur_best
            )
        done = done | newly_done

        return (cur + 1, seqs, new_scores, fin_seqs, fin_scores, fin_lens,
                fin_count, done, caches)

    (cur, seqs, alive_scores, fin_seqs, fin_scores, fin_lens, fin_count, done,
     _) = jax.lax.while_loop(cond, body, state)

    # ---- finalize: add alive beams for rows without K finished hyps -------
    # Same union→top-K merge as in the loop body (BeamSearchScorer.finalize
    # adds alive beams in beam order with the identical tournament rule).
    norm = cur.astype(jnp.float32) ** p.length_penalty
    alive_fin_scores = jnp.where(
        ~done[:, None], alive_scores / norm, NEG_INF
    )  # (B, K)
    union_scores = jnp.concatenate([fin_scores, alive_fin_scores], axis=1)
    union_seqs = jnp.concatenate([fin_seqs, seqs], axis=1)
    union_lens = jnp.concatenate(
        [fin_lens, jnp.full((batch, K), cur, jnp.int32)], axis=1
    )
    fin_scores, keep = jax.lax.top_k(union_scores, K)
    fin_seqs = jnp.take_along_axis(union_seqs, keep[:, :, None], axis=1)
    fin_lens = jnp.take_along_axis(union_lens, keep, axis=1)

    # best hypothesis per row; append EOS when it fits (HF finalize)
    best = jnp.argmax(fin_scores, axis=1)
    out = fin_seqs[jnp.arange(batch), best]
    lens = fin_lens[jnp.arange(batch), best]
    col = jnp.arange(L)[None]
    out = jnp.where(col == lens[:, None], p.eos_token_id, out)
    out = jnp.where(col > lens[:, None], p.pad_token_id, out)
    return out
