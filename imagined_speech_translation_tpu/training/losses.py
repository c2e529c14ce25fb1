"""Composite anti-collapse seq2seq loss + adaptive weight scheduler.

The reference's ``EnhancedCompositeSeq2SeqLoss`` / ``AdaptiveLossScheduler``
survive only as bytecode (``main_model/src/training/__pycache__/
losses.cpython-312.pyc``); this is a re-creation from the decompiled structure
(SURVEY.md §2.2 'Composite loss' row) with the historical weights
(``wandb/run-20250808_123212-wkre98hn/files/config.yaml:135-141``):

* label-smoothed CE with ``-100`` ignore mask;
* alignment: InfoNCE between projected EEG features and mask-pooled decoder
  hidden states at temperature ``tau`` (symmetric cross-entropy over the
  similarity matrix);
* BoW: BCE-with-logits from EEG features onto the multi-hot of top-k
  bag-of-words vocab indices present in the labels;
* diversity: mean |off-diagonal cosine similarity| of batch EEG features;
* variance: ``mean(exp(-var))`` over feature dimensions.

The learnable pieces (eeg/text projections, BoW head) are a flax module so
they train with the model under the same optimizer.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import LossConfig


def label_smoothed_ce(
    logits: jax.Array, labels: jax.Array, *, label_smoothing: float = 0.0
) -> tuple[jax.Array, jax.Array]:
    """Mean CE over non-``-100`` tokens (HF semantics).  Returns
    ``(loss, n_valid)``."""
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -logp.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    nll = jnp.where(valid, nll, 0.0)
    n = jnp.maximum(valid.sum(), 1)
    return nll.sum() / n, valid.sum()


class CompositeLossHeads(nn.Module):
    """Learnable heads of the composite loss: contrastive projections and the
    BoW classifier."""

    hidden_dim: int
    bart_dim: int
    bow_k: int
    proj_dim: int = 256

    @nn.compact
    def __call__(self, eeg_feat, text_feat):
        eeg_p = nn.Dense(self.proj_dim, name="eeg_proj")(eeg_feat)
        txt_p = nn.Dense(self.proj_dim, name="txt_proj")(text_feat)
        bow_logits = nn.Dense(self.bow_k, name="bow_head")(eeg_feat)
        return eeg_p, txt_p, bow_logits


def _info_nce(eeg_p, txt_p, tau: float) -> jax.Array:
    """Symmetric InfoNCE over the in-batch similarity matrix."""
    e = eeg_p / (jnp.linalg.norm(eeg_p, axis=-1, keepdims=True) + 1e-8)
    t = txt_p / (jnp.linalg.norm(txt_p, axis=-1, keepdims=True) + 1e-8)
    sim = (e @ t.T).astype(jnp.float32) / tau
    labels = jnp.arange(sim.shape[0])
    lp_rows = jax.nn.log_softmax(sim, axis=-1)
    lp_cols = jax.nn.log_softmax(sim, axis=0)
    loss_e2t = -jnp.take_along_axis(lp_rows, labels[:, None], axis=1).mean()
    loss_t2e = -jnp.take_along_axis(lp_cols, labels[None, :], axis=0).mean()
    return 0.5 * (loss_e2t + loss_t2e)


def _bow_multi_hot(labels: jax.Array, bow_indices: jax.Array, vocab: int) -> jax.Array:
    """(B, L) labels → (B, K) multi-hot of which bow tokens appear."""
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    onehot = jax.nn.one_hot(safe, vocab, dtype=jnp.float32) * valid[..., None]
    present = jnp.clip(onehot.sum(axis=1), 0.0, 1.0)  # (B, V)
    return jnp.take(present, bow_indices, axis=-1)  # (B, K)


def _diversity_loss(feat: jax.Array) -> jax.Array:
    f = feat / (jnp.linalg.norm(feat, axis=-1, keepdims=True) + 1e-8)
    sim = (f @ f.T).astype(jnp.float32)
    b = sim.shape[0]
    off = sim * (1.0 - jnp.eye(b))
    denom = jnp.maximum(b * (b - 1), 1)
    return jnp.abs(off).sum() / denom


def _variance_loss(feat: jax.Array) -> jax.Array:
    var = jnp.var(feat.astype(jnp.float32), axis=0)
    return jnp.exp(-var).mean()


def composite_loss(
    *,
    logits: jax.Array,
    labels: jax.Array,
    eeg_feat: jax.Array,
    decoder_hidden: jax.Array,
    decoder_mask: jax.Array,
    heads_apply,
    bow_indices: jax.Array,
    weights: dict[str, jax.Array | float],
    cfg: LossConfig,
) -> tuple[jax.Array, dict]:
    """Total loss + per-component dict.  ``heads_apply(eeg_feat, text_feat)``
    runs :class:`CompositeLossHeads`; ``weights`` may be traced arrays so the
    adaptive scheduler can feed updated weights without recompiling."""
    ce, _ = label_smoothed_ce(
        logits, labels, label_smoothing=cfg.label_smoothing
    )
    # mask-pooled decoder hidden (the text-side view)
    m = decoder_mask.astype(jnp.float32)[..., None]
    text_feat = (decoder_hidden * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
    eeg_p, txt_p, bow_logits = heads_apply(eeg_feat, text_feat)

    align = _info_nce(eeg_p, txt_p, cfg.contrastive_tau)
    bow_target = _bow_multi_hot(labels, bow_indices, logits.shape[-1])
    bow = optax_sigmoid_bce(bow_logits, bow_target)
    div = _diversity_loss(eeg_feat)
    var = _variance_loss(eeg_feat)

    total = (
        weights["ce"] * ce
        + weights["align"] * align
        + weights["bow"] * bow
        + weights["div"] * div
        + weights["var"] * var
    )
    return total, {
        "loss_ce": ce,
        "loss_align": align,
        "loss_bow": bow,
        "loss_div": div,
        "loss_var": var,
    }


def optax_sigmoid_bce(logits, targets):
    logits = logits.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(targets * log_p + (1.0 - targets) * log_not_p).mean()


# ---------------------------------------------------------------------------
# BoW vocabulary selection
# ---------------------------------------------------------------------------


def get_top_k_vocab_indices(tokenizer, k: int, texts=None) -> list[int]:
    """Top-k content-token ids for the BoW loss (the reference logged
    'Selected 1000 BoW indices from vocabulary of size 51271').

    With ``texts``, ranks token ids by corpus frequency; otherwise falls back
    to the first k non-special ids."""
    special = getattr(tokenizer, "special_ids", set())
    if texts:
        counts: Counter = Counter()
        for t in texts:
            ids = tokenizer.convert_tokens_to_ids(tokenizer.tokenize(t))
            counts.update(i for i in ids if i not in special)
        ranked = [i for i, _ in counts.most_common(k)]
        if len(ranked) >= k:
            return ranked[:k]
        pool = [i for i in range(tokenizer.vocab_size)
                if i not in special and i not in set(ranked)]
        return ranked + pool[: k - len(ranked)]
    pool = [i for i in range(tokenizer.vocab_size) if i not in special]
    return pool[:k]


# ---------------------------------------------------------------------------
# Adaptive weight scheduler (host-side)
# ---------------------------------------------------------------------------


@dataclass
class AdaptiveLossScheduler:
    """Nudges composite-loss weights from validation diversity
    (decompiled spec: thresholds 0.3/0.8, loss-history window 10,
    adaptation_rate 0.01; observed emergency weights reached
    ``{ce:0.2, align:3.0, bow:2.0, div:4.5, var:2.0}``).

    Low diversity → boost the anti-collapse terms and damp CE; high diversity
    → relax everything back toward the initial weights."""

    cfg: LossConfig
    weights: dict[str, float] = field(default_factory=dict)
    history: list[float] = field(default_factory=list)
    comp_history: list[dict] = field(default_factory=list)

    MIN_WEIGHTS = {"ce": 0.2, "align": 0.1, "bow": 0.05, "div": 0.05, "var": 0.01}
    MAX_WEIGHTS = {"ce": 2.0, "align": 3.0, "bow": 2.0, "div": 4.5, "var": 2.0}

    def __post_init__(self):
        if not self.weights:
            self.weights = self.initial_weights()

    def initial_weights(self) -> dict[str, float]:
        c = self.cfg
        return {
            "ce": c.w_ce, "align": c.w_align, "bow": c.w_bow,
            "div": c.w_div, "var": c.w_var,
        }

    def _stagnant(self, comp: str) -> bool:
        """True when the component's recent validation loss stopped improving
        over the history window (recent-3 mean >= earlier-window mean)."""
        vals = [
            h[f"loss_{comp}"] for h in self.comp_history
            if f"loss_{comp}" in h
        ]
        if len(vals) < 4:
            return False
        recent = sum(vals[-3:]) / 3.0
        earlier = sum(vals[:-3]) / len(vals[:-3])
        return recent >= earlier

    def update(self, loss_components: dict, diversity: float) -> dict[str, float]:
        self.history.append(float(diversity))
        self.comp_history.append(
            {k: float(v) for k, v in (loss_components or {}).items()}
        )
        for h in (self.history, self.comp_history):
            while len(h) > self.cfg.history_window:
                h.pop(0)
        recent = sum(self.history[-3:]) / min(len(self.history), 3)
        rate = self.cfg.adaptation_rate
        init = self.initial_weights()
        if recent < self.cfg.diversity_low:
            # collapse pressure: boost anti-collapse terms, damp CE
            boost = 1.0 + rate * 10.0
            for k in ("align", "bow", "div", "var"):
                self.weights[k] *= boost
            self.weights["ce"] *= 1.0 - rate
        elif recent > self.cfg.diversity_high:
            # relax toward initial
            for k in self.weights:
                self.weights[k] += rate * (init[k] - self.weights[k])
        else:
            # mid-band: steer by the per-component validation-loss history
            # (the decompiled spec's loss-history window 10) — an
            # anti-collapse term whose loss stagnated gets more weight, one
            # that is still improving is left alone
            for k in ("align", "bow", "div", "var"):
                if self._stagnant(k):
                    self.weights[k] *= 1.0 + rate * 5.0
        for k in self.weights:
            self.weights[k] = float(
                min(max(self.weights[k], self.MIN_WEIGHTS[k]), self.MAX_WEIGHTS[k])
            )
        return dict(self.weights)

    def get_weights(self) -> dict[str, float]:
        return dict(self.weights)

    def state_dict(self) -> dict:
        return {
            "weights": dict(self.weights),
            "history": list(self.history),
            "comp_history": [dict(h) for h in self.comp_history],
        }

    def load_state_dict(self, d: dict) -> None:
        self.weights = dict(d.get("weights", self.weights))
        self.history = list(d.get("history", []))
        self.comp_history = [dict(h) for h in d.get("comp_history", [])]
