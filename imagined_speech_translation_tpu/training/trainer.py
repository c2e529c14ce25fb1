"""Trainer loop: epochs of accumulated train steps, beam-decode evaluation,
BLEU/diversity model selection, collapse tracking, checkpointing.

Reference behaviors reproduced (``main_model/src/training/trainer.py``):

* epoch loop with per-window optimizer steps and loss logging (``:69-151``);
* evaluation = teacher-forced val loss + beam-3 generation + jieba/BLEU/ROUGE
  metrics + unique-prediction diversity (``:153-212``, ``_compute_metrics``);
* model selection: BLEU-4 improvement gated on diversity ≥ 0.3, secondary
  path when diversity improves +0.1 with BLEU ≥ 90% of best (``:462-479``);
* repetitive-collapse tolerance counter (``:400-443``), early stop on
  patience (``:446-448``);
* checkpoints: best / every-N-epochs / on-interrupt (``:429-453``,
  scripts/train.py:365-368);
* adaptive loss-weight scheduling from validation diversity
  (``_update_diversity_tracking``, ``:254-279``) — fed back into the jitted
  step as traced weights (no recompilation).
"""

from __future__ import annotations

import logging
import time
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..decode import DecodeParams, build_generate_fn
from ..evaluation import ChineseEvaluator, prediction_diversity
from ..models.eeg_model import EEGDecodingModel
from ..utils.metrics import MetricLogger, NullLogger
from .checkpoint import CheckpointManager
from .losses import AdaptiveLossScheduler
from .optimizer import build_optimizer, learning_rates_at
from .train_state import TrainModule, TrainState, create_train_state
from .train_step import make_eval_step, make_train_step

logger = logging.getLogger(__name__)


def _dict_diff(a: dict, b: dict, prefix: str = "") -> list[str]:
    """Leaf-level ``key: old -> new`` lines for two nested config dicts."""
    out: list[str] = []
    for k in sorted(set(a) | set(b)):
        pa, pb = a.get(k), b.get(k)
        path = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(pa, dict) and isinstance(pb, dict):
            out.extend(_dict_diff(pa, pb, path))
        elif pa != pb:
            out.append(f"{path}: {pa!r} -> {pb!r}")
    return out


class EEGTrainer:
    def __init__(
        self,
        cfg: Config,
        dataset,
        tokenizer,
        *,
        bow_indices,
        train_indices,
        val_indices,
        metric_logger: MetricLogger | None = None,
        checkpoint_dir: str | None = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.dataset = dataset
        self.tokenizer = tokenizer
        self.bow_indices = np.asarray(bow_indices, np.int32)
        self.train_indices = np.asarray(train_indices)
        self.val_indices = np.asarray(val_indices)
        self.mlog = metric_logger or NullLogger()
        self.mesh = mesh

        tc = cfg.training
        self.module = TrainModule(cfg, bow_k=len(self.bow_indices))
        steps_per_epoch = max(
            len(self.train_indices) // (tc.batch_size * tc.grad_accum_steps), 1
        )
        self.total_steps = steps_per_epoch * tc.num_epochs
        self.steps_per_epoch = steps_per_epoch
        self.optimizer = None  # built in init_state (needs params for labels)

        self.evaluator = ChineseEvaluator()
        self.adaptive = (
            AdaptiveLossScheduler(tc.loss) if tc.loss.adaptive else None
        )
        self.ckpt = CheckpointManager(
            checkpoint_dir or tc.checkpoint.directory,
            max_epoch_keep=tc.checkpoint.max_to_keep,
        )

        gen_cfg = cfg.generation
        # Decode ids come from the TOKENIZER, which defines the data contract:
        # sequences start at BOS ([CLS]) and terminate with [SEP].  The
        # reference instead decodes with the HF config's decoder_start/eos
        # (102/104) while training on BOS-started, SEP-terminated labels — a
        # silent train/eval mismatch (generation can neither start from the
        # trained distribution nor stop early).  Deliberate fix.
        self.decode_params = DecodeParams(
            max_length=gen_cfg.max_length,
            min_length=gen_cfg.min_length,
            num_beams=gen_cfg.num_beams,
            length_penalty=gen_cfg.length_penalty,
            early_stopping=gen_cfg.early_stopping,
            pad_token_id=tokenizer.pad_token_id,
            eos_token_id=tokenizer.sep_token_id,
            decoder_start_token_id=tokenizer.bos_token_id,
        )
        self._eeg_model = EEGDecodingModel(cfg.model)
        self._generate = build_generate_fn(self._eeg_model, self.decode_params)

        # host-side training state
        self.best_bleu4 = 0.0
        self.best_diversity = 0.0
        self.patience_counter = 0
        self.consecutive_repetitive = 0
        self.start_epoch = 0
        self.start_window = 0
        self._windows_done = 0
        self._current_epoch = 0
        # latest post-step state: the donated train step deletes its INPUT
        # buffers, so an interrupt handler must never touch a stale binding
        self._live_state: TrainState | None = None

        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> TrainState:
        tc = self.cfg.training
        sample = self.dataset.get_batch(self.train_indices[: tc.batch_size])
        init_weights = (
            self.adaptive.get_weights()
            if self.adaptive
            else AdaptiveLossScheduler(tc.loss).initial_weights()
        )
        # optimizer labels need the param structure — initialize params first
        module = self.module
        params_probe = jax.eval_shape(
            lambda r: module.init(
                r,
                jnp.asarray(sample["eeg"]),
                jnp.asarray(sample["decoder_input_ids"]),
                jnp.asarray(sample["channel_mask"]),
                method="init_all",
            ),
            rng,
        )["params"]
        self.optimizer = build_optimizer(
            params_probe, tc.optimizer, self.total_steps
        )
        state = create_train_state(
            module, rng, sample, self.optimizer, init_weights
        )
        # mesh wiring: an explicit ``mesh=`` wins; otherwise cfg.parallel
        # sizes build one (SURVEY §2.6 — DP over 'data', optional TP over
        # 'model', optional multi-slice 'dcn').  State is committed onto the
        # mesh here; per-window batches are sharded in train_epoch and XLA
        # inserts the gradient collectives from the annotations alone.
        pc = self.cfg.parallel
        if self.mesh is None and getattr(pc, "requested", False):
            from ..parallel import make_mesh

            self.mesh = make_mesh(
                pc.data_axis, pc.model_axis, n_dcn=pc.dcn_axis
            )
        if self.mesh is not None:
            from ..parallel import shard_train_state

            n_data = int(np.prod([
                self.mesh.shape[a] for a in self.mesh.axis_names
                if a in ("data", "dcn")
            ]))
            if tc.batch_size % n_data:
                raise ValueError(
                    f"micro batch {tc.batch_size} not divisible by the mesh's"
                    f" {n_data} data-parallel devices"
                )
            state = shard_train_state(
                state, self.mesh, tp=self.mesh.shape.get("model", 1) > 1
            )
        # donate the input state: the caller always rebinds to the returned
        # state, and donation lets XLA update the 310M-param/optimizer
        # buffers in place instead of copying them every window
        self._train_step = jax.jit(
            make_train_step(module, self.optimizer, self.cfg, self.bow_indices),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            make_eval_step(module, self.cfg, self.bow_indices)
        )
        return state

    # ------------------------------------------------------------------
    def _train_batches(self, epoch: int, start_window: int = 0) -> Iterable[dict]:
        """Accumulation-window batches shaped (accum, micro, ...).

        ``start_window`` supports mid-epoch resume: the data order is a pure
        function of (seed, epoch), so skipping the first N windows replays
        the exact remainder of an interrupted epoch (the reference can only
        resume at epoch granularity — SURVEY.md §5 checkpoint row)."""
        tc = self.cfg.training
        rng = np.random.default_rng((tc.seed, epoch))
        idx = rng.permutation(self.train_indices)
        window = tc.batch_size * tc.grad_accum_steps
        n_windows = len(idx) // window
        for w in range(start_window, n_windows):
            chunk = idx[w * window : (w + 1) * window]
            batch = self.dataset.get_batch(chunk, epoch=epoch)
            out = {}
            for k, v in batch.items():
                if k == "channel_mask":
                    out[k] = v
                else:
                    out[k] = v.reshape(
                        (tc.grad_accum_steps, tc.batch_size) + v.shape[1:]
                    )
            yield out

    def train_epoch(
        self, state: TrainState, epoch: int, *, start_window: int = 0
    ) -> tuple[TrainState, float]:
        tc = self.cfg.training
        losses = []
        t0 = time.time()
        rng = jax.random.key(tc.seed + 1000 + epoch, impl=tc.rng_impl)
        self._windows_done = start_window
        self._current_epoch = epoch
        for step, batch in enumerate(
            self._train_batches(epoch, start_window), start=start_window
        ):
            step_rng = jax.random.fold_in(rng, step)
            if self.mesh is not None:
                from ..parallel.mesh import shard_batch

                cm = batch["channel_mask"]
                batch = shard_batch(
                    self.mesh,
                    {k: v for k, v in batch.items() if k != "channel_mask"},
                    batch_axis=1,
                )
                batch["channel_mask"] = cm
            state, metrics = self._train_step(state, batch, step_rng)
            self._live_state = state
            self._windows_done = step + 1
            if step % max(tc.log_every_steps, 1) == 0:
                m = {k: float(v) for k, v in metrics.items()}
                lrs = learning_rates_at(
                    tc.optimizer, self.total_steps, int(state.step)
                )
                self.mlog.log(
                    {
                        "train/loss": m["loss"],
                        **{f"train/{k}": v for k, v in m.items() if k != "loss"},
                        "train/lr": lrs["encoder"],
                        **{f"train/lr_{g}": v for g, v in lrs.items()},
                    },
                    step=int(state.step),
                )
            losses.append(float(metrics["loss"]))
        avg = float(np.mean(losses)) if losses else float("inf")
        dt = time.time() - t0
        n_samples = len(losses) * tc.batch_size * tc.grad_accum_steps
        self.mlog.log(
            {
                "train/epoch_loss": avg,
                "train/samples_per_sec": n_samples / dt if dt > 0 else 0.0,
                "epoch": epoch,
            }
        )
        logger.info("Epoch %d - avg loss %.4f (%.1f samples/s)", epoch + 1, avg,
                    n_samples / dt if dt > 0 else 0.0)
        return state, avg

    # ------------------------------------------------------------------
    def evaluate(self, state: TrainState, *, epoch: int = 0) -> dict:
        tc = self.cfg.training
        eval_bs = tc.eval_batch_size
        losses, n = [], 0
        comp_sums: dict[str, float] = {}
        predictions, targets = [], []
        model_vars = state.model_variables()
        for start in range(0, len(self.val_indices), eval_bs):
            chunk = self.val_indices[start : start + eval_bs]
            real = len(chunk)
            if real < eval_bs:
                # static shapes: pad the tail by repeating the last index and
                # trim the outputs (no drop_last information loss)
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], eval_bs - real)]
                )
            batch = self.dataset.get_batch(chunk)
            comps = self._eval_step(state, {k: jnp.asarray(v) for k, v in batch.items()})
            losses.append(float(comps["loss"]) * real)
            for k, v in comps.items():
                if k != "loss":
                    comp_sums[k] = comp_sums.get(k, 0.0) + float(v) * real
            n += real
            gen = self._generate(
                model_vars,
                jnp.asarray(batch["eeg"]),
                jnp.asarray(batch["channel_mask"]),
            )
            predictions.extend(
                t.strip()
                for t in self.tokenizer.batch_decode(np.asarray(gen)[:real])
            )
            for row in batch["labels"][:real]:
                ids = row[row != -100]
                targets.append(self.tokenizer.decode(ids).strip())
        metrics = {"val_loss": (sum(losses) / n) if n else float("inf")}
        # per-component validation losses — logged per epoch (the reference
        # mirrored these to wandb) and consumed by the adaptive scheduler's
        # loss-history window in train()
        metrics.update({k: v / n for k, v in comp_sums.items()} if n else {})
        metrics.update(self.evaluator.compute_all_metrics(predictions, targets))
        metrics.update(
            prediction_diversity(predictions, min_diversity=tc.min_diversity)
        )
        metrics["predictions"] = predictions[:10]
        metrics["targets"] = targets[:10]
        # per-region importance (reference logs these each epoch,
        # wandb-summary per-region weights; brain_encoder.py:195-212)
        from ..models.brain_encoder import BrainRegionEncoder

        try:
            rw = BrainRegionEncoder.region_weights(
                state.params["model"]["brain_encoder"],
                self.cfg.model.brain_encoder,
            )
            for name, w in zip(rw["names"], rw["softmax"]):
                metrics[f"region_weight_{name}"] = float(w)
        except (KeyError, TypeError):
            pass
        return metrics

    # ------------------------------------------------------------------
    def check_improvement(self, bleu4: float, diversity: float, is_repetitive: bool) -> bool:
        tc = self.cfg.training
        if is_repetitive:
            return False
        if bleu4 > self.best_bleu4 and diversity >= tc.min_diversity:
            self.best_bleu4 = bleu4
            self.best_diversity = max(self.best_diversity, diversity)
            return True
        if (
            diversity > self.best_diversity + tc.diversity_improvement
            and bleu4 > self.best_bleu4 * tc.bleu_tolerance_frac
        ):
            self.best_diversity = diversity
            return True
        return False

    def _meta(self, epoch: int, metrics: dict, *, window: int = 0) -> dict:
        return {
            "epoch": epoch,
            "window": window,
            "best_bleu4": self.best_bleu4,
            "best_diversity": self.best_diversity,
            "metrics": {
                k: v for k, v in metrics.items()
                if not isinstance(v, (list, tuple))
            },
            "adaptive": self.adaptive.state_dict() if self.adaptive else None,
            "config": self.cfg.to_dict(),
        }

    def resume(self, state: TrainState, name: str | None = None) -> TrainState:
        name = name or self.ckpt.latest_epoch_checkpoint()
        if name is None or not self.ckpt.exists(name):
            return state
        state, meta = self.ckpt.restore(name, state)
        # guard against silent semantic drift: some config changes (e.g.
        # attention HEAD COUNTS — the r3 default moved (8,4,4)→(6,6,6))
        # keep every parameter shape identical, so a checkpoint restores
        # cleanly but computes a different function. Surface any model-
        # section difference loudly instead of mis-evaluating it.
        saved_model = (meta.get("config") or {}).get("model")
        if saved_model is not None:
            current_model = self.cfg.to_dict().get("model")
            if saved_model != current_model:
                diffs = _dict_diff(saved_model, current_model, prefix="model")
                logger.warning(
                    "checkpoint '%s' was trained under a DIFFERENT model "
                    "config — restored weights may compute a different "
                    "function: %s",
                    name,
                    "; ".join(diffs[:8]) or "(nested difference)",
                )
        window = int(meta.get("window", 0))
        if window > 0:
            # mid-epoch checkpoint: replay the rest of that epoch
            self.start_epoch = int(meta.get("epoch", 0))
            self.start_window = window
        else:
            self.start_epoch = int(meta.get("epoch", -1)) + 1
            self.start_window = 0
        self.best_bleu4 = meta.get("best_bleu4", 0.0)
        self.best_diversity = meta.get("best_diversity", 0.0)
        if self.adaptive and meta.get("adaptive"):
            self.adaptive.load_state_dict(meta["adaptive"])
            state = state.replace(
                loss_weights={
                    k: jnp.float32(v) for k, v in self.adaptive.get_weights().items()
                }
            )
        logger.info("Resumed from %s at epoch %d", name, self.start_epoch)
        return state

    # ------------------------------------------------------------------
    def train(self, state: TrainState) -> tuple[TrainState, float]:
        tc = self.cfg.training
        try:
            for epoch in range(self.start_epoch, tc.num_epochs):
                start_window = self.start_window if epoch == self.start_epoch else 0
                state, train_loss = self.train_epoch(
                    state, epoch, start_window=start_window
                )
                # eval cadence: every eval_interval_epochs + the final epoch
                # (patience/adaptive-weights/best-model logic all key off
                # eval rounds, so they simply tick at this cadence too)
                if (
                    (epoch + 1) % tc.eval_interval_epochs != 0
                    and epoch != tc.num_epochs - 1
                ):
                    if (epoch + 1) % tc.checkpoint.save_interval_epochs == 0:
                        self.ckpt.save_epoch(state, epoch, self._meta(epoch, {}))
                    continue
                val = self.evaluate(state, epoch=epoch)
                self.mlog.log(
                    {
                        **{
                            f"val/{k}": v
                            for k, v in val.items()
                            if not isinstance(v, (list, tuple))
                        },
                        "epoch": epoch,
                    }
                )
                # example prediction/target table (reference logs one per
                # epoch to wandb, trainer.py:481-511)
                if val.get("predictions"):
                    self.mlog.log_table(
                        "val/examples",
                        ["epoch", "prediction", "target"],
                        [
                            (epoch, p, t)
                            for p, t in zip(val["predictions"], val["targets"])
                        ],
                    )
                bleu4 = val.get("bleu_4", 0.0)
                diversity = val.get("diversity_score", 0.0)
                repetitive = bool(val.get("is_repetitive", True))

                if self.adaptive:
                    comps = {
                        k: val.get(k, 0.0)
                        for k in ("loss_ce", "loss_align", "loss_bow",
                                  "loss_div", "loss_var")
                    }
                    new_w = self.adaptive.update(comps, diversity)
                    state = state.replace(
                        loss_weights={k: jnp.float32(v) for k, v in new_w.items()}
                    )
                    self.mlog.log({f"weights/{k}": v for k, v in new_w.items()})

                if self.check_improvement(bleu4, diversity, repetitive):
                    self.ckpt.save_best(state, self._meta(epoch, val))
                    logger.info(
                        "New best model - BLEU-4 %.3f diversity %.3f", bleu4, diversity
                    )
                    self.patience_counter = 0
                    self.consecutive_repetitive = 0
                else:
                    self.patience_counter += 1
                    if repetitive:
                        self.consecutive_repetitive += 1
                if self.consecutive_repetitive >= tc.collapse_tolerance:
                    logger.warning(
                        "Repetitive generation for %d evals — consider adjusting "
                        "loss weights or learning rates",
                        self.consecutive_repetitive,
                    )
                if self.patience_counter >= tc.patience:
                    logger.info("Early stopping at epoch %d", epoch + 1)
                    break
                if (epoch + 1) % tc.checkpoint.save_interval_epochs == 0:
                    self.ckpt.save_epoch(state, epoch, self._meta(epoch, {}))
        except KeyboardInterrupt:
            # ``state`` here is an epoch-start binding whose buffers the
            # donated step already consumed; snapshot the latest LIVE state
            live = self._live_state if self._live_state is not None else state
            leaves = jax.tree_util.tree_leaves(live)
            if any(
                getattr(leaf, "is_deleted", lambda: False)() for leaf in leaves
            ):
                # interrupt landed inside a step dispatch: the input was
                # donated and the output never materialized — nothing
                # consistent exists to snapshot
                logger.warning(
                    "Interrupted mid-step; no live state to checkpoint"
                )
                raise
            self.ckpt.save_interrupted(
                live,
                self._meta(self._current_epoch, {}, window=self._windows_done),
            )
            logger.info("Interrupted — checkpoint saved")
            raise
        return state, self.best_bleu4
