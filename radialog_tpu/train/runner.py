"""Stage-1 (Q-Former) training runner + embedding precompute.

Replaces RunnerBase.train (runners/runner_base.py:470-519) and
pretraining/train.py: epoch loop with the reference's "custom epochs"
sub-epoch scheme (2 train sub-epochs per epoch, ReportDataset.py:236,370-371),
per-iteration LR schedule, mean-val-loss best-checkpoint selection
(image_text_pretrain.py:18-26, runner_base.py:417-426), JSON-lines logging,
and the evaluate-mode Q-Former embedding dump (pretraining/train.py:135-173 —
npz instead of pickle).
"""
from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from ..core.checkpoint import BestKeeper, load_checkpoint
from ..models.blip2 import Blip2Config
from ..train.optim import linear_warmup_cosine, make_adamw
from ..train.steps import TrainState, make_stage1_train_step
from ..utils.logging import JsonlLogger, MetricLogger


@dataclasses.dataclass
class Stage1Config:
    """blip2_pretrain_stage1.yaml surface (lr/schedule at yaml:39-48)."""

    max_epoch: int = 100
    custom_epochs: int = 2          # sub-epochs per epoch
    init_lr: float = 1e-4
    min_lr: float = 1e-5
    warmup_lr: float = 1e-6
    warmup_steps: int = 5000
    weight_decay: float = 0.05
    accum_grad_iters: int = 1
    output_dir: str = "outputs/stage1"
    log_freq: int = 50
    seed: int = 42
    resume: Optional[str] = None


class Stage1Runner:
    """Drives make_stage1_train_step over batch iterators."""

    def __init__(self, cfg: Stage1Config, blip2_cfg: Blip2Config, params: Dict,
                 steps_per_epoch: int):
        self.cfg = cfg
        total = steps_per_epoch * cfg.max_epoch * cfg.custom_epochs
        self.tx = make_adamw(
            linear_warmup_cosine(cfg.init_lr, cfg.min_lr, cfg.warmup_steps,
                                 total, warmup_start_lr=cfg.warmup_lr),
            weight_decay=cfg.weight_decay, accum_steps=cfg.accum_grad_iters)
        self.state = TrainState.create(params, self.tx)
        self.step_fn = jax.jit(make_stage1_train_step(self.tx, blip2_cfg),
                               donate_argnums=(0,))
        self.keeper = BestKeeper(cfg.output_dir, mode="min")
        self.logger = JsonlLogger(Path(cfg.output_dir) / "log.txt")
        self.rng = jax.random.PRNGKey(cfg.seed)
        if cfg.resume:
            tree, meta = load_checkpoint(Path(cfg.resume).parent,
                                         Path(cfg.resume).name, target=self.state)
            self.state = tree if isinstance(tree, TrainState) else TrainState(*tree)

    def train(self, train_batches: Callable[[int], Iterable[Dict]],
              val_batches: Optional[Callable[[], Iterable[Dict]]] = None,
              eval_fn: Optional[Callable] = None,
              generate_fn: Optional[Callable] = None,
              decode_fn: Optional[Callable] = None) -> TrainState:
        """train_batches(sub_epoch_index) yields batch dicts with
        image_embeds/text_ids/text_mask.

        generate_fn(params, batch) -> (B, T) caption token ids and
        decode_fn(ids_row) -> str enable the reference's per-val-epoch
        generation QC artifacts (prediction/GT dumps + an HTML sample
        table, runner_base.py:396-409,431-450) via dump_val_generations."""
        cfg = self.cfg
        for epoch in range(cfg.max_epoch):
            for sub in range(cfg.custom_epochs):
                meter = MetricLogger()
                for batch in meter.log_every(train_batches(epoch * cfg.custom_epochs + sub),
                                             cfg.log_freq,
                                             header=f"epoch {epoch}.{sub}"):
                    self.rng, sk = jax.random.split(self.rng)
                    self.state, metrics = self.step_fn(self.state, batch, sk)
                    meter.update(**{k: float(v) for k, v in metrics.items()})
                train_stats = meter.global_avgs()
                self.logger.log({"split": "train", "epoch": epoch, "sub": sub,
                                 **train_stats})
            if val_batches is not None and eval_fn is not None:
                val_loss = self.validate(val_batches, eval_fn)
                improved = self.keeper.update(int(self.state.step), val_loss,
                                              self.state.params)
                self.logger.log({"split": "val", "epoch": epoch,
                                 "loss": val_loss, "best": improved})
                if generate_fn is not None and decode_fn is not None:
                    self.dump_val_generations(epoch, val_batches, generate_fn,
                                              decode_fn)
        return self.state

    def dump_val_generations(self, epoch: int,
                             val_batches: Callable[[], Iterable[Dict]],
                             generate_fn: Callable, decode_fn: Callable,
                             split_name: str = "val",
                             html_rows: int = 5) -> Dict[str, list]:
        """Per-val-epoch caption QC artifacts — the reference's
        "eyeball the generations each epoch" loop (runner_base.py:396-409
        prediction/GT txt dumps; :431-450 wandb HTML sample table via
        generate_html_table, :73-87).

        Writes ``predictions/predictions_{split}.txt`` and
        ``ground_truths/ground_truths_{split}.txt`` under output_dir (one
        double-quoted caption per line — the reference's byte format) and
        mirrors an HTML table of the first ``html_rows`` (epoch, predicted,
        GT) rows to the gated wandb run when the logger carries one."""
        preds, gts = [], []
        for batch in val_batches():
            ids = np.asarray(generate_fn(self.state.params, batch))
            for row in ids:
                preds.append(decode_fn(row))
            for row in np.asarray(batch["text_ids"]):
                gts.append(decode_fn(row))
        out = Path(self.cfg.output_dir)
        (out / "predictions").mkdir(parents=True, exist_ok=True)
        (out / "ground_truths").mkdir(parents=True, exist_ok=True)
        with open(out / "predictions" / f"predictions_{split_name}.txt",
                  "w") as f:
            for p in preds:
                f.write('"' + p + '"\n')
        with open(out / "ground_truths" / f"ground_truths_{split_name}.txt",
                  "w") as f:
            for g in gts:
                f.write('"' + g + '"\n')
        rows = [[str(epoch), p, g]
                for p, g in list(zip(preds, gts))[:html_rows]]
        html = generate_html_table(rows, ["Epoch", "Predicted", "GT"])
        if getattr(self.logger, "wandb_run", None) is not None:
            try:
                import wandb
                self.logger.wandb_run.log(
                    {f"text_predictions_{split_name}": wandb.Html(html)})
            except Exception:
                pass
        return {"predictions": preds, "ground_truths": gts}

    def train_iters(self, batches: Iterable[Dict],
                    iters_per_inner_epoch: int,
                    max_iters: int,
                    val_batches: Optional[Callable[[], Iterable[Dict]]] = None,
                    eval_fn: Optional[Callable] = None) -> TrainState:
        """Iteration-based variant (the reference's RunnerIter,
        runners/runner_iter.py:70-136): inner 'epochs' of N iterations over a
        continuous batch stream, validating + checkpointing per inner epoch."""
        cfg = self.cfg
        meter = MetricLogger()
        it = iter(batches)
        done = 0
        while done < max_iters:
            n = min(iters_per_inner_epoch, max_iters - done)
            for _ in meter.log_every(range(n), cfg.log_freq,
                                     header=f"iters {done}"):
                batch = next(it)
                self.rng, sk = jax.random.split(self.rng)
                self.state, metrics = self.step_fn(self.state, batch, sk)
                meter.update(**{k: float(v) for k, v in metrics.items()})
            done += n
            self.logger.log({"split": "train", "iters": done,
                             **meter.global_avgs()})
            if val_batches is not None and eval_fn is not None:
                val_loss = self.validate(val_batches, eval_fn)
                improved = self.keeper.update(done, val_loss, self.state.params)
                self.logger.log({"split": "val", "iters": done,
                                 "loss": val_loss, "best": improved})
        return self.state

    def validate(self, val_batches: Callable[[], Iterable[Dict]],
                 eval_fn: Callable) -> float:
        losses = []
        rng = jax.random.PRNGKey(0)  # fixed: deterministic ITM negatives
        for batch in val_batches():
            losses.append(float(eval_fn(self.state.params, batch, rng)))
        return float(np.mean(losses)) if losses else float("nan")


def generate_html_table(data, columns) -> str:
    """The reference's wandb sample-table builder (runner_base.py:73-87)."""
    html = '<table border="1" cellpadding="5" cellspacing="0">'
    html += "<tr>"
    for col in columns:
        html += f"<th>{col}</th>"
    html += "</tr>"
    for row in data:
        html += "<tr>"
        for cell in row:
            html += f"<td>{cell}</td>"
        html += "</tr>"
    html += "</table>"
    return html


def precompute_embeddings(forward_image: Callable[[np.ndarray], np.ndarray],
                          batches: Iterable, out_path: str | Path) -> int:
    """Dump Q-Former query embeddings keyed by dicom id to an npz — the
    frozen-feature cache between stage 1 and LoRA training
    (pretraining/train.py:135-173; consumers pass them through the forward
    signature instead of pickle-at-model-init). ``batches`` yields
    (dicom_ids, images_or_embeds)."""
    store: Dict[str, np.ndarray] = {}
    for dicom_ids, images in batches:
        embs = np.asarray(forward_image(images))
        for d, e in zip(dicom_ids, embs):
            store[str(d)] = e.astype(np.float32)
    np.savez(out_path, **store)
    return len(store)
