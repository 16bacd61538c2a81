"""CheXbert labeler training: summed 14-head CE + kappa-gated selection.

Replaces chexbert/src/run_bert.py:97-258 (plain torch loop, DataParallel)
with a jitted step; model selection uses mean Cohen's kappa over the 14
conditions on the dev set (run_bert.py valid/kappa gating).
"""
from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.bert import BertConfig
from ..models.chexbert import chexbert_apply
from ..ops.layers import DTypePolicy, FP32
from .steps import TrainState


def chexbert_loss(head_logits: List[jax.Array], labels: jax.Array) -> jax.Array:
    """Sum of per-head CE, sum-reduced over the batch then normalised by
    batch (run_bert.py: CrossEntropyLoss(reduction='sum') over 14 heads)."""
    b = labels.shape[0]
    total = 0.0
    for i, logits in enumerate(head_logits):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        total = total - jnp.take_along_axis(logp, labels[:, i:i + 1], axis=-1).sum()
    return total / b


def make_chexbert_train_step(tx: optax.GradientTransformation, cfg: BertConfig,
                             policy: DTypePolicy = FP32) -> Callable:
    """batch: input_ids (B,T), attention_mask (B,T), labels (B,14) int
    {0:blank,1:pos,2:neg,3:uncertain} (binary head uses {0,1})."""

    def loss_fn(params, batch, rng):
        logits = chexbert_apply(params, cfg, batch["input_ids"],
                                batch["attention_mask"], policy=policy,
                                train=True, key=rng)
        return chexbert_loss(logits, batch["labels"])

    def step(state: TrainState, batch: Dict, rng: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {"loss": loss}

    return step


def cohens_kappa(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Unweighted Cohen's kappa between two label vectors."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    cats = np.unique(np.concatenate([y_true, y_pred]))
    n = len(y_true)
    if n == 0:
        return 0.0
    po = float((y_true == y_pred).mean())
    pe = 0.0
    for c in cats:
        pe += float((y_true == c).mean()) * float((y_pred == c).mean())
    if pe >= 1.0:
        return 1.0
    return (po - pe) / (1.0 - pe)


def mean_kappa(labels: np.ndarray, head_preds: np.ndarray) -> Tuple[float, List[float]]:
    """Mean Cohen's kappa over the 14 conditions (dev-set selection metric)."""
    ks = [cohens_kappa(labels[:, i], head_preds[:, i]) for i in range(labels.shape[1])]
    return float(np.mean(ks)), ks
