"""Findings-classifier training: BCE with log class weights + F1 selection.

Replaces the Lightning wrapper (findings_classifier/chexpert_train.py:25-150)
with a jitted train step; class-weight computation mirrors
chexpert_dataset.py:55-76 and the save-preds JSON contract mirrors
chexpert_train.py:153-179.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.chexpert import (CHEXPERT_CLASSES, bce_with_logits_loss,
                               chexpert_classifier_apply)
from ..ops.augment import augment_cxr
from ..ops.layers import DTypePolicy, FP32
from .steps import TrainState


def class_weights(labels: np.ndarray, weighting: str = "log") -> np.ndarray:
    """(N, 14) binary labels -> per-class pos_weight
    (chexpert_dataset.py:55-76: none | lin=N/count | log=log(N/count))."""
    labels = np.asarray(labels, np.float64)
    n = len(labels)
    counts = np.maximum(labels.sum(0), 1.0)
    if weighting == "none":
        return np.ones(labels.shape[1], np.float32)
    if weighting == "lin":
        return (n / counts).astype(np.float32)
    if weighting == "log":
        return np.log(n / counts).astype(np.float32)
    raise ValueError(f"unknown weighting '{weighting}'")


def make_classifier_train_step(tx: optax.GradientTransformation,
                               pos_weight: Optional[np.ndarray] = None,
                               policy: DTypePolicy = FP32,
                               augment: bool = False) -> Callable:
    """step((state, model_state), batch{images,labels}[, rng]) -> updated + metrics.
    BatchNorm state threads through (the Lightning model trains BN too).

    With ``augment=True`` the step takes an extra PRNG key and applies the
    reference's train augs (RandomAffine 30deg/shear 15 + ColorJitter 0.2/0.2,
    chexpert_dataset.py:47-52) on device, inside the jitted step."""
    pw = jnp.asarray(pos_weight) if pos_weight is not None else None

    def loss_fn(params, model_state, batch):
        logits, new_state = chexpert_classifier_apply(
            params, model_state, batch["images"], train=True, policy=policy)
        return bce_with_logits_loss(logits, batch["labels"], pw), (logits, new_state)

    def _update(state, model_state, batch):
        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, model_state, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1), new_model_state,
                {"loss": loss, "logits": logits})

    if not augment:
        def step(state: TrainState, model_state: Dict, batch: Dict):
            return _update(state, model_state, batch)
    else:
        def step(state: TrainState, model_state: Dict, batch: Dict,
                 rng: jax.Array):
            keys = jax.random.split(rng, batch["images"].shape[0])
            images = jax.vmap(augment_cxr)(batch["images"], keys)
            return _update(state, model_state, {**batch, "images": images})

    return step


def multilabel_f1(labels: np.ndarray, probs: np.ndarray,
                  threshold: float = 0.5) -> Dict[str, float]:
    """Macro F1 / acc over sigmoid>0.5 decisions (chexpert_train.py metrics)."""
    y = np.asarray(labels) > 0.5
    p = np.asarray(probs) > threshold
    tp = (y & p).sum(0).astype(np.float64)
    fp = (~y & p).sum(0).astype(np.float64)
    fn = (y & ~p).sum(0).astype(np.float64)
    prec = np.divide(tp, tp + fp, out=np.zeros_like(tp), where=(tp + fp) > 0)
    rec = np.divide(tp, tp + fn, out=np.zeros_like(tp), where=(tp + fn) > 0)
    f1 = np.divide(2 * prec * rec, prec + rec, out=np.zeros_like(tp),
                   where=(prec + rec) > 0)
    return {"val_f1": float(f1.mean()),
            "val_acc": float((y == p).mean()),
            "per_class_f1": f1.tolist()}


def save_structured_predictions(predict_fn: Callable[[np.ndarray], np.ndarray],
                                batches, out_path: str | Path) -> Dict[str, list]:
    """Write structured_preds_*.json: dicom -> positive finding names
    (chexpert_train.py:153-179). ``batches`` yields (dicom_ids, images)."""
    names = np.asarray(CHEXPERT_CLASSES)
    out: Dict[str, list] = {}
    for dicom_ids, images in batches:
        probs = predict_fn(images)
        for d, row in zip(dicom_ids, np.asarray(probs) > 0.5):
            out[str(d)] = names[row].tolist()
    Path(out_path).write_text(json.dumps(out, indent=4))
    return out
