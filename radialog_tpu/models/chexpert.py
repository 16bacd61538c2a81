"""CheXpert findings classifier: BioViL-T trunk + 2-layer MLP head.

Re-implements findings_classifier/chexpert_model.py:7-21. The input crop is
488x488 (NOT 448 — chexpert_dataset.py:47): ResNet-50 stride 32 gives a 16x16
grid, avg_pool(4) -> 4x4, flatten 128*4*4=2048 -> fc1(512) -> relu -> fc2(14).
14-way multilabel; trained with BCE-with-logits + log class weights
(chexpert_train.py:25-150).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.layers import DTypePolicy, FP32, avg_pool2d, linear, linear_init
from .biovil_t import biovil_t_apply, biovil_t_init

CHEXPERT_CLASSES = (
    "No Finding", "Enlarged Cardiomediastinum", "Cardiomegaly", "Lung Opacity",
    "Lung Lesion", "Edema", "Consolidation", "Pneumonia", "Atelectasis",
    "Pneumothorax", "Pleural Effusion", "Pleural Other", "Fracture",
    "Support Devices",
)
NUM_CLASSES = len(CHEXPERT_CLASSES)
CLASSIFIER_CROP = 488  # load-bearing (SURVEY §7 quirk 3)


def chexpert_classifier_init(key: jax.Array, num_classes: int = NUM_CLASSES
                             ) -> Tuple[Dict, Dict]:
    kb, k1, k2 = jax.random.split(key, 3)
    params: Dict = {}
    params["biovil"], state = biovil_t_init(kb, joint_feature_size=128)
    params["fc1"] = linear_init(k1, 128 * 4 * 4, 512)
    params["fc2"] = linear_init(k2, 512, num_classes)
    return params, {"biovil": state}


def chexpert_classifier_apply(params: Dict, state: Dict, images: jax.Array,
                              train: bool = False, policy: DTypePolicy = FP32,
                              key=None) -> Tuple[jax.Array, Dict]:
    """images: (B, 488, 488, 3) in [0,1] -> logits (B, 14)."""
    out, new_biovil_state = biovil_t_apply(params["biovil"], state["biovil"],
                                           images, train=train, policy=policy, key=key)
    x = avg_pool2d(out.projected_patch_embeddings, 4)        # (B,4,4,128)
    b = x.shape[0]
    # torch flattens NCHW (chexpert_model.py:18) -> replicate exact order
    x = x.transpose(0, 3, 1, 2).reshape(b, -1)               # (B, 2048)
    x = jax.nn.relu(linear(params["fc1"], x, policy))
    logits = linear(params["fc2"], x, policy)
    return logits.astype(jnp.float32), {"biovil": new_biovil_state}


def bce_with_logits_loss(logits: jax.Array, targets: jax.Array,
                         pos_weight: jax.Array | None = None) -> jax.Array:
    """Matches torch BCEWithLogitsLoss(pos_weight=...) (chexpert_train.py:37)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per = -(targets * log_p * (pos_weight if pos_weight is not None else 1.0)
            + (1.0 - targets) * log_not_p)
    return per.mean()


def predicted_findings(logits: jax.Array, threshold: float = 0.5) -> jax.Array:
    """sigmoid > 0.5 multilabel decisions (demo.py:253-261)."""
    return (jax.nn.sigmoid(logits) > threshold)


def findings_to_text(pred_row) -> list[str]:
    """Boolean row (14,) -> list of positive class names."""
    return [CHEXPERT_CLASSES[i] for i, v in enumerate(pred_row) if bool(v)]
