"""CheXbert report labeler: BERT-base + 14 classification heads.

Re-implements chexbert/src/models/bert_labeler.py:5-51 on-device (the
reference runs it as a subprocess in a separate conda env,
chexbert/run_chexbert.py:5-26 — replaced here by a plain model call; only the
output label CSV contract matters).

Heads: 13 x 4-class (blank / positive / negative / uncertain) + 1 x 2-class
("No Finding"), all on the CLS token. Output label mapping for eval
(chexbert/src/label.py:128-130): argmax 0 -> blank(NaN), 1 -> 1, 2 -> 0,
3 -> -1(uncertain); for the binary head: 0 -> blank, 1 -> 1.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layers import DTypePolicy, FP32, dropout, linear, linear_init
from .bert import BertConfig, bert_apply, bert_init

# CheXbert head order (chexbert/src/constants.py CONDITIONS) — differs from
# the test.py chexpert_cols order; eval code maps by column name.
CHEXBERT_CONDITIONS = (
    "Enlarged Cardiomediastinum", "Cardiomegaly", "Lung Opacity", "Lung Lesion",
    "Edema", "Consolidation", "Pneumonia", "Atelectasis", "Pneumothorax",
    "Pleural Effusion", "Pleural Other", "Fracture", "Support Devices",
    "No Finding",
)


def chexbert_init(key, cfg: BertConfig = BertConfig()) -> Dict:
    kb, kh = jax.random.split(key)
    heads = []
    for i in range(14):
        n_cls = 2 if i == 13 else 4
        heads.append(linear_init(jax.random.fold_in(kh, i), cfg.hidden_size, n_cls))
    return {"bert": bert_init(kb, cfg, with_pooler=False), "heads": heads}


def chexbert_apply(p: Dict, cfg: BertConfig, input_ids: jax.Array,
                   attention_mask: jax.Array, policy: DTypePolicy = FP32,
                   train: bool = False, key=None) -> List[jax.Array]:
    """Returns a list of 14 logits arrays: 13 x (B,4) + 1 x (B,2)."""
    hidden = bert_apply(p["bert"], cfg, input_ids, attention_mask,
                        policy=policy, train=train, key=key)
    cls = hidden[:, 0, :]
    if train and key is not None:
        cls = dropout(jax.random.fold_in(key, 999), cls, 0.1, train)
    return [linear(hp, cls, policy).astype(jnp.float32) for hp in p["heads"]]


def logits_to_labels(head_logits: List[np.ndarray]) -> np.ndarray:
    """Map head argmaxes to the CheXbert CSV label convention
    (label.py:128-130): returns (B, 14) float with values {nan, 1, 0, -1}.

    Column order follows CHEXBERT_CONDITIONS.
    """
    batch = head_logits[0].shape[0]
    out = np.full((batch, 14), np.nan, dtype=np.float64)
    for i, logits in enumerate(head_logits):
        am = np.asarray(logits).argmax(axis=-1)
        if i == 13:  # binary "No Finding": 0 -> blank, 1 -> positive
            out[:, i] = np.where(am == 1, 1.0, np.nan)
        else:
            col = np.full((batch,), np.nan)
            col = np.where(am == 1, 1.0, col)
            col = np.where(am == 2, 0.0, col)
            col = np.where(am == 3, -1.0, col)
            out[:, i] = col
    return out


def ce_label_cleanup(labels: np.ndarray) -> np.ndarray:
    """NaN -> 0 and -1(uncertain) -> 0 before scoring (test.py:399-403)."""
    y = np.nan_to_num(labels, nan=0.0)
    y[y == -1] = 0
    return y
