"""Clinical-efficacy (CE) metrics + byte-compatible CSV writers.

Implements the acceptance contract of test.py:376-435 and
chexbert/src/label.py:108-132 with numpy only:

  * predictions CSV: one double-quoted report per line, inner quotes dropped
    (test.py:377-379).
  * labels CSV: `findings` + 14 CheXbert condition columns where the 4-class
    labeler output maps 0->blank(NaN), 1->1, 2->0, 3->-1 (label.py:128-130).
  * scoring: NaN->0 and -1->0 on BOTH sides (test.py:399-403), then macro
    F1/precision/recall, samples-F1, and mean per-class accuracy
    (test.py:406-421) — sklearn-equivalent definitions, zero_division=0.
"""
from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, Iterable, List, Sequence

import numpy as np

# CheXbert labeler output order (chexbert/src/constants.py CONDITIONS)
CHEXBERT_CONDITIONS = [
    "Enlarged Cardiomediastinum", "Cardiomegaly", "Lung Opacity",
    "Lung Lesion", "Edema", "Consolidation", "Pneumonia", "Atelectasis",
    "Pneumothorax", "Pleural Effusion", "Pleural Other", "Fracture",
    "Support Devices", "No Finding",
]

# test.py:48-54 column order used for scoring
CHEXPERT_COLS = [
    "No Finding", "Enlarged Cardiomediastinum", "Cardiomegaly",
    "Lung Opacity", "Lung Lesion", "Edema", "Consolidation", "Pneumonia",
    "Atelectasis", "Pneumothorax", "Pleural Effusion", "Pleural Other",
    "Fracture", "Support Devices",
]


def write_predictions_csv(reports: Sequence[str], path: str | Path) -> None:
    """test.py:377-379: '"' + report.replace('"','') + '"' per line."""
    with open(path, "w") as f:
        for r in reports:
            f.write('"' + r.replace('"', "") + '"\n')


def class_ids_to_label_matrix(class_ids: np.ndarray) -> np.ndarray:
    """CheXbert 4-class output (N, 14) in {0:blank,1:pos,2:neg,3:uncertain}
    -> float matrix with {NaN, 1, 0, -1} (label.py:128-130)."""
    out = np.full(class_ids.shape, np.nan, np.float64)
    out[class_ids == 1] = 1.0
    out[class_ids == 2] = 0.0
    out[class_ids == 3] = -1.0
    return out


def write_labels_csv(class_ids: np.ndarray, findings: Sequence[str],
                     path: str | Path) -> None:
    """chexbert label.py save_preds: columns [findings] + CONDITIONS, values
    in {blank, 1, 0, -1} written as pandas does (floats, blank for NaN)."""
    mat = class_ids_to_label_matrix(np.asarray(class_ids))
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["findings"] + CHEXBERT_CONDITIONS)
        for text, row in zip(findings, mat):
            cells = ["" if np.isnan(v) else f"{v:.1f}" for v in row]
            w.writerow([text] + cells)


def read_labels_csv(path: str | Path, cols: List[str] = CHEXPERT_COLS) -> np.ndarray:
    """Read a labels CSV back into (N, 14) floats in `cols` order (the
    test.py:394-395 reorder), blanks -> NaN."""
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    out = np.full((len(rows), len(cols)), np.nan, np.float64)
    for i, r in enumerate(rows):
        for j, c in enumerate(cols):
            v = r.get(c, "")
            if v not in ("", None):
                out[i, j] = float(v)
    return out


def map_labels_for_scoring(labels: np.ndarray) -> np.ndarray:
    """NaN->0, -1->0 (test.py:399-403): binary presence matrix."""
    out = np.nan_to_num(np.asarray(labels, np.float64), nan=0.0)
    out[out == -1] = 0.0
    return out


def _prf(tp: np.ndarray, fp: np.ndarray, fn: np.ndarray):
    denom_p = tp + fp
    denom_r = tp + fn
    prec = np.divide(tp, denom_p, out=np.zeros_like(tp, np.float64), where=denom_p > 0)
    rec = np.divide(tp, denom_r, out=np.zeros_like(tp, np.float64), where=denom_r > 0)
    denom_f = prec + rec
    f1 = np.divide(2 * prec * rec, denom_f, out=np.zeros_like(prec), where=denom_f > 0)
    return prec, rec, f1


def ce_metrics(gt_labels: np.ndarray, pred_labels: np.ndarray) -> Dict[str, float]:
    """CheXbert clinical-efficacy scores (test.py:406-421).

    Inputs: (N, 14) in {NaN, 1, 0, -1} or already-binary. Returns macro
    F1/precision/recall, samples-F1, and mean per-class accuracy.
    """
    y = map_labels_for_scoring(gt_labels)
    p = map_labels_for_scoring(pred_labels)
    tp = ((y == 1) & (p == 1)).sum(0).astype(np.float64)
    fp = ((y == 0) & (p == 1)).sum(0).astype(np.float64)
    fn = ((y == 1) & (p == 0)).sum(0).astype(np.float64)
    prec, rec, f1 = _prf(tp, fp, fn)

    # samples average: per-row P/R/F over the 14 labels (sklearn 'samples')
    tp_s = ((y == 1) & (p == 1)).sum(1).astype(np.float64)
    fp_s = ((y == 0) & (p == 1)).sum(1).astype(np.float64)
    fn_s = ((y == 1) & (p == 0)).sum(1).astype(np.float64)
    _, _, f1_s = _prf(tp_s, fp_s, fn_s)

    acc = (y == p).mean(0)
    return {
        "chexbert_macro_f1": float(f1.mean()),
        "chexbert_macro_precision": float(prec.mean()),
        "chexbert_macro_recall": float(rec.mean()),
        "chexbert_sample_f1": float(f1_s.mean()),
        "chexbert_mean_accuracy": float(acc.mean()),
        "per_class_f1": f1.tolist(),
    }
