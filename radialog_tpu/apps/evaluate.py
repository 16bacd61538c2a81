"""Batch evaluation harness — the logic behind the repo-root test.py CLI.

Mirrors the reference test.py end to end: greedy decode over the test split
(batch 12, max_new_tokens 300), predictions/labels CSVs in the reference's
byte formats, NLG + CheXbert CE metrics, and the optional correction /
binary-QA / all-findings-QA second passes (test.py:257-674). The CheXbert
subprocess + second conda env is replaced by an on-device model call.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from ..data.conversation import extract_report
from ..data.datasets import CHEXPERT_COLS
from ..data.downstream import (all_qa_parse, all_qa_prompt,
                               binary_qa_no_finding_fixup, binary_qa_parse,
                               binary_qa_prompts, correction_extract,
                               correction_prompts)
from ..eval.ce_metrics import (ce_metrics, map_labels_for_scoring,
                               write_labels_csv, write_predictions_csv)
from ..eval.nlg import evaluate_reports
from .pipeline import RaDialogPipeline

EVAL_BATCH = 12  # test.py:279


@dataclasses.dataclass
class EvalOptions:
    use_embs: bool = False
    do_sample: bool = False
    temperature: float = 1.0
    num_beams: int = 1
    do_corr: bool = False
    corr_spec: int = 0      # >0: run the correction pass BATCHED through
    # batched speculation (decode/spec_ring.SpecCompactBatcher,
    # spec_k=corr_spec, 8 lanes) instead of the reference's batch-1 loop
    # (test.py:440) — token-identical to greedy by the verify contract,
    # fewer forwards because corrections quote the report being corrected
    # (measured acceptance 2.5 tok/forward, tools/spec_acceptance.py;
    # batched economics in docs/PERF.md "Batched speculative decoding").
    # The compact batcher follows the pipeline's KV dtype — on the
    # quantized serving default the pass runs on the int8 cache (only the
    # non-compact SpecRingBatcher is bf16-only); test.py flag --corr_spec.
    do_cp_bin_qa: bool = False
    do_cp_all_qa: bool = False
    batch_size: int = EVAL_BATCH
    max_new_tokens: int = 300
    exp_name: str = "eval"
    output_dir: str = "vicuna_results"


def _batched(seq: Sequence, n: int):
    for i in range(0, len(seq), n):
        yield seq[i:i + n]


def run_eval(pipe: RaDialogPipeline, records: List[Dict], opts: EvalOptions,
             emb_provider: Optional[Callable[[Sequence[str]], np.ndarray]] = None
             ) -> Dict[str, float]:
    """records: ReportGenData records. Returns the metrics dict and writes
    predictions_/labels_ CSVs + results txt under opts.output_dir."""
    out_dir = Path(opts.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    all_preds: List[str] = []
    preds_history: List[str] = []
    dicoms = [r["dicom"] for r in records]
    gt_labels = np.stack([r["chexpert_labels"] for r in records])

    for chunk in _batched(records, opts.batch_size):
        prompts = [r["text_input"] for r in chunk]
        embs = None
        if opts.use_embs and emb_provider is not None:
            embs = emb_provider([r["dicom"] for r in chunk])
        decoded = pipe.generate_texts(prompts, img_embs=embs,
                                      max_new_tokens=opts.max_new_tokens,
                                      do_sample=opts.do_sample,
                                      temperature=opts.temperature,
                                      num_beams=opts.num_beams)
        preds_history.extend(decoded)
        all_preds.extend(extract_report(d).strip() for d in decoded)

    pred_csv = out_dir / f"predictions_{opts.exp_name}.csv"
    write_predictions_csv(all_preds, pred_csv)

    nlg = evaluate_reports({d: p for d, p in zip(dicoms, all_preds)},
                           {r["dicom"]: r["text_target"] for r in records})

    pred_labels_raw = pipe.label_reports(all_preds)
    write_labels_csv_from_raw(pred_labels_raw, all_preds,
                              out_dir / f"labels_{opts.exp_name}.csv")
    # reorder labeler output (CHEXBERT_CONDITIONS) into scoring order
    pred_labels = _to_scoring_order(pred_labels_raw)
    ce = ce_metrics(gt_labels, pred_labels)

    results = {**nlg.as_dict(), **{k: v for k, v in ce.items()
                                   if not isinstance(v, list)}}
    _write_results_txt(out_dir / f"results_{opts.exp_name}.txt",
                       records[0]["text_input"] if records else "", results)

    if opts.do_corr:
        results.update(run_correction_pass(
            pipe, records, preds_history,
            map_labels_for_scoring(pred_labels),
            map_labels_for_scoring(gt_labels), opts, emb_provider))
    if opts.do_cp_bin_qa:
        results.update(run_binary_qa_pass(pipe, records, preds_history,
                                          gt_labels, opts, emb_provider))
    if opts.do_cp_all_qa:
        results.update(run_all_qa_pass(pipe, records, preds_history,
                                       gt_labels, opts, emb_provider))
    return results


def _to_scoring_order(raw_labels: np.ndarray) -> np.ndarray:
    """CheXbert head order -> test.py chexpert_cols order."""
    from ..eval.ce_metrics import CHEXBERT_CONDITIONS
    idx = [CHEXBERT_CONDITIONS.index(c) for c in CHEXPERT_COLS]
    return raw_labels[:, idx]


def write_labels_csv_from_raw(raw_labels: np.ndarray, texts: Sequence[str],
                              path: Path) -> None:
    import csv
    from ..eval.ce_metrics import CHEXBERT_CONDITIONS
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["findings"] + CHEXBERT_CONDITIONS)
        for text, row in zip(texts, raw_labels):
            cells = ["" if np.isnan(v) else f"{v:.1f}" for v in row]
            w.writerow([text] + cells)


def _write_results_txt(path: Path, prompt: str, results: Dict[str, float]) -> None:
    """results_{exp}.txt in the reference's layout (test.py:423-435)."""
    lines = [f"Prompt: {prompt}"]
    name_map = [
        ("Avg Bleu 1", "Bleu_1"), ("Avg Bleu 2", "Bleu_2"),
        ("Avg Bleu 3", "Bleu_3"), ("Avg Bleu 4", "Bleu_4"),
        ("Avg Meteor", "METEOR"), ("Avg Rouge", "ROUGE_L"),
        ("Mean Chexpert F1", "chexbert_macro_f1"),
        ("Mean Chexpert Precision", "chexbert_macro_precision"),
        ("Mean Chexpert Recall", "chexbert_macro_recall"),
        ("Sample Chexpert F1", "chexbert_sample_f1"),
        ("Mean Chexpert Accuracy", "chexbert_mean_accuracy"),
    ]
    for label, key in name_map:
        if key in results:
            lines.append(f"{label}: {results[key]}")
    path.write_text("\n".join(lines) + "\n")


# ------------------------------------------------------------- second passes
def run_correction_pass(pipe, records, preds_history, pred_labels, gt_labels,
                        opts: EvalOptions, emb_provider) -> Dict[str, float]:
    """test.py:440-533: automated correction, batch 1, max_new_tokens 256."""
    prompts = correction_prompts(list(preds_history), CHEXPERT_COLS,
                                 pred_labels, gt_labels)
    corrected: List[str] = []
    if opts.corr_spec > 0:
        # batched speculation: all correction turns stream through one
        # SpecCompactBatcher (token-identical to the batch-1 greedy loop;
        # cache dtype follows the pipeline's kv_int8 setting)
        embs = (emb_provider([r["dicom"] for r in records])
                if opts.use_embs and emb_provider else None)
        decoded = pipe.generate_texts_ring(prompts, max_new_tokens=256,
                                           lanes=8, img_embs=embs,
                                           spec_k=opts.corr_spec)
        corrected = [correction_extract(d, p)
                     for d, p in zip(decoded, prompts)]
    else:
        for i, prompt in enumerate(prompts):
            embs = (emb_provider([records[i]["dicom"]])
                    if opts.use_embs and emb_provider else None)
            decoded = pipe.generate_texts([prompt], img_embs=embs,
                                          max_new_tokens=256)[0]
            corrected.append(correction_extract(decoded, prompt))

    out_dir = Path(opts.output_dir)
    write_predictions_csv(
        corrected, out_dir / f"predictions_{opts.exp_name}_after_corrections.csv")
    nlg = evaluate_reports({r["dicom"]: c for r, c in zip(records, corrected)},
                           {r["dicom"]: r["text_target"] for r in records})
    labels = _to_scoring_order(pipe.label_reports(corrected))
    ce = ce_metrics(gt_labels, labels)
    return {f"corr_{k}": v for k, v in {**nlg.as_dict(), **ce}.items()
            if not isinstance(v, list)}


def run_binary_qa_pass(pipe, records, preds_history, gt_labels,
                       opts: EvalOptions, emb_provider) -> Dict[str, float]:
    """test.py:536-610: 14 yes/no questions per report, max_new_tokens 10."""
    preds = []
    for i, hist in enumerate(preds_history):
        prompts = binary_qa_prompts(hist, CHEXPERT_COLS)
        embs = None
        if opts.use_embs and emb_provider:
            e = emb_provider([records[i]["dicom"]])
            embs = np.repeat(e, len(prompts), axis=0)
        decoded = pipe.generate_texts(prompts, img_embs=embs, max_new_tokens=10)
        preds.append([binary_qa_parse(d) for d in decoded])
    preds = binary_qa_no_finding_fixup(np.asarray(preds), CHEXPERT_COLS)
    ce = ce_metrics(gt_labels, preds.astype(np.float64))
    return {f"bin_qa_{k}": v for k, v in ce.items() if not isinstance(v, list)}


def run_all_qa_pass(pipe, records, preds_history, gt_labels,
                    opts: EvalOptions, emb_provider) -> Dict[str, float]:
    """test.py:612-674: 'List all the findings', batch 5, max_new_tokens 30."""
    prompts = [all_qa_prompt(h) for h in preds_history]
    preds: List[List[int]] = []
    for i0 in range(0, len(prompts), 5):
        chunk = prompts[i0:i0 + 5]
        embs = None
        if opts.use_embs and emb_provider:
            embs = emb_provider([r["dicom"] for r in records[i0:i0 + 5]])
        decoded = pipe.generate_texts(chunk, img_embs=embs, max_new_tokens=30)
        preds.extend(all_qa_parse(d, CHEXPERT_COLS) for d in decoded)
    ce = ce_metrics(gt_labels, np.asarray(preds, np.float64))
    return {f"all_qa_{k}": v for k, v in ce.items() if not isinstance(v, list)}
