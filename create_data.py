#!/usr/bin/env python
"""Instruct-dataset creation CLI — reference data/create_data.py:415-428
(--mode RG | INS). RG writes the stratified report-generation training JSON;
INS generates the 7 dialog tasks (teacher LLM for EL/SU/RQA/CO) and fuses
them with the RG data into mimic_cxr_instruct_stratified.json.

Mock drive:
  python create_data.py --mode INS --mock --fixture-dir tests/fixtures \
      --output-dir /tmp/instruct_out
"""
from __future__ import annotations

import argparse
import json
import random
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="RaDialog-TPU instruct data creation")
    p.add_argument("--mode", type=str, default="RG", choices=["RG", "INS"])
    p.add_argument("--fixture-dir", type=str, default=None)
    p.add_argument("--split_csv", type=str, default=None)
    p.add_argument("--sectioned_csv", type=str, default=None)
    p.add_argument("--chexpert_csv", type=str, default=None)
    p.add_argument("--preds_json", type=str, default=None)
    p.add_argument("--prompt_csv_dir", type=str, default=None)
    p.add_argument("--correction_preds_json", type=str, default=None)
    p.add_argument("--nle_json", type=str, default=None)
    p.add_argument("--vicuna_path", type=str, default=None,
                   help="teacher model (reference: Vicuna-13B)")
    p.add_argument("--output-dir", type=str, default="data_out")
    p.add_argument("--simulated_epochs", type=int, default=2)
    p.add_argument("--mock", action="store_true", default=False)
    p.add_argument("--teacher", type=str, default="ring",
                   choices=["ring", "batch"],
                   help="teacher-LLM serving shape: 'ring' streams prompts "
                        "through the continuous-batching RingBatcher "
                        "(decode/continuous.py — the production teacher "
                        "path; the reference loops its Vicuna-13B teacher "
                        "one prompt at a time, create_data.py:305,379); "
                        "'batch' uses the fixed-batch generate path")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args()


def main():
    from radialog_tpu.apps.pipeline import PipelineConfig, RaDialogPipeline
    from radialog_tpu.data.datasets import (CHEXPERT_COLS, MimicPaths,
                                            ReportGenData, stratified_indices)
    from radialog_tpu.data.instruct import (fuse_instruct_dataset,
                                            generate_cp_tasks,
                                            generate_correction_tasks,
                                            generate_direct_tasks,
                                            generate_nle_tasks,
                                            load_prompt_bank,
                                            save_instruct_json,
                                            split_six_ways)
    from radialog_tpu.data.prompts import VICUNA_PROMPTS

    args = parse_args()
    random.seed(args.seed)
    rng = np.random.default_rng(args.seed)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    fx = Path(args.fixture_dir) if args.fixture_dir else None
    paths = MimicPaths(
        split_csv=args.split_csv or str(fx / "split.csv"),
        sectioned_csv=args.sectioned_csv or str(fx / "sectioned.csv"),
        chexpert_csv=args.chexpert_csv or str(fx / "chexpert.csv"),
        predicted_findings_json=args.preds_json or
        (str(fx / "preds.json") if fx and (fx / "preds.json").exists() else None))
    ds = ReportGenData(paths, split="train")
    records = ds.records()
    print(f"train records: {len(records)}")

    rg_template = VICUNA_PROMPTS["img_matching_examples_ig2_noexamples_IMG_findings"]

    if args.mode == "RG":
        # stratified report-generation examples (create_data.py RG mode)
        idx = stratified_indices(ds.annotation, simulated_epochs=args.simulated_epochs)
        rg = [{"instruction": ds[ds.annotation.index.get_loc(i)]["text_input"],
               "input": "",
               "output": ds[ds.annotation.index.get_loc(i)]["text_target"],
               "dicom": ds[ds.annotation.index.get_loc(i)]["dicom"],
               "task": "RG"} for i in idx]
        out = out_dir / "mimic_cxr_reports_stratified.json"
        save_instruct_json(rg, out)
        print(f"wrote {len(rg)} RG examples -> {out}")
        return

    # ---- INS mode: teacher LLM + synthesized tasks. The teacher serves
    # through the repo's own decode stack (mock included: tiny shapes, same
    # engines) — RingBatcher continuous batching at the eval batch width by
    # default, the fixed-batch generate path with --teacher batch.
    pipe = RaDialogPipeline(PipelineConfig(mock=args.mock,
                                           quantize=args.mock,
                                           vicuna_path=args.vicuna_path))

    def teacher(prompts):
        max_new = 64 if args.mock else 256
        if args.teacher == "ring":
            return pipe.generate_texts_ring(prompts, max_new_tokens=max_new,
                                            lanes=12)
        return pipe.generate_texts(prompts, max_new_tokens=max_new)

    splits = split_six_ways(len(records), rng)
    tasks = []
    for task in ("EL", "SU", "RQA"):
        recs = [records[i] for i in splits[task]]
        tasks += generate_direct_tasks(teacher, recs, task,
                                       load_prompt_bank(task, args.prompt_csv_dir), rng)
        print(f"{task}: {len(splits[task])} examples")
    for task in ("CPbQA", "CPaQA"):
        recs = [records[i] for i in splits[task]]
        tasks += generate_cp_tasks(recs, task,
                                   load_prompt_bank(task, args.prompt_csv_dir),
                                   CHEXPERT_COLS, rng)
        print(f"{task}: {len(splits[task])} examples")

    if args.correction_preds_json:
        corr = json.loads(Path(args.correction_preds_json).read_text())
    elif args.mock:  # synthesize a few incorrect predictions
        corr = [{"gt_report": r["text_target"],
                 "pred_report": r["text_target"] + " Mild cardiomegaly.",
                 "fp": ["Cardiomegaly"], "fn": [], "dicom": r["dicom"]}
                for r in records[:3]]
    else:
        corr = []
    if corr:
        banks = {k: load_prompt_bank(k, args.prompt_csv_dir)
                 for k in ("CO_both", "CO_add", "CO_rem")}
        tasks += generate_correction_tasks(teacher, corr, banks, rng)
        print(f"CO: {len(corr)} candidates")

    if args.nle_json:
        nle = [json.loads(l) for l in Path(args.nle_json).read_text().splitlines() if l]
    elif args.mock:
        nle = [{"report_ID": ds.annotation.iloc[0]["Note_file"].rstrip(".txt"),
                "nle": records[0]["text_target"].split(".")[0] + ".",
                "diagnosis_label": [1] + [0] * 9}]
    else:
        nle = []
    if nle:
        reports_by_note = {
            row["Note_file"].rstrip(".txt"): {"findings": row["findings"].replace("\n", ""),
                                              "dicom_id": row["dicom_id"]}
            for _, row in ds.annotation.iterrows()}
        tasks += generate_nle_tasks(nle, reports_by_note,
                                    load_prompt_bank("RE", args.prompt_csv_dir), rng)

    # fuse with stratified RG data
    idx = stratified_indices(ds.annotation, simulated_epochs=args.simulated_epochs)
    rg_records = [ds[ds.annotation.index.get_loc(i)] for i in idx]
    findings_by_dicom = {str(r["dicom"]): r["findings_string"] for r in records}
    fused = fuse_instruct_dataset(rg_records, tasks, rg_template,
                                  findings_by_dicom, rng)
    out = out_dir / "mimic_cxr_instruct_stratified.json"
    save_instruct_json(fused, out)
    by_task = {}
    for f in fused:
        by_task[f["task"]] = by_task.get(f["task"], 0) + 1
    print(f"wrote {len(fused)} fused examples -> {out}; by task: {by_task}")


if __name__ == "__main__":
    main()
