"""MIMIC-CXR dataset assembly: CSV joins, prompt building, sampling.

Replaces MIMIC_Text_Dataset (test.py:38-141), MIMIC_CXR_Dataset
(ReportDataset.py:210-371), stratified_sample (test.py:239-254,
create_data.py:244-259) and BalancedSampler (finetune.py:57-70) with one
pandas-based module that emits plain dict records — batching/tokenization is
a separate concern (data/tokenization.py) so records stay framework-free.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from .conversation import Conversation, RADIALOG_SYSTEM
from .prompts import ReportPrompt, structured_findings_string

CHEXPERT_COLS = [
    "No Finding", "Enlarged Cardiomediastinum", "Cardiomegaly", "Lung Opacity",
    "Lung Lesion", "Edema", "Consolidation", "Pneumonia", "Atelectasis",
    "Pneumothorax", "Pleural Effusion", "Pleural Other", "Fracture",
    "Support Devices",
]


@dataclasses.dataclass
class MimicPaths:
    """File inputs of the eval/data pipeline (the reference hardcodes these in
    local_config.py + relative paths)."""

    split_csv: str                  # mimic-cxr-2.0.0-split.csv
    sectioned_csv: str              # mimic_cxr_sectioned.csv (our section parser output)
    chexpert_csv: str               # finding_chexbert_labels.csv (GT labels)
    predicted_findings_json: Optional[str] = None  # classifier structured preds
    image_root: Optional[str] = None


class ReportGenData:
    """Joined records for report generation (test.py:38-141 contract).

    Record fields: text_input (full vicuna prompt), text_target (GT findings),
    chexpert_labels (14,), dicom, img_path, findings_string.
    """

    def __init__(self, paths: MimicPaths, split: str = "test",
                 prompt_type: str = "img_matching_examples_ig2_noexamples_IMG_findings",
                 truncate: Optional[int] = None,
                 system: str = RADIALOG_SYSTEM):
        split_df = pd.read_csv(paths.split_csv)
        reports = pd.read_csv(paths.sectioned_csv).dropna(subset=["findings"])
        self.img_ids = {d: i for i, d in enumerate(reports["dicom_id"])}

        split_ids = set(split_df.loc[split_df["split"] == split]["dicom_id"])
        ann = reports.loc[reports["dicom_id"].isin(split_ids)].copy()
        if truncate is not None:
            ann = ann[:truncate]
        ann["findings"] = ann["findings"].apply(lambda x: x.replace("\n", ""))
        ann["subject_id"] = ann["Img_Folder"].apply(
            lambda x: int(x.split("/")[2].lstrip("p")))
        ann["study_id"] = ann["Note_file"].apply(
            lambda x: int(x.lstrip("s").rstrip(".txt")))
        chexpert = pd.read_csv(paths.chexpert_csv)
        self.annotation = pd.merge(ann, chexpert, how="left", on="dicom_id")

        self.pred_findings: Dict[str, List[str]] = {}
        if paths.predicted_findings_json:
            self.pred_findings = json.loads(
                Path(paths.predicted_findings_json).read_text())
        self.prompt = ReportPrompt(prompt_type)
        self.system = system
        self.chexpert_cols = CHEXPERT_COLS
        self.image_root = paths.image_root

    def __len__(self) -> int:
        return len(self.annotation)

    def findings_for(self, dicom_id: str, row=None) -> tuple[bool, str]:
        """Predicted findings (classifier JSON) if available, else GT labels
        from the chexpert CSV (the create_data.py:167-199 GT-label path)."""
        if self.pred_findings:
            labels = list(self.pred_findings.get(str(dicom_id), []))
        else:
            labels = [c for c in self.chexpert_cols
                      if row is not None and row.get(c) == 1]
        return structured_findings_string(labels)

    def __getitem__(self, index: int) -> Dict:
        ann = self.annotation.iloc[index]
        dicom = ann["dicom_id"]
        no_labels, findings = self.findings_for(dicom, ann)
        conv = Conversation(system=self.system)
        conv.append_user(self.prompt(findings, no_labels=no_labels))
        conv.append_assistant(None)
        labels = ann[self.chexpert_cols].astype(float).values
        return {
            "text_input": conv.get_prompt(),
            "text_target": ann["findings"].strip(),
            "chexpert_labels": np.asarray(labels, np.float64),
            "dicom": dicom,
            "img_path": f"{ann['Img_Folder']}/{ann['Img_Filename']}",
            "findings_string": findings,
        }

    def records(self) -> List[Dict]:
        return [self[i] for i in range(len(self))]


class Stage1Data:
    """Image+caption records for Q-Former stage-1 training — the
    MIMIC_CXR_Dataset contract (ReportDataset.py:210-371): split/sectioned/
    chexpert CSV joins, newline-stripped findings as the caption
    (text_output, consumed by the stage-1 losses, blip2_qformer.py:93), and
    the "custom epochs" subset scheme: the train set is divided into
    ``custom_epochs_per_epoch`` contiguous subsets, one per sub-epoch
    (ReportDataset.py:236,327-331,370-371 — 2 for train, 1 otherwise).
    """

    def __init__(self, paths: MimicPaths, split: str = "train",
                 truncate: Optional[int] = None,
                 custom_epochs_per_epoch: Optional[int] = None):
        split_df = pd.read_csv(paths.split_csv)
        reports = pd.read_csv(paths.sectioned_csv).dropna(subset=["findings"])
        self.img_ids = {d: i for i, d in enumerate(reports["dicom_id"])}
        split_ids = set(split_df.loc[split_df["split"] == split]["dicom_id"])
        ann = reports.loc[reports["dicom_id"].isin(split_ids)].copy()
        if truncate is not None:
            ann = ann[:truncate]
        ann["findings"] = ann["findings"].apply(lambda x: x.replace("\n", ""))
        if paths.chexpert_csv:
            chexpert = pd.read_csv(paths.chexpert_csv)
            ann = pd.merge(ann, chexpert, how="left", on="dicom_id")
        self.annotation = ann
        if custom_epochs_per_epoch is None:
            custom_epochs_per_epoch = 2 if split == "train" and truncate is None else 1
        self.custom_epochs_per_epoch = custom_epochs_per_epoch
        self.current_custom_epoch = 0
        self.image_root = paths.image_root

    def set_custom_epoch(self, custom_epoch: int) -> None:
        self.current_custom_epoch = custom_epoch % self.custom_epochs_per_epoch

    def __len__(self) -> int:
        return len(self.annotation) // self.custom_epochs_per_epoch

    def __getitem__(self, index: int) -> Dict:
        subset_size = len(self.annotation) // self.custom_epochs_per_epoch
        ann = self.annotation.iloc[self.current_custom_epoch * subset_size + index]
        img_path = f"{ann['Img_Folder']}/{ann['Img_Filename']}"
        if self.image_root:
            img_path = f"{self.image_root}/{img_path}"
        return {
            "img_path": img_path,
            "text_output": ann["findings"].strip(),
            "image_id": self.img_ids[ann["dicom_id"]],
            "dicom": ann["dicom_id"],
        }


def stratified_indices(annotation: pd.DataFrame,
                       chexpert_cols: Sequence[str] = tuple(CHEXPERT_COLS),
                       simulated_epochs: int = 1) -> List[int]:
    """test.py:239-254: duplicate finding-positive rows x simulated_epochs and
    cap no-finding rows at 1/14 of the resulting dataset."""
    cols = list(chexpert_cols)
    no_finding = ((annotation["No Finding"] == 1) |
                  ((annotation[cols] == 1).sum(1) == 0))
    no_idx = annotation[no_finding].index.tolist()
    f_idx = annotation.index.difference(annotation[no_finding].index).tolist()
    f_idx = f_idx * simulated_epochs
    new_no_count = int(len(f_idx) * 14 / 13 / 14)
    return f_idx + no_idx[:new_no_count]


def balanced_epoch_indices(rep_idxs: Sequence[int], inst_idxs: Sequence[int],
                           rng: np.random.Generator) -> List[int]:
    """BalancedSampler (finetune.py:57-70): per epoch, sample
    len(inst_idxs) report examples, merge with all instruct examples,
    shuffle."""
    rep = list(rep_idxs)
    take = rng.choice(len(rep), size=min(len(inst_idxs), len(rep)),
                      replace=False)
    merged = [rep[i] for i in take] + list(inst_idxs)
    rng.shuffle(merged)
    return merged


def load_instruct_dataset(path: str | Path) -> List[Dict]:
    """mimic_cxr_instruct_stratified.json records:
    {instruction, input, output, dicom(optional), task}."""
    return json.loads(Path(path).read_text())


def split_report_instruct(records: List[Dict]) -> tuple[List[int], List[int]]:
    """Indices of report-generation vs instruct examples (finetune.py:393-400
    keys on the RG instruction prefix/task marker)."""
    rep, inst = [], []
    for i, r in enumerate(records):
        if r.get("task", "RG") == "RG":
            rep.append(i)
        else:
            inst.append(i)
    return rep, inst
