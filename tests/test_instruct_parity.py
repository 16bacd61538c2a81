"""Instruct-data parity vs the reference's own data/instruct_tasks.py.

Two contracts pinned here:

  (a) prompt banks — DEFAULT_PROMPTS must equal the reference's
      data/instruct_prompts/*.csv verbatim (read with pandas, exactly as
      instruct_tasks.py:89 does). These banks are a data contract: the
      released LoRA was trained on instruct data drawn from these strings.
  (b) record generation — the label-synthesized task families (CPbQA/CPaQA,
      instruct_tasks.py:144-191) and the correction family (CO,
      instruct_tasks.py:219-307) produce byte-equal record dicts when both
      sides see the same fixture labels and a deterministic random source;
      the teacher families (EL/SU/RQA, instruct_tasks.py:88-141) produce
      byte-equal "instruction"/"task" prompts (outputs come from the teacher
      LLM, mocked identically on both sides; the reference keeps the raw
      split()[1] whitespace that its own fuse stage strips,
      create_data.py:401 — we compare post-strip).

The reference module is imported directly from /root/reference with its
module-level `random` swapped for a scripted source, and DataLoader swapped
for a trivial collator (the real one would fork num_workers=200 processes).
"""
from __future__ import annotations

import importlib.machinery
import importlib.util
import json
import os
import shutil
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

from radialog_tpu.data.instruct import (DEFAULT_PROMPTS, generate_cp_tasks,
                                        generate_correction_tasks,
                                        generate_direct_tasks)

REFERENCE_ROOT = "/root/reference"
PROMPT_DIR = Path(REFERENCE_ROOT) / "data" / "instruct_prompts"

pytestmark = pytest.mark.skipif(not PROMPT_DIR.is_dir(),
                                reason="reference repo not present")

# The reference's chexpert_cols ordering (ReportDataset.py / test.py).
COLS = [
    "No Finding", "Enlarged Cardiomediastinum", "Cardiomegaly", "Lung Opacity",
    "Lung Lesion", "Edema", "Consolidation", "Pneumonia", "Atelectasis",
    "Pneumothorax", "Pleural Effusion", "Pleural Other", "Fracture",
    "Support Devices"]


# ------------------------------------------------------------- (a) the banks
@pytest.mark.parametrize("task", ["EL", "SU", "RQA", "CPbQA", "CPaQA",
                                  "CO_both", "CO_add", "CO_rem", "RE"])
def test_prompt_bank_verbatim(task):
    csv = PROMPT_DIR / f"{task}_prompts.csv"
    ref = pd.read_csv(csv)["instruction"].tolist()
    assert DEFAULT_PROMPTS[task] == ref


def test_no_extra_banks():
    """Every bank we ship maps to a reference CSV — no invented families."""
    ref_tasks = {p.name.replace("_prompts.csv", "")
                 for p in PROMPT_DIR.glob("*_prompts.csv")}
    assert set(DEFAULT_PROMPTS) == ref_tasks


# -------------------------------------------------- reference-module loading
def _load_ref_instruct_tasks():
    if "local_config" not in sys.modules:
        stub = types.ModuleType("local_config")
        stub.__spec__ = importlib.machinery.ModuleSpec("local_config", loader=None)
        stub.PATH_TO_MIMIC_NLE = "/nonexistent"
        sys.modules["local_config"] = stub
    path = os.path.join(REFERENCE_ROOT, "data", "instruct_tasks.py")
    spec = importlib.util.spec_from_file_location("ref_instruct_tasks", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _ScriptedRandom:
    """Stand-in for the `random` module inside instruct_tasks: every choice
    picks element 0 and random() returns a constant, so draw *order* (the one
    place the two implementations differ — the reference draws all batch
    prompts up front, ours per record) cannot affect the outcome."""

    def __init__(self, r: float):
        self.r = r

    def choices(self, seq, k):
        return [seq[0]] * k

    def choice(self, seq):
        return seq[0]

    def random(self):
        return self.r


class _ScriptedRng:
    """The np.random.Generator surface our generators consume, same policy."""

    def __init__(self, r: float):
        self.r = r

    def integers(self, n):
        return 0

    def random(self):
        return self.r


class _FakeLoader:
    """DataLoader substitute: one batch, default-collate semantics for the
    field types the reference touches (str -> list, label vector -> stack)."""

    def __init__(self, dataset, **kw):
        self.dataset = dataset

    def __iter__(self):
        items = [self.dataset[i] for i in range(len(self.dataset))]
        batch = {}
        for k in items[0]:
            vals = [it[k] for it in items]
            batch[k] = (np.stack(vals) if isinstance(vals[0], np.ndarray)
                        else vals)
        yield batch

    def __len__(self):
        return 1


class _ListDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _cp_val_dataset(samples):
    """random_split(random_split(ds)) nesting: chexpert_cols lives two
    .dataset hops up (instruct_tasks.py:159)."""
    inner = _ListDataset(samples)
    inner.chexpert_cols = COLS
    return SimpleNamespace(dataset=SimpleNamespace(dataset=inner),
                           __len__=lambda self=None: len(samples),
                           __getitem__=lambda self, i: samples[i])


def _run_ref_cp(tmp_path, monkeypatch, samples, task, r):
    ref = _load_ref_instruct_tasks()
    monkeypatch.setattr(ref, "random", _ScriptedRandom(r))
    monkeypatch.setattr(ref, "DataLoader",
                        lambda ds, **kw: _FakeLoader(_ListDataset(samples)))
    monkeypatch.setattr(ref, "tqdm", lambda x: x)
    (tmp_path / "data" / "large_instruct_data").mkdir(parents=True, exist_ok=True)
    shutil.copytree(PROMPT_DIR, tmp_path / "data" / "instruct_prompts",
                    dirs_exist_ok=True)
    monkeypatch.chdir(tmp_path)
    ref.create_cp_task_data(_cp_val_dataset(samples), task)
    out = json.loads((tmp_path / "data" / "large_instruct_data" /
                      f"instruct_large_{task}.json").read_text())
    return out


def _cp_samples(label_rows):
    return [{"text_input": f"in{i}", "text_target": f"Report text {i}.",
             "dicom": f"d{i}",
             "chexpert_labels": np.asarray(row, np.float64)}
            for i, row in enumerate(label_rows)]


def _our_records(samples):
    return [{"text_target": s["text_target"], "dicom": s["dicom"],
             "chexpert_labels": s["chexpert_labels"]} for s in samples]


# ------------------------------------------------------ (b) CPbQA byte parity
def test_cpbqa_yes_branch_byte_parity(tmp_path, monkeypatch):
    # every record has positive findings; random()=0.0 < 0.6 -> yes branch
    rows = []
    for pos in ([2], [2, 5], [0, 7], [1, 3, 9]):  # incl. a No-Finding mix
        row = np.zeros(len(COLS))
        row[pos] = 1.0
        rows.append(row)
    samples = _cp_samples(rows)
    ref_out = _run_ref_cp(tmp_path, monkeypatch, samples, "CPbQA", r=0.0)
    ours = generate_cp_tasks(_our_records(samples), "CPbQA",
                             DEFAULT_PROMPTS["CPbQA"], COLS, _ScriptedRng(0.0))
    assert ours == ref_out
    assert all(o["output"] == "yes" for o in ours if o["dicom"] != "d2")
    # d2 is No Finding + Pneumonia -> asks about Pneumonia, not No Finding


def test_cpbqa_no_branch_byte_parity(tmp_path, monkeypatch):
    # exactly one negative among cols[1:] -> singleton set difference, so the
    # reference's unsorted-set choice and our sorted choice must agree;
    # random()=1.0 forces the no branch
    rows = []
    for missing in (1, 5, 13):
        row = np.ones(len(COLS))
        row[0] = 0.0
        row[missing] = 0.0
        rows.append(row)
    samples = _cp_samples(rows)
    ref_out = _run_ref_cp(tmp_path, monkeypatch, samples, "CPbQA", r=1.0)
    ours = generate_cp_tasks(_our_records(samples), "CPbQA",
                             DEFAULT_PROMPTS["CPbQA"], COLS, _ScriptedRng(1.0))
    assert ours == ref_out
    assert [o["output"] for o in ours] == ["no"] * 3
    for o, m in zip(ours, (1, 5, 13)):
        assert COLS[m] in o["task"]


def test_cpaqa_byte_parity(tmp_path, monkeypatch):
    rows = []
    for pos in ([0], [2, 5, 10], [], [0, 7]):
        row = np.zeros(len(COLS))
        row[pos] = 1.0
        rows.append(row)
    samples = _cp_samples(rows)
    ref_out = _run_ref_cp(tmp_path, monkeypatch, samples, "CPaQA", r=0.0)
    ours = generate_cp_tasks(_our_records(samples), "CPaQA",
                             DEFAULT_PROMPTS["CPaQA"], COLS, _ScriptedRng(0.0))
    assert ours == ref_out
    # CPaQA keeps "No Finding" in the joined answer (instruct_tasks.py:174)
    assert ours[0]["output"] == "No Finding"
    assert ours[2]["output"] == ""


# --------------------------------------------------------- (b) CO byte parity
class _MockTok:
    def __init__(self):
        self.last = None

    def batch_encode_plus(self, texts, **kw):
        self.last = list(texts)
        ids = SimpleNamespace(to=lambda dev: None)
        return {"input_ids": ids}

    def batch_decode(self, seqs, **kw):
        return [t + " The corrected fixture report." for t in self.last]


def _mock_lm():
    return SimpleNamespace(generate=lambda **kw: SimpleNamespace(sequences=None))


def test_correction_byte_parity(tmp_path, monkeypatch):
    ref = _load_ref_instruct_tasks()
    monkeypatch.setattr(ref, "random", _ScriptedRandom(0.0))
    monkeypatch.setattr(ref, "DataLoader",
                        lambda ds, **kw: _FakeLoader(ds))
    monkeypatch.setattr(ref, "tqdm", lambda x: x)
    (tmp_path / "data" / "large_instruct_data").mkdir(parents=True)
    shutil.copytree(PROMPT_DIR, tmp_path / "data" / "instruct_prompts")

    preds = [
        {"gt_report": "Gt one.", "pred_report": "Pred one.",
         "fp": ["Edema", "Pneumonia"], "fn": [], "dicom": "d0"},
        {"gt_report": "Gt two.", "pred_report": "Pred two.",
         "fp": [], "fn": ["Cardiomegaly"], "dicom": "d1"},
        {"gt_report": "Gt three.", "pred_report": "Pred three.",
         "fp": ["Fracture"], "fn": ["Edema", "Atelectasis", "Pneumonia"],
         "dicom": "d2"},
        {"gt_report": "Gt four.", "pred_report": "Pred four.",
         "fp": [], "fn": [], "dicom": "d3"},  # NOCHANGE -> dropped
    ]
    (tmp_path / "data" / "instruct_prompts" /
     "instruct_task_correction_preds.json").write_text(json.dumps(preds))
    monkeypatch.chdir(tmp_path)
    ref.create_correction_task_data(_mock_lm(), _MockTok())
    ref_out = json.loads((tmp_path / "data" / "large_instruct_data" /
                          "instruct_large_CO.json").read_text())

    banks = {k: DEFAULT_PROMPTS[k] for k in ("CO_both", "CO_add", "CO_rem")}
    teacher = lambda prompts: [p + " The corrected fixture report."
                               for p in prompts]
    ours = generate_correction_tasks(teacher, preds, banks, _ScriptedRng(0.0))
    assert ours == ref_out
    assert len(ours) == 3  # NOCHANGE dropped on both sides


# ------------------------------------------- (b) EL/SU/RQA instruction parity
@pytest.mark.parametrize("task", ["EL", "SU", "RQA"])
def test_direct_task_prompt_parity(tmp_path, monkeypatch, task):
    ref = _load_ref_instruct_tasks()
    monkeypatch.setattr(ref, "random", _ScriptedRandom(0.0))
    samples = [{"text_input": f"in{i}", "text_target": f"Fixture report {i}.",
                "dicom": f"d{i}"} for i in range(3)]
    monkeypatch.setattr(ref, "DataLoader",
                        lambda ds, **kw: _FakeLoader(_ListDataset(samples)))
    monkeypatch.setattr(ref, "tqdm", lambda x: x)
    (tmp_path / "data" / "large_instruct_data").mkdir(parents=True)
    shutil.copytree(PROMPT_DIR, tmp_path / "data" / "instruct_prompts")
    monkeypatch.chdir(tmp_path)
    ref.create_direct_task_data(_mock_lm(), _MockTok(),
                                _ListDataset(samples), task)
    ref_out = json.loads((tmp_path / "data" / "large_instruct_data" /
                          f"instruct_large_{task}.json").read_text())

    teacher = lambda prompts: [p + " The corrected fixture report."
                               for p in prompts]
    recs = [{"text_target": s["text_target"], "dicom": s["dicom"]}
            for s in samples]
    ours = generate_direct_tasks(teacher, recs, task, DEFAULT_PROMPTS[task],
                                 _ScriptedRng(0.0))
    assert len(ours) == len(ref_out) == 3
    for a, b in zip(ours, ref_out):
        # teacher tasks: prompts byte-equal; the reference stores the raw
        # split()[1] answer whose whitespace its fuse stage strips
        # (create_data.py:401) — we strip at generation time
        assert a["instruction"] == b["instruction"]
        assert a["task"] == b["task"]
        assert a["gt_report"] == b["gt_report"]
        assert a["dicom"] == b["dicom"]
        assert a["task_type"] == b["task_type"]
        assert a["output"] == b["output"].strip()
