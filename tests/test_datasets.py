"""Dataset-layer tests over synthetic MIMIC-shaped fixture CSVs."""
import json

import numpy as np
import pandas as pd
import pytest

from radialog_tpu.data.datasets import (CHEXPERT_COLS, MimicPaths,
                                        ReportGenData, balanced_epoch_indices,
                                        split_report_instruct,
                                        stratified_indices)
from radialog_tpu.data.tokenization import (IGNORE_INDEX, Prompter,
                                            WhitespaceTokenizer,
                                            pad_batch_right, pad_labels_right,
                                            tokenize_with_masked_prompt)


@pytest.fixture
def paths(tmp_path):
    dicoms = [f"d{i:03d}" for i in range(8)]
    split = pd.DataFrame({
        "dicom_id": dicoms,
        "study_id": range(8), "subject_id": range(8),
        "split": ["test"] * 4 + ["train"] * 4,
    })
    split.to_csv(tmp_path / "split.csv", index=False)

    sectioned = pd.DataFrame({
        "impression": ["ok"] * 8,
        "findings": [f"The lungs are clear in scan {i}." for i in range(8)],
        "last_paragraph": [None] * 8, "comparison": ["None."] * 8,
        "dicom_id": dicoms,
        "Img_Filename": [f"{d}.jpg" for d in dicoms],
        "Img_Folder": [f"files/p10/p100000{i:02d}/s5000{i:03d}" for i in range(8)],
        "Note_file": [f"s5000{i:03d}.txt" for i in range(8)],
    })
    sectioned.to_csv(tmp_path / "sectioned.csv", index=False)

    chexpert = pd.DataFrame({"dicom_id": dicoms})
    for j, c in enumerate(CHEXPERT_COLS):
        chexpert[c] = [(1.0 if (i + j) % 3 == 0 else 0.0) for i in range(8)]
    chexpert.to_csv(tmp_path / "chexpert.csv", index=False)

    preds = {d: (["Cardiomegaly", "Edema"] if i % 2 else ["No Finding"])
             for i, d in enumerate(dicoms)}
    (tmp_path / "preds.json").write_text(json.dumps(preds))

    return MimicPaths(split_csv=str(tmp_path / "split.csv"),
                      sectioned_csv=str(tmp_path / "sectioned.csv"),
                      chexpert_csv=str(tmp_path / "chexpert.csv"),
                      predicted_findings_json=str(tmp_path / "preds.json"))


class TestReportGenData:
    def test_join_and_prompt(self, paths):
        ds = ReportGenData(paths, split="test")
        assert len(ds) == 4
        rec = ds[1]
        assert rec["dicom"] == "d001"
        assert rec["text_input"].endswith("ASSISTANT:")
        assert rec["text_input"].count("<IMG>") == 32
        assert "cardiomegaly, edema" in rec["text_input"]
        assert rec["text_target"].startswith("The lungs are clear")
        assert rec["chexpert_labels"].shape == (14,)
        assert rec["img_path"].endswith("d001.jpg")

    def test_no_finding_prompt(self, paths):
        ds = ReportGenData(paths, split="test")
        rec = ds[0]  # preds = ["No Finding"]
        assert "no finding" in rec["text_input"]

    def test_gt_label_fallback(self, paths, tmp_path):
        import dataclasses
        p = dataclasses.replace(paths, predicted_findings_json=None)
        ds = ReportGenData(p, split="test")
        rec = ds[0]
        # row 0: labels where (i+j)%3==0 for i=0 -> cols j in {0,3,6,9,12}
        assert "lung opacity" in rec["text_input"]

    def test_truncate(self, paths):
        assert len(ReportGenData(paths, split="test", truncate=2)) == 2


class TestSampling:
    def test_stratified_caps_no_finding(self):
        n = 140
        df = pd.DataFrame({c: np.zeros(n) for c in CHEXPERT_COLS})
        df.loc[:99, "Cardiomegaly"] = 1        # 100 finding rows
        df.loc[100:, "No Finding"] = 1         # 40 no-finding rows
        idx = stratified_indices(df, simulated_epochs=2)
        findings = sum(1 for i in idx if df.loc[i, "Cardiomegaly"] == 1)
        nf = len(idx) - findings
        assert findings == 200                 # duplicated x2
        assert nf == int(200 * 14 / 13 / 14)   # capped at ~1/14

    def test_balanced_epoch(self):
        rng = np.random.default_rng(0)
        idx = balanced_epoch_indices(list(range(100)), list(range(100, 110)), rng)
        assert len(idx) == 20
        assert sum(1 for i in idx if i >= 100) == 10

    def test_split_report_instruct(self):
        recs = [{"task": "RG"}, {"task": "EL"}, {}, {"task": "CP"}]
        rep, inst = split_report_instruct(recs)
        assert rep == [0, 2] and inst == [1, 3]


class TestTokenization:
    def test_prompter(self):
        p = Prompter()
        full = p.generate_prompt("Write a report.", "USER: x ASSISTANT:", "The lungs.")
        assert full == "Write a report. USER: x ASSISTANT:The lungs."
        assert p.get_response("foo ASSISTANT: The lungs.") == "The lungs."

    def test_masked_prompt_tokenization(self):
        tok = WhitespaceTokenizer(vocab_size=512)
        rec = {"instruction": "Write the findings.",
               "input": "USER: findings ASSISTANT:",
               "output": "Lungs clear."}
        out = tokenize_with_masked_prompt(tok, Prompter(), rec, cutoff_len=64)
        ids, labels = out["input_ids"], out["labels"]
        assert ids[-1] == tok.eos_token_id
        n_masked = sum(1 for l in labels if l == IGNORE_INDEX)
        # prompt tokens masked; the response + eos remain
        assert 0 < n_masked < len(labels)
        assert labels[-1] == tok.eos_token_id
        assert labels[:n_masked] == [IGNORE_INDEX] * n_masked
        # response tokens equal input ids on the unmasked tail
        assert labels[n_masked:] == ids[n_masked:]

    def test_cutoff(self):
        tok = WhitespaceTokenizer(vocab_size=512)
        rec = {"instruction": "w " * 300, "input": None, "output": "x " * 300}
        out = tokenize_with_masked_prompt(tok, Prompter(), rec, cutoff_len=50)
        assert len(out["input_ids"]) == 50

    def test_pad_batch_right(self):
        toks, lens = pad_batch_right([[1, 2, 3], [4, 5]], pad_id=0)
        assert toks.shape == (2, 8)  # bucketed to multiple of 8
        np.testing.assert_array_equal(lens, [3, 2])
        assert toks[1, 2] == 0
        labs = pad_labels_right([[1, 2, 3], [4, 5]], 8)
        assert labs[0, 3] == IGNORE_INDEX

    def test_img_token_roundtrip(self):
        tok = WhitespaceTokenizer(vocab_size=512, num_img_tokens=4)
        ids = tok.encode("Image: " + "<IMG>" * 4 + ". Report:")
        assert ids.count(tok.img_token_id) == 4


class TestStage1Data:
    """MIMIC_CXR_Dataset contract (ReportDataset.py:210-371): joins + the
    custom-epoch subset scheme."""

    def test_train_defaults_two_sub_epochs(self, paths):
        from radialog_tpu.data.datasets import Stage1Data
        data = Stage1Data(paths, split="train")
        assert data.custom_epochs_per_epoch == 2
        assert len(data) == 2  # 4 train rows // 2 sub-epochs

    def test_truncate_disables_sub_epochs(self, paths):
        from radialog_tpu.data.datasets import Stage1Data
        data = Stage1Data(paths, split="train", truncate=3)
        assert data.custom_epochs_per_epoch == 1
        assert len(data) == 3

    def test_sub_epoch_subsets_are_disjoint_and_cover(self, paths):
        from radialog_tpu.data.datasets import Stage1Data
        data = Stage1Data(paths, split="train")
        data.set_custom_epoch(0)
        first = [data[i]["dicom"] for i in range(len(data))]
        data.set_custom_epoch(1)
        second = [data[i]["dicom"] for i in range(len(data))]
        assert not set(first) & set(second)
        assert len(first + second) == 4

    def test_record_fields(self, paths):
        from radialog_tpu.data.datasets import Stage1Data
        data = Stage1Data(paths, split="test")
        rec = data[0]
        assert rec["text_output"].startswith("The lungs are clear")
        assert rec["img_path"].endswith(".jpg")
        assert rec["dicom"] in data.img_ids
