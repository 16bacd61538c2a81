"""Instruct-data generation tests (teacher mocked as an echo function)."""
import numpy as np

from radialog_tpu.data.instruct import (DEFAULT_PROMPTS, fuse_instruct_dataset,
                                        generate_cp_tasks,
                                        generate_correction_tasks,
                                        generate_direct_tasks,
                                        generate_nle_tasks, split_six_ways)

COLS = ["No Finding", "Cardiomegaly", "Edema", "Pneumonia"]


def _records(n=6):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        labels = np.zeros(len(COLS))
        labels[rng.integers(0, len(COLS))] = 1.0
        out.append({"text_target": f"Report text {i}.", "dicom": f"d{i}",
                    "chexpert_labels": labels,
                    "text_input": "prompt ASSISTANT:"})
    return out


def _teacher(prompts):
    return [p + " ANSWER-" + str(len(p)) for p in prompts]


def test_split_six_ways_partitions():
    rng = np.random.default_rng(0)
    s = split_six_ways(20, rng)
    all_idx = sorted(sum((v for v in s.values()), []))
    assert all_idx == list(range(20))
    assert abs(len(s["EL"]) - len(s["SU"])) <= 1


def test_direct_tasks():
    recs = _records(4)
    out = generate_direct_tasks(_teacher, recs, "EL", DEFAULT_PROMPTS["EL"],
                                np.random.default_rng(0), batch_size=2)
    assert len(out) == 4
    assert out[0]["task_type"] == "EL"
    assert "Report: Report text 0." in out[0]["instruction"]
    assert out[0]["instruction"].endswith("ASSISTANT:")


def test_cp_binary_qa_consistent():
    recs = _records(40)
    out = generate_cp_tasks(recs, "CPbQA", DEFAULT_PROMPTS["CPbQA"], COLS,
                            np.random.default_rng(0))
    assert len(out) == 40
    for o, r in zip(out, recs):
        # answer must be consistent with the asked finding's label
        asked = [c for c in COLS if c in o["task"]]
        assert len(asked) >= 1
        finding = max(asked, key=len)
        positive = r["chexpert_labels"][COLS.index(finding)] == 1.0
        assert o["output"] == ("yes" if positive else "no")
        assert finding != "No Finding"


def test_cp_all_qa_lists_findings():
    recs = _records(5)
    out = generate_cp_tasks(recs, "CPaQA", DEFAULT_PROMPTS["CPaQA"], COLS,
                            np.random.default_rng(0))
    for o, r in zip(out, recs):
        pos = [COLS[j] for j in np.where(r["chexpert_labels"] == 1)[0]]
        assert o["output"] == ", ".join(pos)


def test_correction_tasks_skip_nochange():
    preds = [
        {"gt_report": "a", "pred_report": "a extra", "fp": ["Edema"],
         "fn": [], "dicom": "d0"},
        {"gt_report": "b", "pred_report": "b", "fp": [], "fn": [], "dicom": "d1"},
        {"gt_report": "c", "pred_report": "c less", "fp": [],
         "fn": ["Cardiomegaly", "Pneumonia"], "dicom": "d2"},
    ]
    banks = {k: DEFAULT_PROMPTS[k] for k in ("CO_both", "CO_add", "CO_rem")}
    out = generate_correction_tasks(_teacher, preds, banks,
                                    np.random.default_rng(0))
    assert len(out) == 2  # NOCHANGE dropped
    assert "Edema" in out[0]["task"]
    assert "Cardiomegaly and Pneumonia" in out[1]["task"]


def test_nle_tasks_filtering():
    nle = [
        {"report_ID": "s1", "nle": "There is edema.",
         "diagnosis_label": [0, 0, 1, 0, 0, 0, 0, 0, 0, 0]},
        {"report_ID": "s2", "nle": "Not in findings.",
         "diagnosis_label": [1] + [0] * 9},
        {"report_ID": "s3", "nle": "whatever", "diagnosis_label": [1] + [0] * 9},
    ]
    reports = {"s1": {"findings": "Stable. There is edema.", "dicom_id": "d1"},
               "s2": {"findings": "Clear lungs.", "dicom_id": "d2"}}
    out = generate_nle_tasks(nle, reports, DEFAULT_PROMPTS["RE"],
                             np.random.default_rng(0))
    assert len(out) == 1  # s2: nle not in findings; s3: unknown report
    assert out[0]["output"] == "There is edema."
    assert "Edema" in out[0]["task"]


def test_fuse_shapes_multi_turn():
    rg = [{"text_input": "P1 ASSISTANT:", "text_target": "T1", "dicom": "d0"}]
    tasks = [{"gt_report": "G", "task": "Summarize.", "input": "",
              "output": "Sum", "dicom": "d0", "task_type": "SU"},
             {"gt_report": "G", "incorrect_report": "BAD", "task": "Fix it.",
              "input": "", "output": "Fixed", "dicom": "d0", "task_type": "CO"},
             {"gt_report": "G", "task": "List.", "input": "",
              "output": "Edema, NO FINDING", "dicom": "d0", "task_type": "CPaQA"}]
    fused = fuse_instruct_dataset(rg, tasks, "Template {findings} prompt",
                                  {"d0": "edema"}, np.random.default_rng(0))
    assert len(fused) == 4
    by_task = {f["task"]: f for f in fused}
    assert by_task["RG"]["output"] == "T1"
    assert "Template edema prompt" in by_task["SU"]["instruction"]
    assert "ASSISTANT: G</s>USER: Summarize. ASSISTANT:" in by_task["SU"]["instruction"]
    assert "ASSISTANT: BAD</s>" in by_task["CO"]["instruction"]  # CO uses the bad report
    assert by_task["CPaQA"]["output"] == "edema, no finding"  # lowercased
