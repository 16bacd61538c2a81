"""Data-layer tests: section parser, conversation templating, prompt bank.

Golden values below were produced by running the reference implementations
(mimic-cxr/section_parser.py section_text, test.py Conversation) on the same
inputs — hard-coded so tests don't depend on /root/reference.
"""
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

from radialog_tpu.data.conversation import (
    Conversation, RADIALOG_SYSTEM, extract_assistant_reply, extract_report,
    single_turn_prompt,
)
from radialog_tpu.data.prompts import (
    IMG_RUN, N_IMG_TOKENS, ReportPrompt, VICUNA_PROMPTS,
    structured_findings_string,
)
from radialog_tpu.data.section_parser import parse_report, split_sections


TYPICAL = (
    "                                 FINAL REPORT\n EXAMINATION:  CHEST (PA "
    "AND LAT)\n \n INDICATION:  Cough.\n \n TECHNIQUE:  PA and lateral views."
    "\n \n COMPARISON:  None.\n \n FINDINGS: \n \n The lungs are clear. No "
    "pleural effusion.\n \n IMPRESSION: \n \n No acute process.\n"
)


class TestSectionParser:
    def test_typical_report(self):
        _, names = split_sections(TYPICAL)
        assert names == ["preamble", "examination", "indication", "technique",
                         "comparison", "findings", "impression"]
        out = parse_report(TYPICAL)
        assert out["findings"] == "The lungs are clear. No pleural effusion."
        assert out["impression"] == "No acute process."
        assert out["comparison"] == "None."

    def test_no_headers_splits_last_paragraph(self):
        text = (" The heart is mildly enlarged. Lungs clear.\n \n "
                "No acute cardiopulmonary process.\n")
        sections, names = split_sections(text)
        assert names == ["full report", "last_paragraph"]
        assert "No acute cardiopulmonary process." in sections[1]

    def test_header_typo_normalized(self):
        text = ("                                 FINAL REPORT\n HISTORY:  "
                "Fever.\n \n IMPRESSON:  Right lower lobe pneumonia.\n")
        out = parse_report(text)
        assert out["impression"] == "Right lower lobe pneumonia."

    def test_findings_hint_header(self):
        text = ("                                 FINAL REPORT\n PORTABLE "
                "CHEST:  There is a right pleural effusion.\n \n CONCLUSION:"
                "  Effusion.\n")
        _, names = split_sections(text)
        assert names == ["preamble", "findings", "impression"]

    def test_empty_findings_dropped(self):
        text = ("                                 FINAL REPORT\n FINDINGS:\n "
                "\n IMPRESSION:  Clear.\n")
        _, names = split_sections(text)
        assert "findings" not in names
        assert "impression" in names

    def test_last_occurrence_wins(self):
        text = ("                                 FINAL REPORT\n IMPRESSION:"
                "  First.\n \n IMPRESSION:  Second.\n")
        assert parse_report(text)["impression"] == "Second."


class TestCustomRules:
    """Manual per-study overrides (section_parser.py:207-270). The reference
    loads but never applies them (create_section_files.py:47); we verify both
    the default (parity: not applied) and the opt-in upstream semantics."""

    def test_tables_match_reference_counts(self):
        from radialog_tpu.data.section_parser import custom_mimic_cxr_rules
        names, indices = custom_mimic_cxr_rules()
        assert len(names) == 23 and len(indices) == 31
        assert names["s50913680"] == "recommendations"
        assert indices["s50525523"] == (201, 349)
        assert indices["s58235663"] == (0, 0)

    def test_default_matches_reference_no_application(self):
        from radialog_tpu.data.section_parser import parse_report_with_rules
        out = parse_report_with_rules("s50913680", TYPICAL)
        assert out == parse_report(TYPICAL)

    def test_custom_index_slice_becomes_findings(self):
        from radialog_tpu.data.section_parser import parse_report_with_rules
        text = "x" * 201 + " Slice findings text. " + "y" * 200
        out = parse_report_with_rules("s50525523", text,
                                      apply_custom_rules=True)
        assert out["findings"] == text[201:349].strip()

    def test_zero_index_means_no_findings(self):
        from radialog_tpu.data.section_parser import parse_report_with_rules
        out = parse_report_with_rules("s58235663", TYPICAL,
                                      apply_custom_rules=True)
        assert "findings" not in out

    def test_custom_section_name_override(self):
        from radialog_tpu.data.section_parser import parse_report_with_rules
        text = ("                                 FINAL REPORT\n "
                "RECOMMENDATION(S):  Repeat radiograph.\n \n IMPRESSION:  "
                "Clear.\n")
        out = parse_report_with_rules("s50913680", text,
                                      apply_custom_rules=True)
        assert out["findings"] == "Repeat radiograph."
        assert out["impression"] == "Clear."

    def test_cli_builds_csv(self, tmp_path):
        import csv
        import subprocess
        import sys
        reports = tmp_path / "reports"
        jpgs = tmp_path / "jpgs"
        sdir = reports / "p10" / "p10000001"
        sdir.mkdir(parents=True)
        (sdir / "s50000001.txt").write_text(TYPICAL)
        idir = jpgs / "p10" / "p10000001" / "s50000001"
        idir.mkdir(parents=True)
        (idir / "abc-123.jpg").write_bytes(b"")
        (idir / "def-456.jpg").write_bytes(b"")
        out = tmp_path / "out"
        r = subprocess.run(
            [sys.executable, "create_sections.py",
             "--reports_path", str(reports),
             "--mimic_cxr_jpg_path", str(jpgs),
             "--output_path", str(out)],
            capture_output=True, text=True, cwd=str(ROOT))
        assert r.returncode == 0, r.stderr
        with open(out / "mimic_cxr_sectioned.csv", newline="") as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["impression", "findings", "last_paragraph",
                           "comparison", "dicom_id", "Img_Filename",
                           "Img_Folder", "Note_file"]
        assert len(rows) == 3  # header + one per dicom
        assert {rows[1][4], rows[2][4]} == {"abc-123", "def-456"}
        assert rows[1][1] == "The lungs are clear. No pleural effusion."
        assert rows[1][6] == "files/p10/p10000001/s50000001"
        assert rows[1][7] == "s50000001.txt"


class TestConversation:
    def test_vicuna_two_style_prompt(self):
        conv = Conversation()
        conv.append_user("Hello")
        conv.append_assistant(None)
        # reference: system + sep, then "ROLE: msg{sep_i}" / trailing "ROLE:"
        assert conv.get_prompt() == RADIALOG_SYSTEM + " USER: Hello ASSISTANT:"

    def test_multi_turn_uses_sep2(self):
        conv = Conversation()
        conv.append_user("Q1")
        conv.append_assistant("A1")
        conv.append_user("Q2")
        conv.append_assistant(None)
        p = conv.get_prompt()
        assert "ASSISTANT: A1</s>USER: Q2 ASSISTANT:" in p

    def test_single_turn_prompt_helper(self):
        assert single_turn_prompt("x") == RADIALOG_SYSTEM + " USER: x ASSISTANT:"

    def test_extracts(self):
        d = "sys USER: q ASSISTANT: The report: lungs clear."
        assert extract_assistant_reply(d) == " The report: lungs clear."
        assert extract_report(d) == " lungs clear."
        assert extract_report("USER: q ASSISTANT: plain text") == " plain text"


class TestPrompts:
    def test_img_run_length(self):
        assert IMG_RUN.count("<IMG>") == N_IMG_TOKENS == 32

    def test_img_template_contains_run(self):
        t = VICUNA_PROMPTS["img_matching_examples_ig2_noexamples_IMG_findings"]
        assert IMG_RUN in t and "{findings}" in t

    def test_report_prompt_formats_findings(self):
        rp = ReportPrompt()
        out = rp("cardiomegaly, edema")
        assert "Predicted Findings: cardiomegaly, edema." in out
        assert rp("ignored", no_labels=True).count("no common findings") == 1

    def test_structured_findings_string(self):
        # No Finding dropped when real findings coexist (test.py:92-107)
        no_labels, s = structured_findings_string(
            ["No Finding", "Support Devices", "Edema"])
        assert not no_labels and s == "support devices, edema"
        no_labels, s = structured_findings_string(["No Finding"])
        assert s == "no finding"
        no_labels, s = structured_findings_string([])
        assert no_labels and s == ""
