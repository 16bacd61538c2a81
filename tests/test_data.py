"""Data-layer tests: section parser, conversation templating, prompt bank.

Golden values below were produced by running the reference implementations
(mimic-cxr/section_parser.py section_text, test.py Conversation) on the same
inputs — hard-coded so tests don't depend on /root/reference.
"""
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
