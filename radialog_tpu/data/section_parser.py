"""MIMIC-CXR radiology report sectioning.

Clean-room implementation of the behavioral contract of
mimic-cxr/section_parser.py:5-205 + create_section_files.py:35-114:
split a raw report on ALL-CAPS ``HEADER:`` lines, normalize header
spellings to canonical section names, extract the *last* occurrence of
impression/findings/last_paragraph/comparison, and emit one CSV row per
dicom image with columns
[impression, findings, last_paragraph, comparison, dicom_id, Img_Filename,
 Img_Folder, Note_file].

The normalization table is a data contract (observed MIMIC-CXR header
variants incl. typos); reproduced as data, organized our own way.
"""
from __future__ import annotations

import csv
import re
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

_HEADER_RE = re.compile(r"\n ([A-Z ()/,-]+):\s", re.DOTALL)

# canonical name -> header variants seen in MIMIC-CXR (incl. typos)
_CANONICAL_VARIANTS: Dict[str, Tuple[str, ...]] = {
    "preamble": ("preamble",),
    "impression": (
        "impression", "conclusion", "findings and impression",
        "findings/impression", "findings/ impression", "ndication",
        "impresson", "imprression", "imoression", "impressoin", "imprssion",
        "impresion", "imperssion", "mpression", "impession",
    ),
    "comparison": (
        "comparison", "comparisons", "reference exam", "comparison exam",
        "comparison film", "comparision", "comparsion", "comparrison",
        "comparisions",
    ),
    "indication": (
        "indication", "reason for examination", "reason for exam",
        "clinical indication", "idication",
    ),
    "findings": (
        "findings", "chest, two views", "finding", "findins", "findindgs",
        "findgings", "findngs", "findnings", "finidngs", "reference findings",
    ),
    "examination": ("examination", "exam", "type of examination"),
    "technique": ("technique",),
    "history": (
        "history", "clinical history", "clinical information",
        "patient history", "pfi",
    ),
    "notification": ("notification",),
    "recommendations": ("recommendation(s)", "recommendations", "recommendation"),
    "addendum": ("addendum",),
    "date": ("date",),
    "comment": ("comment",),
    "wet read": ("wet read", "wetread"),
}

_VARIANT_TO_CANONICAL: Dict[str, str] = {
    v: canon for canon, vs in _CANONICAL_VARIANTS.items() for v in vs
}

_MAIN_SECTIONS = ("impression", "findings", "history", "comparison", "addendum")

_FINDINGS_HINTS = re.compile(
    "(" + "|".join([
        "chest", "portable", "pa and lateral", "lateral and pa",
        "ap and lateral", "lateral and ap", "frontal and", "two views",
        "frontal view", "pa view", "ap view", "one view", "lateral view",
        "bone window", "frontal upright", "frontal semi-upright", "ribs",
        "pa and lat",
    ]) + ")")


def normalize_section_name(raw: str) -> str:
    """Header text -> canonical section name (section_parser.py:91-205)."""
    s = raw.lower().strip()
    if s in _VARIANT_TO_CANONICAL:
        return _VARIANT_TO_CANONICAL[s]
    for m in _MAIN_SECTIONS:
        if m in s:
            return m
    if _FINDINGS_HINTS.search(s):
        return "findings"
    return s


def split_sections(text: str) -> Tuple[List[str], List[str]]:
    """Raw report -> (section texts, normalized names), in document order.

    Mirrors section_text (section_parser.py:5-88): leading text becomes
    'preamble'; a report with no headers is one 'full report' section; empty
    impression/findings sections are dropped; when neither impression nor
    findings exists, the final blank-line-separated paragraph of the last
    section is split off as 'last_paragraph'.
    """
    sections: List[str] = []
    names: List[str] = []

    match = _HEADER_RE.search(text, 0)
    if match is None:
        sections.append(text)
        names.append("full report")
    else:
        sections.append(text[: match.start(1)])
        names.append("preamble")
        while match is not None:
            header = match.group(1).lower()
            body_start = match.end()
            # skip past the first newline to dodge header-like text on the
            # same line
            nl = text[body_start:].find("\n")
            skip = nl if nl != -1 else 0
            nxt = _HEADER_RE.search(text, body_start + skip)
            body_end = nxt.start() if nxt is not None else len(text)
            sections.append(text[body_start:body_end])
            names.append(header)
            match = nxt
        names = [normalize_section_name(n) for n in names]

    # drop empty impression/findings sections (handles title-like openers)
    for i in reversed(range(len(names))):
        if names[i] in ("impression", "findings") and sections[i].strip() == "":
            sections.pop(i)
            names.pop(i)

    if "impression" not in names and "findings" not in names:
        if "\n \n" in sections[-1]:
            parts = sections[-1].split("\n \n")
            sections[-1] = parts[0]
            sections.append("\n \n".join(parts[1:]))
            names.append("last_paragraph")

    return sections, names


def parse_report(text: str) -> Dict[str, str]:
    """Extract the four target sections, taking the LAST occurrence of each
    (create_section_files.py list_rindex)."""
    sections, names = split_sections(text)
    out: Dict[str, str] = {}
    for target in ("impression", "findings", "last_paragraph", "comparison"):
        for i in reversed(range(len(names))):
            if names[i] == target:
                out[target] = sections[i].strip()
                break
    return out


SECTIONED_COLUMNS = ["impression", "findings", "last_paragraph", "comparison",
                     "dicom_id", "Img_Filename", "Img_Folder", "Note_file"]


def build_sectioned_csv(studies: Iterable[Tuple[str, str, str, List[str]]],
                        output_path: str | Path) -> int:
    """Write mimic_cxr_sectioned.csv.

    ``studies``: iterable of (study_stem e.g. 's501...', report_text,
    img_folder e.g. 'files/p10/p10000032/s50414267', dicom_ids).
    Returns number of rows written. One row per dicom (create_section_files.py
    fan-out).
    """
    n = 0
    with open(output_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(SECTIONED_COLUMNS)
        for study_stem, text, img_folder, dicom_ids in studies:
            secs = parse_report(text)
            base = [secs.get("impression"), secs.get("findings"),
                    secs.get("last_paragraph"), secs.get("comparison")]
            for d in dicom_ids:
                w.writerow(base + [d, f"{d}.jpg", img_folder, f"{study_stem}.txt"])
                n += 1
    return n
