#!/usr/bin/env python
"""Section the MIMIC-CXR free-text reports into mimic_cxr_sectioned.csv.

Reference-compatible surface (mimic-cxr/create_section_files.py:16-118):
walk reports_path/p1?/p*/s*.txt, pair each study with its dicom JPEGs under
mimic_cxr_jpg_path, split the report (section_parser), and emit one CSV row
per dicom with [impression, findings, last_paragraph, comparison, dicom_id,
Img_Filename, Img_Folder, Note_file], taking the LAST occurrence of each
section (list_rindex).

The manually-determined rules for poorly formatted studies
(section_parser.py:207-270) are exposed behind --apply-custom-rules; the
default (off) matches the reference, which loads the tables at
create_section_files.py:47 but never applies them in its main loop.
"""
from __future__ import annotations

import argparse
import os
from pathlib import Path

from radialog_tpu.data.section_parser import build_sectioned_csv


def parse_args():
    p = argparse.ArgumentParser(description="MIMIC-CXR report sectioning")
    p.add_argument("--reports_path", required=True,
                   help="root of the free-text reports, e.g. .../mimic-cxr-reports/files")
    p.add_argument("--mimic_cxr_jpg_path", required=True,
                   help="root of the JPEG tree, e.g. .../mimic-cxr-jpg/2.0.0/files")
    p.add_argument("--output_path", default="reports_processed",
                   help="directory for mimic_cxr_sectioned.csv")
    p.add_argument("--apply-custom-rules", action="store_true", default=False,
                   help="apply the manual per-study section overrides "
                        "(upstream MIT-LCP semantics; the reference loads but "
                        "does not apply them)")
    return p.parse_args()


def iter_studies(reports_path: Path, jpg_path: Path):
    """Yield (study_stem, report_text, img_folder, dicom_ids) in the
    reference's sorted p-group / patient / study walk order."""
    p_grps = sorted(d for d in os.listdir(reports_path)
                    if d.startswith("p") and len(d) == 3)
    for p_grp in p_grps:
        patients = sorted(d for d in os.listdir(reports_path / p_grp)
                          if d.startswith("p"))
        for patient in patients:
            patient_path = reports_path / p_grp / patient
            for s in sorted(f for f in os.listdir(patient_path)
                            if f.startswith("s") and f.endswith(".txt")):
                stem = s[:-4]
                img_dir = jpg_path / p_grp / patient / stem
                dicom_ids = []
                if img_dir.is_dir():
                    dicom_ids = [f[:-4] for f in os.listdir(img_dir)
                                 if f.endswith(".jpg")]
                text = (patient_path / s).read_text()
                img_folder = str(Path("files") / p_grp / patient / stem)
                yield stem, text, img_folder, dicom_ids


def main():
    args = parse_args()
    out_dir = Path(args.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    n = build_sectioned_csv(
        iter_studies(Path(args.reports_path), Path(args.mimic_cxr_jpg_path)),
        out_dir / "mimic_cxr_sectioned.csv",
        apply_custom_rules=args.apply_custom_rules)
    print(f"wrote {n} rows -> {out_dir / 'mimic_cxr_sectioned.csv'}")


if __name__ == "__main__":
    main()
