"""Pretrained-weight fetch: URL download with md5 verification.

Replaces the torchvision ``download_url`` dependency of the reference's
biovil_t/pretrained.py:26-85 with a stdlib urllib implementation. The URL /
md5 constants are the reference's published checkpoint pins (pretrained.py:
26-32) — a data contract, reproduced verbatim.

This module performs network I/O, so it is NOT exercised in CI (the build
container has no egress); ``verify_md5`` and the cache-hit logic are unit
tested against local files.
"""
from __future__ import annotations

import hashlib
import tempfile
import urllib.request
from pathlib import Path
from typing import Optional

HF_URL = "https://huggingface.co"

BIOMED_VLP_CXR_BERT_SPECIALIZED = "microsoft/BiomedVLP-CXR-BERT-specialized"
BIOMED_VLP_BIOVIL_T = "microsoft/BiomedVLP-BioViL-T"
CXR_BERT_COMMIT_TAG = "v1.1"
BIOVIL_T_COMMIT_TAG = "v1.0"

BIOVIL_IMAGE_WEIGHTS_NAME = "biovil_image_resnet50_proj_size_128.pt"
BIOVIL_IMAGE_WEIGHTS_URL = (
    f"{HF_URL}/{BIOMED_VLP_CXR_BERT_SPECIALIZED}/resolve/"
    f"{CXR_BERT_COMMIT_TAG}/{BIOVIL_IMAGE_WEIGHTS_NAME}")
BIOVIL_IMAGE_WEIGHTS_MD5 = "02ce6ee460f72efd599295f440dbb453"

BIOVIL_T_IMAGE_WEIGHTS_NAME = "biovil_t_image_model_proj_size_128.pt"
BIOVIL_T_IMAGE_WEIGHTS_URL = (
    f"{HF_URL}/{BIOMED_VLP_BIOVIL_T}/resolve/"
    f"{BIOVIL_T_COMMIT_TAG}/{BIOVIL_T_IMAGE_WEIGHTS_NAME}")
BIOVIL_T_IMAGE_WEIGHTS_MD5 = "a83080e2f23aa584a4f2b24c39b1bb64"


def file_md5(path: str | Path, chunk_size: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(chunk_size)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()


def verify_md5(path: str | Path, md5: Optional[str]) -> bool:
    """True when ``md5`` is None (no pin) or matches the file's digest."""
    return md5 is None or file_md5(path) == md5


def download_url(url: str, root: str | Path, filename: str,
                 md5: Optional[str] = None, progress: bool = True) -> Path:
    """Download ``url`` to root/filename, skipping when a verified copy
    already exists (torchvision download_url semantics). Raises RuntimeError
    on digest mismatch."""
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    target = root / filename
    if target.exists() and verify_md5(target, md5):
        return target
    tmp = target.with_suffix(target.suffix + ".part")
    with urllib.request.urlopen(url) as resp, open(tmp, "wb") as out:
        total = int(resp.headers.get("Content-Length") or 0)
        done = 0
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
            done += len(chunk)
            if progress and total:
                print(f"\r{filename}: {done / total:6.1%}", end="", flush=True)
        if progress and total:
            print()
    if not verify_md5(tmp, md5):
        tmp.unlink(missing_ok=True)
        raise RuntimeError(f"md5 mismatch for {url}")
    tmp.rename(target)
    return target


def fetch_biovil_image_weights(root: Optional[str | Path] = None) -> Path:
    """BioViL (single-image) image-model checkpoint (pretrained.py:36-48)."""
    return download_url(BIOVIL_IMAGE_WEIGHTS_URL,
                        root or tempfile.gettempdir(),
                        BIOVIL_IMAGE_WEIGHTS_NAME, BIOVIL_IMAGE_WEIGHTS_MD5)


def fetch_biovil_t_image_weights(root: Optional[str | Path] = None) -> Path:
    """BioViL-T (multi-image) image-model checkpoint (pretrained.py:51-63),
    the trunk RaDialog builds on. Convert with
    utils.hf_weights.convert_biovil_t after torch.load."""
    return download_url(BIOVIL_T_IMAGE_WEIGHTS_URL,
                        root or tempfile.gettempdir(),
                        BIOVIL_T_IMAGE_WEIGHTS_NAME,
                        BIOVIL_T_IMAGE_WEIGHTS_MD5)
