"""Interactive dialog session — the logic behind the repo-root demo.py.

Re-implements demo.py get_response (demo.py:245-305) as a stateful session:
an image message runs the findings classifier + Q-Former embedding and (in
report mode) builds the RG prompt; free-text messages continue the
conversation. The reference's CPU<->GPU model shuttling and the
current_chat_img.pt disk handoff (demo.py:269-273) are replaced by keeping
the embedding in memory and passing it through prefill each turn.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..data.conversation import Conversation, DEMO_SYSTEM
from ..data.prompts import IMG_RUN
from ..ops.image import load_image_grayscale, preprocess_cxr_np
from .pipeline import RaDialogPipeline

RG_PROMPT = (
    f"Image information: {IMG_RUN}. Predicted Findings: {{findings}}. You are "
    "to act as a radiologist and write the finding section of a chest x-ray "
    "radiology report for this X-ray image and the given predicted findings. "
    "Write in the style of a radiologist, write one fluent text without "
    "enumeration, be concise and don't provide explanations or reasons.")


class ChatSession:
    """Multi-turn RaDialog dialog over one (optional) image."""

    def __init__(self, pipe: RaDialogPipeline, gen_report: bool = True,
                 precomputed_findings: Optional[Dict[str, List[str]]] = None):
        self.pipe = pipe
        self.gen_report = gen_report
        self.precomputed = precomputed_findings or {}
        self.conv = Conversation(system=DEMO_SYSTEM)
        self.img_embs = None
        self.findings: Optional[str] = None

    def reset(self) -> None:
        self.conv = Conversation(system=DEMO_SYSTEM)
        self.img_embs = None
        self.findings = None

    # ---------------------------------------------------------------- image
    def load_image(self, path: str) -> Tuple[str, Optional[str]]:
        """Image upload turn (demo.py:248-276): classify findings, embed the
        image; in report mode immediately generates the report."""
        img = load_image_grayscale(path)
        blip_img = preprocess_cxr_np(img, resize=512, crop=448)
        cp_img = preprocess_cxr_np(img, resize=512, crop=488)

        dicom = Path(path).stem
        if dicom in self.precomputed:
            findings = ", ".join(self.precomputed[dicom]).lower().strip()
        else:
            names = self.pipe.classify_findings(cp_img[None])[0]
            findings = ", ".join(names).lower().strip()
        self.findings = findings
        self.img_embs = np.asarray(
            self.pipe.embed_images(blip_img[None], dicoms=[dicom]))

        if not self.gen_report:
            return "", findings
        reply = self._generate(RG_PROMPT.format(findings=findings))
        return reply, findings

    # ----------------------------------------------------------------- text
    def ask(self, text: str) -> str:
        """Free-chat / follow-up turn (correction, QA, easy language, ...)."""
        if text.endswith(".png") or text.endswith(".jpg"):
            reply, _ = self.load_image(text)
            return reply
        return self._generate(text)

    def _generate(self, user_text: str) -> str:
        self.conv.append_user(user_text)
        self.conv.append_assistant(None)
        prompt = self.conv.get_prompt()
        decoded = self.pipe.generate_texts(
            [prompt],
            img_embs=self.img_embs if self.img_embs is not None else None,
            max_new_tokens=300)[0]
        reply = decoded.split("ASSISTANT:")[-1].strip()
        self.conv.messages.pop()
        self.conv.append_assistant(reply)
        return reply
