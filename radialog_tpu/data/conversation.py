"""Vicuna conversation templating — THE single implementation.

The reference duplicates this dataclass five times (test.py:150-198,
demo.py:67-140, ReportDataset.py:114-182, create_data.py:56-104,
instruct_tasks.py:23-85). Prompt format (v1.3, SeparatorStyle.TWO):

    {system} USER: {msg} ASSISTANT: {reply}</s>USER: ... ASSISTANT:
"""
from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple

RADIALOG_SYSTEM = (
    "A chat between a curious user and an artificial intelligence assistant "
    "acting as an experienced radiologist. The assistant gives professional, "
    "detailed, and polite answers to the user's questions."
)

# demo.py:310-311 uses a shorter system string (note: no space between the two
# sentences — faithful to the reference's string concatenation).
DEMO_SYSTEM = (
    "A chat between a curious user and an artificial intelligence assistant."
    "The assistant gives professional, detailed, and polite answers to the "
    "user's questions."
)


class SeparatorStyle(enum.Enum):
    SINGLE = "single"
    TWO = "two"


@dataclasses.dataclass
class Conversation:
    system: str = RADIALOG_SYSTEM
    roles: Tuple[str, str] = ("USER", "ASSISTANT")
    messages: List[List[Optional[str]]] = dataclasses.field(default_factory=list)
    sep_style: SeparatorStyle = SeparatorStyle.TWO
    sep: str = " "
    sep2: str = "</s>"

    def append(self, role: str, message: Optional[str]) -> "Conversation":
        self.messages.append([role, message])
        return self

    def append_user(self, message: str) -> "Conversation":
        return self.append(self.roles[0], message)

    def append_assistant(self, message: Optional[str] = None) -> "Conversation":
        return self.append(self.roles[1], message)

    def get_prompt(self) -> str:
        if self.sep_style is SeparatorStyle.SINGLE:
            out = self.system
            for role, message in self.messages:
                if message:
                    out += f"{self.sep} {role}: {message}"
                else:
                    out += f"{self.sep} {role}:"
            return out
        if self.sep_style is SeparatorStyle.TWO:
            seps = (self.sep, self.sep2)
            out = self.system + seps[0]
            for i, (role, message) in enumerate(self.messages):
                if message:
                    out += f"{role}: {message}{seps[i % 2]}"
                else:
                    out += f"{role}:"
            return out
        raise ValueError(f"unknown separator style {self.sep_style}")

    def copy(self) -> "Conversation":
        return Conversation(system=self.system, roles=self.roles,
                            messages=[list(m) for m in self.messages],
                            sep_style=self.sep_style, sep=self.sep,
                            sep2=self.sep2)


def single_turn_prompt(user_text: str, system: str = RADIALOG_SYSTEM) -> str:
    """The standard report-generation prompt (test.py:118-130)."""
    conv = Conversation(system=system)
    conv.append_user(user_text)
    conv.append_assistant(None)
    return conv.get_prompt()


def extract_assistant_reply(decoded: str) -> str:
    """Text after the last 'ASSISTANT:' (test.py:371 splits on the first —
    single-turn; multi-turn flows take [-1], test.py:475-476)."""
    return decoded.split("ASSISTANT:")[-1]


def extract_report(decoded: str) -> str:
    """test.py:216-225: strip an optional leading 'report:' marker."""
    pred = decoded.split("ASSISTANT:")[1]
    for marker in ("report:", "Report:", "REPORT:"):
        if marker in pred:
            return pred.split(marker)[1]
    return pred
