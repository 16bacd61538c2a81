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
from ..native.loader import preprocess_file
from .pipeline import RaDialogPipeline

RG_PROMPT = (
    f"Image information: {IMG_RUN}. Predicted Findings: {{findings}}. You are "
    "to act as a radiologist and write the finding section of a chest x-ray "
    "radiology report for this X-ray image and the given predicted findings. "
    "Write in the style of a radiologist, write one fluent text without "
    "enumeration, be concise and don't provide explanations or reasons.")


class ChatSession:
    """Multi-turn RaDialog dialog over one (optional) image.

    With ``prefix_cache`` (default) each turn runs an incremental prefill of
    only the NEW tokens against a persistent KV cache
    (decode/session.InteractiveSession) — the reference re-prefills the whole
    conversation every turn (demo.py:281-297). Token-prefix mismatches (e.g.
    after manual conversation edits) fall back to a full re-prefill.
    """

    def __init__(self, pipe: RaDialogPipeline, gen_report: bool = True,
                 precomputed_findings: Optional[Dict[str, List[str]]] = None,
                 prefix_cache: bool = True, cache_len: int = 2048,
                 speculative: bool = False, spec_k: int = 5):
        self.pipe = pipe
        self.gen_report = gen_report
        self.speculative = speculative and prefix_cache
        self.spec_k = spec_k
        self.precomputed = precomputed_findings or {}
        self.conv = Conversation(system=DEMO_SYSTEM)
        self.img_embs = None
        self.findings: Optional[str] = None
        self.session = None
        if prefix_cache:
            from ..decode.session import InteractiveSession
            cache_len = min(cache_len, pipe.llama_cfg.max_position)
            self.session = InteractiveSession(pipe.llama, pipe.llama_cfg,
                                              lora=pipe.lora,
                                              policy=pipe.policy,
                                              cache_len=cache_len)

    def reset(self) -> None:
        self.conv = Conversation(system=DEMO_SYSTEM)
        self.img_embs = None
        self.findings = None
        if self.session is not None:
            self.session.reset()

    def warmup(self, turn_lengths=(16, 128)) -> float:
        """Boot-time precompile of the chat decode path (demo.py --warmup).

        Builds the exact DecodeParams the steady-state turns use (cap-length
        greedy; the spec loop too when speculative) and runs the session's
        throwaway warmup conversation, so the first user's turn pays decode
        latency only — not the cold compile wall (docs/PERF.md "Cold
        start"). No-op (0.0) without a prefix-cache session. Returns
        seconds spent."""
        if self.session is None:
            return 0.0
        from ..decode.engine import DecodeParams
        tok = self.pipe.tokenizer
        cap = self.pipe.cfg.max_new_tokens or 300
        max_new = max(1, min(cap, self.session.cache_len - 1
                             - (self.spec_k + 1 if self.speculative else 0)))
        dp = DecodeParams(max_new_tokens=max_new,
                          eos_token_id=tok.eos_token_id,
                          seed=self.pipe.cfg.seed)
        return self.session.warmup(
            dp, turn_lengths=turn_lengths,
            spec_k=self.spec_k if self.speculative else 0)

    # ---------------------------------------------------------------- image
    def load_image(self, path: str) -> Tuple[str, Optional[str]]:
        """Image upload turn (demo.py:248-276): classify findings, embed the
        image; in report mode immediately generates the report."""
        # native C++ decode+preprocess (libjpeg pool path, PIL-parity-pinned
        # in tests/test_native_loader.py; falls back to PIL when the native
        # build is unavailable — native/loader.py preprocess_file)
        blip_img = preprocess_file(path, resize=512, crop=448)
        cp_img = preprocess_file(path, resize=512, crop=488)

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
        if self.session is not None:
            reply = self._generate_incremental(prompt)
        else:
            decoded = self.pipe.generate_texts(
                [prompt],
                img_embs=self.img_embs if self.img_embs is not None else None,
                max_new_tokens=300)[0]
            reply = decoded.split("ASSISTANT:")[-1].strip()
        self.conv.messages.pop()
        self.conv.append_assistant(reply)
        return reply

    def ask_stream(self, text: str, chunk_size: int = 16):
        """Streaming ask(): yields the accumulated assistant reply after each
        decoded chunk. This is the gradio bot contract (demo.py:349-366) done
        TPU-natively — the reference generates the FULL reply first and then
        sleeps 10ms per character; here the decode itself streams in
        ``chunk_size``-token jitted calls against the persistent KV cache
        (utils/streaming.stream_chunks), so the first words appear while the
        rest is still decoding. Greedy chunked decode is token-identical to
        the single-call decode (tests/test_apps.py pins stream == ask).
        Image-path messages behave like ask() and yield the report once."""
        if text.endswith((".png", ".jpg")):
            reply, _ = self.load_image(text)
            if reply:
                yield reply
            return
        if self.session is None:
            yield self._generate(text)
            return
        from ..decode.engine import DecodeParams
        from ..utils.streaming import stream_chunks
        self.conv.append_user(text)
        self.conv.append_assistant(None)
        self._prefill_incremental(self.conv.get_prompt())
        tok = self.pipe.tokenizer
        cap = self.pipe.cfg.max_new_tokens or 300
        cap = max(1, min(cap, self.session.remaining - 1))
        dp = DecodeParams(max_new_tokens=cap, eos_token_id=tok.eos_token_id,
                          seed=self.pipe.cfg.seed)
        ids: List[int] = []
        for chunk in stream_chunks(self.session, dp, chunk_size=chunk_size,
                                   max_new_tokens=cap):
            ids.extend(chunk)
            yield tok.decode(ids, skip_special_tokens=True).strip()
        reply = tok.decode(ids, skip_special_tokens=True).strip()
        self.conv.messages.pop()
        self.conv.append_assistant(reply)

    def _prefill_incremental(self, prompt: str) -> None:
        """Incremental prefill of the new prompt suffix against the session's
        persistent KV cache (full re-prefill on prefix mismatch)."""
        import jax.numpy as jnp
        tok = self.pipe.tokenizer
        full_ids = tok(prompt)["input_ids"]
        prev = self.session.token_ids + self.session._pending_tail
        embs = (jnp.asarray(self.img_embs) if self.img_embs is not None
                else None)
        if prev and full_ids[:len(prev)] == prev:
            delta = full_ids[len(prev):]
            # embs are spliced only if the delta itself contains an <IMG> run
            # (e.g. a new scan uploaded mid-conversation); find_img_start
            # returns -1 otherwise and the splice is a no-op
            self.session.append_tokens(delta, img_embs=embs)
        else:
            self.session.reset()
            self.session.append_tokens(full_ids, img_embs=embs)

    def _generate_incremental(self, prompt: str) -> str:
        from ..decode.engine import DecodeParams
        tok = self.pipe.tokenizer
        self._prefill_incremental(prompt)
        cap = self.pipe.cfg.max_new_tokens or 300
        if self.speculative:
            # prompt-lookup speculative decode (decode/speculative.py):
            # token-identical, fastest on correction/QA turns whose replies
            # echo the conversation history; needs k+1 slots of headroom
            max_new = max(1, min(cap,
                                 self.session.remaining - self.spec_k - 2))
            dp = DecodeParams(max_new_tokens=max_new,
                              eos_token_id=tok.eos_token_id,
                              seed=self.pipe.cfg.seed)
            ids = self.session.generate_spec(dp, k=self.spec_k)
        else:
            max_new = max(1, min(cap, self.session.remaining - 1))
            dp = DecodeParams(max_new_tokens=max_new,
                              eos_token_id=tok.eos_token_id,
                              seed=self.pipe.cfg.seed)
            ids = self.session.generate(dp)
        return tok.decode(ids, skip_special_tokens=True).strip()
