"""Interactive multi-turn serving with a persistent KV cache (prefix cache).

The reference re-prefills the FULL conversation every turn (demo.py:281-297:
conv.get_prompt() re-encodes all history; generate() recomputes all its KV).
Here a session keeps one pre-allocated cache across turns:

  turn 1: prefill(prompt + <IMG> splice)            -> cache[0:t1)
  reply : decode writes cache[t1: t1+g1)
  turn 2: incremental prefill of ONLY the new turn  -> cache[t1+g1 : ...)
  ...

so each turn costs O(new tokens) instead of O(conversation). Single-sequence
(the demo's setting); slots == absolute positions, masks are plain causal
with offset. Generation buckets the appended turn to multiples of 16 tokens —
garbage KV in the padded tail sits beyond cur_len, is never unmasked, and is
overwritten by subsequent writes.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import (LlamaConfig, find_img_start, init_cache,
                            llama_apply)
from ..ops.attention import causal_mask_bias
from ..ops.layers import DTypePolicy, FP32
from .engine import DecodeParams, _decode_loop_with_cache


# Session executables: ONE compile per (shape, dp) signature, reused across
# turns. The turn offset ``cur_len`` is a TRACED int32 scalar — it is data,
# not a compile key (positions, masks and the cache write slot all derive
# from it inside the program). Without this every turn / stream chunk would
# re-trace the full decode while_loop (a fresh multi-second compile per
# reply on the 7B shapes — the exact per-turn recompile tax the reference's
# HF generate() pays, which this session exists to avoid). The cache is
# donated: each turn's executable updates the conversation cache in place
# instead of allocating a second copy (2x-cache peak on 7B, engine.py).

@partial(jax.jit, static_argnames=("cfg", "policy"),
         donate_argnames=("cache",))
def _session_prefill(params, cfg: LlamaConfig, cache, tokens, cur_len,
                     true_len, img_embs, lora, policy: DTypePolicy):
    """Incremental prefill of a 16-bucketed turn at offset cur_len."""
    t = tokens.shape[1]
    positions = cur_len + jnp.arange(t)[None]
    bias = causal_mask_bias(t, cache.max_len, offset=cur_len)
    img_start = (find_img_start(tokens, cfg.img_token_id)
                 if img_embs is not None else None)
    # Unrolled serving params take llama_apply's DIRECT-prefill branch, which
    # attends only the appended block's own fresh K/V — correct at offset 0,
    # wrong for a turn-2 append that must also attend the cached history.
    # verify=True routes those params through the full-cache attention path
    # (the same one speculative verification uses); the stacked layout always
    # attends the full cache and ignores the flag.
    unrolled = isinstance(params["layers"], (list, tuple))
    return llama_apply(params, cfg, tokens, positions, bias, cache=cache,
                       write_pos=cur_len, img_embs=img_embs,
                       img_start=img_start, lora=lora, policy=policy,
                       last_pos=true_len[None] - 1, verify=unrolled)


@partial(jax.jit, static_argnames=("cfg", "dp", "policy"),
         donate_argnames=("cache",))
def _session_decode(params, cfg: LlamaConfig, cache, first_logits, cur_len,
                    dp: DecodeParams, lora, policy: DTypePolicy):
    return _decode_loop_with_cache(
        params, cfg, cache, first_logits, cur_len[None], dp, lora=lora,
        policy=policy, prompt_pad=cur_len)


@partial(jax.jit, static_argnames=("cfg", "dp", "k", "m", "policy"),
         donate_argnames=("cache",))
def _session_spec(params, cfg: LlamaConfig, cache, first_logits, cur_len,
                  dp: DecodeParams, k: int, m: int, hist, lora,
                  policy: DTypePolicy):
    from .speculative import spec_decode_loop
    return spec_decode_loop(params, cfg, cache, first_logits, cur_len, dp,
                            k, m, hist, lora=lora, policy=policy)


class InteractiveSession:
    """One conversation's LLM state: cache + current length."""

    def __init__(self, params: Dict, cfg: LlamaConfig,
                 lora: Optional[Dict] = None, policy: DTypePolicy = FP32,
                 cache_len: int = 2048):
        self.params = params
        self.cfg = cfg
        self.lora = lora
        self.policy = policy
        self.cache_len = cache_len
        self.reset()

    def reset(self) -> None:
        self.cache = init_cache(self.cfg, 1, self.cache_len)
        self.cur_len = 0
        self.token_ids: List[int] = []
        self._last_logits = None
        # the decode loop never writes the FINAL generated token's KV (the
        # loop exits after selecting it); it is prepended to the next append
        self._pending_tail: List[int] = []

    @property
    def remaining(self) -> int:
        return self.cache_len - self.cur_len

    def warmup(self, dp: DecodeParams, turn_lengths=(16,),
               spec_k: int = 0, token_id: int = 0) -> float:
        """Precompile this session's jit entries at boot, then reset.

        Runs a throwaway conversation: one incremental prefill per 16-token
        bucket in ``turn_lengths`` (the prefill executable is shape-keyed on
        the bucketed turn length) + one decode with ``dp`` (shape-keyed on
        dp alone — cur_len is traced, so every later turn of every
        conversation reuses it); spec_k > 0 also builds the speculative
        loop. Moves the cold compile wall (~7 min at 7B uncached; seconds
        with `.jax_cache/`) out of the first user's turn — the reference's
        HF generate() has no compile wall but re-pays kernel-launch
        overhead per call. Measured boot numbers: docs/PERF.md "Cold
        start". Returns seconds spent. Call on a FRESH session (it resets)."""
        import time
        t0 = time.time()
        if self.cur_len:
            self.reset()
        for tl in turn_lengths:
            self.reset()
            self.append_tokens([token_id] * max(1, int(tl)))
            if spec_k > 0:
                self.generate_spec(dp, k=spec_k)
                self.reset()
                self.append_tokens([token_id] * max(1, int(tl)))
            self.generate(dp)
        self.reset()
        return time.time() - t0

    def append_tokens(self, ids: List[int],
                      img_embs: Optional[jax.Array] = None) -> None:
        """Feed new prompt tokens (a full first prompt, or a later turn's
        delta) through an incremental prefill at the current offset."""
        ids = self._pending_tail + list(ids)
        self._pending_tail = []
        if not ids:
            return
        tn = len(ids)
        pad = (-tn) % 16  # bucket appended turns: bounded compile count
        padded = list(ids) + [self.cfg.pad_token_id] * pad
        tokens = jnp.asarray(padded, jnp.int32)[None]
        t = tokens.shape[1]
        if self.cur_len + t > self.cache_len:
            raise ValueError(f"conversation overflow: {self.cur_len}+{t} > "
                             f"{self.cache_len}")
        logits, self.cache = _session_prefill(
            self.params, self.cfg, self.cache, tokens,
            jnp.asarray(self.cur_len, jnp.int32),
            jnp.asarray(tn, jnp.int32), img_embs, self.lora, self.policy)
        self._last_logits = logits[:, 0]
        self.cur_len += tn
        self.token_ids.extend(ids)

    def generate(self, dp: DecodeParams) -> List[int]:
        """Decode a reply continuing the cached conversation; the generated
        tokens' KV stays in the cache for the next turn."""
        if self._last_logits is None:
            raise RuntimeError("append_tokens must run before generate")
        # unroll>=3 sub-steps can write phantom KV up to (unroll-2) slots past
        # max_new; with a traced cur_len the engine's static-pad bounds check
        # (engine.py phantom-KV guard) never fires, so enforce it host-side —
        # the session knows cur_len concretely.
        headroom = max(0, dp.unroll - 2)
        if self.cur_len + dp.max_new_tokens + headroom > self.cache_len:
            raise ValueError(
                f"conversation overflow: {self.cur_len}+{dp.max_new_tokens}"
                f"+{headroom} (unroll phantom headroom) > {self.cache_len}")
        res, cache = _session_decode(
            self.params, self.cfg, self.cache, self._last_logits,
            jnp.asarray(self.cur_len, jnp.int32), dp, self.lora, self.policy)
        self.cache = cache
        n = int(res.lengths[0])
        new_ids = [int(x) for x in np.asarray(res.tokens)[0, :n]]
        # KV for tokens [0, n-1) is written at slots cur_len..; the final
        # token (often eos) is only selected, not yet fed through the model
        written = max(n - 1, 0)
        self.cur_len += written
        self.token_ids.extend(new_ids[:written])
        tail = new_ids[written:]
        # an eos tail never needs KV (the next turn's text re-tokenizes the
        # </s> separator); a max-length cut keeps its last token pending
        self._pending_tail = [t for t in tail if t != dp.eos_token_id]
        self._last_logits = None
        return new_ids

    def generate_spec(self, dp: DecodeParams, k: int = 4,
                      m: int = 3) -> List[int]:
        """``generate`` with prompt-lookup speculative decoding
        (decode/speculative.py): one (k+1)-token verification forward per
        loop iteration, accepting drafts matched from the conversation
        history. Token-identical to ``generate``; faster whenever the reply
        echoes the history — correction turns regenerate the report under
        discussion, QA answers quote finding phrases. Single-sequence slots
        == positions here, exactly the batch-1 contract the speculative
        loop requires."""
        if self._last_logits is None:
            raise RuntimeError("append_tokens must run before generate_spec")
        if self.cur_len + dp.max_new_tokens + k + 1 > self.cache_len:
            raise ValueError("conversation overflow")
        if k + 1 > 16:
            # the final verification block can leave up to k-1 stale KV
            # slots past cur_len; the next turn's 16-bucketed append
            # overwrites them before anything attends that region — the
            # same invariant as the append padding tail (class docstring)
            raise ValueError("session speculative decode supports k <= 15")
        hist_np = np.full((self.cache_len,), -1, np.int32)
        hist_np[:self.cur_len] = np.asarray(self.token_ids, np.int32)
        res, cache = _session_spec(
            self.params, self.cfg, self.cache, self._last_logits,
            jnp.asarray(self.cur_len, jnp.int32), dp, k, m,
            jnp.asarray(hist_np), self.lora, self.policy)
        self.cache = cache
        n = int(res.lengths[0])
        new_ids = [int(x) for x in np.asarray(res.tokens)[0, :n]]
        written = max(n - 1, 0)
        self.cur_len += written
        self.token_ids.extend(new_ids[:written])
        tail = new_ids[written:]
        self._pending_tail = [t for t in tail if t != dp.eos_token_id]
        self._last_logits = None
        return new_ids

