"""Continuous batching: many interactive sessions share one decode loop.

The reference serves one conversation at a time (demo.py — a single gradio
session; each generate() call owns the GPU). BASELINE config 5 / SURVEY §7
call for the TPU-idiomatic upgrade: a fixed-lane decode batch where sessions
are admitted and evicted at STEP granularity, so a new request starts decoding
on the next step instead of waiting for the whole batch to finish, and a
finished lane immediately frees capacity.

Design (static shapes, compile-once):
  * ``lanes`` fixed batch rows over one pre-allocated (L, lanes, S, H, D)
    bf16 cache (models/llama.py KVCache, scan layout).
  * admit  = batch-1 prefill (prompt bucketed to multiples of 32 -> bounded
    compile count) whose fresh KV is written into the free lane's rows
    [0, T); garbage in the bucket tail is never unmasked.
  * step   = ONE jitted token step for all lanes: per-lane RoPE positions =
    cur_len, per-lane ragged cache writes (write_pos vector -> the scatter
    path in models/llama.py:300-305), per-lane mask = decode_bias(cur_len+1).
    Inactive/done lanes compute garbage that the host ignores; their writes
    land at their frozen cur_len slot, which stays masked and is overwritten
    on the lane's next admission.
  * evict  = host-side: a lane whose session hit EOS / max_new_tokens is
    freed before the next admit round.

Per-lane numerics are independent (attention/bias/positions are per-row), so
a session decodes the exact same tokens it would get from a solo
engine.generate() call — asserted by tests/test_continuous.py against the
serial reference.

ContinuousBatcher serves the bf16 scan-layout params (per-lane slot =
token position; ragged scatter writes). For the UNROLLED int8 serving
weights — whose cache writes must be one contiguous dynamic_update_slice at
a scalar slot — use RingBatcher below: a shared-ring static-slot design
where every lane writes the same generation-ring slot each step and
attention validity is an explicit per-lane bitmask. That is what lets
multi-session interactive serving run against the quantized 7B weights on
a single 16GB chip (bf16 weights alone would not fit).
"""
from __future__ import annotations

import dataclasses
import itertools
from collections import deque
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import (LlamaConfig, decode_bias, find_img_start,
                            init_cache, llama_apply, prefill_bias)
from ..ops.layers import DTypePolicy, FP32
from .engine import DecodeParams
from .kvcache import install_prefill


def _bucket32(n: int) -> int:
    return max(32, ((n + 31) // 32) * 32)


@dataclasses.dataclass
class Session:
    sid: int
    prompt_ids: List[int]
    img_embs: Optional[jax.Array]
    max_new_tokens: int
    tokens: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


class ContinuousBatcher:
    """Admit/evict interactive sessions into a shared decode step.

    Greedy decoding (the reference eval/serving default, test.py:339-348).
    """

    def __init__(self, params: Dict, cfg: LlamaConfig, lanes: int = 4,
                 cache_len: int = 512, dp: DecodeParams = DecodeParams(),
                 lora: Optional[Dict] = None, policy: DTypePolicy = FP32):
        if isinstance(params["layers"], (list, tuple)):
            raise ValueError(
                "ContinuousBatcher requires the stacked (scan) param layout "
                "with a bf16 cache; the unrolled int8 serving layout uses "
                "shared-slot batch decoding (decode/engine.py)")
        self.params, self.cfg, self.lora, self.policy = params, cfg, lora, policy
        self.lanes, self.cache_len, self.dp = lanes, cache_len, dp
        self.cache = init_cache(cfg, lanes, cache_len)
        self.cur_lens = np.zeros(lanes, np.int32)   # KV rows written per lane
        self.last_tok = np.zeros(lanes, np.int32)   # token whose KV is pending
        self.steps = np.zeros(lanes, np.int32)      # generated tokens so far
        self.lane_session: List[Optional[Session]] = [None] * lanes
        self.queue: deque[Session] = deque()
        self.finished: Dict[int, Session] = {}
        self._ids = itertools.count()

        s_max = cache_len

        # params/lora are explicit jit ARGUMENTS, not closure captures:
        # closed-over device arrays are serialized into the compile payload,
        # which at 7B serving sizes (~7GB) stalls remote compilation under
        # the TPU tunnel (verify-skill gotcha; measured as a silent
        # 25-minute hang in tools/bench_interactive.py).
        # cache is DONATED: the returned cache aliases the argument buffer,
        # so the per-step DUS updates in place instead of copying the
        # multi-GB cache (donation at a flat call aliases fine; it is only
        # the while-loop carry where XLA double-buffers, docs/PERF.md).
        @partial(jax.jit, donate_argnums=(2,))
        def step_fn(params, lora, cache, last_tok, cur_lens):
            pos = cur_lens[:, None]
            bias = decode_bias(cur_lens + 1, s_max)
            logits, cache = llama_apply(
                params, cfg, last_tok[:, None], pos, bias, cache=cache,
                write_pos=cur_lens, lora=lora, policy=self.policy)
            return cache, jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)

        @partial(jax.jit, static_argnames=("t",), donate_argnums=(2,))
        def prefill_fn(params, lora, cache, tokens, length, lane, img_embs, t):
            positions = jnp.arange(t)[None]
            bias = prefill_bias(length[None], t)
            img_start = (find_img_start(tokens, cfg.img_token_id)
                         if img_embs is not None else None)
            logits, fresh = llama_apply(
                params, cfg, tokens, positions, bias, cache=None,
                img_embs=img_embs, img_start=img_start, lora=lora,
                policy=self.policy, lengths=length[None],
                last_pos=length[None] - 1)
            k = jax.lax.dynamic_update_slice(
                cache.k, fresh.k.astype(cache.k.dtype), (0, lane, 0, 0, 0))
            v = jax.lax.dynamic_update_slice(
                cache.v, fresh.v.astype(cache.v.dtype), (0, lane, 0, 0, 0))
            first = jnp.argmax(logits[0, 0], axis=-1).astype(jnp.int32)
            return type(cache)(k, v), first

        self._step_fn = step_fn
        self._prefill_fn = prefill_fn

    # ------------------------------------------------------------- interface
    def submit(self, prompt_ids: List[int],
               img_embs: Optional[jax.Array] = None,
               max_new_tokens: Optional[int] = None) -> int:
        """Queue a request; returns its session id."""
        sid = next(self._ids)
        self.queue.append(Session(sid, list(prompt_ids), img_embs,
                                  max_new_tokens or self.dp.max_new_tokens))
        return sid

    @property
    def active_lanes(self) -> int:
        return sum(s is not None for s in self.lane_session)

    def step(self) -> List[int]:
        """Admit queued requests into free lanes, run ONE decode step for all
        active lanes, evict finished sessions. Returns sids finished this
        step."""
        self._admit()
        newly_finished: List[int] = []
        if self.active_lanes == 0:
            return newly_finished
        cache, nxt = self._step_fn(self.params, self.lora, self.cache,
                                   jnp.asarray(self.last_tok),
                                   jnp.asarray(self.cur_lens))
        self.cache = cache
        nxt = np.asarray(nxt)
        for lane, sess in enumerate(self.lane_session):
            if sess is None:
                continue
            # the step wrote last_tok's KV at cur_len and produced the next token
            self.cur_lens[lane] += 1
            tok = int(nxt[lane])
            sess.tokens.append(tok)
            self.steps[lane] += 1
            self.last_tok[lane] = tok
            if tok == self.dp.eos_token_id or self.steps[lane] >= sess.max_new_tokens:
                sess.done = True
                self.finished[sess.sid] = sess
                self.lane_session[lane] = None  # evict: lane free next step
                newly_finished.append(sess.sid)
        return newly_finished

    def run(self, max_steps: int = 10_000) -> Dict[int, Session]:
        """Drive until queue + lanes drain. Returns finished sessions."""
        for _ in range(max_steps):
            if not self.queue and self.active_lanes == 0:
                break
            self.step()
        return self.finished

    # -------------------------------------------------------------- internals
    def _admit(self) -> None:
        while self.queue and self.active_lanes < self.lanes:
            sess = self.queue.popleft()
            lane = self.lane_session.index(None)
            t = len(sess.prompt_ids)
            tpad = _bucket32(t)
            # guard on the BUCKETED prompt: prefill writes tpad rows
            if tpad > self.cache_len or t + sess.max_new_tokens > self.cache_len:
                raise ValueError(
                    f"request needs max(bucketed prompt {tpad}, "
                    f"{t}+{sess.max_new_tokens}) slots > "
                    f"cache_len {self.cache_len}")
            padded = sess.prompt_ids + [self.cfg.pad_token_id] * (tpad - t)
            self.cache, first = self._prefill_fn(
                self.params, self.lora, self.cache,
                jnp.asarray(padded, jnp.int32)[None],
                jnp.asarray(t, jnp.int32), jnp.asarray(lane, jnp.int32),
                sess.img_embs, t=tpad)
            first = int(first)
            self.lane_session[lane] = sess
            self.cur_lens[lane] = t
            self.steps[lane] = 1
            self.last_tok[lane] = first
            sess.tokens.append(first)
            # eos OR the budget already spent: the prefill token counts as
            # step 1, so max_new_tokens=1 must finish here — checking the
            # cap only in step() (after appending a second token) emitted
            # max_new+1 tokens for 1-token requests (engine.generate
            # returns exactly max_new)
            if (first == self.dp.eos_token_id
                    or self.steps[lane] >= sess.max_new_tokens):
                sess.done = True
                self.finished[sess.sid] = sess
                self.lane_session[lane] = None


class RingBatcher:
    """Continuous batching for the QUANTIZED serving layout (shared-ring
    static-slot design).

    The plain ContinuousBatcher writes each lane's KV at its own position
    (write_pos = cur_lens, a vector) — a per-sequence scatter that XLA turns
    into a full-cache copy every step, and the unrolled int8 serving params
    cannot express at all (their cache write is one contiguous
    dynamic_update_slice at a scalar slot). The ring design restores the
    static-slot property under staggered admission:

      * cache rows are per lane: (L, lanes, S, H, D) bf16. Slots [0, P) are
        the lane's PROMPT region (filled at admit); slots [P, S) are a
        GENERATION RING shared by position: every active lane writes step
        t's KV at the same scalar slot P + (t mod ring_len) in its own row.
      * slots no longer encode token positions. RoPE is applied at write
        time from the lane's true position (cur_lens), and attention
        validity comes from an explicit (lanes, S) bitmask carried on
        device: admit clears a lane's row and marks its prompt; each step
        marks the shared slot for active lanes; the mask IS the attention
        bias. Decode order is irrelevant to causality — every valid slot is
        a past token of that lane.
      * ring reuse is safe because a session generates exactly one token
        per step: a span written at slot g is only revisited ring_len steps
        later, by which time any session with max_new_tokens < ring_len has
        finished (asserted at construction).

    Same greedy admit/evict host loop + per-session exactness contract as
    ContinuousBatcher (tests/test_continuous.py); works with both weight
    layouts, bf16 KV cache. ``steps_per_call`` batches k decode steps into
    one jit call (lax.scan) to amortize per-call dispatch — the serving
    default for real deployments; admission then happens every k tokens.
    """

    # the generation region rotates (KV slots are reused modulo ring_len);
    # subclasses that replace the rotation with linear frontiers
    # (SpecCompactBatcher) set this False to disable the ring-span guards
    _ring_wraps = True

    def __init__(self, params: Dict, cfg: LlamaConfig, lanes: int = 4,
                 cache_len: int = 512, prompt_len: int = 256,
                 dp: DecodeParams = DecodeParams(),
                 lora: Optional[Dict] = None, policy: DTypePolicy = FP32,
                 steps_per_call: int = 1, donate_cache: bool = True,
                 kv_int8: bool = False):
        # kv_int8: store the ring cache int8 (per-token scales, dense-lane
        # scale buffers — models/llama.py KVCache). Halves the per-lane
        # cache bytes, so ~2x the lanes fit the same HBM. On TPU the decode
        # step dispatches the flash-decode kernel with the PER-LANE interval
        # mask (a lane's valid generated slots are a rotating contiguous
        # window of the ring — at most two slot intervals); the CPU/fallback
        # path keeps using the explicit validity-bitmask bias. Quality bound
        # = the same 0.048-sigma teacher-forced budget as batch serving
        # (tools/measure_kv_logit_err.py).
        # steps_per_call > 1 amortizes the per-call dispatch cost (under the
        # TPU tunnel each jit call carries ~30ms of round-trip — measured:
        # 42.7 -> ~14 ms/tok going 1 -> 8 steps/call at 7B, 8 lanes) at the
        # cost of admitting/evicting only every k tokens. A lane whose
        # session finishes mid-chunk decodes garbage until the chunk ends;
        # the host trims it and the lane's valid row is reset at the next
        # admission, so other lanes are unaffected (per-lane numerics are
        # independent).
        ring_len = cache_len - prompt_len
        k = steps_per_call
        # a session occupies ceil((max_new-1)/k) chunks = that many * k ring
        # advances; the ring must not wrap onto its own live slots.
        # _ring_wraps=False subclasses (SpecCompactBatcher) replace the
        # rotating ring with linear per-lane frontiers + a fixed scratch
        # window — their capacity bound is gen_cap, checked in their own
        # __init__/validate_request, and this guard would spuriously
        # reject configurations that fit the compact geometry.
        life = -(-max(dp.max_new_tokens - 1, 1) // k) * k
        if type(self)._ring_wraps and life >= ring_len:
            raise ValueError(
                f"generation ring ({cache_len}-{prompt_len}={ring_len} slots)"
                f" must exceed a session's ring span {life} "
                f"(max_new_tokens={dp.max_new_tokens} rounded up to "
                f"steps_per_call={k} chunks)")
        if kv_int8 and not isinstance(params["layers"], (list, tuple)):
            raise ValueError("kv_int8 requires the unrolled serving params "
                             "(quantize_llama_host layout)")
        self.params, self.cfg, self.lora, self.policy = params, cfg, lora, policy
        self.lanes, self.cache_len, self.dp = lanes, cache_len, dp
        self.prompt_len, self.ring_len = prompt_len, ring_len
        self.steps_per_call = k
        self.donate_cache = donate_cache
        self.kv_int8 = kv_int8
        self.cache = self._make_cache()
        self.valid = jnp.zeros((lanes, cache_len), jnp.bool_)
        self.ring_pos = 0                           # host ring counter
        self.cur_lens = np.zeros(lanes, np.int32)   # true token positions
        self.last_tok = np.zeros(lanes, np.int32)
        self.steps = np.zeros(lanes, np.int32)
        # int8-kernel interval mask state (host mirrors): per-lane admitted
        # prompt length + count of ring writes since admission
        self.prompt_lens = np.zeros(lanes, np.int32)
        self.ring_writes = np.zeros(lanes, np.int32)
        self.lane_session: List[Optional[Session]] = [None] * lanes
        self.queue: deque[Session] = deque()
        self.finished: Dict[int, Session] = {}
        self._ids = itertools.count()
        self._build_fns()

    # Overridable hooks: parallel/tp_ring.py TPRingBatcher reuses the whole
    # host admit/evict loop and swaps only the device programs (shard_map
    # over a TP mesh) and the cache placement (heads sharded over `model`).
    def _make_cache(self):
        return init_cache(self.cfg, self.lanes, self.cache_len,
                          quantized=self.kv_int8)

    def _build_fns(self) -> None:
        cfg, prompt_len, ring_len = self.cfg, self.prompt_len, self.ring_len
        k, donate_cache = self.steps_per_call, self.donate_cache
        NEG = -1e30

        # params/lora as jit ARGUMENTS, cache/valid donated by default (see
        # ContinuousBatcher.__init__; donate_cache=False is a measurement
        # knob — the donated argument is also the scan carry, the exact
        # shape XLA double-buffers per docs/PERF.md). One call =
        # steps_per_call decode steps under a lax.scan; returns (k, lanes).
        kv_int8 = self.kv_int8

        @partial(jax.jit,
                 donate_argnums=(2, 3) if donate_cache else ())
        def step_fn(params, lora, cache, valid, last_tok, cur_lens, active,
                    ring_base, prompt_lens, ring_writes):
            def body(carry, i):
                cache, valid, last_tok, cur_lens, writes = carry
                e = jax.lax.rem(ring_base + i, ring_len)
                slot = prompt_len + e
                # mark the shared ring slot for active lanes BEFORE building
                # the bias: the current token attends itself, matching the
                # batch engine's static-slot semantics
                valid = jax.lax.dynamic_update_slice(
                    valid, active[:, None], (0, slot))
                bias = jnp.where(valid, 0.0, NEG)[:, None, None, :]
                pos = cur_lens[:, None]
                if kv_int8:
                    # per-lane interval form of the validity mask for the
                    # flash-decode kernel: an active lane's generated slots
                    # are the last `writes` ring positions ending at e — one
                    # contiguous ring window = at most two slot intervals
                    # (closed; empty marked b=-1). The CPU fallback inside
                    # llama_apply keeps using `bias`.
                    w_new = writes + active.astype(jnp.int32)
                    start = e - (w_new - 1)
                    a1 = prompt_len + jnp.maximum(start, 0)
                    b1 = jnp.where(w_new > 0, prompt_len + e, -1)
                    wrap = start < 0
                    a2 = jnp.where(wrap, prompt_len + ring_len + start, 0)
                    b2 = jnp.where(wrap, prompt_len + ring_len - 1, -1)
                    logits, cache = llama_apply(
                        params, cfg, last_tok[:, None], pos, bias,
                        cache=cache, write_pos=slot, lora=lora,
                        policy=self.policy, lengths=prompt_lens,
                        slot_info=(a1, b1, a2, b2))
                    writes = w_new
                else:
                    logits, cache = llama_apply(
                        params, cfg, last_tok[:, None], pos, bias,
                        cache=cache, write_pos=slot, lora=lora,
                        policy=self.policy)
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                last_tok = jnp.where(active, nxt, last_tok)
                cur_lens = cur_lens + active.astype(jnp.int32)
                return (cache, valid, last_tok, cur_lens, writes), nxt

            (cache, valid, last_tok, cur_lens, _), toks = jax.lax.scan(
                body, (cache, valid, last_tok, cur_lens, ring_writes),
                jnp.arange(k, dtype=jnp.int32))
            return cache, valid, last_tok, cur_lens, toks

        @partial(jax.jit, static_argnames=("t",), donate_argnums=(2, 3))
        def prefill_fn(params, lora, cache, valid, tokens, length, lane,
                       img_embs, t):
            positions = jnp.arange(t)[None]
            bias = prefill_bias(length[None], t)
            img_start = (find_img_start(tokens, cfg.img_token_id)
                         if img_embs is not None else None)
            logits, fresh = llama_apply(
                params, cfg, tokens, positions, bias, cache=None,
                img_embs=img_embs, img_start=img_start, lora=lora,
                policy=self.policy, lengths=length[None],
                last_pos=length[None] - 1)
            # the single-lane prefill writes through the SAME helper the
            # whole-batch engine uses — the int8 layout contract (token-flat
            # reshape, bf16-rounded scales, dense-lane padding) lives in one
            # place (kvcache.install_prefill), offset to this lane's row
            cache = install_prefill(cache, fresh, lane=lane)
            # reset the lane's validity row: prompt slots [0, length) live,
            # everything else (old session leftovers, ring region) dead
            row = (jnp.arange(cache.k.shape[2]) < length)[None]
            valid = jax.lax.dynamic_update_slice(
                valid, row, (lane, 0))
            first = jnp.argmax(logits[0, 0], axis=-1).astype(jnp.int32)
            return cache, valid, first

        self._step_fn = step_fn
        self._prefill_fn = prefill_fn

    # ------------------------------------------------------------- interface
    submit = ContinuousBatcher.submit
    run = ContinuousBatcher.run
    active_lanes = ContinuousBatcher.active_lanes

    def step(self) -> List[int]:
        """One jit call = steps_per_call decode steps for every active lane
        (admission/eviction at chunk granularity). Returns sids finished."""
        self._admit()
        newly_finished: List[int] = []
        if self.active_lanes == 0:
            return newly_finished
        ring_base = self.ring_pos % self.ring_len
        self.ring_pos += self.steps_per_call
        active = np.asarray(
            [s is not None for s in self.lane_session], np.bool_)
        cache, valid, last_tok, cur_lens, toks = self._step_fn(
            self.params, self.lora, self.cache, self.valid,
            jnp.asarray(self.last_tok), jnp.asarray(self.cur_lens),
            jnp.asarray(active), jnp.asarray(ring_base, jnp.int32),
            jnp.asarray(self.prompt_lens), jnp.asarray(self.ring_writes))
        self.cache, self.valid = cache, valid
        self.ring_writes[active] += self.steps_per_call
        # np.array (copy): _admit mutates these host-side per lane
        self.last_tok = np.array(last_tok)
        self.cur_lens = np.array(cur_lens)
        toks = np.asarray(toks)          # (steps_per_call, lanes)
        for lane, sess in enumerate(self.lane_session):
            if sess is None:
                continue
            for i in range(self.steps_per_call):
                tok = int(toks[i, lane])
                sess.tokens.append(tok)
                self.steps[lane] += 1
                if (tok == self.dp.eos_token_id
                        or self.steps[lane] >= sess.max_new_tokens):
                    # tokens the chunk produced past this point are garbage
                    # (the lane kept decoding); trimmed by stopping here
                    sess.done = True
                    self.finished[sess.sid] = sess
                    self.lane_session[lane] = None
                    newly_finished.append(sess.sid)
                    break
        return newly_finished

    # -------------------------------------------------------------- internals
    def validate_request(self, n_prompt_tokens: int,
                         max_new_tokens: Optional[int] = None) -> None:
        """Raise ValueError if a request cannot be admitted (also usable by
        callers BEFORE submit() — apps/serve.py rejects per-request instead
        of letting _admit's raise take down a shared step loop)."""
        tpad = _bucket32(n_prompt_tokens)
        if tpad > self.prompt_len:
            raise ValueError(
                f"prompt needs {tpad} slots > prompt region "
                f"{self.prompt_len}")
        max_new = (self.dp.max_new_tokens if max_new_tokens is None
                   else max_new_tokens)
        # a session occupies whole CHUNKS of ring writes (a lane keeps
        # decoding to the chunk boundary after its last real token), so the
        # bound is the chunk-rounded span — raw max_new < ring_len is not
        # enough: e.g. ring 256, steps_per_call 10, max_new 255 writes
        # ceil(254/10)*10 = 260 slots and wraps onto its own live KV while
        # the validity mask still marks the overwritten slots live.
        k = self.steps_per_call
        life = -(-max(max_new - 1, 1) // k) * k
        if type(self)._ring_wraps and life >= self.ring_len:
            raise ValueError(
                f"max_new_tokens {max_new} needs {life} ring writes "
                f"(rounded up to steps_per_call={k} chunks) >= ring "
                f"{self.ring_len}")

    def _admit(self) -> None:
        while self.queue and self.active_lanes < self.lanes:
            sess = self.queue.popleft()
            lane = self.lane_session.index(None)
            t = len(sess.prompt_ids)
            tpad = _bucket32(t)
            self.validate_request(t, sess.max_new_tokens)
            padded = sess.prompt_ids + [self.cfg.pad_token_id] * (tpad - t)
            self.cache, self.valid, first = self._prefill_fn(
                self.params, self.lora, self.cache, self.valid,
                jnp.asarray(padded, jnp.int32)[None],
                jnp.asarray(t, jnp.int32), jnp.asarray(lane, jnp.int32),
                sess.img_embs, t=tpad)
            first = int(first)
            self.lane_session[lane] = sess
            self.cur_lens[lane] = t
            self.steps[lane] = 1
            self.last_tok[lane] = first
            self.prompt_lens[lane] = t
            self.ring_writes[lane] = 0
            sess.tokens.append(first)
            # same 1-token-budget rule as ContinuousBatcher._admit above
            if (first == self.dp.eos_token_id
                    or self.steps[lane] >= sess.max_new_tokens):
                sess.done = True
                self.finished[sess.sid] = sess
                self.lane_session[lane] = None
