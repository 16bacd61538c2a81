"""Batched speculative decoding on the static-slot ring (round-4).

Round 3 dismissed batched speculation with "per-lane acceptance raggedness
breaks the batched static-slot write". Round 4's verdict challenged that —
and the challenge is half right. The ring's static-slot contract survives
speculation because slots don't encode positions there:

  * every verify step writes ONE shared (k+1)-slot ring window for ALL
    lanes — a contiguous dynamic_update_slice at a scalar base, exactly the
    write the unrolled int8 serving weights require (models/llama.py
    static-slot decode path);
  * per-lane ragged acceptance becomes per-lane VALIDITY marks on that
    window: lane l accepted a_l drafts, so only the window's first
    e_l = a_l + 1 slots carry correct KV (slot j holds block[j]'s KV, which
    conditioned on drafts 0..j-1 — correct iff j <= a_l). The explicit
    (lanes, S) attention mask the bf16-KV ring already carries expresses
    that for free; rejected slots stay masked forever and the ring simply
    advances k+1 per verify.

What the RING genuinely does not survive: the INT8 KV cache. Its
flash-decode kernel takes the validity as prefetched scalar intervals — at
most two closed slot ranges per lane (ops/flash_decode.py gen_intervals),
which is exactly a contiguous rotating window, possibly wrapped. Ragged
acceptance punches a hole per VERIFY into each lane's history
((k+1 - e_l) dead slots every window), so after V verifies a lane's live
slots form up to V disjoint intervals — unboundedly many, not two.
Encoding them would need a dense mask input, which is precisely what the
interval design removed to keep the kernel's scalar prefetch. So
SpecRingBatcher runs on the bf16-KV ring (which still serves the
int8/int4 *weights* — the dominant HBM term).

Round 5 resolved the verdict's compaction challenge with
``SpecCompactBatcher`` below: relocating accepted rows to contiguous
per-lane frontiers after every verify restores the single-interval
invariant AND collapses the ring's (k+1)-slots-per-verify capacity cost
to a fixed (k+1)-slot scratch window — batched speculation then composes
with the int8 KV cache at plain-decode cache sizes. docs/PERF.md
"Batched speculative decoding" has the measurements for both designs.

Cost model: a verify forward is (k+1)-token wide but decode is weight-read
bound, so it costs ~one plain step; with acceptance A tokens/verify the
speedup -> A. The price is ring CAPACITY: k+1 slots per verify regardless
of acceptance, so the ring must hold (max_new-1 verifies worst case) x
(k+1) slots — speculation trades HBM for latency and only fits
short-to-medium generations (the correction/QA turns it targets,
reference test.py:440-534).

Drafting is per-lane prompt-lookup (decode/speculative.ngram_propose,
vmapped over lanes) against on-device per-lane history buffers, so a whole
chunk of verify iterations runs in one jit call with zero host round-trips
(steps_per_call = verify iterations per call).

Greedy-exactness contract: every emitted token is the model's argmax given
its full context — token-identical to RingBatcher/engine.generate per lane
(tests/test_spec_ring.py pins it on fp32 CPU where float associativity
cannot flip argmaxes).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig, llama_apply
from ..ops.layers import DTypePolicy, FP32
from .continuous import RingBatcher
from .engine import DecodeParams
from .speculative import ngram_propose


class SpecRingBatcher(RingBatcher):
    """RingBatcher whose decode step is a batched speculative verify.

    steps_per_call counts VERIFY iterations per jit call (each emits
    1..k+1 tokens per lane). kv_int8 is rejected (see module docstring).
    """

    def __init__(self, params: Dict, cfg: LlamaConfig, lanes: int = 4,
                 cache_len: int = 512, prompt_len: int = 256,
                 dp: DecodeParams = DecodeParams(),
                 lora: Optional[Dict] = None, policy: DTypePolicy = FP32,
                 steps_per_call: int = 1, donate_cache: bool = True,
                 kv_int8: bool = False, spec_k: int = 4, spec_m: int = 3,
                 proposer=None):
        # proposer(hist (Hmax,), hist_len ()) -> (k,) drafts for ONE lane
        # (vmapped inside the step). Default prompt-lookup; the bench tool
        # injects oracle/junk proposers to bound acceptance honestly
        # (tools/bench_spec_ring.py, same protocol as bench_spec.py).
        self._proposer = proposer
        if kv_int8:
            raise ValueError(
                "batched speculation needs the dense validity mask; the int8"
                " KV kernel's two-interval contract (ops/flash_decode.py "
                "gen_intervals) cannot encode the per-verify acceptance "
                "holes — see decode/spec_ring.py module docstring")
        if dp.do_sample:
            raise ValueError("speculative verification is greedy-only")
        self.spec_k, self.spec_m = spec_k, spec_m
        ring_len = cache_len - prompt_len
        if ring_len % (spec_k + 1):
            raise ValueError(
                f"ring ({cache_len}-{prompt_len}={ring_len}) must be a "
                f"multiple of the verify window k+1={spec_k + 1} so windows "
                f"never straddle the wrap")
        # a session consumes (k+1) ring slots per verify and worst-case
        # (zero acceptance) needs max_new-1 verifies, rounded up to whole
        # chunks; RingBatcher.__init__'s own guard checks the plain-decode
        # bound, so pre-check the speculative one here
        nv = -(-max(dp.max_new_tokens - 1, 1) // steps_per_call) \
            * steps_per_call
        if nv * (spec_k + 1) >= ring_len:
            raise ValueError(
                f"speculative ring span {nv}*(k+1)={nv * (spec_k + 1)} "
                f"slots >= ring {ring_len}: zero-acceptance sessions would "
                f"wrap onto live KV (grow cache_len or shrink "
                f"max_new_tokens/k)")
        super().__init__(params, cfg, lanes=lanes, cache_len=cache_len,
                         prompt_len=prompt_len, dp=dp, lora=lora,
                         policy=policy, steps_per_call=steps_per_call,
                         donate_cache=donate_cache, kv_int8=False)
        # per-lane on-device token history for the prompt-lookup drafter.
        # kp1 padding columns past cache_len: the per-verify (k+1)-row
        # append (dynamic_update_slice at hist_lens) CLAMPS its start when
        # it would run off the end — with an exactly-cache_len buffer a
        # lane decoding near capacity had its real history tail silently
        # overwritten by garbage rows, degrading drafter acceptance in the
        # long-generation tail; with the padding, clamped writes land
        # entirely in the dead region (real history never exceeds
        # cache_len - 1 under the admission guards)
        self.hist = jnp.full((lanes, cache_len + spec_k + 1), -1, jnp.int32)
        self.hist_lens = np.zeros(lanes, np.int32)
        self.verifies = 0   # verify forwards run (acceptance telemetry)

    # RingBatcher's plain-decode ring guard is looser than the speculative
    # one checked in __init__/validate_request; keep both.
    def validate_request(self, n_prompt_tokens: int,
                         max_new_tokens: Optional[int] = None) -> None:
        super().validate_request(n_prompt_tokens, max_new_tokens)
        max_new = (self.dp.max_new_tokens if max_new_tokens is None
                   else max_new_tokens)
        nv = -(-max(max_new - 1, 1) // self.steps_per_call) \
            * self.steps_per_call
        if nv * (self.spec_k + 1) >= self.ring_len:
            raise ValueError(
                f"max_new_tokens {max_new} needs {nv} verifies * "
                f"(k+1)={self.spec_k + 1} slots >= ring {self.ring_len}")

    def _build_fns(self) -> None:
        # prefill_fn is inherited (RingBatcher builds both; its step_fn is
        # simply never called on this subclass)
        super()._build_fns()
        cfg, prompt_len, ring_len = self.cfg, self.prompt_len, self.ring_len
        nv, donate = self.steps_per_call, self.donate_cache
        k, m = self.spec_k, self.spec_m
        kp1 = k + 1
        eos = self.dp.eos_token_id
        NEG = -1e30
        proposer = (self._proposer if self._proposer is not None
                    else partial(ngram_propose, k=k, m=m))

        @partial(jax.jit, donate_argnums=(2, 3, 4) if donate else ())
        def spec_step_fn(params, lora, cache, valid, hist, hist_lens,
                         last_tok, cur_lens, active, ring_base):
            lanes = last_tok.shape[0]

            def body(carry, i):
                cache, valid, hist, hist_lens, last_tok, cur_lens = carry
                slot = prompt_len + jax.lax.rem(ring_base + i * kp1, ring_len)
                # per-lane prompt-lookup drafts from the device histories
                drafts = jax.vmap(proposer)(hist, hist_lens)
                block = jnp.concatenate([last_tok[:, None], drafts], axis=1)
                positions = cur_lens[:, None] + jnp.arange(kp1)[None]
                # committed validity broadcast over the kp1 queries + the
                # in-window causal triangle spliced at the window slots (the
                # window is still marked dead in `valid` — previous sessions'
                # marks were cleared at admit, this session's wrap is guarded)
                base = jnp.broadcast_to(
                    jnp.where(valid, 0.0, NEG)[:, None, None, :],
                    (lanes, 1, kp1, valid.shape[1])).astype(jnp.float32)
                win = jnp.where(jnp.tril(jnp.ones((kp1, kp1), jnp.bool_)),
                                0.0, NEG).astype(jnp.float32)
                bias = jax.lax.dynamic_update_slice(
                    base, jnp.broadcast_to(win[None, None],
                                           (lanes, 1, kp1, kp1)),
                    (0, 0, 0, slot))
                logits, cache = llama_apply(
                    params, cfg, block, positions, bias, cache=cache,
                    write_pos=slot, lora=lora, policy=self.policy,
                    verify=True)
                g = jnp.argmax(logits.astype(jnp.float32),
                               -1).astype(jnp.int32)          # (lanes, kp1)
                # g[:, j] = model's token after block[:, :j+1]; draft j
                # survives iff it matches g[:, j] and all earlier survived
                accepted = jnp.sum(jnp.cumprod(
                    (drafts == g[:, :k]).astype(jnp.int32), axis=1), axis=1)
                emit = accepted + 1
                js = jnp.arange(kp1)[None]
                eos_in = (g == eos) & (js < emit[:, None])
                emit = jnp.where(eos_in.any(1),
                                 jnp.argmax(eos_in, 1) + 1, emit)
                emit = jnp.where(active, emit, 0)
                # slot j of the window holds block[:, j]'s KV — live iff
                # j < emit (conditioned only on accepted drafts)
                valid = jax.lax.dynamic_update_slice(
                    valid, js < emit[:, None], (0, slot))
                # ragged per-lane history append (tiny int32 scatter); junk
                # past emit is overwritten by the next iteration's write at
                # the advanced base
                hist = jax.vmap(
                    lambda h, row, p: jax.lax.dynamic_update_slice(
                        h, row, (p,)))(hist, g, hist_lens)
                hist_lens = hist_lens + emit
                bonus = jnp.take_along_axis(
                    g, jnp.maximum(emit - 1, 0)[:, None], axis=1)[:, 0]
                last_tok = jnp.where(active, bonus, last_tok)
                cur_lens = cur_lens + emit
                return ((cache, valid, hist, hist_lens, last_tok, cur_lens),
                        (g, emit))

            carry = (cache, valid, hist, hist_lens, last_tok, cur_lens)
            carry, (toks, emits) = jax.lax.scan(
                body, carry, jnp.arange(nv, dtype=jnp.int32))
            cache, valid, hist, hist_lens, last_tok, cur_lens = carry
            return (cache, valid, hist, hist_lens, last_tok, cur_lens,
                    toks, emits)

        self._spec_step_fn = spec_step_fn

    def step(self) -> List[int]:
        """One jit call = steps_per_call speculative verify iterations for
        every active lane. Returns sids finished this call."""
        self._admit()
        newly_finished: List[int] = []
        if self.active_lanes == 0:
            return newly_finished
        ring_base = self.ring_pos % self.ring_len
        self.ring_pos += self.steps_per_call * (self.spec_k + 1)
        active = np.asarray(
            [s is not None for s in self.lane_session], np.bool_)
        (self.cache, self.valid, self.hist, hist_lens, last_tok, cur_lens,
         toks, emits) = self._spec_step_fn(
            self.params, self.lora, self.cache, self.valid, self.hist,
            jnp.asarray(self.hist_lens), jnp.asarray(self.last_tok),
            jnp.asarray(self.cur_lens), jnp.asarray(active),
            jnp.asarray(ring_base, jnp.int32))
        self.hist_lens = np.array(hist_lens)
        self.last_tok = np.array(last_tok)
        self.cur_lens = np.array(cur_lens)
        return self._drain(toks, emits, active, newly_finished)

    def _drain(self, toks, emits, active, newly_finished: List[int]
               ) -> List[int]:
        """Host-side per-lane token append + eos/budget trim, shared by the
        ring and compact step() variants (they differ only in the device
        call). A lane keeps verifying to the chunk boundary after its last
        real token; everything past eos or the max_new budget is garbage
        the loop below never appends."""
        toks = np.asarray(toks)          # (nv, lanes, k+1)
        emits = np.asarray(emits)        # (nv, lanes)
        self.verifies += int(self.steps_per_call * active.sum())
        for lane, sess in enumerate(self.lane_session):
            if sess is None:
                continue
            for i in range(self.steps_per_call):
                stop = False
                for tok in toks[i, lane, :emits[i, lane]].tolist():
                    sess.tokens.append(int(tok))
                    self.steps[lane] += 1
                    if (tok == self.dp.eos_token_id
                            or self.steps[lane] >= sess.max_new_tokens):
                        stop = True
                        break
                if stop:
                    sess.done = True
                    self.finished[sess.sid] = sess
                    self.lane_session[lane] = None
                    newly_finished.append(sess.sid)
                    break
        return newly_finished

    def _admit(self) -> None:
        # RingBatcher._admit + per-lane drafter-history seeding
        before = [s is not None for s in self.lane_session]
        super()._admit()
        for lane, (was, sess) in enumerate(zip(before, self.lane_session)):
            if was or sess is None:
                continue
            row = np.full((self.hist.shape[1],), -1, np.int32)
            t = len(sess.prompt_ids)
            row[:t] = sess.prompt_ids
            # _admit already emitted the prefill's first token
            row[t:t + 1] = sess.tokens[:1]
            self.hist = self.hist.at[lane].set(jnp.asarray(row))
            self.hist_lens[lane] = t + 1


class SpecCompactBatcher(SpecRingBatcher):
    """Batched speculation WITHOUT the ring: relocate accepted rows after
    every verify (round-5; the round-4 verdict's compaction challenge).

    The SpecRingBatcher above burns (k+1) cache slots per verify regardless
    of acceptance (rejected window slots stay dead forever), which (a)
    blows the cache up ~6x at k=5 — 8 lanes x 300 tokens does NOT fit next
    to the 7B int8 weights on one v5e — and (b) leaves per-lane validity as
    unboundedly many slot intervals, which the int8 flash-decode kernel's
    two-interval scalar-prefetch mask provably cannot encode.

    Both problems are the same problem: accepted KV rows are left WHERE THE
    WINDOW WROTE THEM. This batcher instead keeps ONE fixed (k+1)-slot
    scratch window at the cache tail and, after each verify, COPIES each
    lane's accepted rows to its contiguous generation frontier:

        cache layout   [0, P) prompt | [P, P+G) generated | [WB, WB+k+1)
        verify         write block KV at WB (one contiguous scalar-base DUS
                       - the unrolled int8 layout's write contract), attend
                       committed-valid + in-window causal triangle
        relocate       rows j < emit_l move WB+j -> fr_l+j (a masked
                       scatter; fr_l = P + generated count). EXACT: rows are
                       copied bytes (int8 rows were quantized once at the
                       window write - no requantization), and token position
                       lives in the RoPE'd K content, not the slot index.

    After relocation every lane's live KV is [0, len_l) u [P, fr_l) - a
    single generated interval - so the cache never grows past plain-decode
    size + (k+1) scratch slots, sessions of ANY acceptance profile fit, and
    the int8 KV cache composes (G alone bounds capacity, not verifies).
    The verify forward reads the int8 cache through the XLA dequant path
    (llama_apply verify=True; the t=1 Pallas kernel stays for plain decode).

    Token-exactness contract: identical to SpecRingBatcher/RingBatcher per
    lane (tests/test_spec_ring.py pins it on fp32 CPU for BOTH cache
    dtypes). kv_int8=True requires the unrolled serving params (inherited
    RingBatcher guard); measured economics in docs/PERF.md.
    """

    # linear frontiers + fixed window — nothing rotates; RingBatcher's
    # ring-span guards would spuriously reject configs that fit gen_cap
    _ring_wraps = False

    def __init__(self, params: Dict, cfg: LlamaConfig, lanes: int = 4,
                 cache_len: int = 512, prompt_len: int = 256,
                 dp: DecodeParams = DecodeParams(),
                 lora: Optional[Dict] = None, policy: DTypePolicy = FP32,
                 steps_per_call: int = 1, donate_cache: bool = True,
                 kv_int8: bool = False, spec_k: int = 4, spec_m: int = 3,
                 proposer=None):
        self._proposer = proposer
        if dp.do_sample:
            raise ValueError("speculative verification is greedy-only")
        self.spec_k, self.spec_m = spec_k, spec_m
        kp1 = spec_k + 1
        gen_cap = cache_len - prompt_len - kp1
        # a session's generated KV rows (<= max_new - 1; the final bonus
        # token's KV stays pending) must fit the frontier region; the
        # relocation scatter drops any garbage row past WB, so chunk-tail
        # garbage cannot overflow into the window
        if dp.max_new_tokens > gen_cap:
            raise ValueError(
                f"generation region {gen_cap} (= cache {cache_len} - prompt "
                f"{prompt_len} - window {kp1}) < max_new_tokens "
                f"{dp.max_new_tokens}")
        # skip SpecRingBatcher.__init__ (ring-specific geometry/guards);
        # RingBatcher.__init__ builds the cache/valid/admit machinery and
        # calls our _build_fns
        RingBatcher.__init__(self, params, cfg, lanes=lanes,
                             cache_len=cache_len, prompt_len=prompt_len,
                             dp=dp, lora=lora, policy=policy,
                             steps_per_call=steps_per_call,
                             donate_cache=donate_cache, kv_int8=kv_int8)
        self.gen_cap = gen_cap
        # kp1 padding columns: same clamp-proofing as SpecRingBatcher.hist
        self.hist = jnp.full((lanes, cache_len + spec_k + 1), -1, jnp.int32)
        self.hist_lens = np.zeros(lanes, np.int32)
        self.verifies = 0

    def validate_request(self, n_prompt_tokens: int,
                         max_new_tokens: Optional[int] = None) -> None:
        RingBatcher.validate_request(self, n_prompt_tokens, max_new_tokens)
        max_new = (self.dp.max_new_tokens if max_new_tokens is None
                   else max_new_tokens)
        if max_new > self.cache_len - self.prompt_len - (self.spec_k + 1):
            raise ValueError(
                f"max_new_tokens {max_new} exceeds the generation region "
                f"{self.cache_len - self.prompt_len - (self.spec_k + 1)}")

    def _build_fns(self) -> None:
        super(SpecRingBatcher, self)._build_fns()   # RingBatcher's prefill
        cfg, prompt_len = self.cfg, self.prompt_len
        nv, donate = self.steps_per_call, self.donate_cache
        k, m = self.spec_k, self.spec_m
        kp1 = k + 1
        s_len = self.cache_len
        wb = s_len - kp1                 # fixed scratch-window base (static)
        eos = self.dp.eos_token_id
        quantized = self.kv_int8
        NEG = -1e30
        proposer = (self._proposer if self._proposer is not None
                    else partial(ngram_propose, k=k, m=m))

        def relocate(buf, dest):
            # static window slice -> masked scatter to per-lane frontiers.
            # buf: (L, B, S, ...) (axis 2 = slots); dest: (B, kp1) slot ids,
            # already set to S (dropped) for rejected/garbage rows.
            rows = jax.lax.dynamic_slice_in_dim(buf, wb, kp1, 2)
            bidx = jnp.arange(buf.shape[1])[:, None]
            return buf.at[:, bidx, dest].set(rows, mode="drop")

        @partial(jax.jit, donate_argnums=(2, 3, 4) if donate else ())
        def spec_step_fn(params, lora, cache, valid, hist, hist_lens,
                         last_tok, cur_lens, active, prompt_lens):
            lanes = last_tok.shape[0]
            win = jnp.where(jnp.tril(jnp.ones((kp1, kp1), jnp.bool_)),
                            0.0, NEG).astype(jnp.float32)

            def body(carry, _):
                cache, valid, hist, hist_lens, last_tok, cur_lens = carry
                drafts = jax.vmap(proposer)(hist, hist_lens)
                block = jnp.concatenate([last_tok[:, None], drafts], axis=1)
                positions = cur_lens[:, None] + jnp.arange(kp1)[None]
                base = jnp.broadcast_to(
                    jnp.where(valid, 0.0, NEG)[:, None, None, :],
                    (lanes, 1, kp1, s_len)).astype(jnp.float32)
                bias = jax.lax.dynamic_update_slice(
                    base, jnp.broadcast_to(win[None, None],
                                           (lanes, 1, kp1, kp1)),
                    (0, 0, 0, wb))
                logits, cache = llama_apply(
                    params, cfg, block, positions, bias, cache=cache,
                    write_pos=wb, lora=lora, policy=self.policy,
                    verify=True)
                g = jnp.argmax(logits.astype(jnp.float32),
                               -1).astype(jnp.int32)          # (lanes, kp1)
                accepted = jnp.sum(jnp.cumprod(
                    (drafts == g[:, :k]).astype(jnp.int32), axis=1), axis=1)
                emit = accepted + 1
                js = jnp.arange(kp1)[None]
                eos_in = (g == eos) & (js < emit[:, None])
                emit = jnp.where(eos_in.any(1),
                                 jnp.argmax(eos_in, 1) + 1, emit)
                emit = jnp.where(active, emit, 0)
                # ---- relocation: window rows j < emit -> frontier fr + j
                fr = prompt_len + (cur_lens - prompt_lens)     # (lanes,)
                dest = fr[:, None] + js                        # (lanes, kp1)
                ok = (js < emit[:, None]) & (dest < wb)
                dest = jnp.where(ok, dest, s_len)              # drop others
                if quantized:
                    cache_n = type(cache)(
                        relocate(cache.k, dest), relocate(cache.v, dest),
                        relocate(cache.k_scale, dest),
                        relocate(cache.v_scale, dest))
                else:
                    cache_n = type(cache)(relocate(cache.k, dest),
                                          relocate(cache.v, dest))
                bidx = jnp.arange(lanes)[:, None]
                valid = valid.at[bidx, dest].set(True, mode="drop")
                hist = jax.vmap(
                    lambda h, row, p: jax.lax.dynamic_update_slice(
                        h, row, (p,)))(hist, g, hist_lens)
                hist_lens = hist_lens + emit
                bonus = jnp.take_along_axis(
                    g, jnp.maximum(emit - 1, 0)[:, None], axis=1)[:, 0]
                last_tok = jnp.where(active, bonus, last_tok)
                cur_lens = cur_lens + emit
                return ((cache_n, valid, hist, hist_lens, last_tok,
                         cur_lens), (g, emit))

            carry = (cache, valid, hist, hist_lens, last_tok, cur_lens)
            carry, (toks, emits) = jax.lax.scan(
                body, carry, jnp.arange(nv, dtype=jnp.int32))
            cache, valid, hist, hist_lens, last_tok, cur_lens = carry
            return (cache, valid, hist, hist_lens, last_tok, cur_lens,
                    toks, emits)

        self._spec_step_fn = spec_step_fn

    def step(self) -> List[int]:
        """One jit call = steps_per_call verify+relocate iterations."""
        self._admit()
        newly_finished: List[int] = []
        if self.active_lanes == 0:
            return newly_finished
        active = np.asarray(
            [s is not None for s in self.lane_session], np.bool_)
        (self.cache, self.valid, self.hist, hist_lens, last_tok, cur_lens,
         toks, emits) = self._spec_step_fn(
            self.params, self.lora, self.cache, self.valid, self.hist,
            jnp.asarray(self.hist_lens), jnp.asarray(self.last_tok),
            jnp.asarray(self.cur_lens), jnp.asarray(active),
            jnp.asarray(self.prompt_lens))
        self.hist_lens = np.array(hist_lens)
        self.last_tok = np.array(last_tok)
        self.cur_lens = np.array(cur_lens)
        return self._drain(toks, emits, active, newly_finished)
