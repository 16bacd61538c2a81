"""Prompt-lookup speculative decoding for the single-session paths.

Greedy decode emits one token per full forward pass; the pass is
HBM-bandwidth-bound (every weight byte + the live KV is read per step,
docs/PERF.md), so a step that feeds k+1 tokens costs nearly the same wall
time as a 1-token step. Speculative decoding exploits that: draft k cheap
candidate tokens, run ONE (k+1)-token verification forward against the KV
cache, accept the longest prefix of drafts that matches the model's own
greedy argmax, and take the model's token at the first mismatch as a bonus.
Every emitted token is the model's exact greedy choice given its full
context, so the output is token-identical to plain generate() — only the
number of forward passes changes (tests/test_speculative.py asserts the
equality). Identity caveat: "exact" is up to float associativity — a
(k+1)-row matmul may tile differently from a 1-row one, so an argmax
decided by <=1 ulp can flip. Trained-model margins dwarf ulp noise; on
RANDOM weights (near-uniform logits) long generations can diverge — the
same measurement caveat as tests/test_shared_prefix.py's int8 note.

The drafter is PROMPT-LOOKUP (n-gram) matching: propose the continuation of
the most recent occurrence of the last ``m`` tokens in the history
(prompt + generated so far). No draft model, no training, near-zero cost.
This targets exactly the RaDialog workloads whose outputs echo their
prompts:

  * the automated-correction pass — the model regenerates the report being
    corrected with small edits (reference test.py:440-534,
    downstream_tasks/automated_correction.py: the report text sits verbatim
    in the prompt);
  * findings-QA / easy-language / summarization follow-ups that quote
    report phrases (instruct tasks, data/instruct.py);
  * multi-turn chat where the model restates earlier turns (demo.py flow,
    decode/session.py).

Batch-1 only (the reference runs correction and binary-QA at batch size 1,
test.py:440-674, and the interactive demo serves one conversation): with
one sequence the accepted-length raggedness that breaks the batched
static-slot cache contract (all lanes writing one shared slot per step,
decode/engine.py) does not exist — the write position is a traced scalar
and rejected slots are simply overwritten by the next iteration's block.
Batched serving keeps the RingBatcher (decode/continuous.py).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.llama import KVCache, LlamaConfig, llama_apply
from ..ops.attention import causal_mask_bias
from ..ops.layers import DTypePolicy, FP32
from .engine import DecodeParams, prefill
from .kvcache import bucket_length


class SpecResult(NamedTuple):
    tokens: jax.Array         # (1, max_new) generated ids, eos-padded
    lengths: jax.Array        # (1,) generated length incl. eos
    prompt_lengths: jax.Array
    iters: jax.Array          # () number of verification forwards run —
    #                           mean accepted/step = lengths / iters


def ngram_propose(hist: jax.Array, hist_len: jax.Array, k: int,
                  m: int) -> jax.Array:
    """Draft ``k`` tokens by continuing the most recent earlier occurrence
    of the last ``m`` history tokens (prompt-lookup decoding).

    hist: (Hmax,) int32 token buffer, entries >= hist_len are junk (the
    engine fills with -1 and leaves verification overshoot there);
    hist_len: () live length. When no match exists the draft repeats the
    last token — a draft is only a guess, a wrong one costs nothing beyond
    the (k+1)-wide step the engine pays anyway.

    Overshoot note: a match near the end may draft past hist_len into the
    junk region; those tokens are clipped to valid ids and simply get
    rejected by verification.
    """
    hmax = hist.shape[0]
    pattern = jax.lax.dynamic_slice(hist, (hist_len - m,), (m,))
    # windows[i, j] = hist[i + j] (wrapped rows at the end are excluded by
    # the i < hist_len - m validity mask below)
    windows = jnp.stack([jnp.roll(hist, -j) for j in range(m)], axis=1)
    idx = jnp.arange(hmax)
    cand = jnp.all(windows == pattern[None, :], axis=1) & (idx < hist_len - m)
    found = cand.any() & (hist_len > m)
    last = jnp.max(jnp.where(cand, idx, -1))
    start = jnp.clip(last + m, 0, hmax - k)
    draft = jax.lax.dynamic_slice(hist, (start,), (k,))
    fallback = jax.lax.dynamic_slice(hist, (hist_len - 1,), (1,))
    draft = jnp.where(found, draft, jnp.broadcast_to(fallback, (k,)))
    return jnp.clip(draft, 0, None)  # junk (-1) -> a valid id; gets rejected


def spec_decode_loop(params: Dict, cfg: LlamaConfig, cache: KVCache,
                     first_logits: jax.Array, prompt_len, dp: DecodeParams,
                     k: int, m: int, hist: jax.Array,
                     proposer: Optional[Callable] = None,
                     lora: Optional[Dict] = None,
                     policy: DTypePolicy = FP32,
                     ) -> Tuple[SpecResult, KVCache]:
    """Speculative greedy decode over a prefilled batch-1 cache.

    Slot contract: single sequence, no padding — cache slot == absolute
    position. The prompt occupies slots [0, prompt_len); generated token i
    lands at slot prompt_len + i (identical to the plain loop's
    prompt_pad + step with prompt_pad == prompt_len). Each iteration writes
    the whole (k+1)-token block's KV at the block base; slots past the
    accepted count hold stale KV that the next iteration's block overwrites
    before anything can attend it (the causal mask hides slots beyond the
    current query position).

    hist: (Hmax,) int32 with hist[:prompt_len] = prompt ids, rest -1;
    Hmax >= prompt_len + max_new + k + 1 (the caller sizes it).
    proposer(hist, hist_len) -> (k,) drafts; default = prompt-lookup
    ``ngram_propose``. Returns (SpecResult, final cache) — sessions keep the
    cache to continue the conversation (decode/session.py).
    """
    if dp.do_sample:
        raise ValueError("speculative decoding verifies against the greedy "
                         "argmax; sampled decoding needs rejection sampling "
                         "(not implemented) — use generate()")
    if first_logits.shape[0] != 1:
        raise ValueError("speculative decoding is batch-1 (see module doc)")
    if proposer is None:
        proposer = partial(ngram_propose, k=k, m=m)
    s_max = cache.max_len
    max_new = dp.max_new_tokens
    eos = dp.eos_token_id
    pl = jnp.asarray(prompt_len, jnp.int32)

    tok0 = jnp.argmax(first_logits.astype(jnp.float32), -1).astype(jnp.int32)
    # +k+1 overshoot room: one iteration may emit up to k+1 tokens past the
    # loop bound; the tail is trimmed/eos-filled below
    out0 = jnp.full((1, max_new + k + 1), eos, jnp.int32)
    out0 = out0.at[:, 0].set(tok0)
    hist0 = jax.lax.dynamic_update_slice(hist, tok0, (pl,))
    done0 = tok0[0] == eos

    def cond(st):
        c, _, _, done, _, _ = st
        return (c < max_new) & ~done

    def body(st):
        c, cache, out, done, hist, iters = st
        hl = pl + c                       # live history length
        draft = proposer(hist, hl)        # (k,)
        last = jax.lax.dynamic_slice(hist, (hl - 1,), (1,))
        block = jnp.concatenate([last, draft])[None]          # (1, k+1)
        base = hl - 1                     # slot & position of block[0]
        positions = (base + jnp.arange(k + 1))[None]
        bias = causal_mask_bias(k + 1, s_max, offset=base)
        logits, cache = llama_apply(params, cfg, block, positions, bias,
                                    cache=cache, write_pos=base, lora=lora,
                                    policy=policy, verify=True)
        g = jnp.argmax(logits[0].astype(jnp.float32), -1).astype(jnp.int32)
        # g[j] = model's token after block[:j+1]; draft[j] survives iff it
        # equals g[j] AND every earlier draft survived
        accepted = jnp.sum(jnp.cumprod((draft == g[:k]).astype(jnp.int32)))
        emit = accepted + 1               # accepted drafts + bonus token
        js = jnp.arange(k + 1)
        eos_in = (g == eos) & (js < emit)
        has_eos = eos_in.any()
        emit = jnp.where(has_eos, jnp.argmax(eos_in) + 1, emit)
        # write the whole block's outputs; entries past `emit` are stale and
        # get overwritten by the next iteration (or trimmed/eos-filled after
        # the loop — nothing reads them as live)
        out = jax.lax.dynamic_update_slice(out, g[None], (0, c))
        hist = jax.lax.dynamic_update_slice(hist, g, (pl + c,))
        return (c + emit, cache, out, done | has_eos, hist, iters + 1)

    init = (jnp.asarray(1, jnp.int32), cache, out0, done0, hist0,
            jnp.asarray(0, jnp.int32))
    c, cache, out, done, hist, iters = jax.lax.while_loop(cond, body, init)

    trimmed = out[:, :max_new]
    eos_hit = trimmed == eos
    gen_len = jnp.where(eos_hit.any(1), jnp.argmax(eos_hit, 1) + 1, max_new)
    # overshoot past the first eos (stale block entries) -> eos padding,
    # matching the plain loop's eos fill after `done`
    idx = jnp.arange(max_new)[None]
    tokens = jnp.where(idx >= gen_len[:, None], eos, trimmed)
    return (SpecResult(tokens, gen_len, jnp.full((1,), pl, jnp.int32), iters),
            cache)


def generate_spec(params: Dict, cfg: LlamaConfig, tokens: jax.Array,
                  dp: DecodeParams = DecodeParams(), k: int = 4, m: int = 3,
                  img_embs: Optional[jax.Array] = None,
                  lora: Optional[Dict] = None, policy: DTypePolicy = FP32,
                  cache_len: Optional[int] = None, kv_int8: bool = False,
                  proposer: Optional[Callable] = None) -> SpecResult:
    """prefill + speculative decode for one sequence.

    tokens: (1, T) EXACT-length prompt (no padding — slot == position is the
    batch-1 contract that keeps rejected-slot overwrites safe). Token output
    is identical to ``generate(params, cfg, tokens, ...)``; only
    ``result.iters`` (the number of forward passes) shrinks with draft
    acceptance.
    """
    b, t = tokens.shape
    if b != 1:
        raise ValueError("generate_spec is batch-1; batched serving uses "
                         "generate()/RingBatcher (see module docstring)")
    if cache_len is None:
        cache_len = bucket_length(t + dp.max_new_tokens + k + 1)
    if t + dp.max_new_tokens + k + 1 > cache_len:
        raise ValueError(f"cache too small: {t}+{dp.max_new_tokens}+{k + 1} "
                         f"> {cache_len}")
    lengths = jnp.full((1,), t, jnp.int32)
    cache, first = prefill(params, cfg, tokens, lengths, cache_len,
                           img_embs=img_embs, lora=lora, policy=policy,
                           kv_int8=kv_int8)
    hist = jnp.full((cache_len,), -1, jnp.int32)
    hist = jax.lax.dynamic_update_slice(hist, tokens[0].astype(jnp.int32),
                                        (0,))
    res, _ = spec_decode_loop(params, cfg, cache, first, t, dp, k, m, hist,
                              proposer=proposer, lora=lora, policy=policy)
    return res


generate_spec_jit = partial(jax.jit, static_argnames=(
    "cfg", "dp", "k", "m", "policy", "cache_len", "kv_int8",
    "proposer"))(generate_spec)
