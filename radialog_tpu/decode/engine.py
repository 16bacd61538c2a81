"""Autoregressive generation engine: batched prefill + while-loop decode.

Replaces the HF generate() loop driven by the reference
(test.py:339-348 -> modeling_llama_imgemb.py prepare_inputs_for_generation)
with a TPU-native engine:

  * right-padded prompts, per-sequence lengths (vs. the reference's left
    padding + unk-as-pad, test.py:288-304) — same RoPE positions, but prefill
    is a single static-shape batched matmul-heavy pass;
  * the image-embedding splice happens once at prefill
    (modeling_llama_imgemb.py:571-594 only splices when past is None);
  * decode is one jitted lax.while_loop over single-token steps against the
    pre-allocated KV cache, with early exit when every sequence hit EOS —
    no per-token host round-trips, no recompiles;
  * greedy (reference eval default) and temperature sampling.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import (KVCache, LlamaConfig, decode_bias_static_slot,
                            find_img_start, init_cache, llama_apply,
                            pad_scale_lanes, prefill_bias, quantize_kv)
from ..ops.attention import NEG_INF
from ..ops.layers import DTypePolicy, FP32
from .kvcache import bucket_length, install_prefill


@dataclasses.dataclass(frozen=True)
class DecodeParams:
    max_new_tokens: int = 300        # test.py:344
    eos_token_id: int = 2
    temperature: float = 1.0
    do_sample: bool = False
    top_k: int = 0                   # 0 = no top-k filter
    top_p: float = 1.0               # 1.0 = no nucleus filter
    seed: int = 42
    # tokens decoded per while_loop trip: >1 amortizes the ~0.9ms fixed
    # lax.while_loop iteration overhead this runtime pays (docs/PERF.md) over
    # several forwards. Token-identical to unroll=1 (test_llama_decode.py);
    # the last trip may run up to unroll-1 phantom forwards whose output
    # writes are dropped, so pick unroll << max_new_tokens.
    unroll: int = 1


class GenerationResult(NamedTuple):
    tokens: jax.Array        # (B, max_new) generated ids, eos-padded
    lengths: jax.Array       # (B,) number of generated tokens incl. eos
    prompt_lengths: jax.Array


def default_cache_len(t: int, dp: DecodeParams) -> int:
    """Bucketized cache length for a t-token prompt, INCLUDING the
    unroll>2 phantom-sub-step headroom decode_loop enforces (its deepest
    phantom forward writes slot t + max_new + unroll - 3; without the
    max(0, unroll - 2) term a prompt whose t + max_new lands exactly on
    a bucket boundary raised 'cache too small for unroll k' at the
    serving default unroll=3 — e.g. test.py --max_new_tokens 256 with a
    prompt padding to 128)."""
    return bucket_length(t + dp.max_new_tokens + max(0, dp.unroll - 2))


def prefill(params: Dict, cfg: LlamaConfig, tokens: jax.Array,
            lengths: jax.Array, cache_len: int,
            img_embs: Optional[jax.Array] = None,
            lora: Optional[Dict] = None,
            policy: DTypePolicy = FP32,
            kv_int8: bool = False,
            axis_name: Optional[str] = None):
    """Run the prompt pass; returns (cache, last_logits).
    axis_name: tensor-parallel mesh axis when called per-shard under
    shard_map (parallel/tp_serving.py).

    tokens: (B, T) right-padded; lengths: (B,) true lengths;
    cache_len: S_max for the pre-allocated cache (>= T + max_new).
    """
    b, t = tokens.shape
    if img_embs is not None and img_embs.shape[1] != cfg.num_img_tokens:
        raise ValueError(
            f"img_embs provides {img_embs.shape[1]} embeddings but the prompt "
            f"contract reserves cfg.num_img_tokens={cfg.num_img_tokens} <IMG> "
            f"slots — a mismatched splice would silently overwrite prompt tokens")
    positions = jnp.arange(t)[None, :].repeat(b, 0)
    bias = prefill_bias(lengths, t)
    img_start = find_img_start(tokens, cfg.img_token_id) if img_embs is not None else None
    # last_pos: the vocab projection runs only on each sequence's final
    # prompt position — projecting all T positions materializes a (B,T,V)
    # f32 buffer (459MB at batch 28) and pays T x the lm_head MXU work
    # int8 cache, small batch: stacked-fresh + layer-wise-quantize install
    # (the per-layer quantize+4-buffer DUS chain of direct prefill schedules
    # worse: 4.91 -> 4.38 reports/s at batch 24). Large batch flips the
    # tradeoff: the stacked (L,B,T,H,D) bf16 fresh-KV temp (~2.1 GB at
    # batch 32, prompt 128) pushes the executable's peak against HBM
    # capacity, where XLA's remat pass starts compressing/copying the
    # loop-carried cache every decode step (docs/PERF.md remat cliff) — a
    # far worse tax than the prefill-phase DUS chain. Crossover measured on
    # one v5e: b24 prefers the install pass, b32+ needs direct.
    int8_direct = kv_int8 and b >= 30
    if isinstance(params["layers"], (list, tuple)) and (not kv_int8
                                                        or int8_direct):
        # unrolled serving layout: DIRECT prefill — each layer attends its
        # own fresh K/V and stores straight into the pre-allocated cache at
        # slot 0 (quantizing on the way when the cache is int8). No stacked
        # (L,B,T,H,D) fresh-KV array, no separate install pass — the ~2GB
        # of HLO temp this frees is what lets bf16 serve at batch 32 and
        # int8 past the capacity-pressure remat cliff (docs/PERF.md).
        cache = init_cache(cfg, b, cache_len, quantized=int8_direct)
        logits, cache = llama_apply(params, cfg, tokens, positions, bias,
                                    cache=cache, write_pos=0,
                                    img_embs=img_embs, img_start=img_start,
                                    lora=lora, policy=policy, lengths=lengths,
                                    axis_name=axis_name, last_pos=lengths - 1)
        return cache, logits[:, 0]
    logits, fresh = llama_apply(params, cfg, tokens, positions, bias,
                                cache=None, img_embs=img_embs,
                                img_start=img_start, lora=lora, policy=policy,
                                lengths=lengths, axis_name=axis_name,
                                last_pos=lengths - 1)
    cache = install_prefill(init_cache(cfg, b, cache_len, quantized=kv_int8),
                            fresh)
    return cache, logits[:, 0]


def prefix_kv(params: Dict, cfg: LlamaConfig, prefix_tokens: jax.Array,
              lora: Optional[Dict] = None, policy: DTypePolicy = FP32,
              axis_name: Optional[str] = None,
              img_embs: Optional[jax.Array] = None,
              ) -> KVCache:
    """Prefill a batch-wide shared prompt prefix ONCE.

    prefix_tokens (P0,) -> KVCache with k/v (L, P0, Hkv, D) in the COMPUTE
    dtype: the per-layer K/V that ``generate_shared_prefix`` merges into
    every sequence's attention. Unrolled serving layout only.

    img_embs: optional (1, n_img, qformer_dim) — when the shared prefix
    itself contains the <IMG> run (every lane shows the SAME image, e.g.
    the 14-questions-per-study binary-QA pass, test.py:536-610), the
    splice happens here, once, and the per-lane remainders carry no <IMG>
    tokens.

    Dtype contract (what keeps shared-prefix numerics equal to plain
    generate): the plain path's remainder prefill attends the prefix's
    FRESH compute-dtype K/V (models/llama.py direct prefill), while its
    decode re-reads the prefix from the bf16 cache. So the caller must use
    this compute-dtype result for the remainder prefill and a
    cache-dtype-rounded copy for the decode loop — one prefix tensor for
    both phases shifts logits by ~0.07 (fp32 policy) and greedy outputs
    diverge from plain generate() within a few steps."""
    p0 = prefix_tokens.shape[0]
    ln = jnp.full((1,), p0, jnp.int32)
    img_start = (find_img_start(prefix_tokens[None], cfg.img_token_id)
                 if img_embs is not None else None)
    _, fresh = llama_apply(
        params, cfg, prefix_tokens[None], jnp.arange(p0)[None],
        prefill_bias(ln, p0), cache=None, lora=lora, policy=policy,
        lengths=ln, axis_name=axis_name, last_pos=jnp.zeros((1,), jnp.int32),
        img_embs=img_embs, img_start=img_start)
    return KVCache(fresh.k[:, 0], fresh.v[:, 0])


def generate_shared_prefix(params: Dict, cfg: LlamaConfig,
                           prefix_tokens: jax.Array, tokens: jax.Array,
                           lengths: jax.Array,
                           dp: DecodeParams = DecodeParams(),
                           img_embs: Optional[jax.Array] = None,
                           lora: Optional[Dict] = None,
                           policy: DTypePolicy = FP32,
                           cache_len: Optional[int] = None,
                           axis_name: Optional[str] = None,
                           kv_int8: bool = False,
                           prefix_img_embs: Optional[jax.Array] = None
                           ) -> GenerationResult:
    """generate() for a batch whose prompts share a literal common token
    prefix (the RaDialog report template: system prompt + instruction
    boilerplate are identical across requests, data/conversation.py).

    prefix_tokens (P0,): the shared prefix, prefilled ONCE (batch-free);
    tokens (B, T1): per-sequence REMAINDERS, right-padded; lengths (B,):
    remainder lengths (>= 1 — the last prompt token must be per-sequence so
    each row gets its own first logits). The <IMG> run lives in the
    remainder when image embeddings differ per request (img_embs); when
    every lane shows the SAME image — the downstream QA passes ask 14
    questions about one study (test.py:536-610) — pass prefix_img_embs
    ((1, n_img, q) and put the <IMG> run in the prefix instead: the whole
    conversation history including the image is then prefilled once.

    Vs plain generate(concat(prefix, remainder)): identical greedy math
    (one softmax over the concatenated score row — ops/attention.py
    mha_shared_prefix), but the prefix K/V is stored once and read once
    per decode step instead of once per lane, and the per-lane cache
    shrinks by P0 slots. Serving is bandwidth-bound (docs/PERF.md), so
    both effects are throughput: ~B*P0 fewer KV rows per step, and the
    smaller cache moves the batch-size OOM wall out.

    Unrolled serving layout only. ``kv_int8=True`` composes prefix sharing
    with the int8 cache: the remainder prefill still attends the
    compute-dtype prefix (int8 rounding only affects decode reads — same
    contract as plain int8 prefill), while the decode loop reads an
    int8-quantized copy of the prefix (quantize_kv — the same rounding the
    plain int8 path applies when it installs the prefix into its cache),
    merged by the flash-decode kernel's leading shared grid step."""
    if not isinstance(params["layers"], (list, tuple)):
        raise ValueError("prefix sharing is a serving feature of the "
                         "unrolled weight layout (quantize_llama_host)")
    b, t1 = tokens.shape
    p0 = prefix_tokens.shape[0]
    if cache_len is None:
        cache_len = default_cache_len(t1, dp)
    if img_embs is not None and img_embs.shape[1] != cfg.num_img_tokens:
        raise ValueError(
            f"img_embs provides {img_embs.shape[1]} embeddings but the "
            f"prompt contract reserves {cfg.num_img_tokens} <IMG> slots")
    if (prefix_img_embs is not None
            and prefix_img_embs.shape[1] != cfg.num_img_tokens):
        # same contract as img_embs: prefix_kv splices these rows at the
        # <IMG> start with dynamic_update_slice — a wrong count silently
        # overwrites real token embeddings / leaves <IMG> rows unspliced
        raise ValueError(
            f"prefix_img_embs provides {prefix_img_embs.shape[1]} embeddings "
            f"but the prompt contract reserves {cfg.num_img_tokens} <IMG> "
            f"slots")
    shared = prefix_kv(params, cfg, prefix_tokens, lora=lora, policy=policy,
                       axis_name=axis_name, img_embs=prefix_img_embs)
    cache = init_cache(cfg, b, cache_len, quantized=kv_int8)
    positions = p0 + jnp.arange(t1)[None, :].repeat(b, 0)
    bias = prefill_bias(lengths, t1)
    img_start = (find_img_start(tokens, cfg.img_token_id)
                 if img_embs is not None else None)
    # prefill attends the COMPUTE-dtype prefix (plain direct prefill attends
    # fresh K/V); decode attends the cache-dtype-rounded prefix (plain decode
    # re-reads the bf16/int8 cache) — see the prefix_kv dtype contract.
    logits, cache = llama_apply(params, cfg, tokens, positions, bias,
                                cache=cache, write_pos=0, img_embs=img_embs,
                                img_start=img_start, lora=lora, policy=policy,
                                lengths=lengths, axis_name=axis_name,
                                last_pos=lengths - 1, shared_kv=shared)
    # PRE-SPLIT per layer before the decode while_loop: the loop body then
    # consumes 32 (or 128) separate LOOP-INVARIANT buffers by construction.
    # Measured NEUTRAL at the b56 serving default (7.8618 -> 7.8534
    # reports/s, noise) — XLA was already hoisting the stacked in-body
    # slices out of the loop; kept because it makes the Pallas operands'
    # loop-invariance structural rather than an optimizer outcome.
    if kv_int8:
        # token-flat int8 prefix, padded to the kernel's 32-row sublane tile;
        # scales carry the dense-lane padding of the cache contract
        L, P0, H, D = shared.k.shape
        k0_8, ks0 = quantize_kv(shared.k)
        v0_8, vs0 = quantize_kv(shared.v)
        p0p = -(-P0 // 32) * 32
        pad = ((0, 0), (0, p0p - P0), (0, 0))
        k0f = jnp.pad(k0_8.reshape(L, P0, H * D), pad)
        v0f = jnp.pad(v0_8.reshape(L, P0, H * D), pad)
        ks0f = jnp.pad(pad_scale_lanes(ks0), pad)
        vs0f = jnp.pad(pad_scale_lanes(vs0), pad)
        shared_c = tuple((k0f[i], ks0f[i], v0f[i], vs0f[i])
                         for i in range(L))
    else:
        kc = shared.k.astype(cache.k.dtype)
        vc = shared.v.astype(cache.v.dtype)
        shared_c = tuple((kc[i], vc[i]) for i in range(kc.shape[0]))
    return decode_loop(params, cfg, cache, logits[:, 0], lengths, dp,
                       lora=lora, policy=policy, prompt_pad=t1,
                       axis_name=axis_name, shared_kv=shared_c, pos_offset=p0,
                       shared_p0=p0)


generate_shared_jit = partial(jax.jit, static_argnames=(
    "cfg", "dp", "cache_len", "policy", "kv_int8"))(generate_shared_prefix)


def _select_token(logits: jax.Array, dp: DecodeParams, key) -> jax.Array:
    """Greedy (reference eval default) or temperature/top-k/top-p sampling.

    Filters compose HF-style: top-k first, then nucleus. All branches are
    trace-time (dp is a static jit arg), so greedy decode pays nothing.
    Nucleus keeps the smallest prefix of the descending-probability order
    whose mass reaches top_p, ALWAYS including the most probable token."""
    if not dp.do_sample:
        return jnp.argmax(logits, axis=-1)
    logits = logits.astype(jnp.float32) / jnp.maximum(dp.temperature, 1e-6)
    neg = jnp.asarray(NEG_INF, logits.dtype)
    if dp.top_k and dp.top_k > 0:
        kth = jax.lax.top_k(logits, dp.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, neg, logits)
    if dp.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep entries whose PRECEDING mass is < top_p (first token always)
        keep_sorted = (cum - probs) < dp.top_p
        cutoff = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                         axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff, neg, logits)
    return jax.random.categorical(key, logits, axis=-1)


def decode_loop(params: Dict, cfg: LlamaConfig, cache: KVCache,
                first_logits: jax.Array, prompt_lengths: jax.Array,
                dp: DecodeParams, lora: Optional[Dict] = None,
                policy: DTypePolicy = FP32,
                prompt_pad: Optional[int] = None,
                axis_name: Optional[str] = None,
                shared_kv: Optional[KVCache] = None,
                pos_offset: int = 0,
                shared_p0: Optional[int] = None) -> GenerationResult:
    """Greedy/sampled decode with early exit once all sequences emit EOS.

    Static-slot KV writes: step s writes every sequence's K/V at slot
    prompt_pad + s (one contiguous dynamic_update_slice, aliased in place by
    XLA) while RoPE positions and attention masks stay per-sequence — the
    pad gap between len_i and prompt_pad is masked (decode_bias_static_slot).

    shared_kv/pos_offset: prefix-sharing mode (generate_shared_prefix) —
    prompt_lengths/prompt_pad then describe the per-lane REMAINDER region
    and RoPE positions are offset by the shared prefix length.
    """
    res, _ = _decode_loop_with_cache(params, cfg, cache, first_logits,
                                     prompt_lengths, dp, lora=lora,
                                     policy=policy, prompt_pad=prompt_pad,
                                     axis_name=axis_name, shared_kv=shared_kv,
                                     pos_offset=pos_offset,
                                     shared_p0=shared_p0)
    return res


def _decode_loop_with_cache(params: Dict, cfg: LlamaConfig, cache: KVCache,
                            first_logits: jax.Array, prompt_lengths: jax.Array,
                            dp: DecodeParams, lora: Optional[Dict] = None,
                            policy: DTypePolicy = FP32,
                            prompt_pad: Optional[int] = None,
                            axis_name: Optional[str] = None,
                            shared_kv: Optional[KVCache] = None,
                            pos_offset: int = 0,
                            shared_p0: Optional[int] = None):
    """decode_loop returning (result, final_cache). The cache output is what
    makes the two-phase donation real: XLA input-output aliasing needs an
    output buffer matching the donated input, otherwise the donation is
    silently dropped ("donated buffers were not usable"), the while_loop
    carry copies the whole cache once at loop entry, and the transient
    2x-cache peak OOMs the large-batch serving configs."""
    b = first_logits.shape[0]
    s_max = cache.max_len
    max_new = dp.max_new_tokens
    key0 = jax.random.PRNGKey(dp.seed)
    if prompt_pad is None:
        raise ValueError("decode_loop requires prompt_pad (padded prompt length)")
    # prompt_pad may be a TRACED scalar (interactive sessions jit one decode
    # executable reused across turns, decode/session.py — the turn offset is
    # data, not a compile key); bounds checks then live on the caller.
    pad_static = isinstance(prompt_pad, (int, np.integer))
    if pad_static and prompt_pad + max_new > s_max:
        raise ValueError(f"cache too small: {prompt_pad}+{max_new} > {s_max}")

    tok0 = _select_token(first_logits, dp, key0)
    out0 = jnp.full((b, max_new), dp.eos_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(tok0.astype(jnp.int32))
    done0 = tok0 == dp.eos_token_id

    def cond(st):
        step, _, _, done, _, _ = st
        # step+1: body(step) emits out[:, step+1] — slot 0 already holds the
        # prefill token, so only max_new-1 body iterations produce output.
        # `step < max_new` would run one PHANTOM step whose token lands in a
        # dropped out-of-bounds write: a wasted full forward per generate.
        # (Session continuation is unaffected: decode/session.py already
        # treats the final token's KV as pending, not written.)
        # With unroll>1 the trailing trip may still run up to unroll-1
        # phantom sub-steps; their output writes are scatter-dropped below.
        return (step + 1 < max_new) & ~done.all()

    def one_step(st, guard_oob: bool):
        step, cache, out, done, last_tok, key = st
        # RoPE position of the current token: prompt_len + step (per-seq;
        # + the shared prefix length in prefix-sharing mode)
        pos = (prompt_lengths + pos_offset + step)[:, None]
        bias = decode_bias_static_slot(prompt_lengths, prompt_pad, step, s_max)
        logits, cache = llama_apply(
            params, cfg, last_tok[:, None], pos, bias, cache=cache,
            write_pos=prompt_pad + step, lora=lora, policy=policy,
            lengths=prompt_lengths, slot_info=(prompt_pad, step),
            axis_name=axis_name, shared_kv=shared_kv, shared_p0=shared_p0)
        key, sub = jax.random.split(key)
        nxt = _select_token(logits[:, 0], dp, sub).astype(jnp.int32)
        nxt = jnp.where(done, dp.eos_token_id, nxt)
        if guard_oob:
            # phantom sub-step past max_new: a plain .at[].set lowers to
            # dynamic_update_slice whose CLAMPED start would overwrite the
            # real final token; mode="drop" scatters (B,) values and drops
            # the out-of-bounds write instead
            out = out.at[:, step + 1].set(nxt, mode="drop")
        else:
            out = out.at[:, step + 1].set(nxt)
        done = done | (nxt == dp.eos_token_id)
        return (step + 1, cache, out, done, nxt, key)

    unroll = max(1, int(dp.unroll))

    def body(st):
        st = one_step(st, guard_oob=False)
        for _ in range(unroll - 1):
            # sub-steps 2..unroll can land past max_new on the last trip:
            # phantom forwards whose KV write hits the fresh slot
            # prompt_pad+step (in bounds by the unroll cache check) and
            # whose token write is dropped
            st = one_step(st, guard_oob=True)
        return st

    # deepest phantom KV write: a trip can start at step max_new-2, so its
    # last sub-step forwards at step max_new-2+unroll-1 and writes slot
    # prompt_pad+max_new+unroll-3 — for unroll=2 that is within the plain
    # prompt_pad+max_new<=s_max budget already enforced above (no headroom)
    if unroll > 2 and pad_static and prompt_pad + max_new + unroll - 2 > s_max:
        raise ValueError(
            f"cache too small for unroll {unroll}: phantom sub-steps write "
            f"KV up to slot {prompt_pad + max_new + unroll - 3} >= {s_max}")

    # write tok0's KV while generating tok1, etc.
    init = (jnp.asarray(0), cache, out0, done0, tok0.astype(jnp.int32), key0)
    step, cache, out, done, _, _ = jax.lax.while_loop(cond, body, init)

    eos_hit = out == dp.eos_token_id
    gen_len = jnp.where(eos_hit.any(1), jnp.argmax(eos_hit, 1) + 1, max_new)
    return GenerationResult(out, gen_len, prompt_lengths), cache


def generate(params: Dict, cfg: LlamaConfig, tokens: jax.Array,
             lengths: jax.Array, dp: DecodeParams = DecodeParams(),
             img_embs: Optional[jax.Array] = None,
             lora: Optional[Dict] = None, policy: DTypePolicy = FP32,
             cache_len: Optional[int] = None,
             kv_int8: bool = False,
             axis_name: Optional[str] = None) -> GenerationResult:
    """End-to-end: prefill + decode. ``tokens`` right-padded (B, T).
    ``kv_int8`` stores the cache int8 with per-token scales (unrolled serving
    params only) — halves cache memory + attention traffic."""
    t = tokens.shape[1]
    if cache_len is None:
        cache_len = default_cache_len(t, dp)
    cache, last = prefill(params, cfg, tokens, lengths, cache_len,
                          img_embs=img_embs, lora=lora, policy=policy,
                          kv_int8=kv_int8, axis_name=axis_name)
    return decode_loop(params, cfg, cache, last, lengths, dp, lora=lora,
                       policy=policy, prompt_pad=t, axis_name=axis_name)


@partial(jax.jit, static_argnames=("cfg", "dp", "cache_len", "policy",
                                   "kv_int8"))
def generate_jit(params, cfg: LlamaConfig, tokens, lengths,
                 dp: DecodeParams, img_embs=None, lora=None,
                 policy: DTypePolicy = FP32, cache_len: int = 1024,
                 kv_int8: bool = False):
    """Fused prefill+decode as ONE jitted executable — the production
    serving shape: the KV cache is created inside the program, so the decode
    while_loop's dynamic_update_slice aliases it in place with no argument
    copy (cf. generate_two_phase's measured double-buffering)."""
    return generate(params, cfg, tokens, lengths, dp, img_embs=img_embs,
                    lora=lora, policy=policy, cache_len=cache_len,
                    kv_int8=kv_int8)


# serving-path alias: the name the pipeline uses
generate_fused_jit = generate_jit


# --------------------------------------------------------------- two-phase
# Prefill and decode compiled as SEPARATE executables with the KV cache
# donated across the boundary. Rationale (the round-1 "HBM cliff"): in one
# fused executable XLA must budget the PEAK across prefill + all decode
# steps; once that peak nears HBM capacity its rematerialization pass breaks
# the decode loop's in-place cache aliasing and every step pays full cache
# copies (~3x step time; .claude/skills/verify documents the observed
# cliff at ~11GB live + a compile-time OOM at batch 28 that the split
# avoids). Splitting keeps each executable's peak small: prefill peaks at
# weights + cache + prompt activations; decode peaks at weights + cache +
# one token's activations. The cache buffer moves prefill -> decode by
# donation, never copied. Two dispatches per generate (~0.5ms each over the
# TPU tunnel) are noise against a 300-step decode.
prefill_jit = partial(jax.jit, static_argnames=(
    "cfg", "cache_len", "policy", "kv_int8", "axis_name"))(prefill)

# Jitted decode returning the final cache: the cache OUTPUT is required for
# the donation to hold (XLA input-output aliasing) — donating without a
# matching output is silently dropped and the while_loop carry copies the
# whole cache at loop entry (transient 2x-cache peak, OOM at batch 24 bf16).
decode_loop_jit = jax.jit(_decode_loop_with_cache, static_argnames=(
    "cfg", "dp", "policy", "prompt_pad", "axis_name"),
    donate_argnames=("cache",))


def generate_two_phase(params: Dict, cfg: LlamaConfig, tokens: jax.Array,
                       lengths: jax.Array, dp: DecodeParams = DecodeParams(),
                       img_embs: Optional[jax.Array] = None,
                       lora: Optional[Dict] = None,
                       policy: DTypePolicy = FP32,
                       cache_len: Optional[int] = None,
                       kv_int8: bool = False) -> GenerationResult:
    """generate() with prefill/decode as separate jitted executables and the
    cache donated between them.

    NOT the production serving path. Measured on one v5e
    (tools/bench_sweep.py --two-phase): although the donated cache does
    alias the decode output ("Output size 5.25G; shares 5.25G with
    arguments"), XLA still double-buffers the decode while_loop carry
    against the donated ARGUMENT — the compiled program allocates a full
    extra cache of HLO temp, so the split costs one cache more than the
    fused executable and OOMs exactly the large-batch configs it was meant
    to unlock (bf16 b24: 17.02G > 15.75G at compile; int8 b24: runtime
    ResourceExhausted). The fused generate_jit keeps the cache internal to
    one program, where the loop updates it in place with no copy. Kept for
    callers that need prefill and decode dispatched separately (e.g.
    prefix-cached sessions reuse prefill_jit/decode_loop_jit directly)."""
    t = tokens.shape[1]
    if cache_len is None:
        cache_len = default_cache_len(t, dp)
    cache, last = prefill_jit(params, cfg, tokens, lengths, cache_len,
                              img_embs=img_embs, lora=lora, policy=policy,
                              kv_int8=kv_int8)
    res, final_cache = decode_loop_jit(params, cfg, cache, last, lengths, dp,
                                       lora=lora, policy=policy, prompt_pad=t)
    # the donated-in cache came back as an aliased output; drop our handle so
    # the buffer frees as soon as the result is consumed
    del final_cache
    return res
