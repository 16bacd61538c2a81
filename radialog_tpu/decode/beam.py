"""Beam-search decoding (the reference's --num_beams path, test.py:346,
modeling_llama_imgemb.py:795-836 repeats dicoms across beams).

Split-cache design (TPU-first, no per-step full-cache copy): the prompt
region of the KV cache is IDENTICAL across the K beams of a batch element —
beam reordering permutes only the generated continuations. So the cache is
split in two:

  * prompt KV  (L, B,   S_prompt, H, D) — written once at prefill, shared by
    all beams, never duplicated, never reordered;
  * generated KV (L, B*K, S_gen,  H, D) — one slot per generated token
    (S_gen = max_new_tokens), written at slot `step`, and gathered on beam
    reorder.

Attention per step merges the two regions with a shared-max online softmax:
scores against the prompt keys are computed at (B, K, H, S_prompt) — the
B*K queries read the B prompt rows directly, no broadcast materialization —
and scores against the generated keys at (B*K, H, S_gen). Versus the
round-1 design (cache repeated to B*K rows, full gather per step) this
removes the K-fold prompt-cache memory cost entirely and shrinks the
per-step reorder gather from S_max to S_gen slots; with the reference
serving shapes (prompt ~448 padded, 300 new tokens, test.py:288,344) that
is ~2.6x less reorder traffic and ~2.4x less cache HBM at K=4.

Finished beams (EOS) are frozen: their only continuation is EOS at zero
added log-prob, standard HF semantics with length-normalized final scoring.
Works with both weight layouts: stacked bf16 (lax.scan over layers) and the
unrolled quantized serving params (python layer loop, bf16 KV).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.llama import (KVCache, LlamaConfig, _index_lora, _mlp, _proj,
                            _psum_if, qkv_proj)
from ..ops.layers import (DTypePolicy, FP32, embedding_lookup, linear,
                          rmsnorm)
from ..ops.rotary import apply_rope, rope_tables
from .engine import DecodeParams, GenerationResult, prefill

NEG_INF = -1e30


def _split_attention(q: jax.Array, pk: jax.Array, pv: jax.Array,
                     gk: jax.Array, gv: jax.Array,
                     prompt_bias: jax.Array, gen_bias: jax.Array,
                     nh: int, beams: int) -> jax.Array:
    """Single-token attention over the split cache.

    q (B*K, 1, nh, hd); pk/pv (B, S_p, nkv, hd) shared prompt KV;
    gk/gv (B*K, S_g, nkv, hd) per-beam generated KV;
    prompt_bias (B, 1, 1, S_p); gen_bias (S_g,).
    Returns (B*K, 1, nh*hd) merged via a shared-max two-part softmax
    (same math as one softmax over the concatenated KV axis).
    """
    bk, _, _, hd = q.shape
    b = bk // beams
    nkv = pk.shape[2]
    if nkv != nh:  # GQA broadcast
        rep = nh // nkv
        pk, pv = jnp.repeat(pk, rep, 2), jnp.repeat(pv, rep, 2)
        gk, gv = jnp.repeat(gk, rep, 2), jnp.repeat(gv, rep, 2)
    scale = hd ** -0.5
    qb = q.reshape(b, beams, nh, hd)
    s_p = jnp.einsum("bkhd,bshd->bkhs", qb, pk,
                     preferred_element_type=jnp.float32) * scale
    s_p = (s_p + prompt_bias.astype(jnp.float32)).reshape(bk, nh, -1)
    s_g = jnp.einsum("bhd,bshd->bhs", q[:, 0], gk,
                     preferred_element_type=jnp.float32) * scale
    s_g = s_g + gen_bias.astype(jnp.float32)
    m = jnp.maximum(s_p.max(-1), s_g.max(-1))            # (B*K, nh)
    ep = jnp.exp(s_p - m[..., None])
    eg = jnp.exp(s_g - m[..., None])
    denom = ep.sum(-1) + eg.sum(-1)
    o_p = jnp.einsum("bkhs,bshd->bkhd",
                     ep.reshape(b, beams, nh, -1).astype(pv.dtype), pv,
                     preferred_element_type=jnp.float32).reshape(bk, nh, hd)
    o_g = jnp.einsum("bhs,bshd->bhd", eg.astype(gv.dtype), gv,
                     preferred_element_type=jnp.float32)
    o = (o_p + o_g) / denom[..., None]
    return o.reshape(bk, 1, nh * hd).astype(q.dtype)


def _beam_forward(params: Dict, cfg: LlamaConfig, last_tok: jax.Array,
                  positions: jax.Array, pk: jax.Array, pv: jax.Array,
                  prompt_bias: jax.Array, gk: jax.Array, gv: jax.Array,
                  step: jax.Array, beams: int,
                  lora: Optional[Dict], policy: DTypePolicy,
                  axis_name: Optional[str] = None
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One decode step at B*K rows against the split cache. Writes each
    layer's new K/V into generated slot `step` and returns
    (logits (B*K, V), gk, gv).

    axis_name: tensor-parallel mesh axis when running per-shard under
    shard_map (parallel/tp_serving.py make_tp_generate(num_beams>1)) —
    cfg then holds the LOCAL head/FFN counts and the row-parallel wo/down
    partial outputs are psum'd over the axis before each residual add,
    exactly as llama_apply does. The beam bookkeeping (top_k, reorder
    gather) runs on the psum'd replicated logits, so every shard picks
    identical beams and permutes its local generated KV consistently."""
    x = embedding_lookup(params["embed"], last_tok[:, None]).astype(policy.compute)
    rope = rope_tables(cfg.head_dim, cfg.max_position, cfg.rope_theta)
    lora_scale = lora["scale"] if lora is not None else None
    lora_layers = lora["layers"] if lora is not None else None
    s_gen = gk.shape[2]
    gen_bias = jnp.where(jnp.arange(s_gen) <= step, 0.0, NEG_INF)

    def layer_step(lp, ll, pk_l, pv_l, gk_l, gv_l, x):
        h = rmsnorm(lp["input_ln"], x, cfg.rms_eps)
        q, k, v = qkv_proj(lp, ll, lora_scale, cfg, h, policy)
        cos, sin = rope
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)
        gk_l = jax.lax.dynamic_update_slice(
            gk_l, k.astype(gk_l.dtype), (0, step, 0, 0))
        gv_l = jax.lax.dynamic_update_slice(
            gv_l, v.astype(gv_l.dtype), (0, step, 0, 0))
        o = _split_attention(q, pk_l.astype(x.dtype), pv_l.astype(x.dtype),
                             gk_l.astype(x.dtype), gv_l.astype(x.dtype),
                             prompt_bias, gen_bias, cfg.num_heads, beams)
        x = x + _psum_if(_proj(lp, ll, "wo", o, lora_scale, policy),
                         axis_name)
        h2 = rmsnorm(lp["post_ln"], x, cfg.rms_eps)
        x = x + _psum_if(_mlp(lp, h2, policy), axis_name)
        return x, gk_l, gv_l

    if isinstance(params["layers"], (list, tuple)):
        # unrolled serving layout: python layer loop, static layer indices
        for i, lp in enumerate(params["layers"]):
            ll = _index_lora(lora_layers, i)
            x, gk_i, gv_i = layer_step(lp, ll, pk[i], pv[i],
                                       gk[i], gv[i], x)
            gk = jax.lax.dynamic_update_index_in_dim(gk, gk_i, i, 0)
            gv = jax.lax.dynamic_update_index_in_dim(gv, gv_i, i, 0)
    else:
        # stacked layout: scan over layers; generated cache rides the carry
        # so XLA aliases the slot update in place (see llama_apply)
        def body(carry, scanned):
            x, gk, gv = carry
            lp, ll, pk_l, pv_l, i = scanned
            gk_l = jax.lax.dynamic_index_in_dim(gk, i, 0, keepdims=False)
            gv_l = jax.lax.dynamic_index_in_dim(gv, i, 0, keepdims=False)
            x, gk_l, gv_l = layer_step(lp, ll, pk_l, pv_l, gk_l, gv_l, x)
            gk = jax.lax.dynamic_update_index_in_dim(gk, gk_l, i, 0)
            gv = jax.lax.dynamic_update_index_in_dim(gv, gv_l, i, 0)
            return (x, gk, gv), None

        (x, gk, gv), _ = jax.lax.scan(
            body, (x, gk, gv),
            (params["layers"], lora_layers, pk, pv,
             jnp.arange(cfg.num_layers)))

    x = rmsnorm(params["final_ln"], x, cfg.rms_eps)
    logits = linear(params["lm_head"], x, policy).astype(jnp.float32)
    return logits[:, 0], gk, gv


def beam_decode(params: Dict, cfg: LlamaConfig, cache: KVCache,
                first_logits: jax.Array, prompt_lengths: jax.Array,
                prompt_pad: int, dp: DecodeParams, num_beams: int,
                lora: Optional[Dict] = None,
                policy: DTypePolicy = FP32,
                length_penalty: float = 1.0,
                axis_name: Optional[str] = None) -> GenerationResult:
    """cache: bf16 prompt KV at batch B (only slots [0, prompt_pad) are
    read — a larger serving cache may be passed and is sliced)."""
    if cache.quantized:
        raise ValueError("beam search uses the bf16 KV cache (quality path); "
                         "prefill with kv_int8=False")
    if dp.do_sample:
        raise NotImplementedError(
            "beam search is deterministic (length-penalized greedy over "
            "beams); do_sample=True with num_beams>1 is not supported — "
            "silent fallback would return identical 'sampled' outputs")
    b = first_logits.shape[0]
    k = num_beams
    max_new = dp.max_new_tokens
    eos = dp.eos_token_id
    vocab = first_logits.shape[-1]

    pk = cache.k[:, :, :prompt_pad]
    pv = cache.v[:, :, :prompt_pad]
    # prompt slots j < len_b are live; the right-pad tail is garbage
    kj = jnp.arange(prompt_pad)[None, :]
    prompt_bias = jnp.where(kj < prompt_lengths[:, None], 0.0,
                            NEG_INF)[:, None, None, :]
    gshape = (cfg.num_layers, b * k, max_new, cfg.num_kv_heads, cfg.head_dim)
    gk0 = jnp.zeros(gshape, cache.k.dtype)
    gv0 = jnp.zeros(gshape, cache.v.dtype)
    lengths_bk = jnp.repeat(prompt_lengths, k, axis=0)

    logp0 = jax.nn.log_softmax(first_logits.astype(jnp.float32), axis=-1)
    top0 = jax.lax.top_k(logp0, k)                       # (B, K)
    tok0 = top0[1].reshape(b * k).astype(jnp.int32)
    scores0 = top0[0].reshape(b * k)

    out0 = jnp.full((b * k, max_new), eos, jnp.int32)
    out0 = out0.at[:, 0].set(tok0)
    done0 = tok0 == eos

    def cond(st):
        step, done = st[0], st[6]
        # step+1 (not step): body(step) emits out[:, step+1]. With
        # `step < max_new` the final iteration scores and REORDERS beams by
        # a phantom max_new+1-th token whose output write is dropped —
        # returned hypotheses/scores would disagree with the emitted tokens
        # (and length-normalization would divide a (max_new+1)-token score
        # by max_new).
        return (step + 1 < max_new) & ~done.all()

    def body(st):
        step, gk, gv, out, scores, last_tok, done = st
        pos = (lengths_bk + step)[:, None]
        logits, gk, gv = _beam_forward(params, cfg, last_tok, pos, pk, pv,
                                       prompt_bias, gk, gv, step, k,
                                       lora, policy, axis_name=axis_name)
        logp = jax.nn.log_softmax(logits, axis=-1)
        # finished beams may only extend with EOS at no cost
        eos_only = jnp.full((vocab,), NEG_INF).at[eos].set(0.0)
        logp = jnp.where(done[:, None], eos_only[None, :], logp)

        cand = scores[:, None] + logp                    # (B*K, V)
        cand = cand.reshape(b, k * vocab)
        top = jax.lax.top_k(cand, k)                     # (B, K)
        new_scores = top[0].reshape(b * k)
        flat = top[1]                                    # (B, K) in [0, K*V)
        src_beam = flat // vocab                         # (B, K)
        new_tok = (flat % vocab).reshape(b * k).astype(jnp.int32)

        # reindex beam-major rows over the GENERATED region only: the prompt
        # KV is shared and untouched. global row = batch * K + src_beam
        src_rows = (jnp.arange(b)[:, None] * k + src_beam).reshape(b * k)
        gk = jnp.take(gk, src_rows, axis=1)
        gv = jnp.take(gv, src_rows, axis=1)
        out = jnp.take(out, src_rows, axis=0).at[:, step + 1].set(new_tok)
        done = jnp.take(done, src_rows, axis=0) | (new_tok == eos)
        return (step + 1, gk, gv, out, new_scores, new_tok, done)

    init = (jnp.asarray(0), gk0, gv0, out0, scores0, tok0, done0)
    _, _, _, out, scores, _, done = jax.lax.while_loop(cond, body, init)

    # pick the best beam per batch element, length-penalized (HF convention)
    eos_hit = out == eos
    gen_len = jnp.where(eos_hit.any(1), jnp.argmax(eos_hit, 1) + 1, max_new)
    norm = scores / (gen_len.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(norm.reshape(b, k), axis=1)        # (B,)
    rows = jnp.arange(b) * k + best
    return GenerationResult(jnp.take(out, rows, axis=0),
                            jnp.take(gen_len, rows, axis=0),
                            prompt_lengths)


def generate_beam(params: Dict, cfg: LlamaConfig, tokens: jax.Array,
                  lengths: jax.Array, dp: DecodeParams, num_beams: int,
                  img_embs: Optional[jax.Array] = None,
                  lora: Optional[Dict] = None, policy: DTypePolicy = FP32,
                  cache_len: Optional[int] = None,
                  axis_name: Optional[str] = None) -> GenerationResult:
    """Prefill once at batch B, then beam-decode at B*num_beams.

    cache_len is accepted for API compatibility with generate() but the
    split-cache design sizes its own buffers: prompt KV at the padded
    prompt length, generated KV at max_new_tokens.

    axis_name: TP mesh axis when called per-shard under shard_map with a
    head-sharded cfg (parallel/tp_serving.py)."""
    del cache_len
    t = tokens.shape[1]
    cache, last = prefill(params, cfg, tokens, lengths, t,
                          img_embs=img_embs, lora=lora, policy=policy,
                          axis_name=axis_name)
    return beam_decode(params, cfg, cache, last, lengths, t, dp, num_beams,
                       lora=lora, policy=policy, axis_name=axis_name)
