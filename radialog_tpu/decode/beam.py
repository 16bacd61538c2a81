"""Beam-search decoding (the reference's --num_beams path, test.py:346,
modeling_llama_imgemb.py:795-836 repeats dicoms across beams).

Design: after a single prefill at batch B, the KV cache is repeated to
B*K rows and the decode while_loop carries per-beam cumulative log-probs.
Each step selects the top-K continuations over the (K*V) candidate matrix per
batch element and reindexes the cache rows with a gather — a cache copy per
step, acceptable for this quality-over-throughput path (greedy is the eval
default, test.py:339-348). Finished beams (EOS) are frozen: their only
continuation is EOS at zero added log-prob, standard HF semantics with
length-normalized final scoring.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models.llama import (KVCache, LlamaConfig, decode_bias_static_slot,
                            llama_apply)
from ..ops.layers import DTypePolicy, FP32
from .engine import DecodeParams, GenerationResult, prefill
from .kvcache import bucket_length

NEG_INF = -1e30


def _repeat_beams(x: jax.Array, k: int) -> jax.Array:
    """(B, ...) -> (B*K, ...) with each row repeated K times (beam-major)."""
    return jnp.repeat(x, k, axis=0)


def beam_decode(params: Dict, cfg: LlamaConfig, cache: KVCache,
                first_logits: jax.Array, prompt_lengths: jax.Array,
                prompt_pad: int, dp: DecodeParams, num_beams: int,
                lora: Optional[Dict] = None,
                policy: DTypePolicy = FP32,
                length_penalty: float = 1.0) -> GenerationResult:
    b = first_logits.shape[0]
    k = num_beams
    s_max = cache.max_len
    max_new = dp.max_new_tokens
    eos = dp.eos_token_id
    vocab = first_logits.shape[-1]

    # expand state to B*K rows
    cache = KVCache(_repeat_beams(cache.k.transpose(1, 0, 2, 3, 4), k)
                    .transpose(1, 0, 2, 3, 4),
                    _repeat_beams(cache.v.transpose(1, 0, 2, 3, 4), k)
                    .transpose(1, 0, 2, 3, 4))
    lengths_bk = _repeat_beams(prompt_lengths, k)

    logp0 = jax.nn.log_softmax(first_logits.astype(jnp.float32), axis=-1)
    top0 = jax.lax.top_k(logp0, k)                       # (B, K)
    tok0 = top0[1].reshape(b * k).astype(jnp.int32)
    scores0 = top0[0].reshape(b * k)

    out0 = jnp.full((b * k, max_new), eos, jnp.int32)
    out0 = out0.at[:, 0].set(tok0)
    done0 = tok0 == eos

    def cond(st):
        step, done = st[0], st[5]
        return (step < max_new) & ~done.all()

    def body(st):
        step, cache, out, scores, last_tok, done = st
        pos = (lengths_bk + step)[:, None]
        bias = decode_bias_static_slot(lengths_bk, prompt_pad, step, s_max)
        logits, cache = llama_apply(params, cfg, last_tok[:, None], pos, bias,
                                    cache=cache, write_pos=prompt_pad + step,
                                    lora=lora, policy=policy)
        logp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1)
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

        # reindex beam-major rows: global row = batch * K + src_beam
        src_rows = (jnp.arange(b)[:, None] * k + src_beam).reshape(b * k)
        cache = KVCache(jnp.take(cache.k, src_rows, axis=1),
                        jnp.take(cache.v, src_rows, axis=1))
        out = jnp.take(out, src_rows, axis=0).at[:, step + 1].set(new_tok)
        done = jnp.take(done, src_rows, axis=0) | (new_tok == eos)
        return (step + 1, cache, out, new_scores, new_tok, done)

    init = (jnp.asarray(0), cache, out0, scores0, tok0, done0)
    _, cache, out, scores, _, done = jax.lax.while_loop(cond, body, init)

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
                  cache_len: Optional[int] = None) -> GenerationResult:
    """Prefill once at batch B, then beam-decode at B*num_beams."""
    t = tokens.shape[1]
    if cache_len is None:
        cache_len = bucket_length(t + dp.max_new_tokens)
    cache, last = prefill(params, cfg, tokens, lengths, cache_len,
                          img_embs=img_embs, lora=lora, policy=policy)
    return beam_decode(params, cfg, cache, last, lengths, t, dp, num_beams,
                       lora=lora, policy=policy)
