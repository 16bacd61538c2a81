"""Multi-head attention primitives.

``mha`` is the XLA-fused baseline used everywhere (BERT/Q-Former/ViT pooler,
LLaMA prefill + decode). The Pallas flash kernel (ops/flash_attention.py)
overrides the prefill path on TPU for long sequences; both produce identical
math: scores in fp32, additive bias masks, softmax in fp32.

Replaces the reference's per-model attention implementations
(Qformer.py:228-276, modeling_llama_imgemb.py:162-250, transformer.py:131-185).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large negative, safe in bf16/fp32 softmax


def mha(q: jax.Array, k: jax.Array, v: jax.Array,
        bias: Optional[jax.Array] = None,
        scale: Optional[float] = None) -> jax.Array:
    """Batched multi-head attention.

    q: (B, T, H, D); k, v: (B, S, H, D); bias: broadcastable to (B, H, T, S).
    Returns (B, T, H, D) in q.dtype. Scores + softmax are computed in fp32
    (the MXU emits fp32 accumulations for bf16 inputs).
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def mha_shared_prefix(q: jax.Array, k0: jax.Array, v0: jax.Array,
                      k1: jax.Array, v1: jax.Array,
                      bias1: Optional[jax.Array] = None,
                      scale: Optional[float] = None) -> jax.Array:
    """Attention over [SHARED prefix | per-sequence region] without ever
    materializing a per-sequence copy of the prefix K/V.

    q (B,T,H,D); k0/v0 (P0,H,D) — one prefix, shared by every batch row (a
    literal common token prefix, so it is unconditionally attendable: every
    query position is >= P0 and causality over it is trivial); k1/v1
    (B,S1,H,D) per-sequence; bias1 broadcastable to (B,H,T,S1) masks only
    the per-sequence region.

    Softmax runs over the CONCATENATED scores, so the result equals
    ``mha(q, concat([prefix, own]), ...)`` exactly up to the f32 summation
    split at the P0 boundary in the value pass (two einsums instead of
    one). The point is HBM traffic: a decode step reads the prefix K/V
    bytes ONCE instead of B times (docs/PERF.md — serving is
    bandwidth-bound, and the prefix is ~20-45%% of the live cache for the
    RaDialog report prompt).
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    s0 = jnp.einsum("bthd,phd->bhtp", q, k0,
                    preferred_element_type=jnp.float32) * scale
    s1 = jnp.einsum("bthd,bshd->bhts", q, k1,
                    preferred_element_type=jnp.float32) * scale
    if bias1 is not None:
        s1 = s1 + bias1.astype(jnp.float32)
    p = jax.nn.softmax(jnp.concatenate([s0, s1], axis=-1), axis=-1)
    p0, p1 = p[..., : k0.shape[0]], p[..., k0.shape[0]:]
    out = (jnp.einsum("bhtp,phd->bthd", p0.astype(v0.dtype), v0,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bhts,bshd->bthd", p1.astype(v1.dtype), v1,
                        preferred_element_type=jnp.float32))
    return out.astype(q.dtype)


def causal_mask_bias(q_len: int, kv_len: int, offset: int = 0,
                     dtype=jnp.float32) -> jax.Array:
    """(1,1,q_len,kv_len) additive causal bias. Query i (at absolute position
    offset+i) may attend kv j iff j <= offset + i."""
    qi = jnp.arange(q_len)[:, None] + offset
    kj = jnp.arange(kv_len)[None, :]
    allowed = kj <= qi
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[None, None]


def padding_mask_bias(valid: jax.Array, dtype=jnp.float32) -> jax.Array:
    """valid: (B, S) bool/int — 1 for real tokens. Returns (B,1,1,S) bias."""
    return jnp.where(valid.astype(bool), 0.0, NEG_INF).astype(dtype)[:, None, None, :]


def combine_bias(*biases: Optional[jax.Array]) -> Optional[jax.Array]:
    out = None
    for b in biases:
        if b is None:
            continue
        out = b if out is None else out + b
    return out
