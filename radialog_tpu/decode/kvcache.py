"""KV-cache utilities for the autoregressive engine.

The cache is a pair of pre-allocated (L, B, S_max, H, D) bf16 arrays
(models/llama.py KVCache) — a static-shape design so the decode step compiles
once per (batch, S_max) bucket, replacing the reference's per-step
torch.cat cache growth (modeling_llama_imgemb.py:209-214) which would force
an XLA recompile every token.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.llama import KVCache


def bucket_length(n: int, buckets=(128, 256, 384, 512, 768, 1024, 1536, 2048)) -> int:
    """Smallest bucket >= n. Bounds the number of distinct compiles."""
    for b in buckets:
        if n <= b:
            return b
    return ((n + 127) // 128) * 128


def install_prefill(cache: KVCache, fresh: KVCache) -> KVCache:
    """Copy fresh prefill K/V (L,B,T,H,D) into slots [0, T) of the cache,
    quantizing on the way when the cache is int8."""
    if cache.quantized:
        from ..models.llama import quantize_kv
        k8, ks = quantize_kv(fresh.k)
        v8, vs = quantize_kv(fresh.v)
        # token-flat int8 layout: (L,B,T,H,D) -> (L,B,T,H*D)
        l, b, t = k8.shape[:3]
        k8 = k8.reshape(l, b, t, -1)
        v8 = v8.reshape(l, b, t, -1)
        return KVCache(
            jax.lax.dynamic_update_slice(cache.k, k8, (0, 0, 0, 0)),
            jax.lax.dynamic_update_slice(cache.v, v8, (0, 0, 0, 0)),
            jax.lax.dynamic_update_slice(cache.k_scale, ks, (0, 0, 0, 0)),
            jax.lax.dynamic_update_slice(cache.v_scale, vs, (0, 0, 0, 0)))
    k = jax.lax.dynamic_update_slice(cache.k, fresh.k.astype(cache.k.dtype),
                                     (0, 0, 0, 0, 0))
    v = jax.lax.dynamic_update_slice(cache.v, fresh.v.astype(cache.v.dtype),
                                     (0, 0, 0, 0, 0))
    return KVCache(k, v)
