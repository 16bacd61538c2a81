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


def install_prefill(cache: KVCache, fresh: KVCache, lane=0) -> KVCache:
    """Copy fresh prefill K/V (L,B,T,H,D) into slots [0, T) of the cache,
    quantizing on the way when the cache is int8.

    ``lane``: batch offset (static or traced) — the single place that owns
    the int8 layout contract (token-flat reshape, bf16-rounded scales,
    dense-lane padding). The RingBatcher writes one lane's prefill into a
    multi-lane cache through this same helper (decode/continuous.py)."""
    if cache.quantized:
        from ..models.llama import pad_scale_lanes, quantize_kv

        # Quantize LAYER BY LAYER under a scan: quantize_kv over the whole
        # stacked (L,B,T,H,D) fresh KV materializes two full-size f32 temps
        # (the astype + the div) — 2x1.75G at serving shapes, which is what
        # OOM'ed the int8 batch-28 config by 59MB (v5e compile dump,
        # tools/bench_sweep.py --mem). Per-layer the temp is (B,T,H,D) f32
        # (~56MB) and the cache update aliases in place on the scan carry.
        def body(c, xs):
            i, k_l, v_l = xs                       # (B,T,H,D) one layer
            k8, ks = quantize_kv(k_l)
            v8, vs = quantize_kv(v_l)
            b, t = k8.shape[:2]
            k8 = k8.reshape(b, t, -1)              # token-flat (B,T,H*D)
            v8 = v8.reshape(b, t, -1)
            return KVCache(
                jax.lax.dynamic_update_slice(c.k, k8[None], (i, lane, 0, 0)),
                jax.lax.dynamic_update_slice(c.v, v8[None], (i, lane, 0, 0)),
                jax.lax.dynamic_update_slice(
                    c.k_scale, pad_scale_lanes(ks)[None], (i, lane, 0, 0)),
                jax.lax.dynamic_update_slice(
                    c.v_scale, pad_scale_lanes(vs)[None],
                    (i, lane, 0, 0))), None

        num_layers = fresh.k.shape[0]
        cache, _ = jax.lax.scan(
            body, cache, (jnp.arange(num_layers), fresh.k, fresh.v))
        return cache
    k = jax.lax.dynamic_update_slice(cache.k, fresh.k.astype(cache.k.dtype),
                                     (0, lane, 0, 0, 0))
    v = jax.lax.dynamic_update_slice(cache.v, fresh.v.astype(cache.v.dtype),
                                     (0, lane, 0, 0, 0))
    return KVCache(k, v)
