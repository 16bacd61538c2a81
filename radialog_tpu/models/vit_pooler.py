"""Vision-transformer pooler fusing current + prior scan patch grids.

Re-implements BioViL-T's VisionTransformerPooler (biovil_t/transformer.py:
28-266): 3 pre-norm blocks at dim 256, 8 heads, mlp_ratio 1.0, with
DETR-style additive sine position embeddings + 2-series type embeddings.

Faithfulness notes:
  * The reference adds (pos+type) to the *normed* input and feeds that tensor
    as Q, K AND V (transformer.py:219-224 forward_as_mhsa) — replicated here.
  * QKV projections have no bias; the output projection does
    (transformer.py:155-160).
  * In RaDialog this module is constructed for checkpoint compatibility but
    never executes (no prior image is ever passed — SURVEY §7 quirk 2). It is
    fully functional here: pass ``previous`` to exercise it.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import mha
from ..ops.layers import (DTypePolicy, FP32, dropout, gelu_exact, layernorm,
                          layernorm_init, linear, linear_init, trunc_normal)


def sine_position_embedding(grid: Tuple[int, int], dim_per_axis: int = 128,
                            temperature: float = 10000.0,
                            scale: float = 2 * math.pi) -> jnp.ndarray:
    """DETR sine/cos table, (H*W, 2*dim_per_axis). Matches
    SinePositionEmbedding(normalize=True) (transformer.py:227-266)."""
    h, w = grid
    y = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=0)
    x = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=1)
    y = y / (y[-1:, :] + 1e-6) * scale
    x = x / (x[:, -1:] + 1e-6) * scale
    i = jnp.arange(dim_per_axis, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(i / 2) / dim_per_axis)
    px = x[:, :, None] / dim_t   # (h, w, D)
    py = y[:, :, None] / dim_t
    # interleave: pair k = (sin(v/T_{2k}), cos(v/T_{2k}))
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])], axis=-1).reshape(h, w, -1)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])], axis=-1).reshape(h, w, -1)
    return jnp.concatenate([py, px], axis=-1).reshape(h * w, 2 * dim_per_axis)


def _block_init(key, dim: int, mlp_hidden: int) -> Dict:
    ks = jax.random.split(key, 6)
    return {
        "norm1": layernorm_init(dim),
        "q": linear_init(ks[0], dim, dim, bias=False),
        "k": linear_init(ks[1], dim, dim, bias=False),
        "v": linear_init(ks[2], dim, dim, bias=False),
        "proj": linear_init(ks[3], dim, dim, bias=True),
        "norm2": layernorm_init(dim),
        "fc1": linear_init(ks[4], dim, mlp_hidden),
        "fc2": linear_init(ks[5], mlp_hidden, dim),
    }


def vit_pooler_init(key: jax.Array, dim: int = 256, grid: Tuple[int, int] = (14, 14),
                    num_blocks: int = 3) -> Dict:
    ks = jax.random.split(key, num_blocks + 1)
    return {
        "blocks": [_block_init(ks[i], dim, int(dim * 1.0)) for i in range(num_blocks)],
        "norm_post": layernorm_init(dim),
        "type_embed": trunc_normal(ks[-1], (2, dim), std=0.02),
        # pos table is a fixed buffer (non-persistent in the reference)
        "_pos": sine_position_embedding(grid, dim // 2),
    }


def _block(p, x, emb, num_heads: int, policy: DTypePolicy,
           train: bool, key) -> jax.Array:
    b, n, c = x.shape
    hd = c // num_heads
    xe = layernorm(p["norm1"], x, eps=1e-6) + emb
    q = linear(p["q"], xe, policy).reshape(b, n, num_heads, hd)
    k = linear(p["k"], xe, policy).reshape(b, n, num_heads, hd)
    v = linear(p["v"], xe, policy).reshape(b, n, num_heads, hd)
    o = mha(q, k, v).reshape(b, n, c)
    o = linear(p["proj"], o, policy)
    if train and key is not None:
        k1, k2, key = jax.random.split(key, 3)
        o = dropout(k1, o, 0.10, train)
    x = x + o
    h = gelu_exact(linear(p["fc1"], layernorm(p["norm2"], x, eps=1e-6), policy))
    h = linear(p["fc2"], h, policy)
    if train and key is not None:
        h = dropout(jax.random.split(key)[0], h, 0.10, train)
    return x + h


def vit_pooler_apply(p: Dict, current: jax.Array,
                     previous: Optional[jax.Array] = None,
                     num_heads: int = 8, policy: DTypePolicy = FP32,
                     train: bool = False, key=None) -> jax.Array:
    """current/previous: (B, H, W, C) patch grids -> fused current grid (B,H,W,C).

    Mirrors VisionTransformerPooler.forward (transformer.py:73-119): tokens =
    [current (+prior)], pos+type embeds added to Q/K/V inside each block,
    post-norm, return only the current image's tokens.
    """
    b, h, w, c = current.shape
    n = h * w
    x = current.reshape(b, n, c)
    pos = p["_pos"][None].astype(x.dtype)                    # (1, N, C)
    emb = pos + p["type_embed"][0][None, None, :]
    if previous is not None:
        xp = previous.reshape(b, n, c)
        x = jnp.concatenate([x, xp], axis=1)
        emb_prev = pos + p["type_embed"][1][None, None, :]
        emb = jnp.concatenate([emb, emb_prev], axis=1)
    if train and key is not None:
        key, kd = jax.random.split(key)
        x = dropout(kd, x, 0.10, train)
    for i, bp in enumerate(p["blocks"]):
        bk = None if key is None else jax.random.fold_in(key, i)
        x = _block(bp, x, emb, num_heads, policy, train, bk)
    x = layernorm(p["norm_post"], x, eps=1e-6)
    return x[:, :n].reshape(b, h, w, c)
