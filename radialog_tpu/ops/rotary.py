"""Rotary position embeddings (LLaMA flavor).

Matches the reference's LlamaRotaryEmbedding + rotate_half + apply scheme
(modeling_llama_imgemb.py:96-160): head_dim split in halves (NOT interleaved),
cos/sin tables indexed by absolute position ids.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_tables(head_dim: int, max_len: int, theta: float = 10000.0):
    """Precompute (cos, sin) tables of shape (max_len, head_dim)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                       # (L, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)       # (L, D) — llama "half" layout
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               positions: jax.Array) -> jax.Array:
    """Apply rotary embedding.

    x:         (B, T, H, D)
    cos/sin:   (max_len, D)
    positions: (B, T) absolute position ids (reference computes these as
               cumsum(attention_mask)-1, modeling_llama_imgemb.py:805-810).
    """
    c = jnp.take(cos, positions, axis=0)[:, :, None, :]  # (B,T,1,D)
    s = jnp.take(sin, positions, axis=0)[:, :, None, :]
    xf = x.astype(jnp.float32)
    out = xf * c + _rotate_half(xf) * s
    return out.astype(x.dtype)
