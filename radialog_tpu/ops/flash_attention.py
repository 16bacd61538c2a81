"""Pallas TPU flash attention (prefill / training).

Online-softmax attention over KV blocks: never materializes the (T, S) score
matrix, so long-prompt prefill and LoRA-training attention stay in VMEM.
Masks are computed IN-kernel from per-sequence lengths + a causal flag —
callers don't build (B,1,T,S) bias tensors (which at B=12, T=S=600 would be
17MB of HBM traffic per layer).

Matches ops/attention.mha numerics: fp32 running max/sum, bf16 MXU matmuls.
Decode (T=1) stays on the XLA path — its cost is KV streaming, which XLA
already handles at speed of light.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(lengths_ref,            # scalar prefetch: (B,) int32
            q_ref, k_ref, v_ref,    # (1, bq, D), (1, bk, D), (1, bk, D)
            o_ref,                  # (1, bq, D)
            m_ref, l_ref, acc_ref,  # VMEM scratch
            *, causal: bool, scale: float, bq: int, bk: int,
            heads: int, kv_len: int):
    kv_i = pl.program_id(3)

    @pl.when(kv_i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = pl.program_id(0)
    q_i = pl.program_id(2)
    length = lengths_ref[b]

    q = q_ref[0, 0]                                # (bq, D)
    k = k_ref[0, 0]                                # (bk, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale

    q_pos = q_i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    k_pos = kv_i * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    mask = k_pos < length
    if causal:
        mask &= k_pos <= q_pos
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ref[:]                              # (bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                         # (bq, bk)
    l_ref[:] = l_ref[:] * alpha + p.sum(axis=1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kv_i == pl.num_programs(3) - 1)
    def _finish():
        # rows with no valid kv (padding queries) produce l=0: emit zeros
        l = l_ref[:]
        o_ref[0, 0] = jnp.where(l > 0, acc_ref[:] / jnp.maximum(l, 1e-30),
                             0.0).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("causal", "scale", "bq", "bk", "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    lengths: jax.Array, causal: bool = True,
                    scale: float | None = None, bq: int = 256, bk: int = 256,
                    interpret: bool = False) -> jax.Array:
    """q: (B, T, H, D); k/v: (B, S, H, D); lengths: (B,) valid kv lengths.

    Returns (B, T, H, D) in q.dtype. Queries beyond a sequence's length
    attend the valid prefix (same as mha + prefill_bias; those rows are never
    read under right-padding).
    """
    b, t, h, d = q.shape
    s_len = k.shape[1]
    scale = float(scale if scale is not None else d ** -0.5)
    bq = min(bq, t)
    bk = min(bk, s_len)
    # explicit zero padding to block multiples: implicit edge-tile padding is
    # uninitialized (NaN in interpret mode) and 0-weight x NaN = NaN in p@v
    tpad = (-t) % bq
    spad = (-s_len) % bk
    if tpad:
        q = jnp.pad(q, ((0, 0), (0, tpad), (0, 0), (0, 0)))
    if spad:
        k = jnp.pad(k, ((0, 0), (0, spad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, spad), (0, 0), (0, 0)))
    t_p, s_p = t + tpad, s_len + spad

    # (B, H, T, D) layout so the kernel sees one (T, D) panel per (b, h)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    grid = (b, h, t_p // bq, s_p // bk)
    kernel = functools.partial(_kernel, causal=causal, scale=scale, bq=bq,
                               bk=bk, heads=h, kv_len=s_len)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, d),
                             lambda bi, hi, qi, ki, lens: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, bk, d),
                             lambda bi, hi, qi, ki, lens: (bi, hi, ki, 0)),
                pl.BlockSpec((1, 1, bk, d),
                             lambda bi, hi, qi, ki, lens: (bi, hi, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, d),
                                   lambda bi, hi, qi, ki, lens: (bi, hi, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * s_len * d,
            bytes_accessed=(qt.size + kt.size + vt.size + qt.size) * 2,
            transcendentals=b * h * t * s_len),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qt, kt, vt)
    return out.transpose(0, 2, 1, 3)[:, :t]
