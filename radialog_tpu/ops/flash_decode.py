"""Pallas TPU flash-decode over an int8 KV cache (single-token attention).

This kernel streams the int8 K/V slabs of the FULL stacked cache in their
native (L, B, S, H, D) layout (contiguous per-(b, s-block) DMAs at a static
layer offset), dequantizes + reduces on the VPU, and applies the
online-softmax update per KV block.

Measured status (v5e, B=24, S=512): ~270GB/s — faster than XLA's batched
int8 attention (~150GB/s) but below XLA's bf16 attention (~460GB/s), because
the per-element int8 dequant/multiply/reduce is VPU-throughput-bound. int8
KV is therefore a CAPACITY feature today (half the cache memory -> batch
24-32 beside the int8 weights on one 16GB chip); matching bf16 bandwidth
needs the D-reduction on the int8 MXU (block-diagonal q trick) — future
work. The bf16-KV batch-12 path remains the serving default.

Masking matches decode_bias_static_slot (models/llama.py): kv slot j is
valid iff j < length_b (prefill region) or prompt_pad <= j <= prompt_pad+step
(generated region). lengths/prompt_pad/step arrive via scalar prefetch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(lens_ref,                       # scalar prefetch: (B+2,) int32
            q8_ref, qs_ref, k8_ref, ks_ref, v8_ref, vs_ref,
            o_ref,
            m_ref, l_ref, acc_ref,
            *, bs: int, heads: int, head_dim: int, scale: float):
    s_i = pl.program_id(1)

    @pl.when(s_i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = pl.program_id(0)
    length = lens_ref[b]
    prompt_pad = lens_ref[pl.num_programs(0)]
    step = lens_ref[pl.num_programs(0) + 1]

    # k8/v8 block: (1, bs, H, D) int8 -> (bs, H*D) view per head via slices
    q8 = q8_ref[0]                           # (H, D) int8
    qs = qs_ref[0]                           # (H, 1) f32

    # 2D iota (TPU requires >=2D); valid mask directly in (bs, H) shape
    s_pos = s_i * bs + jax.lax.broadcasted_iota(jnp.int32, (bs, heads), 0)
    valid = (s_pos < length) | ((s_pos >= prompt_pad)
                                & (s_pos <= prompt_pad + step))

    m_prev = m_ref[:]                        # (1, H)
    # VPU path: per-head M=1 MXU matmuls are latency-bound (measured
    # ~180GB/s); elementwise multiply + lane reduction keeps the VPU busy at
    # the DMA rate instead.
    kf = k8_ref[0, 0].astype(jnp.float32)    # (bs, H, D)
    qf = q8.astype(jnp.float32) * qs         # (H, D) dequantized q
    scores = jnp.sum(qf[None] * kf, axis=-1)             # (bs, H)
    scores = scores * ks_ref[0, 0] * scale               # x k scales (bs, H)
    scores = jnp.where(valid, scores, NEG_INF)

    m_cur = jnp.max(scores, axis=0, keepdims=True)       # (1, H)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)                          # (bs, H)
    p = jnp.where(valid, p, 0.0)
    l_ref[:] = l_ref[:] * alpha + p.sum(axis=0, keepdims=True)
    m_ref[:] = m_new

    vf = v8_ref[0, 0].astype(jnp.float32)    # (bs, H, D)
    pv = p * vs_ref[0, 0]                    # (bs, H) with v scales folded
    block_o = jnp.sum(pv[:, :, None] * vf, axis=0)       # (H, D)
    acc_ref[:] = acc_ref[:] * alpha.T  # (1,H)->(H,1) broadcast
    acc_ref[:] += block_o

    @pl.when(s_i == pl.num_programs(1) - 1)
    def _finish():
        l = l_ref[:]                          # (1, H)
        o_ref[0] = (acc_ref[:] / jnp.maximum(l.T, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("layer_idx", "scale", "bs",
                                             "interpret"))
def flash_decode_int8(q: jax.Array, k8: jax.Array, ks: jax.Array,
                      v8: jax.Array, vs: jax.Array, lengths: jax.Array,
                      prompt_pad, step, layer_idx: int = 0,
                      scale: float | None = None,
                      bs: int = 128, interpret: bool = False) -> jax.Array:
    """Single-token attention over one layer of a FULL stacked int8 cache.

    q: (B, H, D) float; k8/v8: (L, B, S, H, D) int8; ks/vs: (L, B, S, H) f32;
    lengths: (B,) int32; prompt_pad/step: int32 scalars (static-slot mask);
    layer_idx: STATIC layer index, baked into the BlockSpec index maps — the
    kernel DMAs blocks straight out of the stacked cache. (Slicing the layer
    in XLA first would materialize a 100MB copy per operand per step, since
    custom calls cannot consume fused slices.)
    Returns (B, H, D) in q.dtype.
    """
    b, h, d = q.shape
    s_len = k8.shape[2]
    scale = float(scale if scale is not None else d ** -0.5)
    assert s_len % bs == 0, (s_len, bs)
    li = layer_idx

    qf = q.astype(jnp.float32)
    qscale = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1), 1e-8) / 127.0  # (B,H)
    q8 = jnp.clip(jnp.round(qf / qscale[..., None]), -127, 127).astype(jnp.int8)

    scalars = jnp.concatenate([
        lengths.astype(jnp.int32),
        jnp.asarray([prompt_pad], jnp.int32).reshape(1),
        jnp.asarray([step], jnp.int32).reshape(1)])

    grid = (b, s_len // bs)
    kernel = functools.partial(_kernel, bs=bs, heads=h, head_dim=d,
                               scale=scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, h, d), lambda bi, si, sc: (bi, 0, 0)),
                pl.BlockSpec((1, h, 1), lambda bi, si, sc: (bi, 0, 0)),
                pl.BlockSpec((1, 1, bs, h, d),
                             lambda bi, si, sc: (li, bi, si, 0, 0)),
                pl.BlockSpec((1, 1, bs, h), lambda bi, si, sc: (li, bi, si, 0)),
                pl.BlockSpec((1, 1, bs, h, d),
                             lambda bi, si, sc: (li, bi, si, 0, 0)),
                pl.BlockSpec((1, 1, bs, h), lambda bi, si, sc: (li, bi, si, 0)),
            ],
            out_specs=pl.BlockSpec((1, h, d), lambda bi, si, sc: (bi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, h), jnp.float32),
                pltpu.VMEM((1, h), jnp.float32),
                pltpu.VMEM((h, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_len * d,
            bytes_accessed=2 * b * s_len * h * d,
            transcendentals=b * h * s_len),
        interpret=interpret,
    )(scalars, q8, qscale[..., None], k8, ks, v8, vs)
    return out
