"""Pallas TPU flash attention (prefill / training) — forward AND backward.

Online-softmax attention over KV blocks: never materializes the (T, S) score
matrix, so long-prompt prefill and LoRA-training attention stay in VMEM.
Masks are computed IN-kernel from per-sequence lengths + a causal flag —
callers don't build (B,1,T,S) bias tensors (which at B=12, T=S=600 would be
17MB of HBM traffic per layer).

Matches ops/attention.mha numerics: fp32 running max/sum, input-dtype MXU
matmuls. Decode (T=1) stays on the XLA path — its cost is KV streaming, which
XLA already handles at speed of light.

The kernel is DIFFERENTIABLE via jax.custom_vjp (FlashAttention-2-style
backward): the forward saves per-row logsumexp stats (lane-broadcast to 128,
the same layout trick as jax's reference TPU kernel) and two backward kernels
recompute the probabilities blockwise —

  dq pass  (grid ..., q_blocks, kv_blocks): p = exp(s - lse);
           ds = p * (do @ v^T - delta) * scale; dq += ds @ k
  dkv pass (grid ..., kv_blocks, q_blocks): dv += p^T @ do; dk += ds^T @ q

where delta = rowsum(do * o) (computed in XLA — one fused elementwise pass).
No (T, S) tensor is ever materialized in the backward either, so training
forwards can route through this kernel (train/steps.py lora_loss_fn).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LSE_DEAD = 1e30      # lse sentinel for rows with no valid kv: exp(s - 1e30)=0
STATS_LANES = 128    # lse/delta are stored lane-broadcast (Mosaic cannot tile
#                      a (bq, 1) operand block; 128 lanes of identical values
#                      tile cleanly to any 128-multiple score block)


def _fwd_kernel(lengths_ref,            # scalar prefetch: (B,) int32
                q_ref, k_ref, v_ref,    # (1, 1, bq, D), (1, 1, bk, D) x2
                *refs,                  # o [, lse], then VMEM scratch
                causal: bool, scale: float, bq: int, bk: int,
                with_lse: bool):
    if with_lse:
        o_ref, lse_ref, m_ref, l_ref, acc_ref = refs
    else:
        o_ref, m_ref, l_ref, acc_ref = refs
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
        if with_lse:
            lse = jnp.where(l > 0,
                            m_ref[:] + jnp.log(jnp.maximum(l, 1e-30)),
                            LSE_DEAD)              # (bq, 1)
            lse_ref[0, 0] = jnp.broadcast_to(lse, (bq, STATS_LANES))


def _stats_block(ref, bq: int, bk: int):
    """Expand a lane-broadcast (bq, 128) stats block to (bq, bk)."""
    x = ref[0, 0]
    if bk % STATS_LANES == 0:
        reps = bk // STATS_LANES
        return x if reps == 1 else jnp.tile(x, (1, reps))
    return jnp.broadcast_to(x[:, :1], (bq, bk))


def _recompute_p(q, k, lse_t, lengths_ref, b, q_i, kv_i, causal, scale,
                 bq, bk):
    """Blockwise softmax probabilities from the saved logsumexp stats."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    q_pos = q_i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    k_pos = kv_i * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    mask = k_pos < lengths_ref[b]
    if causal:
        mask &= k_pos <= q_pos
    s = jnp.where(mask, s, NEG_INF)
    return jnp.exp(s - lse_t)                      # normalized probabilities


def _dq_kernel(lengths_ref,
               q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_acc,
               *, causal: bool, scale: float, bq: int, bk: int):
    kv_i = pl.program_id(3)

    @pl.when(kv_i == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    b = pl.program_id(0)
    q_i = pl.program_id(2)
    live = kv_i * bk < lengths_ref[b]              # block has valid keys
    if causal:
        live &= kv_i * bk <= q_i * bq + (bq - 1)   # block not fully masked

    @pl.when(live)
    def _block():
        q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
        lse_t = _stats_block(lse_ref, bq, bk)
        delta_t = _stats_block(delta_ref, bq, bk)
        p = _recompute_p(q, k, lse_t, lengths_ref, b, q_i, kv_i,
                         causal, scale, bq, bk)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta_t) * scale).astype(q_ref.dtype)
        dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kv_i == pl.num_programs(3) - 1)
    def _finish():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _dkv_kernel(lengths_ref,
                q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc,
                *, causal: bool, scale: float, bq: int, bk: int):
    q_i = pl.program_id(3)

    @pl.when(q_i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    b = pl.program_id(0)
    kv_i = pl.program_id(2)
    live = kv_i * bk < lengths_ref[b]
    if causal:
        live &= q_i * bq + (bq - 1) >= kv_i * bk

    @pl.when(live)
    def _block():
        q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
        lse_t = _stats_block(lse_ref, bq, bk)
        delta_t = _stats_block(delta_ref, bq, bk)
        p = _recompute_p(q, k, lse_t, lengths_ref, b, q_i, kv_i,
                         causal, scale, bq, bk)
        # dv += p^T @ do; dk += ds^T @ q — contractions over the q dim, no
        # explicit transpose (dot_general contracts dim 0 of both operands)
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta_t) * scale).astype(q_ref.dtype)
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(q_i == pl.num_programs(3) - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _fwd_call(qt, kt, vt, lengths, causal, scale, bq, bk, interpret,
              with_lse):
    """qt: (B, H, Tp, D); kt/vt: (B, H, Sp, D), block-multiple padded."""
    b, h, t_p, d = qt.shape
    s_p = kt.shape[2]
    grid = (b, h, t_p // bq, s_p // bk)
    kernel = functools.partial(_fwd_kernel, causal=causal, scale=scale,
                               bq=bq, bk=bk, with_lse=with_lse)
    out_shape = [jax.ShapeDtypeStruct(qt.shape, qt.dtype)]
    out_specs = [pl.BlockSpec((1, 1, bq, d),
                              lambda bi, hi, qi, ki, lens: (bi, hi, qi, 0))]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, h, t_p, STATS_LANES),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, 1, bq, STATS_LANES),
            lambda bi, hi, qi, ki, lens: (bi, hi, qi, 0)))
    res = pl.pallas_call(
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
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_p * s_p * d,
            bytes_accessed=(qt.size + kt.size + vt.size + qt.size) * 2,
            transcendentals=b * h * t_p * s_p),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qt, kt, vt)
    return res if with_lse else (res[0], None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(qt, kt, vt, lengths, causal, scale, bq, bk, interpret):
    out, _ = _fwd_call(qt, kt, vt, lengths, causal, scale, bq, bk,
                       interpret, with_lse=False)
    return out


def _flash_fwd(qt, kt, vt, lengths, causal, scale, bq, bk, interpret):
    out, lse = _fwd_call(qt, kt, vt, lengths, causal, scale, bq, bk,
                         interpret, with_lse=True)
    return out, (qt, kt, vt, lengths, out, lse)


def _flash_bwd(causal, scale, bq, bk, interpret, res, do):
    qt, kt, vt, lengths, out, lse = res
    b, h, t_p, d = qt.shape
    s_p = kt.shape[2]
    # delta = rowsum(do * o): one fused XLA pass, lane-broadcast like lse
    delta = (do.astype(jnp.float32) * out.astype(jnp.float32)).sum(-1)
    delta = jnp.broadcast_to(delta[..., None], (b, h, t_p, STATS_LANES))
    lens = lengths.astype(jnp.int32)

    stats_spec = pl.BlockSpec((1, 1, bq, STATS_LANES),
                              lambda bi, hi, qi, ki, lens: (bi, hi, qi, 0))
    q_spec = pl.BlockSpec((1, 1, bq, d),
                          lambda bi, hi, qi, ki, lens: (bi, hi, qi, 0))
    k_spec = pl.BlockSpec((1, 1, bk, d),
                          lambda bi, hi, qi, ki, lens: (bi, hi, ki, 0))
    semantics = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"))
    cost = pl.CostEstimate(
        flops=5 * 2 * b * h * t_p * s_p * d,
        bytes_accessed=(qt.size + kt.size + vt.size) * 4,
        transcendentals=b * h * t_p * s_p)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, causal=causal, scale=scale,
                          bq=bq, bk=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, t_p // bq, s_p // bk),
            in_specs=[q_spec, k_spec, k_spec, q_spec, stats_spec, stats_spec],
            out_specs=[q_spec],
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct(qt.shape, qt.dtype)],
        compiler_params=semantics,
        cost_estimate=cost,
        interpret=interpret,
    )(lens, qt, kt, vt, do, lse, delta)[0]

    # dkv pass: grid iterates kv blocks (parallel) x q blocks (accumulated);
    # index maps swap the roles of grid dims 2/3 relative to the dq pass
    qi_spec = pl.BlockSpec((1, 1, bq, d),
                           lambda bi, hi, ki, qi, lens: (bi, hi, qi, 0))
    ki_spec = pl.BlockSpec((1, 1, bk, d),
                           lambda bi, hi, ki, qi, lens: (bi, hi, ki, 0))
    stats_qi = pl.BlockSpec((1, 1, bq, STATS_LANES),
                            lambda bi, hi, ki, qi, lens: (bi, hi, qi, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, causal=causal, scale=scale,
                          bq=bq, bk=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, s_p // bk, t_p // bq),
            in_specs=[qi_spec, ki_spec, ki_spec, qi_spec, stats_qi, stats_qi],
            out_specs=[ki_spec, ki_spec],
            scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                            pltpu.VMEM((bk, d), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct(kt.shape, kt.dtype),
                   jax.ShapeDtypeStruct(vt.shape, vt.dtype)],
        compiler_params=semantics,
        cost_estimate=cost,
        interpret=interpret,
    )(lens, qt, kt, vt, do, lse, delta)

    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    lengths: jax.Array, causal: bool = True,
                    scale: float | None = None, bq: int = 256, bk: int = 256,
                    interpret: bool = False) -> jax.Array:
    """q: (B, T, H, D); k/v: (B, S, H, D); lengths: (B,) valid kv lengths.

    Returns (B, T, H, D) in q.dtype. Queries beyond a sequence's length
    attend the valid prefix (same as mha + prefill_bias; those rows are never
    read under right-padding). Differentiable in q/k/v (custom FA2-style
    backward above); the pad/transpose wrappers below autodiff normally.

    Thin non-jitted wrapper: the RADIALOG_FLASH_BQ/BK env knobs (block-size
    A/B sweeps without code edits, tools/bench_train.py --flash) are resolved
    HERE so the values become the static args keying the jit cache — reading
    them inside the jitted body would silently reuse an executable built with
    a stale block size after the env changes mid-process.
    """
    bq = int(os.environ.get("RADIALOG_FLASH_BQ", bq))
    bk = int(os.environ.get("RADIALOG_FLASH_BK", bk))
    return _flash_attention_jit(q, k, v, lengths, causal, scale, bq, bk,
                                interpret)


@functools.partial(jax.jit,
                   static_argnames=("causal", "scale", "bq", "bk", "interpret"))
def _flash_attention_jit(q: jax.Array, k: jax.Array, v: jax.Array,
                         lengths: jax.Array, causal: bool = True,
                         scale: float | None = None, bq: int = 256,
                         bk: int = 256, interpret: bool = False) -> jax.Array:
    b, t, h, d = q.shape
    s_len = k.shape[1]
    scale = float(scale if scale is not None else d ** -0.5)
    # block size trades MXU tile size against padding waste — e.g.
    # cutoff-600 training pads to 768 at 256 but only 640 at 128
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

    # (B, H, T, D) layout so the kernel sees one (T, D) panel per (b, h)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    out = _flash(qt, kt, vt, lengths, causal, scale, bq, bk, interpret)
    return out.transpose(0, 2, 1, 3)[:, :t]
