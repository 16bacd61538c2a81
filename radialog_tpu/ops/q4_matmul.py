"""Pallas TPU kernel: W4A8 matmul over nibble-packed int4 weights.

The opt-in 4-bit weight mode for serving (capacity/speed; the lossless-er
W8A8 path in q8_matmul.py stays the default). Decode reads every weight
byte each step, so int4 halves the dominant HBM term: measured on the 32×
(wqkv|wo|gateup|down) Vicuna-7B weight sweep (tools/microbench_w4.py),
8.3 ms for 3.24 GB int4 vs 10.6 ms for 6.47 GB int8 — ~22 % faster per
step even though the VPU nibble-unpack keeps it off the DMA
speed-of-light.

Design notes (deltas from q8_matmul.py):

  * Weights are packed two-per-byte along K: byte b of a (bk/2, bn) tile
    holds w[2k] in the low nibble, w[2k+1] in the high nibble, values in
    [-7, 7]. Activation rows are deinterleaved (even/odd K) OUTSIDE the
    kernel so the in-kernel unpack feeds straight int8 MXU matmuls.
  * Mosaic cannot legalize i8 vector shifts (arith.shli on vector<i8>), so
    the unpack runs in i32: wi = sign-extended byte, wi >> 4 IS the signed
    high nibble, ((wi & 15) ^ 8) - 8 sign-extends the low one.
  * Scales are GROUP-WISE over K (default group 512) — at 4 bits the
    full-K per-channel dynamic range costs real fidelity (measured max-rel
    ~0.16 per-channel vs ~0.07 at group 512 on N(0, 0.02) weights + int8
    activations).
  * Group size is DECOUPLED from the DMA block: shrinking bk to the group
    (bk 512) measured 9.6 ms/sweep — the 4× finer grid loses DMA
    efficiency. Instead the kernel keeps the big (bk 2048) block and runs
    one int8 dot + f32 rescale per SUB-GROUP of the block into an f32
    accumulator: same DMA shape as the int8 kernel, group-wise math.
  * Default packing is ASYMMETRIC with an MSE-optimal clip search (round-4
    quality work, docs/PERF.md "W4A8 quality"): per (group, out-channel)
    the grid is dequant = s*q + m with q in [-8, 7] (all 16 codes; the old
    symmetric absmax grid wastes one code and its step is set by the group
    outlier). s and m come from a host-side search over clip ratios that
    minimizes the group's quantization MSE — for near-Gaussian weight
    groups the optimum clips at ~2.8 sigma instead of absmax ~3.5 sigma.
    The kernel folds the offset in exactly: y += (sum_g x8) * m per group,
    i.e. ONE extra per-group activation row-sum (VPU reduce) and a rank-1
    f32 update — the int8 MXU dots are unchanged. mode="sym" keeps the old
    symmetric grid (goff=None; kernel skips the correction).

No reference counterpart (the reference serves fp16 on GPU;
bitsandbytes int8 is training-only there — finetune.py:309).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .q8_matmul import pick_bk, quantize_act

TILE_BN = 1024
GROUP = 512             # K rows per scale group (divides every bk choice)


@jax.tree_util.register_pytree_node_class
class PackedQ4:
    """Pytree for a nibble-packed int4 weight: w_t (kt, nt, bk/2, bn) int8,
    gscale (K_padded/group, nt*bn) f32, optional bias; the true output
    width n and the group size are static aux data. goff (same shape as
    gscale, or None for the symmetric grid) is the per-group dequant
    offset m of the asymmetric grid w ~= gscale*q + goff."""

    def __init__(self, w_t, gscale, n: int, group: int = GROUP, b=None,
                 goff=None):
        self.w_t = w_t
        self.gscale = gscale
        self.n = n
        self.group = group
        self.b = b
        self.goff = goff

    def tree_flatten(self):
        return (self.w_t, self.gscale, self.b, self.goff), (self.n, self.group)

    @classmethod
    def tree_unflatten(cls, aux, children):
        w_t, gscale, b, goff = children
        n, group = aux
        return cls(w_t, gscale, n, group, b, goff)

    def __repr__(self):
        shape = getattr(self.w_t, "shape", None)
        mode = "sym" if self.goff is None else "asym"
        return (f"PackedQ4(w_t={shape}, n={self.n}, group={self.group}, "
                f"{mode})")


def _fit_asym_grid(grouped: np.ndarray, search: int):
    """MSE-optimal clipped asymmetric 4-bit grid per (group, out-channel).

    grouped: (G, group, N) f32. The grid is dequant = s*q + m, q in [-8, 7]
    (all 16 codes). Candidates shrink the [min, max] range symmetrically
    about its midpoint by ratios r; per (g, n) the r with the smallest
    quantization MSE wins — for Gaussian groups the optimum clips at
    ~0.8*absmax (~2.8 sigma), trading a few clipped outliers for a ~30%
    finer step everywhere else. Returns (gscale (G,N), goff (G,N),
    w_q (G, group, N) int8 in [-8, 7])."""
    lo = grouped.min(axis=1)
    hi = grouped.max(axis=1)
    mid = 0.5 * (lo + hi)
    half = 0.5 * (hi - lo)
    best_mse = best_s = best_m = None
    for r in np.linspace(0.68, 1.0, search, dtype=np.float32):
        s = np.maximum(2.0 * r * half / 15.0, 1e-8).astype(np.float32)
        m = (mid - r * half + 8.0 * s).astype(np.float32)  # q=-8 -> clip_lo
        q = np.clip(np.round((grouped - m[:, None, :]) / s[:, None, :]),
                    -8, 7)
        err = s[:, None, :] * q + m[:, None, :] - grouped
        mse = np.mean(err * err, axis=1)
        if best_mse is None:
            best_mse, best_s, best_m = mse, s, m
        else:
            better = mse < best_mse
            best_s = np.where(better, s, best_s)
            best_m = np.where(better, m, best_m)
            best_mse = np.minimum(mse, best_mse)
    w_q = np.clip(np.round((grouped - best_m[:, None, :])
                           / best_s[:, None, :]), -8, 7).astype(np.int8)
    return best_s, best_m, w_q


def pack_q4(w: np.ndarray, bn: int = TILE_BN, bk: int = None,
            group: int = GROUP, b=None, mode: str = "asym",
            search: int = 9) -> PackedQ4:
    """(K, N) float (numpy, host) -> PackedQ4. K and N are zero-padded to
    bk/bn multiples (zero rows/cols are inert; padded groups get scale
    ~0).

    mode="asym" (default): MSE-optimal clipped asymmetric grid (goff set;
    ~26% lower weight RMSE than symmetric absmax on Gaussian weights —
    docs/PERF.md "W4A8 quality"). mode="sym": the round-3 symmetric absmax
    grid, q in [-7, 7], goff=None (the kernel then skips the offset
    correction). ``search`` = clip-ratio candidates for the asym fit (the
    fit is a one-time host cost at pack time, ~1 s per 4096x11008 matrix)."""
    w = np.asarray(w, np.float32)
    k, n = w.shape
    if bk is None:
        bk = pick_bk(k)
    if bk % group:
        # tests use tiny bk; shrink the group to the block
        group = bk
    npad = (-n) % bn
    kpad = (-k) % bk
    if npad or kpad:
        w = np.pad(w, ((0, kpad), (0, npad)))
    kp, np_ = k + kpad, n + npad
    kt = kp // bk
    grouped = w.reshape(kp // group, group, np_)
    if mode == "asym":
        gscale, goff, w_q = _fit_asym_grid(grouped, search)
        gscale = gscale.astype(np.float32)
        goff = goff.astype(np.float32)
    elif mode == "sym":
        gscale = np.maximum(np.abs(grouped).max(axis=1) / 7.0,
                            1e-8).astype(np.float32)      # (kp/group, np_)
        goff = None
        w_q = np.clip(np.round(grouped / gscale[:, None, :]),
                      -7, 7).astype(np.int8)
    else:
        raise ValueError(f"mode must be 'asym' or 'sym', got {mode!r}")
    w_q = w_q.reshape(kp, np_)
    lo = w_q[0::2]
    hi = w_q[1::2]
    packed = ((hi.astype(np.uint8) << 4) | (lo.astype(np.uint8) & 0xF)
              ).astype(np.int8)                            # (kp/2, np_)
    w_t = (packed.reshape(kt, bk // 2, np_ // bn, bn)
           .transpose(0, 2, 1, 3).copy())                  # (kt, nt, bk/2, bn)
    return PackedQ4(w_t, gscale, n, group, b, goff)


def _make_kernel(n_groups: int, asym: bool):
    def _kernel(xlo_ref, xhi_ref, w_ref, gs_ref, *rest):
        if asym:
            goff_ref, out_ref, acc_ref = rest
        else:
            out_ref, acc_ref = rest

        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # i32 unpack (Mosaic rejects i8 vector shifts): wi is the
        # sign-extended byte; wi >> 4 is the signed high nibble, the low
        # nibble sign-extends via the xor-8 trick.
        wi = w_ref[0, 0].astype(jnp.int32)
        lo = (((wi & 15) ^ 8) - 8).astype(jnp.int8)
        hi = (wi >> 4).astype(jnp.int8)
        gs2 = lo.shape[0] // n_groups       # packed rows per scale group
        for g in range(n_groups):
            sl = slice(g * gs2, (g + 1) * gs2)
            acc = jax.lax.dot_general(
                xlo_ref[:, sl], lo[sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc += jax.lax.dot_general(
                xhi_ref[:, sl], hi[sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # group-wise rescale into the f32 accumulator
            upd = acc.astype(jnp.float32) * gs_ref[0, 0, g]
            if asym:
                # exact dequant-offset fold: sum_k x8_k * m_gn per group —
                # one VPU row-sum + a rank-1 f32 update; padded K rows have
                # x8 = 0 so they contribute nothing
                gsum = (jnp.sum(xlo_ref[:, sl].astype(jnp.int32), axis=1)
                        + jnp.sum(xhi_ref[:, sl].astype(jnp.int32), axis=1)
                        ).astype(jnp.float32)
                upd += gsum[:, None] * goff_ref[0, 0, g][None, :]
            acc_ref[:] += upd

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _finish():
            out_ref[:] = acc_ref[:]

    return _kernel


@functools.partial(jax.jit, static_argnames=("n_groups", "bm", "interpret"))
def _w4a8_tiled(xlo: jax.Array, xhi: jax.Array, w_t: jax.Array,
                gscale: jax.Array, n_groups: int, bm: int = 128,
                interpret: bool = False, goff: jax.Array = None) -> jax.Array:
    m, k2 = xlo.shape
    kt, nt, bk2, bn = w_t.shape
    assert kt * bk2 == k2, (xlo.shape, w_t.shape)
    bm = min(bm, m)
    grid = (-(-m // bm), nt, kt)

    def regroup(garr):
        # (kt, nt, G, bn): block dims equal the trailing array dims (the
        # Pallas TPU (8, 128)-divisibility rule rejects narrow 2-D blocks)
        return garr.reshape(kt, n_groups, nt, bn).swapaxes(1, 2)

    asym = goff is not None
    gspec = pl.BlockSpec((1, 1, n_groups, bn), lambda i, j, kk: (kk, j, 0, 0))
    args = [xlo, xhi, w_t, regroup(gscale)]
    in_specs = [
        pl.BlockSpec((bm, bk2), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((bm, bk2), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((1, 1, bk2, bn), lambda i, j, kk: (kk, j, 0, 0)),
        gspec,
    ]
    if asym:
        args.append(regroup(goff))
        in_specs.append(gspec)
    return pl.pallas_call(
        _make_kernel(n_groups, asym),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, nt * bn), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(flops=2 * m * 2 * k2 * nt * bn,
                                      bytes_accessed=k2 * nt * bn + 2 * m * k2,
                                      transcendentals=0),
        interpret=interpret,
    )(*args)


def _split_even_odd(x8: jax.Array, kp: int) -> Tuple[jax.Array, jax.Array]:
    m, k = x8.shape
    if kp != k:  # K was padded at pack time; zero rows contribute nothing
        x8 = jnp.pad(x8, ((0, 0), (0, kp - k)))
    xp = x8.reshape(m, kp // 2, 2)
    return xp[:, :, 0], xp[:, :, 1]


def _finish(acc, xs, packed: PackedQ4, lead, out_dtype):
    y = acc * xs[:, None]
    if packed.b is not None:
        y = y + jnp.pad(packed.b.astype(jnp.float32),
                        (0, y.shape[-1] - packed.n))
    # convert before the pad-slice (fusion-boundary ordering — see the
    # matching note in ops/q8_matmul.py _finish): halves the rescale temp.
    return y.astype(out_dtype)[:, :packed.n].reshape(*lead, packed.n)


def q4_matmul_packed(x: jax.Array, packed: PackedQ4,
                     out_dtype=jnp.bfloat16, interpret: bool = False,
                     bm: int = 128) -> jax.Array:
    """(..., K) float x PackedQ4 -> (..., N) out_dtype (Pallas, TPU)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    m = int(np.prod(lead)) if lead else 1
    x8, xs = quantize_act(x.reshape(m, k))
    kt, nt, bk2, bn = packed.w_t.shape
    kp = kt * bk2 * 2
    xlo, xhi = _split_even_odd(x8, kp)
    n_groups = (bk2 * 2) // packed.group
    acc = _w4a8_tiled(xlo, xhi, packed.w_t, packed.gscale,
                      n_groups=n_groups, bm=bm, interpret=interpret,
                      goff=packed.goff)
    return _finish(acc, xs, packed, lead, out_dtype)


def q4_matmul_reference(x: jax.Array, packed: PackedQ4,
                        out_dtype=jnp.float32) -> jax.Array:
    """Numerically identical XLA-only path (CPU tests / non-TPU backends):
    same int math, same per-group f32 accumulation order."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    m = int(np.prod(lead)) if lead else 1
    x8, xs = quantize_act(x.reshape(m, k))
    kt, nt, bk2, bn = packed.w_t.shape[-4:]
    kp = kt * bk2 * 2
    if kp != k:
        x8 = jnp.pad(x8, ((0, 0), (0, kp - k)))
    w_t = packed.w_t
    wi = w_t.transpose(*range(w_t.ndim - 4), w_t.ndim - 4, w_t.ndim - 2,
                       w_t.ndim - 3, w_t.ndim - 1
                       ).reshape(kp // 2, nt * bn).astype(jnp.int32)
    lo = ((wi & 15) ^ 8) - 8
    hi = wi >> 4
    w_q = jnp.stack([lo, hi], axis=1).reshape(kp, nt * bn)
    g = packed.group
    xg = x8.astype(jnp.int32).reshape(m, kp // g, g)
    wg = w_q.reshape(kp // g, g, nt * bn)
    accg = jnp.einsum("mgk,gkn->gmn", xg, wg)              # int32 per group
    acc = jnp.sum(accg.astype(jnp.float32)
                  * packed.gscale[:, None, :].astype(jnp.float32), axis=0)
    if packed.goff is not None:
        # asymmetric grid: fold the per-group dequant offset exactly —
        # sum_k x8_k * m_gn, same f32 per-group accumulation as the kernel.
        # HIGHEST precision: the TPU MXU's default f32 matmul rounds inputs
        # to bf16, while the kernel's rank-1 VPU update is true f32 — the
        # default-precision dot measured 1.3e-3 max rel vs the kernel.
        gsum = jnp.sum(xg, axis=2).astype(jnp.float32)     # (m, kp/g)
        acc = acc + jax.lax.dot(gsum, packed.goff.astype(jnp.float32),
                                precision=jax.lax.Precision.HIGHEST)
    return _finish(acc, xs, packed, lead, out_dtype)
