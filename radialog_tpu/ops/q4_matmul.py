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
    width n and the group size are static aux data."""

    def __init__(self, w_t, gscale, n: int, group: int = GROUP, b=None):
        self.w_t = w_t
        self.gscale = gscale
        self.n = n
        self.group = group
        self.b = b

    def tree_flatten(self):
        return (self.w_t, self.gscale, self.b), (self.n, self.group)

    @classmethod
    def tree_unflatten(cls, aux, children):
        w_t, gscale, b = children
        n, group = aux
        return cls(w_t, gscale, n, group, b)

    def __repr__(self):
        shape = getattr(self.w_t, "shape", None)
        return f"PackedQ4(w_t={shape}, n={self.n}, group={self.group})"


def pack_q4(w: np.ndarray, bn: int = TILE_BN, bk: int = None,
            group: int = GROUP, b=None) -> PackedQ4:
    """(K, N) float (numpy, host) -> PackedQ4. K and N are zero-padded to
    bk/bn multiples (zero rows/cols are inert; padded groups get scale
    ~0)."""
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
    gscale = np.maximum(np.abs(grouped).max(axis=1) / 7.0,
                        1e-8).astype(np.float32)          # (kp/group, np_)
    w_q = np.clip(np.round(grouped / gscale[:, None, :]), -7, 7).astype(np.int8)
    w_q = w_q.reshape(kp, np_)
    lo = w_q[0::2]
    hi = w_q[1::2]
    packed = ((hi.astype(np.uint8) << 4) | (lo.astype(np.uint8) & 0xF)
              ).astype(np.int8)                            # (kp/2, np_)
    w_t = (packed.reshape(kt, bk // 2, np_ // bn, bn)
           .transpose(0, 2, 1, 3).copy())                  # (kt, nt, bk/2, bn)
    return PackedQ4(w_t, gscale, n, group, b)


def _make_kernel(n_groups: int):
    def _kernel(xlo_ref, xhi_ref, w_ref, gs_ref, out_ref, acc_ref):
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
            acc_ref[:] += acc.astype(jnp.float32) * gs_ref[0, 0, g]

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _finish():
            out_ref[:] = acc_ref[:]

    return _kernel


@functools.partial(jax.jit, static_argnames=("n_groups", "bm", "interpret"))
def _w4a8_tiled(xlo: jax.Array, xhi: jax.Array, w_t: jax.Array,
                gscale: jax.Array, n_groups: int, bm: int = 128,
                interpret: bool = False) -> jax.Array:
    m, k2 = xlo.shape
    kt, nt, bk2, bn = w_t.shape
    assert kt * bk2 == k2, (xlo.shape, w_t.shape)
    bm = min(bm, m)
    grid = (-(-m // bm), nt, kt)
    # (kt, nt, G, bn): block dims equal the trailing array dims (the Pallas
    # TPU (8, 128)-divisibility rule rejects narrow 2-D scale blocks)
    gscale = (gscale.reshape(kt, n_groups, nt, bn)
              .swapaxes(1, 2))                             # (kt, nt, G, bn)
    return pl.pallas_call(
        _make_kernel(n_groups),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk2), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bm, bk2), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((1, 1, bk2, bn), lambda i, j, kk: (kk, j, 0, 0)),
            pl.BlockSpec((1, 1, n_groups, bn), lambda i, j, kk: (kk, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, nt * bn), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(flops=2 * m * 2 * k2 * nt * bn,
                                      bytes_accessed=k2 * nt * bn + 2 * m * k2,
                                      transcendentals=0),
        interpret=interpret,
    )(xlo, xhi, w_t, gscale)


def _split_even_odd(x8: jax.Array, kp: int) -> Tuple[jax.Array, jax.Array]:
    m, k = x8.shape
    if kp != k:  # K was padded at pack time; zero rows contribute nothing
        x8 = jnp.pad(x8, ((0, 0), (0, kp - k)))
    xp = x8.reshape(m, kp // 2, 2)
    return xp[:, :, 0], xp[:, :, 1]


def _finish(acc, xs, packed: PackedQ4, lead, out_dtype):
    y = acc * xs[:, None]
    y = y[:, :packed.n]
    if packed.b is not None:
        y = y + packed.b.astype(jnp.float32)
    return y.astype(out_dtype).reshape(*lead, packed.n)


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
                      n_groups=n_groups, bm=bm, interpret=interpret)
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
    return _finish(acc, xs, packed, lead, out_dtype)
