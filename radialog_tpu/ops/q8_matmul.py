"""Pallas TPU kernel: W8A8 matmul over pre-tiled int8 weights.

Decode is HBM-bound; the design keeps the weight traffic int8 end to end:

  * Weights are packed OFFLINE into contiguous (kt, nt, bk, bn) int8 tiles —
    reading a (bk, bn) tile of a row-major (K, N) array is a strided DMA
    (~50GB/s measured on v5e); the packed layout makes every tile one
    contiguous DMA (~600+GB/s).
  * Activations are dynamically quantized per row (symmetric int8); the MXU
    runs native int8 x int8 -> int32 (no in-VMEM dequant of the weights —
    converting 6.9GB of int8->bf16 through the VPU costs ~30ms/step, the
    reason both XLA's own int8 lowering and a dequant-in-kernel variant are
    ~3x slower than bf16).
  * The int32 accumulator is rescaled outside the kernel:
    y = acc * x_scale[:,None] * w_scale[None,:] — an (M, N) elementwise op
    XLA fuses into the surrounding graph.

N is zero-padded to the tile width at pack time (sliced off after). bk
(pick_bk) must be a multiple of 128 (lane constraint on the activation
block): 2048 divides K=4096 exactly; K=11008 has no 128-multiple divisor
<= 2048, so it takes bk=1024 with 256 zero-padded K rows (~2.3% extra
int8 bytes on the down-projection — padded at pack time, matched by
zero-padded activation rows at call time).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_BN = 1024


@jax.tree_util.register_pytree_node_class
class PackedQ8:
    """Pytree node for a packed int8 weight: arrays (w_t, scale, bias?) are
    children; the true output width n is static aux data (so the post-matmul
    slice stays static under jit)."""

    def __init__(self, w_t, scale, n: int, b=None):
        self.w_t = w_t
        self.scale = scale
        self.n = n
        self.b = b

    def tree_flatten(self):
        return (self.w_t, self.scale, self.b), self.n

    @classmethod
    def tree_unflatten(cls, n, children):
        w_t, scale, b = children
        return cls(w_t, scale, n, b)

    def __repr__(self):
        shape = getattr(self.w_t, "shape", None)
        return f"PackedQ8(w_t={shape}, n={self.n})"


def pick_bk(k: int, cap: int = 2048) -> int:
    """k-tile size: a multiple of 128 (lane constraint on the activation
    block); K is zero-padded up to a bk multiple at pack time and the
    activation rows are zero-padded to match at call time."""
    if k <= cap:
        return k if k % 128 == 0 else ((k + 127) // 128) * 128
    return cap if k % cap == 0 else 1024


def pack_q8(w: np.ndarray, bn: int = TILE_BN, b=None,
            bk: int | None = None) -> PackedQ8:
    """(K, N) float (numpy, host) -> PackedQ8 with (kt, nt, bk, bn) int8
    tiles. Per-output-channel symmetric scales; N zero-padded to bn.
    bk overrides the pick_bk default (tile-size sweeps)."""
    w = np.asarray(w, np.float32)
    k, n = w.shape
    scale = np.maximum(np.abs(w).max(axis=0) / 127.0, 1e-8).astype(np.float32)
    w_q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    bk = pick_bk(k) if bk is None else bk
    npad = (-n) % bn
    kpad = (-k) % bk
    if npad or kpad:
        w_q = np.pad(w_q, ((0, kpad), (0, npad)))
        scale = np.pad(scale, (0, npad), constant_values=1.0)
    kp, np_ = k + kpad, n + npad
    w_t = (w_q.reshape(kp // bk, bk, np_ // bn, bn)
           .transpose(0, 2, 1, 3).copy())
    return PackedQ8(w_t, scale, n, b)


def quantize_act(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8: returns (x8 (M,K), x_scale (M,) f32)."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(xf / xs[..., None]), -127, 127).astype(jnp.int8)
    return x8, xs


def _kernel(x_ref, w_ref, out_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _finish():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bm", "interpret"))
def _w8a8_tiled(x8: jax.Array, w_t: jax.Array, bm: int = 128,
                interpret: bool = False) -> jax.Array:
    m, k = x8.shape
    kt, nt, bk, bn = w_t.shape
    assert kt * bk == k, (x8.shape, w_t.shape)
    bm = min(bm, m)
    grid = (-(-m // bm), nt, kt)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((1, 1, bk, bn), lambda i, j, kk: (kk, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, nt * bn), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(flops=2 * m * k * nt * bn,
                                      bytes_accessed=k * nt * bn + m * k,
                                      transcendentals=0),
        interpret=interpret,
    )(x8, w_t)


def _finish(acc, xs, packed: PackedQ8, lead, out_dtype):
    y = (acc.astype(jnp.float32) * xs[:, None]
         * packed.scale[None, :].astype(jnp.float32))
    if packed.b is not None:
        y = y + jnp.pad(packed.b.astype(jnp.float32),
                        (0, y.shape[-1] - packed.n))
    # convert BEFORE the pad-slice: the slice is a fusion boundary, and
    # slicing first made XLA materialize the full f32 rescale product
    # (f32[6912,4096] = 108 MB per matmul in the b48 prefill dump) before a
    # separate convert — casting first keeps the fusion output in out_dtype
    # (half the temp bytes; elementwise ops commute with the slice).
    return y.astype(out_dtype)[:, :packed.n].reshape(*lead, packed.n)


def q8_matmul_packed(x: jax.Array, packed: PackedQ8,
                     out_dtype=jnp.bfloat16, interpret: bool = False,
                     bm: int = 128) -> jax.Array:
    """(..., K) float x PackedQ8 -> (..., N) out_dtype (Pallas, TPU)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    m = int(np.prod(lead)) if lead else 1
    x8, xs = quantize_act(x.reshape(m, k))
    kp = packed.w_t.shape[0] * packed.w_t.shape[2]
    if kp != k:  # K was padded at pack time; zero rows contribute nothing
        x8 = jnp.pad(x8, ((0, 0), (0, kp - k)))
    acc = _w8a8_tiled(x8, packed.w_t, bm=bm, interpret=interpret)
    return _finish(acc, xs, packed, lead, out_dtype)


def q8_matmul_reference(x: jax.Array, packed: PackedQ8,
                        out_dtype=jnp.float32) -> jax.Array:
    """Numerically identical XLA-only path (CPU tests / non-TPU backends)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    m = int(np.prod(lead)) if lead else 1
    x8, xs = quantize_act(x.reshape(m, k))
    kt, nt, bk, bn = packed.w_t.shape[-4:]
    if kt * bk != k:
        x8 = jnp.pad(x8, ((0, 0), (0, kt * bk - k)))
    # packed.w_t is always 4-D (kt, nt, bk, bn): the stacked-layout pack
    # helper this once generalized over was dead code and is removed
    w_q = packed.w_t.transpose(0, 2, 1, 3).reshape(kt * bk, nt * bn)
    acc = jax.lax.dot_general(x8.astype(jnp.int32), w_q.astype(jnp.int32),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return _finish(acc, xs, packed, lead, out_dtype)
