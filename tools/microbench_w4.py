#!/usr/bin/env python
"""Micro-experiment: is W4A8 (int4 weights) faster than W8A8 for decode?

Decode is weight-read-bound (docs/PERF.md: 6.9GB of int8 weights per step at
~660GB/s ≈ 10.5ms of the 21.9ms step). Halving weight bytes to int4 would
save ~5ms/step — IF the in-kernel unpack cost (VPU) doesn't eat it. Round-1
measured that int8->bf16 dequant-in-kernel costs ~30ms/step (the reason the
W8A8 kernel feeds the MXU int8 directly), so int4 unpack must stay in the
int8 domain: lo = (w<<4)>>4, hi = w>>4, two half-K MXU matmuls.

Honest-measurement rules (verify skill): chain all 32 layers' matmuls in ONE
jit with data dependence (per-iteration overhead amortized), weights passed
as jit args (not closed over), reduce to a scalar on device, time warm calls.

Variants:
  w8   — the production W8A8 kernel (ops/q8_matmul.py)
  w4   — nibble-packed int8 tiles, in-kernel shift unpack, 2 matmuls
  w4x  — XLA-native jnp.int4 arrays, plain dot_general (no Pallas), as a
         check on whether Mosaic/XLA already handles int4 well

Usage: python tools/microbench_w4.py [--variants w8,w4,w4x] [--m 32]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radialog_tpu.ops.q8_matmul import (PackedQ8, pack_q8, pick_bk,
                                        q8_matmul_packed, quantize_act)

# Vicuna-7B decode-step matmul shapes (fused serving layout)
LAYER_SHAPES = {
    "wqkv": (4096, 12288),
    "wo": (4096, 4096),
    "gateup": (4096, 22016),
    "down": (11008, 4096),
}
NUM_LAYERS = 32
TILE_BN = 1024


# ---------------------------------------------------------------- w4 kernel
@jax.tree_util.register_pytree_node_class
class PackedQ4:
    """Nibble-packed int4 tiles: w_t (kt, nt, bk//2, bn) int8 where byte b
    holds w[2k] in the low nibble, w[2k+1] in the high nibble."""

    def __init__(self, w_t, scale, n):
        self.w_t = w_t
        self.scale = scale
        self.n = n

    def tree_flatten(self):
        return (self.w_t, self.scale), self.n

    @classmethod
    def tree_unflatten(cls, n, children):
        return cls(*children, n)


def pack_q4(w: np.ndarray, bn: int = TILE_BN) -> PackedQ4:
    w = np.asarray(w, np.float32)
    k, n = w.shape
    scale = np.maximum(np.abs(w).max(axis=0) / 7.0, 1e-8).astype(np.float32)
    w_q = np.clip(np.round(w / scale[None, :]), -7, 7).astype(np.int8)
    bk = pick_bk(k)
    npad = (-n) % bn
    kpad = (-k) % bk
    if npad or kpad:
        w_q = np.pad(w_q, ((0, kpad), (0, npad)))
        scale = np.pad(scale, (0, npad), constant_values=1.0)
    kp, np_ = k + kpad, n + npad
    lo = w_q[0::2]                       # (kp/2, np_)
    hi = w_q[1::2]
    packed = ((hi.astype(np.uint8) << 4) | (lo.astype(np.uint8) & 0xF)
              ).astype(np.int8)
    w_t = (packed.reshape(kp // bk, bk // 2, np_ // bn, bn)
           .transpose(0, 2, 1, 3).copy())
    return PackedQ4(w_t, scale, n)


def _w4_kernel(xlo_ref, xhi_ref, w_ref, out_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Mosaic cannot legalize arith.shli on i8 vectors (measured); unpack in
    # i32 instead: wi is the sign-extended byte, so wi >> 4 IS the signed
    # high nibble and ((wi & 15) ^ 8) - 8 sign-extends the low one.
    wi = w_ref[0, 0].astype(jnp.int32)
    lo = (((wi & 15) ^ 8) - 8).astype(jnp.int8)
    hi = (wi >> 4).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        xlo_ref[:], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_ref[:] += jax.lax.dot_general(
        xhi_ref[:], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _finish():
        out_ref[:] = acc_ref[:]


# --------------------------------------------- w4p: Mosaic-native int4 ref
@jax.tree_util.register_pytree_node_class
class PackedQ4N:
    """jnp.int4 tiles (Mosaic packs 2/byte in VMEM): w_t (kt, nt, bk, bn)."""

    def __init__(self, w_t, scale, n):
        self.w_t = w_t
        self.scale = scale
        self.n = n

    def tree_flatten(self):
        return (self.w_t, self.scale), self.n

    @classmethod
    def tree_unflatten(cls, n, children):
        return cls(*children, n)


@jax.jit
def _nibbles_to_int4(packed):
    """(kt, nt, bk//2, bn) int8 nibble-pairs -> (kt, nt, bk, bn) int4 ON
    DEVICE. (Transferring a host int4 array through the axon tunnel hits a
    'Recursively calling jit' client bug; int8 bytes transfer fine and XLA
    emits the packed s4 layout itself.)"""
    wi = packed.astype(jnp.int32)
    lo = ((wi & 15) ^ 8) - 8
    hi = wi >> 4
    kt, nt, bk2, bn = packed.shape
    w = jnp.stack([lo, hi], axis=-2)          # (kt, nt, bk2, 2, bn)
    return w.reshape(kt, nt, bk2 * 2, bn).astype(jnp.int4)


def pack_q4n(w: np.ndarray, bn: int = TILE_BN) -> PackedQ4N:
    p = pack_q4(w, bn)                        # host nibble-packing
    return PackedQ4N(_nibbles_to_int4(jnp.asarray(p.w_t)), p.scale, p.n)


def _w4p_kernel(x_ref, w_ref, out_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[0, 0].astype(jnp.int8), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _finish():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bm",))
def _w4p_tiled(x8, w_t, bm: int = 128):
    m, k = x8.shape
    kt, nt, bk, bn = w_t.shape
    assert kt * bk == k, (x8.shape, w_t.shape)
    bm = min(bm, m)
    grid = (-(-m // bm), nt, kt)
    return pl.pallas_call(
        _w4p_kernel,
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
                                      bytes_accessed=k * nt * bn // 2 + m * k,
                                      transcendentals=0),
    )(x8, w_t)


def q4p_matmul(x, packed: PackedQ4N, out_dtype=jnp.bfloat16):
    lead = x.shape[:-1]
    k = x.shape[-1]
    m = int(np.prod(lead)) if lead else 1
    x8, xs = quantize_act(x.reshape(m, k))
    kp = packed.w_t.shape[0] * packed.w_t.shape[2]
    if kp != k:
        x8 = jnp.pad(x8, ((0, 0), (0, kp - k)))
    acc = _w4p_tiled(x8, packed.w_t)
    y = (acc.astype(jnp.float32) * xs[:, None]
         * packed.scale[None, :].astype(jnp.float32))
    return y[:, :packed.n].astype(out_dtype).reshape(*lead, packed.n)


@functools.partial(jax.jit, static_argnames=("bm",))
def _w4a8_tiled(xlo, xhi, w_t, bm: int = 128):
    m, k2 = xlo.shape
    kt, nt, bk2, bn = w_t.shape
    assert kt * bk2 == k2, (xlo.shape, w_t.shape)
    bm = min(bm, m)
    grid = (-(-m // bm), nt, kt)
    return pl.pallas_call(
        _w4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk2), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bm, bk2), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((1, 1, bk2, bn), lambda i, j, kk: (kk, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, nt * bn), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(flops=2 * m * 2 * k2 * nt * bn,
                                      bytes_accessed=k2 * nt * bn + 2 * m * k2,
                                      transcendentals=0),
    )(xlo, xhi, w_t)


def q4_matmul(x, packed: PackedQ4, out_dtype=jnp.bfloat16):
    lead = x.shape[:-1]
    k = x.shape[-1]
    m = int(np.prod(lead)) if lead else 1
    x8, xs = quantize_act(x.reshape(m, k))
    kp2 = packed.w_t.shape[0] * packed.w_t.shape[2]
    if kp2 * 2 != k:
        x8 = jnp.pad(x8, ((0, 0), (0, kp2 * 2 - k)))
    xp = x8.reshape(m, kp2, 2)
    acc = _w4a8_tiled(xp[:, :, 0], xp[:, :, 1], packed.w_t)
    y = (acc.astype(jnp.float32) * xs[:, None]
         * packed.scale[None, :].astype(jnp.float32))
    return y[:, :packed.n].astype(out_dtype).reshape(*lead, packed.n)


# ------------------------------------------------------------- chain bodies
def chain_w8(x, layers):
    for lyr in layers:
        a = q8_matmul_packed(x, lyr["wqkv"])
        b = q8_matmul_packed(a[:, :4096], lyr["wo"])
        c = q8_matmul_packed(x, lyr["gateup"])
        d = q8_matmul_packed(c[:, :11008], lyr["down"])
        x = (x + 0.001 * (b + d)).astype(jnp.bfloat16)
    return jnp.sum(x.astype(jnp.float32))


def chain_w4(x, layers):
    for lyr in layers:
        a = q4_matmul(x, lyr["wqkv"])
        b = q4_matmul(a[:, :4096], lyr["wo"])
        c = q4_matmul(x, lyr["gateup"])
        d = q4_matmul(c[:, :11008], lyr["down"])
        x = (x + 0.001 * (b + d)).astype(jnp.bfloat16)
    return jnp.sum(x.astype(jnp.float32))


def chain_w4g(x, layers):
    from radialog_tpu.ops.q4_matmul import q4_matmul_packed as q4g
    for lyr in layers:
        a = q4g(x, lyr["wqkv"])
        b = q4g(a[:, :4096], lyr["wo"])
        c = q4g(x, lyr["gateup"])
        d = q4g(c[:, :11008], lyr["down"])
        x = (x + 0.001 * (b + d)).astype(jnp.bfloat16)
    return jnp.sum(x.astype(jnp.float32))


def chain_w4p(x, layers):
    for lyr in layers:
        a = q4p_matmul(x, lyr["wqkv"])
        b = q4p_matmul(a[:, :4096], lyr["wo"])
        c = q4p_matmul(x, lyr["gateup"])
        d = q4p_matmul(c[:, :11008], lyr["down"])
        x = (x + 0.001 * (b + d)).astype(jnp.bfloat16)
    return jnp.sum(x.astype(jnp.float32))


def chain_w4x(x, layers):
    def mm(x, lyr):
        x8, xs = quantize_act(x)
        acc = jax.lax.dot_general(x8, lyr["w4"].astype(jnp.int8),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs[:, None]
                * lyr["scale"][None, :]).astype(jnp.bfloat16)

    for lyr in layers:
        a = mm(x, lyr["wqkv"])
        b = mm(a[:, :4096], lyr["wo"])
        c = mm(x, lyr["gateup"])
        d = mm(c[:, :11008], lyr["down"])
        x = (x + 0.001 * (b + d)).astype(jnp.bfloat16)
    return jnp.sum(x.astype(jnp.float32))


def build_layers(variant: str, rng, num_layers: int = NUM_LAYERS):
    layers = []
    for i in range(num_layers):
        lyr = {}
        for name, (k, n) in LAYER_SHAPES.items():
            w = rng.standard_normal((k, n), np.float32) * 0.02
            if variant == "w8":
                p = pack_q8(w)
                lyr[name] = PackedQ8(jax.device_put(p.w_t),
                                     jax.device_put(p.scale), p.n)
            elif variant == "w4":
                p = pack_q4(w)
                lyr[name] = PackedQ4(jax.device_put(p.w_t),
                                     jax.device_put(p.scale), p.n)
            elif variant == "w4g":
                from radialog_tpu.ops.q4_matmul import (PackedQ4 as PQ4G,
                                                        pack_q4 as pack_q4g)
                p = pack_q4g(w)
                lyr[name] = PQ4G(jax.device_put(p.w_t),
                                 jax.device_put(p.gscale), p.n)
            elif variant == "w4p":
                p = pack_q4n(w)
                lyr[name] = PackedQ4N(jax.device_put(p.w_t),
                                      jax.device_put(p.scale), p.n)
            else:  # w4x: XLA-native int4
                scale = np.maximum(np.abs(w).max(0) / 7.0, 1e-8)
                q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
                lyr[name] = {"w4": jax.device_put(q.astype(jnp.int4)),
                             "scale": jax.device_put(scale.astype(np.float32))}
        layers.append(lyr)
    return layers


def flatten(layers):
    leaves, treedef = jax.tree_util.tree_flatten(
        layers, is_leaf=lambda x: isinstance(x, (PackedQ8, PackedQ4)))
    return leaves, treedef


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="w8,w4")
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--layers", type=int, default=NUM_LAYERS,
                    help="distinct layers to build (host packing time); the "
                         "chain cycles them reps x to keep 32 total sweeps")
    args = ap.parse_args()
    reps = -(-NUM_LAYERS // args.layers)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((args.m, 4096), np.float32),
                     jnp.bfloat16)

    # correctness spot-check: q4 vs float matmul on one (4096, 4096) weight
    variants = args.variants.split(",")
    w = rng.standard_normal((4096, 4096), np.float32) * 0.02
    ref = np.asarray(x0, np.float32) @ w
    for name, fn in (("w4", lambda: q4_matmul(x0, pack_q4(w),
                                              out_dtype=jnp.float32)),
                     ("w4p", lambda: q4p_matmul(x0, pack_q4n(w),
                                                out_dtype=jnp.float32))):
        if name not in variants:
            continue
        try:
            got = np.asarray(fn())
        except Exception as e:  # noqa: BLE001
            print(f"{name} correctness: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")
            variants.remove(name)
            continue
        err = np.abs(got - ref).max() / np.abs(ref).max()
        print(f"{name} correctness: max rel err {err:.4f} "
              f"(int4 weights + int8-act quant)", flush=True)
        assert err < 0.2, f"{name} kernel numerically wrong, not just quantized"
    args.variants = ",".join(variants)
    chains = {"w8": chain_w8, "w4": chain_w4, "w4g": chain_w4g,
              "w4p": chain_w4p, "w4x": chain_w4x}
    gb = {"w8": 6.47, "w4": 3.24, "w4g": 3.24, "w4p": 3.24, "w4x": 3.24}

    for variant in args.variants.split(","):
        layers = build_layers(variant, rng, args.layers) * reps
        layers = layers[:NUM_LAYERS]
        if args.layers < NUM_LAYERS:
            print(f"({args.layers} distinct layers cycled to {len(layers)}; "
                  f"HBM re-reads the same {args.layers * 0.2:.1f}GB — fine "
                  f"for bandwidth, weights exceed any on-chip cache)",
                  flush=True)
        jax.block_until_ready(jax.tree_util.tree_leaves(
            [(l.w_t, l.scale) if isinstance(l, (PackedQ8, PackedQ4)) else l
             for lyr in layers for l in lyr.values()]))
        fn = jax.jit(lambda x, ls: chains[variant](x, ls))
        try:
            out = fn(x0, layers)
            float(out)  # force through the tunnel
            # pipeline iters dispatches, sync ONCE: per-call sync pays the
            # ~30ms tunnel RTT every iteration and masks the device time
            # (measured: w8 34.9 ms/chain per-call-synced vs ~10ms real)
            t0 = time.perf_counter()
            outs = [fn(x0, layers) for _ in range(args.iters)]
            float(outs[-1])
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{variant}: {dt*1e3:.2f} ms/chain  "
                  f"({gb[variant]/dt:.0f} GB/s effective weight read)")
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{variant}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:300]}")
        del layers


if __name__ == "__main__":
    main()
