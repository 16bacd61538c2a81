#!/usr/bin/env python
"""Tile-size sweep for the W8A8 weight kernel (ops/q8_matmul.py).

Decode reads all 6.9GB of int8 weights per step; the production tiles
(bk<=2048, bn=1024) measured ~612GB/s. Larger tiles = longer contiguous
DMA bursts and fewer grid steps — this sweeps (bk_cap, bn) over the full
32-layer Vicuna-7B weight sweep with the honest-measurement rules from
tools/microbench_w4.py (one jit, data-dependent chain, weights as args,
scalar reduce, warm timing).

Usage: python tools/sweep_q8_tiles.py [--m 56] [--configs 2048x1024,...]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from radialog_tpu.ops.q8_matmul import PackedQ8, pack_q8, q8_matmul_packed

LAYER_SHAPES = {          # Vicuna-7B fused serving layout
    "wqkv": (4096, 12288),
    "wo": (4096, 4096),
    "gateup": (4096, 22016),
    "down": (11008, 4096),
}
NUM_LAYERS = 32


def pick_bk_cap(k: int, cap: int) -> int:
    """Largest multiple of 128 <= cap dividing k exactly; if only tiny
    divisors exist (K=11008 has none >= 256), pad K to the cap instead —
    matching the production pick_bk behavior of preferring big DMA tiles
    over exact division."""
    for bk in range(min(cap, k), 127, -128):
        if k % bk == 0 and bk >= cap // 2:
            return bk
    return min(cap, ((k + 127) // 128) * 128 if k < cap else cap)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=56, help="decode batch rows")
    ap.add_argument("--configs", default="2048x1024,2048x2048,4096x1024,"
                                         "4096x2048,1024x1024,4096x4096")
    ap.add_argument("--runs", type=int, default=30)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    rng = np.random.default_rng(0)
    gb = NUM_LAYERS * sum(k * n for k, n in LAYER_SHAPES.values()) / 1e9
    host_w = {name: rng.normal(size=shape).astype(np.float32) * 0.02
              for name, shape in LAYER_SHAPES.items()}

    for conf in args.configs.split(","):
        cap, bn = (int(v) for v in conf.split("x"))
        packed = {}
        for name, (k, n) in LAYER_SHAPES.items():
            bk = pick_bk_cap(k, cap)
            packed[name] = pack_q8(host_w[name], bn=bn, bk=bk)
        # Device-put ONCE before fanning out to 32 layer references: pack_q8
        # returns numpy, and 32 host leaves would each re-cross the ~1GB/s
        # tunnel at call time (~22GB -> indefinite stall, learned the hard way).
        packed = jax.tree.map(jnp.asarray, packed)
        layers = [packed] * NUM_LAYERS   # same buffers; DMA cost identical

        @jax.jit
        def sweep(layers, x):
            for lp in layers:
                a = q8_matmul_packed(x, lp["wqkv"])[:, :4096]
                b = q8_matmul_packed(a.astype(jnp.bfloat16), lp["wo"])
                c = q8_matmul_packed(b.astype(jnp.bfloat16),
                                     lp["gateup"])[:, :11008]
                x = q8_matmul_packed(c.astype(jnp.bfloat16),
                                     lp["down"]).astype(jnp.bfloat16)
            return x.sum()

        x0 = jnp.asarray(rng.normal(size=(args.m, 4096)), jnp.bfloat16)
        np.asarray(sweep(layers, x0))          # compile + warm
        t0 = time.time()
        for _ in range(args.runs):
            r = sweep(layers, x0)
        np.asarray(r)
        dt = (time.time() - t0) / args.runs
        tiles = {n: tuple(packed[n].w_t.shape) for n in ("wqkv", "down")}
        print(f"bk_cap={cap:5d} bn={bn:5d}: {dt*1e3:7.2f} ms/sweep "
              f"({gb/dt:5.0f} GB/s)  wqkv{tiles['wqkv']} down{tiles['down']}")


if __name__ == "__main__":
    main()
