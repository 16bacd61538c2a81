#!/usr/bin/env python
"""Real-TPU smoke for the int8 flash-decode kernel (ops/flash_decode.py).

The CI suite exercises the kernel only in Pallas interpret mode on CPU
(tests/test_kv_int8.py); this tool runs the SAME contracts on the real
chip, where Mosaic lowering, tiling, and DMA paths differ:

1. lane-grouping bitwise exactness at SERVING shapes: for each mask mode
   (static-slot, static+shared-prefix, per-lane intervals) the output at
   every gl in --gls (and at the default resolution) must be BITWISE
   equal to gl=1 — grouping is a pure scheduling change (identical
   per-lane accumulation order);
2. TPU-vs-interpret closeness at a small shape (full serving shapes are
   too slow to interpret): max|diff|/std(output) must stay under --tol
   (f32 accumulation-order noise only; ~0.9% of std measured — a pure
   per-element rel metric is NOT used because near-zero output elements
   make it explode while the absolute error stays at noise level).

Prints one JSON line; exits nonzero on any failure. This is the
maintained form of the ad-hoc "round-5 smoke" cited in the kernel
docstring and PERF.md "Lane grouping".

Usage: python tools/tpu_smoke.py [--batch 56] [--cache 384]
       [--gls 2,4,7,8,14] [--tol 0.01]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _operands(rng, b, s, h, d, p0):
    import jax.numpy as jnp
    hd = h * d
    k8 = jnp.asarray(rng.integers(-127, 128, (1, b, s, hd)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (1, b, s, hd)), jnp.int8)
    ks = jnp.asarray(rng.random((1, b, s, 128)) * 0.02, jnp.float32)
    vs = jnp.asarray(rng.random((1, b, s, 128)) * 0.02, jnp.float32)
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    k0 = jnp.asarray(rng.integers(-127, 128, (1, p0, hd)), jnp.int8)
    v0 = jnp.asarray(rng.integers(-127, 128, (1, p0, hd)), jnp.int8)
    ks0 = jnp.asarray(rng.random((1, p0, 128)) * 0.02, jnp.float32)
    vs0 = jnp.asarray(rng.random((1, p0, 128)) * 0.02, jnp.float32)
    return q, k8, ks, v8, vs, (k0, ks0, v0, vs0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=56)
    ap.add_argument("--cache", type=int, default=384)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--gls", type=str, default="2,4,7,8,14")
    ap.add_argument("--tol", type=float, default=0.02,
                    help="TPU-vs-interpret bound on max|diff|/std(output) "
                         "(a pure per-element rel metric explodes on "
                         "near-zero output elements; measured noise is "
                         "~0.9%% of std — f32 accumulation order)")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from radialog_tpu.ops.flash_decode import flash_decode_int8

    b, s = args.batch, args.cache
    h, d = args.heads, args.head_dim
    p0 = 48
    rng = np.random.default_rng(0)
    q, k8, ks, v8, vs, sh = _operands(rng, b, s, h, d, p0)
    lengths = jnp.full((b,), 128, jnp.int32)
    lo = jnp.asarray(rng.integers(100, 140, (b,)), jnp.int32)
    span = jnp.asarray(rng.integers(1, 40, (b,)), jnp.int32)
    intervals = (lo, lo + span,
                 jnp.zeros((b,), jnp.int32) - 1,
                 jnp.zeros((b,), jnp.int32) - 2)   # second interval empty

    modes = {
        "static": dict(prompt_pad=128, step=40),
        "static+shared": dict(prompt_pad=128, step=40, shared=sh, p0=p0),
        "intervals": dict(gen_intervals=intervals),
    }
    gls = [int(x) for x in args.gls.split(",")]
    result = {"batch": b, "cache": s, "gls": gls, "modes": {}}
    ok = True
    for name, kw in modes.items():
        ref = np.asarray(flash_decode_int8(q, k8, ks, v8, vs, lengths,
                                           layer_idx=0, gl=1, **kw))
        rows = {}
        default = np.asarray(flash_decode_int8(q, k8, ks, v8, vs, lengths,
                                               layer_idx=0, **kw))
        rows["default"] = bool(np.array_equal(default, ref))
        for gl in gls:
            got = np.asarray(flash_decode_int8(q, k8, ks, v8, vs, lengths,
                                               layer_idx=0, gl=gl, **kw))
            rows[f"gl={gl}"] = bool(np.array_equal(got, ref))
        result["modes"][name] = rows
        ok = ok and all(rows.values())

    # TPU-vs-interpret closeness at a small shape (interpret at serving
    # shapes would take minutes per call on one CPU core)
    bs_, ss_, hs_, ds_ = 8, 64, 4, 128
    rng2 = np.random.default_rng(1)
    q2, k2, ks2, v2, vs2, sh2 = _operands(rng2, bs_, ss_, hs_, ds_, 16)
    len2 = jnp.full((bs_,), 24, jnp.int32)
    kw2 = dict(prompt_pad=24, step=10, shared=sh2, p0=16, layer_idx=0)
    tpu = np.asarray(flash_decode_int8(q2, k2, ks2, v2, vs2, len2, **kw2))
    itp = np.asarray(flash_decode_int8(q2, k2, ks2, v2, vs2, len2,
                                       interpret=True, **kw2))
    err = float(np.max(np.abs(tpu - itp)) / (float(np.std(itp)) + 1e-9))
    result["tpu_vs_interpret_maxdiff_over_std"] = err
    ok = ok and err < args.tol
    result["ok"] = ok
    print(json.dumps(result))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
