#!/usr/bin/env python
"""Price the fused-KV-operand idea for the int8 flash-decode kernel.

The final round-5 profile (docs/PERF.md) leaves `flash_decode_int8` at
~48% of speed-of-light on its bytes; the remaining gap was attributed to
the grid's per-step fixed cost, part of which is per-OPERAND: each grid
step issues 4 DMA descriptors (k block, k scales, v block, v scales).
Fusing k+v into one (L, B, S, 2*hd) buffer and the scales into one
(L, B, S, 2*sl) buffer halves the descriptor count per step — but
adopting it means migrating the KVCache layout through engine/ring/
spec/TP. This tool prices the ceiling FIRST, per the repo's
measure-before-migrate rule:

  A: the production kernel (4 cache operands), 32 chained layer calls
     in ONE jit (the decode step's attention portion; per-jit dispatch
     ~0.5 ms is shared by both variants);
  B: a minimal fused-operand kernel (2 cache operands, halves split
     in-kernel by lane slicing) reusing the SAME _process_block inner
     math, same grid, same live-bound clamp, same scratch.

Identical bytes, identical FLOPs, identical accumulation order — the
delta isolates the per-descriptor fixed cost. Outputs are cross-checked
bitwise-equal before timing. One JSON line.

CLAUDE.md measurement rules apply: run on the real chip in a quiet
window; trust the A-vs-B delta, not absolute GB/s.

Usage: python tools/microbench_kvfused.py [--batch 56] [--cache 384]
       [--step 150] [--gl 8] [--bs 64] [--reps 30]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=56)
    ap.add_argument("--cache", type=int, default=384)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=8,
                    help="chained layer calls per jit; the per-step "
                         "descriptor cost scales linearly in L, and each "
                         "distinct layer index is its own Mosaic compile "
                         "in BOTH variants — 8 keeps the compile wall "
                         "tractable (x4 to project the 32-layer step)")
    ap.add_argument("--step", type=int, default=150,
                    help="decode position: live bound = 128 + step "
                         "(mid-decode, exercises the dead-block clamp)")
    ap.add_argument("--gl", type=int, default=8)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from radialog_tpu.ops.flash_decode import (NEG_INF, _process_block,
                                               flash_decode_int8)

    b, s_len = args.batch, args.cache
    h, d, L = args.heads, args.head_dim, args.layers
    hd, sl = h * d, 128
    gl, bs = args.gl, args.bs
    pp, st = 128, args.step
    assert b % gl == 0 and s_len % bs == 0

    rng = np.random.default_rng(0)
    k8 = jnp.asarray(rng.integers(-127, 128, (L, b, s_len, hd)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, b, s_len, hd)), jnp.int8)
    ks = jnp.asarray(rng.random((L, b, s_len, sl)) * 0.02, jnp.bfloat16)
    vs = jnp.asarray(rng.random((L, b, s_len, sl)) * 0.02, jnp.bfloat16)
    qs_all = jnp.asarray(rng.normal(size=(L, b, h, d)), jnp.float32)
    lengths = jnp.full((b,), pp, jnp.int32)
    # fused layouts (same bytes, one buffer): [k | v] on the lane dim
    kv8 = jnp.concatenate([k8, v8], axis=-1)            # (L, B, S, 2*hd)
    kvs = jnp.concatenate([ks, vs], axis=-1)            # (L, B, S, 2*sl)

    # ---- variant B: minimal fused-operand kernel (static-slot mask only)
    scale = float(d ** -0.5)

    def fused_kernel(lens_ref, q8_ref, qs_ref, kv_ref, sc_ref,
                     o_ref, m_ref, l_ref, acc_ref, qbt_ref, ef_ref):
        s_i = pl.program_id(1)

        @pl.when(s_i == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)
            e_row = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 0)
            e_col_h = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 1) // d
            e_mask = e_row == e_col_h
            ef_ref[:] = e_mask.astype(jnp.float32)
            for g in range(gl):
                qbt_ref[g * h:(g + 1) * h, :] = jnp.where(
                    e_mask, q8_ref[g].astype(jnp.int32), 0).astype(jnp.int8)

        bi = pl.program_id(0)
        nb = pl.num_programs(0) * gl

        def lane_scalars(g):
            ln = bi * gl + g
            return lens_ref[ln], lens_ref[nb + ln]

        group_live = jnp.int32(0)
        for g in range(gl):
            lg, b1g = lane_scalars(g)
            group_live = jnp.maximum(group_live, jnp.maximum(lg - 1, b1g))

        @pl.when(s_i * bs <= group_live)
        def _lane():
            s_pos = s_i * bs + jax.lax.broadcasted_iota(
                jnp.int32, (bs, h), 0)
            for g in range(gl):
                lg, b1g = lane_scalars(g)
                valid = (s_pos < lg) | ((s_pos >= pp) & (s_pos <= b1g))
                _process_block(kv_ref[0, g][:, :hd],
                               sc_ref[0, g][:, :h],
                               kv_ref[0, g][:, hd:],
                               sc_ref[0, g][:, sl:sl + h],
                               valid, qbt_ref[g * h:(g + 1) * h, :],
                               qs_ref[g], m_ref, l_ref, acc_ref,
                               ef_ref[:], scale, g=g)

        @pl.when(s_i == pl.num_programs(1) - 1)
        def _finish():
            for g in range(gl):
                inv_l = 1.0 / jnp.maximum(l_ref[g:g + 1, :], 1e-30)
                inv_exp = jax.lax.dot_general(
                    inv_l, ef_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_ref[g] = (acc_ref[g:g + 1, :] * inv_exp).astype(o_ref.dtype)

    nb = b

    def make_fused_call(li: int):
        # the layer index is baked into the index maps, exactly like the
        # production kernel — the fused buffer is passed whole, NOT
        # pre-sliced (a kv8[i:i+1] slice outside the kernel materializes
        # a 176 MB copy per layer: custom calls cannot consume fused
        # slices, same reason the shared-prefix path documents)
        def lane_idx(bi, si, sc):
            last_live = None
            for g in range(gl):
                ln = bi * gl + g
                lg = jnp.maximum(sc[ln] - 1, sc[nb + ln])
                last_live = lg if last_live is None else jnp.maximum(
                    last_live, lg)
            return (li, bi, jnp.minimum(si, jnp.maximum(last_live // bs, 0)),
                    0)

        return pl.pallas_call(
            fused_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b // gl, s_len // bs),
                in_specs=[
                    pl.BlockSpec((gl, 1, hd), lambda bi, si, sc: (bi, 0, 0)),
                    pl.BlockSpec((gl, 1, h), lambda bi, si, sc: (bi, 0, 0)),
                    pl.BlockSpec((1, gl, bs, 2 * hd), lane_idx),
                    pl.BlockSpec((1, gl, bs, 2 * sl), lane_idx),
                ],
                out_specs=pl.BlockSpec((gl, 1, hd),
                                       lambda bi, si, sc: (bi, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((gl, h), jnp.float32),
                    pltpu.VMEM((gl, h), jnp.float32),
                    pltpu.VMEM((gl, hd), jnp.float32),
                    pltpu.VMEM((gl * h, hd), jnp.int8),
                    pltpu.VMEM((h, hd), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((b, 1, hd), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                **({"vmem_limit_bytes": 100 * 1024 * 1024}
                   if 2 * gl * bs * (2 * hd + 4 * sl) > 14 * 1024 * 1024
                   else {})),
        )

    def quant_q(q):
        qf = q.astype(jnp.float32)
        qsc = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1), 1e-8) / 127.0
        q8 = jnp.clip(jnp.round(qf / qsc[..., None]),
                      -127, 127).astype(jnp.int8)
        return q8.reshape(b, 1, hd), qsc[:, None, :]

    scalars = jnp.concatenate(
        [lengths, jnp.full((b,), pp + st, jnp.int32)])

    @jax.jit
    def chain_a(qs_all, k8, ks, v8, vs):
        acc = jnp.zeros((b, h, d), jnp.float32)
        for i in range(L):
            acc = acc + flash_decode_int8(
                qs_all[i], k8, ks, v8, vs, lengths,
                prompt_pad=pp, step=st, layer_idx=i, bs=bs, gl=gl)
        return acc.sum()

    fused_calls = [make_fused_call(i) for i in range(L)]

    @jax.jit
    def chain_b(qs_all, kv8, kvs):
        acc = jnp.zeros((b, h, d), jnp.float32)
        for i in range(L):
            q8, qsc = quant_q(qs_all[i])
            o = fused_calls[i](scalars, q8, qsc, kv8, kvs)
            acc = acc + o.reshape(b, h, d)
        return acc.sum()

    # correctness cross-check (layer 0): fused == production, bitwise
    q8, qsc = quant_q(qs_all[0])
    got = np.asarray(fused_calls[0](scalars, q8, qsc, kv8,
                                    kvs)).reshape(b, h, d)
    ref = np.asarray(flash_decode_int8(qs_all[0], k8, ks, v8, vs, lengths,
                                       prompt_pad=pp, step=st, layer_idx=0,
                                       bs=bs, gl=gl))
    assert np.array_equal(got, ref), "fused kernel != production kernel"

    def bench(fn, *xs):
        fn(*xs).block_until_ready()          # compile
        for _ in range(3):
            fn(*xs).block_until_ready()      # warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = fn(*xs)
        _ = float(r)                         # force completion (tunnel)
        return (time.perf_counter() - t0) / args.reps * 1e3

    ms_a = bench(chain_a, qs_all, k8, ks, v8, vs)
    ms_b = bench(chain_b, qs_all, kv8, kvs)
    print(json.dumps({
        "batch": b, "cache": s_len, "step": st, "gl": gl, "bs": bs,
        "layers": L, "reps": args.reps,
        "ms_4operand": round(ms_a, 3), "ms_fused": round(ms_b, 3),
        "delta_ms": round(ms_a - ms_b, 3),
        "delta_pct": round((ms_a - ms_b) / ms_a * 100, 2),
    }))


if __name__ == "__main__":
    main()
