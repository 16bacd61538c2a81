#!/usr/bin/env python
"""Batched speculative decoding bench: SpecRingBatcher vs RingBatcher at
Vicuna-7B on one TPU chip (round-4 verdict #4's measured answer).

Protocol mirrors tools/bench_spec.py: random weights generate text with no
real n-gram structure, so the shipped prompt-lookup drafter's acceptance on
synthetic prompts is meaningless — the honest rows are the CONTROLLED ones:

  plain    — RingBatcher (the production bf16-KV ring), the baseline;
  oracle   — drafts = the model's own greedy stream (precomputed by the
             plain run; every lane gets the same prompt so one hist_len-
             indexed table serves all lanes): 100% acceptance upper bound;
  junk     — drafts that never match: the zero-acceptance overhead floor;
  pattern  — drafts matching the true stream for pattern[i] tokens on
             verify i (e.g. '1,2' = 2.5 emitted/verify, the realistic
             correction-pass acceptance from tools/spec_acceptance.py);
  ngram    — the shipped drafter (quoted with the synthetic-text caveat).

Memory note (the honest cost): the spec ring consumes k+1 slots per verify
REGARDLESS of acceptance, so its cache is sized for the zero-acceptance
worst case — at k=5, max_new 300 that is ~6x the plain ring's generation
region (decode/spec_ring.py module docstring). This bench allocates both
honestly and reports the cache shapes.

Usage: python tools/bench_spec_ring.py [--k 5] [--lanes 4]
       [--new-tokens 300] [--pattern 1,2] [--runs 2]
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
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--m", type=int, default=3)
    ap.add_argument("--lanes", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=448,
                    help="correction-turn scale: conversation + report")
    ap.add_argument("--new-tokens", type=int, default=300)
    ap.add_argument("--spc-plain", type=int, default=8,
                    help="plain ring decode steps per jit call")
    ap.add_argument("--spc-spec", type=int, default=4,
                    help="spec ring verify iterations per jit call")
    ap.add_argument("--pattern", type=str, default="1,2")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--tiny", action="store_true",
                    help="TINY_LLAMA on CPU: protocol smoke test, not a "
                         "measurement")
    ap.add_argument("--compact", action="store_true",
                    help="SpecCompactBatcher (fixed scratch window + "
                         "post-verify relocation): plain-decode cache size "
                         "instead of (k+1) slots/verify")
    ap.add_argument("--kv-int8", action="store_true",
                    help="int8 KV cache (compact mode only — the ring's "
                         "interval contract cannot encode acceptance holes)")
    args = ap.parse_args()
    if args.kv_int8 and not args.compact:
        # fail BEFORE the plain mode's minutes of 7B build+compile: the
        # non-compact ring would only reject the combination in its
        # constructor, after the baseline was already measured
        ap.error("--kv-int8 requires --compact (the ring's interval "
                 "contract cannot encode acceptance holes)")

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from bench import build_serving_params
    from radialog_tpu.decode.continuous import RingBatcher
    from radialog_tpu.decode.engine import DecodeParams
    from radialog_tpu.decode.spec_ring import SpecCompactBatcher, SpecRingBatcher
    from radialog_tpu.models.llama import VICUNA_7B, lora_init
    from radialog_tpu.ops.layers import BF16

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    cfg = VICUNA_7B
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    if args.tiny:
        from radialog_tpu.models.llama import TINY_LLAMA, llama_init
        from radialog_tpu.ops.quant import quantize_llama_host
        cfg = TINY_LLAMA
        params = quantize_llama_host(jax.tree_util.tree_map(
            np.asarray, llama_init(k1, cfg)))
        lora = None
    else:
        params = build_serving_params(cfg, k1, bits=8)
        lora = lora_init(k2, cfg, dtype=jnp.bfloat16)
    jax.block_until_ready(jax.tree_util.tree_leaves(params))

    rng = np.random.default_rng(0)
    t = args.prompt_len
    prompt = [int(x) for x in
              rng.integers(3, min(30000, cfg.vocab_size - 1), t)]
    n_new, kk, lanes = args.new_tokens, args.k, args.lanes
    dp = DecodeParams(max_new_tokens=n_new, eos_token_id=-1)
    kp1 = kk + 1

    preg = max(32, -(-t // 32) * 32)   # prompt region (bucketed admit)
    # plain ring: generation region for chunk-rounded max_new
    ring_p = (-(-max(n_new - 1, 1) // args.spc_plain) * args.spc_plain
              + args.spc_plain)
    ring_p = max(-(-ring_p // 32) * 32, 64)
    cache_p = preg + ring_p
    if args.compact:
        # compact: plain-decode-sized generation region + (k+1) scratch
        nv_life = (-(-max(n_new - 1, 1) // args.spc_spec) * args.spc_spec
                   + args.spc_spec)
        ring_s = max(-(-max(n_new + kp1, nv_life + 1) // 32) * 32, 64)
        cache_s = preg + ring_s
    else:
        # spec ring: worst-case verifies x window, rounded to a kp1 multiple
        nv_life = -(-max(n_new - 1, 1) // args.spc_spec) * args.spc_spec
        ring_s = (nv_life + args.spc_spec) * kp1
        ring_s = -(-ring_s // kp1) * kp1
        cache_s = preg + ring_s

    def drain(rb, n_sessions):
        sids = [rb.submit(prompt) for _ in range(n_sessions)]
        finished = rb.run()
        return [finished[s].tokens for s in sids]

    def timed(make, label):
        rb = make()
        toks = drain(rb, lanes)              # compile + warm
        best, verifies = float("inf"), 0
        for _ in range(args.runs):
            v0 = getattr(rb, "verifies", 0)
            t0 = time.perf_counter()
            toks = drain(rb, lanes)
            wall = time.perf_counter() - t0
            if wall < best:
                best = wall
                verifies = getattr(rb, "verifies", 0) - v0
        # free this mode's multi-GB cache BEFORE the next mode allocates —
        # back-to-back batchers otherwise coexist long enough to OOM the
        # chip at realistic shapes (measured in the round-5 q5 run)
        rb.cache = rb.valid = None
        del rb
        import gc
        gc.collect()
        return toks, best, verifies

    out = {}
    plain_toks, wall, _ = timed(
        lambda: RingBatcher(params, cfg, lanes=lanes, cache_len=cache_p,
                            prompt_len=preg, dp=dp, lora=lora, policy=BF16,
                            steps_per_call=args.spc_plain,
                            kv_int8=args.kv_int8), "plain")
    total = sum(len(x) for x in plain_toks)
    out["plain"] = {"mode": "plain", "tok_s": round(total / wall, 1),
                    "reports_s": round(lanes / wall, 3),
                    "cache_slots": cache_p}

    # controlled proposers: every lane shares the prompt, so one
    # hist_len-indexed table drives all lanes (vmapped proposer sees only
    # (hist, hist_len))
    stream = np.asarray(plain_toks[0], np.int32)
    assert all(x == plain_toks[0] for x in plain_toks), \
        "same-prompt lanes must decode identical streams"
    tbl_oracle = jnp.asarray(np.concatenate([stream,
                                             np.zeros(kk + 2, np.int32)]))

    def oracle(hist, hist_len, _tbl=tbl_oracle, _pl=t, _k=kk):
        return jax.lax.dynamic_slice(_tbl, (hist_len - _pl,), (_k,))

    def junk(hist, hist_len, _k=kk):
        return jnp.ones((_k,), jnp.int32)

    modes = [("oracle", oracle), ("junk", junk), ("ngram", None)]
    if args.pattern:
        pattern = [int(x) for x in args.pattern.split(",")]
        tbl_np = np.ones((t + n_new + kk + 2, kk), np.int32)
        c, it_i = 1, 0
        while c < n_new:
            acc = min(pattern[it_i % len(pattern)], kk, n_new - c - 1)
            row = np.where(stream[c:c + kk] == 1, 2, 1)[:kk]
            row = np.concatenate([row, np.ones(kk - len(row), np.int32)])
            row[:acc] = stream[c:c + acc]
            tbl_np[t + c] = row
            c += acc + 1
            it_i += 1
        tbl = jnp.asarray(tbl_np)

        def realistic(hist, hist_len, _tbl=tbl, _k=kk):
            return jax.lax.dynamic_slice(_tbl, (hist_len, 0), (1, _k))[0]

        modes.insert(1, ("pattern", realistic))

    spec_cls = SpecCompactBatcher if args.compact else SpecRingBatcher
    for mode, proposer in modes:
        toks, wall, verifies = timed(
            lambda: spec_cls(
                params, cfg, lanes=lanes, cache_len=cache_s, prompt_len=preg,
                dp=dp, lora=lora, policy=BF16,
                steps_per_call=args.spc_spec, spec_k=kk, spec_m=args.m,
                kv_int8=args.kv_int8, proposer=proposer), mode)
        total = sum(len(x) for x in toks)
        exact = sum(a == b for a, b in zip(toks, plain_toks))
        out[mode] = {
            "mode": mode, "tok_s": round(total / wall, 1),
            "reports_s": round(lanes / wall, 3),
            "accepted_per_verify": round(total / max(verifies, 1), 2),
            "lanes_token_exact_vs_plain": f"{exact}/{lanes}",
            "cache_slots": cache_s}

    hdr = {"k": kk, "lanes": lanes, "prompt_len": t, "new_tokens": n_new,
           "compact": bool(args.compact), "kv_int8": bool(args.kv_int8),
           "spc_plain": args.spc_plain, "spc_spec": args.spc_spec,
           "note": "oracle = full-acceptance bound; junk = zero-acceptance "
                   "floor; pattern = controlled realistic acceptance; ngram "
                   "rate on synthetic text is not a real-text claim"}
    print(json.dumps(hdr))
    for row in out.values():
        print(json.dumps(row))


if __name__ == "__main__":
    main()
