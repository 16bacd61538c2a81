#!/usr/bin/env python
"""Speculative-decoding bench: batch-1 Vicuna-7B greedy on one TPU chip.

Decode is HBM-bandwidth-bound — every weight byte is re-read per forward —
so a (k+1)-token verification step should cost barely more than a 1-token
step. This tool measures exactly that tradeoff for the prompt-lookup
speculative engine (decode/speculative.py):

  plain   — the production 1-token loop (decode/engine.py), the baseline;
  oracle  — spec decode whose drafts are the model's own greedy stream
            (precomputed by the plain run): 100%% acceptance, the k-step
            UPPER BOUND and the honest way to measure verification-step
            cost with synthetic weights (random weights generate text with
            no self-overlap, so real n-gram acceptance is text-dependent:
            high for correction/QA turns whose outputs echo the prompt,
            ~0 here);
  ngram   — the shipped prompt-lookup drafter on the same synthetic prompt:
            the ~0%%-acceptance WORST CASE, i.e. the overhead a user pays
            when drafts never hit.

Prints one JSON line per mode: tokens/s, verification forwards run,
ms per forward, accepted tokens per forward.

Usage: python tools/bench_spec.py [--k 5] [--prompt-len 448]
       [--new-tokens 300] [--kv-int8] [--runs 2]
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
    ap.add_argument("--k", type=int, default=5, help="draft tokens per step")
    ap.add_argument("--m", type=int, default=3, help="n-gram match length")
    ap.add_argument("--prompt-len", type=int, default=448,
                    help="correction-turn scale: conversation + report")
    ap.add_argument("--new-tokens", type=int, default=300)
    ap.add_argument("--kv-int8", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--accept-pattern", type=str, default=None,
                    help="comma-separated ints: adds a 'realistic' mode whose "
                         "drafts match the true greedy stream for pattern[i] "
                         "tokens on iteration i (cycling) then mismatch — a "
                         "MEASURED e2e wall at a controlled acceptance rate. "
                         "'1,2' = 2.5 emitted/forward, the realistic "
                         "correction-pass rate from tools/spec_acceptance.py")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from bench import build_serving_params
    from radialog_tpu.decode.engine import DecodeParams, generate_jit
    from radialog_tpu.decode.speculative import generate_spec_jit
    from radialog_tpu.models.llama import VICUNA_7B, lora_init
    from radialog_tpu.ops.layers import BF16

    cfg = VICUNA_7B
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = build_serving_params(cfg, k1, bits=8)
    lora = lora_init(k2, cfg, dtype=jnp.bfloat16)
    jax.block_until_ready(jax.tree_util.tree_leaves(params))

    rng = np.random.default_rng(0)
    t = args.prompt_len
    prompt = rng.integers(3, 30000, (1, t)).astype(np.int32)
    tokens = jnp.asarray(prompt)
    lengths = jnp.full((1,), t, jnp.int32)
    dp = DecodeParams(max_new_tokens=args.new_tokens, eos_token_id=-1)
    cache_len = ((t + args.new_tokens + args.k + 1 + 127) // 128) * 128

    def timed(fn, *fargs, **kw):
        # block_until_ready can return early under the axon tunnel — force
        # completion by pulling a tiny result to host (verify skill notes)
        res = fn(*fargs, **kw)
        np.asarray(res.lengths)                          # compile + warm
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            res = fn(*fargs, **kw)
            np.asarray(res.lengths)
            best = min(best, time.perf_counter() - t0)
        return res, best

    out = {}
    plain, wall = timed(generate_jit, params, cfg, tokens, lengths, dp,
                        lora=lora, policy=BF16, cache_len=cache_len,
                        kv_int8=args.kv_int8)
    n = int(plain.lengths[0])
    out["plain"] = {"mode": "plain", "tok_s": round(n / wall, 1),
                    "forwards": n, "ms_per_forward": round(1e3 * wall / n, 2),
                    "accepted_per_forward": 1.0}

    stream = jnp.asarray(np.asarray(plain.tokens)[0], jnp.int32)
    pad = jnp.zeros((args.k,), jnp.int32)
    oracle_tbl = jnp.concatenate([stream, pad])
    kk = args.k

    def oracle(hist, hist_len, _tbl=oracle_tbl, _pl=t, _k=kk):
        return jax.lax.dynamic_slice(_tbl, (hist_len - _pl,), (_k,))

    def junk(hist, hist_len, _k=kk):
        # drafts that never match the greedy argmax (vocab row 1 = <unk>-ish
        # id the random model never argmaxes in practice): acceptance 0,
        # i.e. the pure overhead floor of running (k+1)-wide steps
        return jnp.ones((_k,), jnp.int32)

    modes = [("oracle", oracle), ("ngram", None), ("junk", junk)]
    if args.accept_pattern:
        pattern = [int(x) for x in args.accept_pattern.split(",")]
        # Precompute a hist_len-indexed draft table that matches the true
        # stream for exactly pattern[i % len] tokens on iteration i: under
        # greedy teacher forcing the model's post-accepted-prefix argmax IS
        # the true next token, so the engine's acceptance per iteration is
        # controlled exactly (the emission walk below mirrors the engine's
        # emit = accepted + 1, so every visited hist_len row is populated).
        stream_np = np.asarray(stream)
        n_new, pl = args.new_tokens, t
        tbl_np = np.ones((pl + n_new + args.k + 2, args.k), np.int32)
        c, it_i = 1, 0
        while c < n_new:
            acc = min(pattern[it_i % len(pattern)], args.k, n_new - c - 1)
            row = np.where(stream_np[c:c + args.k] == 1, 2, 1)[:args.k]
            row = np.concatenate([row, np.ones(args.k - len(row), np.int32)])
            row[:acc] = stream_np[c:c + acc]
            tbl_np[pl + c] = row
            c += acc + 1
            it_i += 1
        tbl = jnp.asarray(tbl_np)

        def realistic(hist, hist_len, _tbl=tbl, _k=args.k):
            return jax.lax.dynamic_slice(_tbl, (hist_len, 0), (1, _k))[0]

        modes.append(("realistic", realistic))

    for mode, proposer in modes:
        res, wall = timed(generate_spec_jit, params, cfg, tokens, dp,
                          k=args.k, m=args.m, lora=lora, policy=BF16,
                          cache_len=cache_len, kv_int8=args.kv_int8,
                          proposer=proposer)
        assert (np.asarray(res.tokens) == np.asarray(plain.tokens)).all(), \
            f"{mode} output diverged from plain greedy"
        it = int(res.iters) + 1  # + the prefill forward's first token
        n = int(res.lengths[0])
        out[mode] = {"mode": mode, "tok_s": round(n / wall, 1),
                     "forwards": it,
                     "ms_per_forward": round(1e3 * wall / it, 2),
                     "accepted_per_forward": round(n / it, 2)}

    hdr = {"k": args.k, "m": args.m, "prompt_len": t,
           "new_tokens": args.new_tokens, "kv": "int8" if args.kv_int8
           else "bf16", "note": "oracle = full-acceptance upper bound; "
           "junk = zero-acceptance overhead floor; ngram = the shipped "
           "drafter (random-weight greedy text degenerates into repetition, "
           "which prompt-lookup catches — real-text acceptance is workload-"
           "dependent, highest on correction/QA turns)"}
    if args.accept_pattern:
        hdr["accept_pattern"] = args.accept_pattern
    print(json.dumps(hdr))
    for mode in out:
        print(json.dumps(out[mode]))


if __name__ == "__main__":
    main()
