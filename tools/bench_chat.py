#!/usr/bin/env python
"""Multi-turn chat latency bench: Vicuna-7B, batch 1, one TPU chip.

Measures the interactive-demo serving path (decode/session.py through
apps/chat.py) the way a user experiences it: wall time per TURN
(append the turn's tokens + generate the full reply). The reference demo
re-encodes and re-prefills the WHOLE conversation every turn
(reference demo.py:281-297) and pays HF generate() dispatch per token;
here the session keeps a persistent KV cache and each turn costs
O(new tokens), with jit-cached entry points (one compile per shape
signature — the turn offset is traced data, decode/session.py).

Modes:
  session — InteractiveSession incremental prefill + cached decode
            executables (the production chat path);
  reprefill — the reference-shaped alternative: one fused
            generate_jit over the full concatenated history each turn
            (prefill cost grows with the conversation; compile count
            grows with the number of distinct prompt-length buckets);
  session+spec (--spec) — session turns decoded speculatively
            (prompt-lookup drafting, decode/speculative.py). Random-
            weight text makes ngram acceptance unrepresentative (see
            tools/bench_spec.py) — this row measures the session-spec
            PLUMBING cost at whatever acceptance the synthetic text
            yields, not a real-text speedup claim.

Conversation shape (RaDialog demo flow, reference demo.py:245-305):
turn 1 = report-generation prompt (image tokens + findings + instruction,
~128 tokens) -> 300-token report; follow-ups = short QA/correction turns
(~24 tokens) -> 64-token replies.

Each mode runs the conversation twice: conv 1 pays every compile (cold),
conv 2 reuses the jit caches (warm — the steady-state a chat server
actually serves). Prints one JSON line per mode with per-turn walls.

Usage: python tools/bench_chat.py [--turns 3] [--unroll 1] [--spec]
       [--report-tokens 300] [--reply-tokens 64]
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
    ap.add_argument("--turns", type=int, default=3,
                    help="follow-up turns after the report turn")
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--turn-len", type=int, default=24)
    ap.add_argument("--report-tokens", type=int, default=300)
    ap.add_argument("--reply-tokens", type=int, default=64)
    ap.add_argument("--cache-len", type=int, default=1024)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--spec", action="store_true")
    ap.add_argument("--spec-k", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from bench import build_serving_params
    from radialog_tpu.decode.engine import DecodeParams, generate_jit
    from radialog_tpu.decode.kvcache import bucket_length
    from radialog_tpu.decode.session import InteractiveSession
    from radialog_tpu.models.llama import VICUNA_7B, lora_init
    from radialog_tpu.ops.layers import BF16

    cfg = VICUNA_7B
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = build_serving_params(cfg, k1, bits=8)
    lora = lora_init(k2, cfg, dtype=jnp.bfloat16)
    jax.block_until_ready(jax.tree_util.tree_leaves(params))

    rng = np.random.default_rng(0)
    prompt = [int(x) for x in rng.integers(3, 30000, args.prompt_len)]
    turns = [[int(x) for x in rng.integers(3, 30000, args.turn_len)]
             for _ in range(args.turns)]
    dp_report = DecodeParams(max_new_tokens=args.report_tokens,
                             eos_token_id=-1, unroll=args.unroll)
    dp_reply = DecodeParams(max_new_tokens=args.reply_tokens,
                            eos_token_id=-1, unroll=args.unroll)

    def run_session(spec: bool):
        sess = InteractiveSession(params, cfg, lora=lora, policy=BF16,
                                  cache_len=args.cache_len)
        walls = []
        for conv in range(2):
            sess.reset()
            per_turn = []
            for i, (ids, dp) in enumerate(
                    [(prompt, dp_report)] + [(t, dp_reply) for t in turns]):
                t0 = time.perf_counter()
                sess.append_tokens(ids)
                if spec:
                    out = sess.generate_spec(dp, k=args.spec_k, m=3)
                else:
                    out = sess.generate(dp)
                per_turn.append(round(time.perf_counter() - t0, 3))
                assert len(out) == dp.max_new_tokens
            walls.append(per_turn)
        return walls

    def run_reprefill():
        walls = []
        hist: list = []
        for conv in range(2):
            hist = []
            per_turn = []
            for i, (ids, dp) in enumerate(
                    [(prompt, dp_report)] + [(t, dp_reply) for t in turns]):
                hist = hist + list(ids)
                toks = jnp.asarray(hist, jnp.int32)[None]
                lengths = jnp.full((1,), len(hist), jnp.int32)
                cl = bucket_length(len(hist) + dp.max_new_tokens)
                t0 = time.perf_counter()
                res = generate_jit(params, cfg, toks, lengths, dp, lora=lora,
                                   policy=BF16, cache_len=cl)
                new = [int(x) for x in
                       np.asarray(res.tokens)[0, :int(res.lengths[0])]]
                per_turn.append(round(time.perf_counter() - t0, 3))
                hist = hist + new
            walls.append(per_turn)
        return walls

    def report(mode, walls):
        cold, warm = walls
        print(json.dumps({
            "mode": mode, "cold_turns_s": cold, "warm_turns_s": warm,
            "warm_followup_mean_s": round(sum(warm[1:]) / max(len(warm) - 1,
                                                              1), 3),
            "warm_report_tok_s": round(args.report_tokens / warm[0], 1)}))

    print(json.dumps({
        "prompt_len": args.prompt_len, "turn_len": args.turn_len,
        "report_tokens": args.report_tokens, "reply_tokens": args.reply_tokens,
        "turns": 1 + args.turns, "cache_len": args.cache_len,
        "unroll": args.unroll,
        "note": "cold = conv 1 (includes every compile); warm = conv 2 "
                "(steady state). reprefill re-prefills the full history per "
                "turn (the reference demo's shape)."}))
    report("session", run_session(spec=False))
    if args.spec:
        report("session+spec", run_session(spec=True))
    report("reprefill", run_reprefill())


if __name__ == "__main__":
    main()
