#!/usr/bin/env python
"""Interactive-serving benchmark: RingBatcher continuous batching at
Vicuna-7B serving shapes on one TPU chip (BASELINE config 5).

Measures steady-state aggregate decode throughput with `lanes` concurrent
sessions over the unrolled int8 W8A8 weights + bf16 KV cache — the
configuration that fits a single 16GB chip (bf16 weights alone would not) —
with sessions admitted staggered so the lane mix churns like a live server.
The reference's demo serves ONE conversation at a time (demo.py, each
generate() call owns the GPU); per-session latency here is one shared step
per token while throughput scales with occupied lanes.

Prints one JSON line: aggregate tok/s, per-session tok/s, and the
admission (prefill) latency.

Usage: python tools/bench_interactive.py [--lanes 8] [--cache-len 512]
       [--prompt-len 128] [--new-tokens 64] [--sessions 16]
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
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--cache-len", type=int, default=512)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--sessions", type=int, default=16)
    ap.add_argument("--steps-per-call", type=int, default=8,
                    help="decode steps per jit call (amortizes the ~30ms "
                         "tunnel dispatch; admission granularity = k tokens)")
    ap.add_argument("--no-donate", action="store_true",
                    help="do not donate the cache into the step call "
                         "(measurement knob: donated args that are also "
                         "scan carries get double-buffered, docs/PERF.md)")
    ap.add_argument("--w4", action="store_true",
                    help="W4A8 weights (3.6GB vs 7GB — headroom for more "
                         "lanes)")
    ap.add_argument("--kv-int8", action="store_true",
                    help="int8 ring cache (per-lane interval-masked "
                         "flash-decode; halves per-lane cache bytes — "
                         "~2x the lanes fit)")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from bench import build_serving_params
    from radialog_tpu.decode.continuous import RingBatcher
    from radialog_tpu.decode.engine import DecodeParams
    from radialog_tpu.models.llama import VICUNA_7B
    from radialog_tpu.ops.layers import BF16

    cfg = VICUNA_7B
    params = build_serving_params(cfg, jax.random.PRNGKey(0),
                                  bits=4 if args.w4 else 8)
    jax.block_until_ready(jax.tree_util.tree_leaves(params))

    # prompt region must hold the bucketed prompt; ring takes the rest
    prompt_region = ((args.prompt_len + 31) // 32) * 32
    rb = RingBatcher(params, cfg, lanes=args.lanes, cache_len=args.cache_len,
                     prompt_len=prompt_region,
                     dp=DecodeParams(max_new_tokens=args.new_tokens,
                                     eos_token_id=-1),  # run full length
                     policy=BF16, steps_per_call=args.steps_per_call,
                     donate_cache=not args.no_donate,
                     kv_int8=args.kv_int8)

    rng = np.random.default_rng(0)

    def make_prompt():
        return [int(x) for x in rng.integers(3, 30000, args.prompt_len)]

    # warm-up: compile prefill + step with one session
    rb.submit(make_prompt())
    t0 = time.time()
    rb.step()
    admit_s = time.time() - t0          # includes prefill compile+run
    rb.step()
    t0 = time.time()
    rb.step()
    step_warm = time.time() - t0

    # measure one more admission now that prefill is compiled
    rb.submit(make_prompt())
    t0 = time.time()
    rb.step()
    admit_warm_s = time.time() - t0
    rb.run()                             # drain the two warm-up sessions

    # steady-state: keep all lanes occupied, staggered admissions
    for _ in range(args.sessions):
        rb.submit(make_prompt())
    done_before = sum(len(s.tokens) for s in rb.finished.values())
    t0 = time.time()
    steps = 0
    while rb.queue or rb.active_lanes:
        rb.step()
        steps += 1
        if steps > args.sessions * (args.new_tokens + 8):
            raise RuntimeError("scheduler did not drain")
    dt = time.time() - t0
    total_tokens = sum(len(s.tokens) for s in rb.finished.values()) - done_before

    print(json.dumps({
        "lanes": args.lanes, "sessions": args.sessions,
        "prompt_len": args.prompt_len, "new_tokens": args.new_tokens,
        "cache_len": args.cache_len, "steps_per_call": args.steps_per_call,
        "w4": bool(args.w4),
        "aggregate_tok_per_s": round(total_tokens / dt, 1),
        "per_session_tok_per_s": round(total_tokens / dt / args.lanes, 1),
        "chunk_ms": round(step_warm * 1000, 2),
        "ms_per_tok": round(step_warm * 1000 / args.steps_per_call, 2),
        "admit_ms_warm": round(admit_warm_s * 1000, 1),
    }))


if __name__ == "__main__":
    main()
