#!/usr/bin/env python
"""Boot-time warmup measurement (round-3 verdict #5 — cold start as an ops
concern).

Builds the quantized Vicuna-7B serving weights and times
InteractiveSession.warmup(dp) in THIS process: with an empty
JAX_COMPILATION_CACHE_DIR that is the true cold boot (full decode-graph
compile); with `.jax_cache/` populated it is the warm boot a redeploy pays.
Run twice (or with --cache-dir pointing at a temp dir) to get both numbers.

Usage: python tools/bench_warmup.py [--spec] [--cache-dir DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", default="/root/repo/.jax_cache")
    ap.add_argument("--spec", action="store_true",
                    help="also warm the speculative loop (k=5)")
    ap.add_argument("--max-new", type=int, default=300)
    ap.add_argument("--cache-len", type=int, default=1024)
    args = ap.parse_args()
    os.environ["JAX_COMPILATION_CACHE_DIR"] = args.cache_dir

    import jax

    jax.config.update("jax_compilation_cache_dir", args.cache_dir)

    from bench import build_serving_params
    from radialog_tpu.decode.engine import DecodeParams
    from radialog_tpu.decode.session import InteractiveSession
    from radialog_tpu.models.llama import VICUNA_7B, lora_init
    from radialog_tpu.ops.layers import BF16

    t_boot = time.time()
    cfg = VICUNA_7B
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = build_serving_params(cfg, k1)
    lora = lora_init(k2, cfg, dtype=__import__("jax.numpy", fromlist=["x"]).bfloat16)
    jax.block_until_ready(jax.tree_util.tree_leaves(params))
    t_weights = time.time() - t_boot

    sess = InteractiveSession(params, cfg, lora=lora, policy=BF16,
                              cache_len=args.cache_len)
    dp = DecodeParams(max_new_tokens=args.max_new, eos_token_id=-1)
    spent = sess.warmup(dp, turn_lengths=(128,),
                        spec_k=5 if args.spec else 0)

    # post-warmup first REAL turn: what the first user pays after boot
    import numpy as np
    ids = [int(x) for x in np.random.default_rng(0).integers(3, 30000, 120)]
    t0 = time.time()
    sess.append_tokens(ids)
    out = sess.generate(dp)
    first_turn = time.time() - t0

    print(json.dumps({
        "weights_s": round(t_weights, 1),
        "warmup_s": round(spent, 1),
        "first_turn_s": round(first_turn, 2),
        "tokens": len(out),
        "cache_dir": args.cache_dir,
    }))


if __name__ == "__main__":
    main()
