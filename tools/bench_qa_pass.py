#!/usr/bin/env python
"""Throughput of the binary-QA serving shape (BASELINE config 5 /
test.py:536-610): 14 yes/no questions about ONE study, each prompt =
~`--hist-len`-token shared conversation history (incl. the 32-token <IMG>
run) + a ~`--q-len`-token question, 10 new tokens.

Compares the plain batched path (history prefilled and re-read per lane)
against image-in-prefix sharing (apps/pipeline.py `_shared_prefix_len`
same-image detection -> decode/engine.py `prefix_img_embs`): the history
is prefilled ONCE and each lane's cache holds only the question.

Usage: python tools/bench_qa_pass.py [--hist-len 448] [--q-len 16]
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
    ap.add_argument("--hist-len", type=int, default=448,
                    help="shared history tokens (prompt + generated report)")
    ap.add_argument("--q-len", type=int, default=16)
    ap.add_argument("--new-tokens", type=int, default=10)  # test.py:553
    ap.add_argument("--batch", type=int, default=14)       # 14 findings
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--kv-int8", action=argparse.BooleanOptionalAction,
                    default=True, help="--no-kv-int8 measures the bf16 cache")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from bench import build_serving_params
    from radialog_tpu.decode.engine import (DecodeParams, generate_jit,
                                            generate_shared_jit)
    from radialog_tpu.models.llama import VICUNA_7B, lora_init
    from radialog_tpu.ops.layers import BF16

    cfg = VICUNA_7B
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = build_serving_params(cfg, k1)
    lora = lora_init(k2, cfg, dtype=jnp.bfloat16)
    jax.block_until_ready(jax.tree_util.tree_leaves(params))

    rng = np.random.default_rng(0)
    B, H, Q = args.batch, args.hist_len, args.q_len
    hist = rng.integers(3, 30000, (H,)).astype(np.int32)
    hist[4:4 + cfg.num_img_tokens] = cfg.img_token_id
    qs = rng.integers(3, 30000, (B, Q)).astype(np.int32)
    emb1 = jnp.asarray(rng.normal(size=(1, cfg.num_img_tokens,
                                        cfg.qformer_dim)), jnp.float32)
    dp = DecodeParams(max_new_tokens=args.new_tokens, eos_token_id=-1)

    def timed(fn, *a, **kw):
        res = fn(*a, **kw)
        np.asarray(res.tokens)
        t0 = time.time()
        for _ in range(args.runs):
            res = fn(*a, **kw)
            np.asarray(res.tokens)
        return (time.time() - t0) / args.runs

    # plain path: every lane carries the full history + its question
    full = np.concatenate([np.tile(hist[None], (B, 1)), qs], axis=1)
    lens = np.full((B,), H + Q, np.int32)
    plain_cache = -(-(H + Q + args.new_tokens) // 32) * 32
    t_plain = timed(generate_jit, params, cfg, jnp.asarray(full),
                    jnp.asarray(lens), dp,
                    img_embs=jnp.tile(emb1, (B, 1, 1)), lora=lora,
                    policy=BF16, cache_len=plain_cache,
                    kv_int8=args.kv_int8)

    # image-in-prefix sharing: history prefilled once
    lane_cache = -(-(Q + args.new_tokens) // 32) * 32
    t_shared = timed(generate_shared_jit, params, cfg, jnp.asarray(hist),
                     jnp.asarray(qs), jnp.full((B,), Q, jnp.int32), dp,
                     prefix_img_embs=emb1, lora=lora, policy=BF16,
                     cache_len=lane_cache, kv_int8=args.kv_int8)

    print(json.dumps({
        "batch": B, "hist_len": H, "q_len": Q,
        "new_tokens": args.new_tokens, "kv_int8": bool(args.kv_int8),
        "plain_s_per_study": round(t_plain, 4),
        "shared_s_per_study": round(t_shared, 4),
        "speedup": round(t_plain / t_shared, 2),
    }))


if __name__ == "__main__":
    main()
