#!/usr/bin/env python
"""Throughput of the all-findings-QA serving shape (test.py:612-674):
"List all the findings" over batches of DISTINCT studies — the reference
runs this at batch 5 with max_new_tokens 30.

Unlike the binary-QA pass (bench_qa_pass.py — 14 questions about ONE
study, whole-history prefix sharing), every lane here carries a different
image, so only the ~48-token boilerplate prefix (Vicuna system prompt +
"USER: Image information: ", capped before the first <IMG> because the
spliced K/V differ per lane — apps/pipeline.py `_shared_prefix_len`) is
shared. Compares:

  plain   — generate_jit, each lane prefills its full history + question;
  shared  — generate_shared_jit with the common 48-token prefix prefilled
            once (the serving default the pipeline picks automatically).

Usage: python tools/bench_allqa_pass.py [--hist-len 448] [--batch 5]
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
                    help="per-study tokens: prompt + generated report")
    ap.add_argument("--q-len", type=int, default=16,
                    help="'List all the findings...' turn")
    ap.add_argument("--new-tokens", type=int, default=30)   # test.py:630
    ap.add_argument("--batch", type=int, default=5)         # test.py:615
    ap.add_argument("--prefix", type=int, default=48,
                    help="shared boilerplate tokens before the <IMG> run")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--kv-int8", action=argparse.BooleanOptionalAction,
                    default=True)
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
    B, H, Q, P0 = args.batch, args.hist_len, args.q_len, args.prefix
    # distinct per-lane histories; every lane starts with the same
    # boilerplate and carries its own <IMG> run right after it
    prefix = rng.integers(3, 30000, (P0,)).astype(np.int32)
    rem = rng.integers(3, 30000, (B, H - P0 + Q)).astype(np.int32)
    rem[:, 2:2 + cfg.num_img_tokens] = cfg.img_token_id
    embs = jnp.asarray(rng.normal(size=(B, cfg.num_img_tokens,
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

    full = np.concatenate([np.tile(prefix[None], (B, 1)), rem], axis=1)
    lens = np.full((B,), H + Q, np.int32)
    plain_cache = -(-(H + Q + args.new_tokens) // 32) * 32
    t_plain = timed(generate_jit, params, cfg, jnp.asarray(full),
                    jnp.asarray(lens), dp, img_embs=embs, lora=lora,
                    policy=BF16, cache_len=plain_cache,
                    kv_int8=args.kv_int8)

    lane_cache = -(-(H - P0 + Q + args.new_tokens) // 32) * 32
    t_shared = timed(generate_shared_jit, params, cfg, jnp.asarray(prefix),
                     jnp.asarray(rem), jnp.full((B,), H - P0 + Q, jnp.int32),
                     dp, img_embs=embs, lora=lora, policy=BF16,
                     cache_len=lane_cache, kv_int8=args.kv_int8)

    print(json.dumps({
        "batch": B, "hist_len": H, "q_len": Q, "prefix": P0,
        "new_tokens": args.new_tokens, "kv_int8": bool(args.kv_int8),
        "plain_s_per_batch": round(t_plain, 4),
        "shared_s_per_batch": round(t_shared, 4),
        "plain_s_per_study": round(t_plain / B, 4),
        "shared_s_per_study": round(t_shared / B, 4),
        "speedup": round(t_plain / t_shared, 2),
    }))


if __name__ == "__main__":
    main()
