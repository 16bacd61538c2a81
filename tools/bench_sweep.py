#!/usr/bin/env python
"""Serving-throughput sweep: batch x KV-cache dtype on one TPU chip.

Measures the bench.py pipeline (image -> BioViL-T -> Q-Former -> int8 W8A8
Vicuna-7B -> 300-token greedy decode) at a given batch and KV mode, printing
one JSON line per run. Used to pick the headline batch for bench.py and to
map the HBM capacity cliff (VERDICT r1 weak #5): beyond a live-HBM threshold
XLA historically stopped aliasing the per-layer cache dynamic_update_slice
in place and step time 3x'ed.

Usage: python tools/bench_sweep.py --batch 16 [--kv-int8] [--cache-len 448]
       [--new-tokens 300] [--profile-dir DIR]
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--kv-int8", action="store_true")
    ap.add_argument("--w4", action="store_true",
                    help="W4A8 layer weights (ops/q4_matmul.py) instead of "
                         "the default W8A8")
    ap.add_argument("--cache-len", type=int, default=448)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--new-tokens", type=int, default=300)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--unroll", type=int, default=1,
                    help="tokens decoded per while_loop trip "
                         "(DecodeParams.unroll): amortizes the ~0.9ms fixed "
                         "per-iteration overhead, token-identical to 1")
    ap.add_argument("--two-phase", action="store_true",
                    help="prefill/decode as separate executables with a "
                         "donated cache (engine.generate_two_phase)")
    ap.add_argument("--shared-prefix", type=int, default=0, metavar="P0",
                    help="treat the first P0 prompt tokens as a batch-wide "
                         "shared prefix prefilled ONCE "
                         "(engine.generate_shared_prefix); the <IMG> run "
                         "moves into the per-lane remainder and the per-lane "
                         "cache shrinks by P0 slots. bf16 KV only.")
    ap.add_argument("--profile-dir", default=None)
    ap.add_argument("--mem", action="store_true",
                    help="don't run: AOT-compile the serving step and print "
                         "its HBM budget (argument/output/temp bytes) — maps "
                         "where the capacity cliff comes from")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from bench import build_serving_params  # shared synthetic-weight builder
    from radialog_tpu.decode.engine import (DecodeParams, generate,
                                            generate_shared_prefix,
                                            generate_two_phase)
    from radialog_tpu.models.biovil_t import (biovil_t_apply, biovil_t_init,
                                              patch_tokens_for_qformer)
    from radialog_tpu.models.blip2 import Blip2Config, blip2_forward_image
    from radialog_tpu.models.llama import VICUNA_7B, lora_init
    from radialog_tpu.models.qformer import qformer_init
    from radialog_tpu.ops.layers import BF16, layernorm, layernorm_init

    cfg = VICUNA_7B
    bcfg = Blip2Config()
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    params = build_serving_params(cfg, k1, bits=4 if args.w4 else 8)
    lora = lora_init(k2, cfg, dtype=jnp.bfloat16)
    vis_params, vis_state = biovil_t_init(
        k3, joint_feature_size=bcfg.qformer.encoder_width)
    qf_params = {"qformer": qformer_init(k4, bcfg.qformer),
                 "ln_vision": layernorm_init(bcfg.qformer.encoder_width)}
    jax.block_until_ready(jax.tree_util.tree_leaves(params))

    B = args.batch
    p0 = args.shared_prefix
    if p0 and args.two_phase:
        ap.error("--shared-prefix requires the fused path")
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, 448, 448, 3)), jnp.float32)
    if p0:
        # prefix = first P0 tokens, identical across the batch (the RaDialog
        # system prompt + instruction boilerplate); the per-lane remainder
        # carries the <IMG> run. Per-lane cache shrinks by P0 slots.
        prefix_tokens = jnp.asarray(
            rng.integers(3, 30000, (p0,)).astype(np.int32))
        t1 = args.prompt_len - p0
        rem = rng.integers(3, 30000, (B, t1)).astype(np.int32)
        rem[:, 4:4 + cfg.num_img_tokens] = cfg.img_token_id
        tokens = jnp.asarray(rem)
        lengths = jnp.full((B,), t1, jnp.int32)
    else:
        prompt = rng.integers(3, 30000, (B, args.prompt_len)).astype(np.int32)
        prompt[:, 4:4 + cfg.num_img_tokens] = cfg.img_token_id
        tokens = jnp.asarray(prompt)
        lengths = jnp.full((B,), args.prompt_len, jnp.int32)
    lane_cache = args.cache_len - p0  # same TOTAL sequence capacity per lane
    dp = DecodeParams(max_new_tokens=args.new_tokens, eos_token_id=-1,
                      unroll=args.unroll)

    @jax.jit
    def embed_step(vis_params, vis_state, qf_params, images):
        out, _ = biovil_t_apply(vis_params, vis_state, images, policy=BF16)
        patch = patch_tokens_for_qformer(out.projected_patch_embeddings)
        patch = layernorm(qf_params["ln_vision"], patch)
        return blip2_forward_image(qf_params, bcfg, patch, policy=BF16)

    @jax.jit
    def fused_step(vis_params, vis_state, qf_params, params, lora, images,
                   tokens, lengths):
        # round-1 headline shape: ONE executable for vision+prefill+decode
        out, _ = biovil_t_apply(vis_params, vis_state, images, policy=BF16)
        patch = patch_tokens_for_qformer(out.projected_patch_embeddings)
        patch = layernorm(qf_params["ln_vision"], patch)
        embs = blip2_forward_image(qf_params, bcfg, patch, policy=BF16)
        if p0:
            return generate_shared_prefix(
                params, cfg, prefix_tokens, tokens, lengths, dp,
                img_embs=embs, lora=lora, policy=BF16, cache_len=lane_cache,
                kv_int8=args.kv_int8)
        return generate(params, cfg, tokens, lengths, dp, img_embs=embs,
                        lora=lora, policy=BF16, cache_len=args.cache_len,
                        kv_int8=args.kv_int8)

    def report_step(vis_params, vis_state, qf_params, params, lora, images,
                    tokens, lengths):
        if args.two_phase:
            embs = embed_step(vis_params, vis_state, qf_params, images)
            return generate_two_phase(
                params, cfg, tokens, lengths, dp, img_embs=embs, lora=lora,
                policy=BF16, cache_len=args.cache_len, kv_int8=args.kv_int8)
        return fused_step(vis_params, vis_state, qf_params, params, lora,
                          images, tokens, lengths)

    if args.mem:
        lowered = fused_step.lower(vis_params, vis_state, qf_params, params,
                                   lora, images, tokens, lengths)
        compiled = lowered.compile()
        m = compiled.memory_analysis()
        print(json.dumps({
            "batch": B, "kv_int8": bool(args.kv_int8),
            "cache_len": args.cache_len,
            "argument_gib": round(m.argument_size_in_bytes / 2**30, 3),
            "output_gib": round(m.output_size_in_bytes / 2**30, 3),
            "temp_gib": round(m.temp_size_in_bytes / 2**30, 3),
            "alias_gib": round(m.alias_size_in_bytes / 2**30, 3),
            "peak_gib": round((m.argument_size_in_bytes
                               + m.output_size_in_bytes
                               + m.temp_size_in_bytes
                               - m.alias_size_in_bytes) / 2**30, 3),
        }))
        return

    res = report_step(vis_params, vis_state, qf_params, params, lora, images,
                      tokens, lengths)
    np.asarray(res.tokens)

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    t0 = time.time()
    for _ in range(args.runs):
        res = report_step(vis_params, vis_state, qf_params, params, lora,
                          images, tokens, lengths)
        np.asarray(res.tokens)
    dt = time.time() - t0
    if args.profile_dir:
        jax.profiler.stop_trace()

    rps = args.runs * B / dt
    print(json.dumps({
        "batch": B, "kv_int8": bool(args.kv_int8), "w4": bool(args.w4),
        "two_phase": bool(args.two_phase), "shared_prefix": p0,
        "cache_len": args.cache_len, "new_tokens": args.new_tokens,
        "reports_per_sec": round(rps, 4),
        "ms_per_token": round(dt / args.runs / args.new_tokens * 1000, 3),
    }))


if __name__ == "__main__":
    main()
