#!/usr/bin/env python
"""Teacher-forced per-step decode LOGIT error of the int8 KV cache.

Greedy-token agreement on random weights is a meaningless quality metric
(tools/measure_quant.py: near-uniform logits flip argmax on ANY rounding —
even the accepted W8A8 weight default "agrees" on only ~15 % of tokens).
This measures the transferable quantity for the KV cache instead: decode
BOTH cache dtypes over the SAME forced token sequence (the bf16-KV greedy
output) with the SAME int8 W8A8 weights and BF16 policy, so the per-step
logit delta is attributable to KV rounding alone, then normalize by the
per-step logit std. Comparison points (tools/measure_quant.py, same
normalization): bf16's own rounding floor 0.010, the accepted W8A8 serving
default 0.049, the opt-in W4A8 0.402.

Teacher forcing matters: free-running decode compounds a single early
argmax flip into a different trajectory, which measures trajectory
sensitivity (huge on random weights), not cache fidelity.

Runs on the real TPU by default (the int8 path dispatches the Pallas
flash-decode kernel — the thing that actually serves); the CPU fallback
exercises the XLA int8 dot path with identical quantization math.

Usage: python tools/measure_kv_logit_err.py [--seeds 3] [--layers 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--vocab", type=int, default=32001)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from radialog_tpu.decode.engine import DecodeParams, generate, prefill
    from radialog_tpu.models.llama import (LlamaConfig, decode_bias_static_slot,
                                           llama_apply, llama_init)
    from radialog_tpu.ops.layers import BF16
    from radialog_tpu.ops.quant import quantize_llama_host

    cfg = LlamaConfig(vocab_size=args.vocab, hidden_size=4096,
                      num_layers=args.layers, num_heads=32, num_kv_heads=32,
                      intermediate_size=11008)
    t = args.prompt_len
    cache_len = t + args.steps + 8

    def forced_logits(params, toks, lens, forced, kv_int8: bool):
        """Prefill + teacher-forced decode; (B, steps, V) per-step logits."""
        cache, last = prefill(params, cfg, toks, lens, cache_len,
                              policy=BF16, kv_int8=kv_int8)

        def body(carry, xs):
            step, cache = carry
            tok = xs                                     # (B,) forced input
            pos = (lens + step)[:, None]
            bias = decode_bias_static_slot(lens, t, step, cache_len)
            logits, cache = llama_apply(
                params, cfg, tok[:, None], pos, bias, cache=cache,
                write_pos=t + step, policy=BF16, lengths=lens,
                slot_info=(t, step))
            return (step + 1, cache), logits[:, 0]

        (_, _), step_logits = jax.lax.scan(
            body, (jnp.asarray(0), cache), forced.T)
        return last, step_logits.transpose(1, 0, 2)     # (B, steps, V)

    jit_forced = jax.jit(forced_logits, static_argnames=("kv_int8",))

    per_step_err = []          # (seeds*batch, steps) normalized |delta|
    argmax_agree = []
    for seed in range(args.seeds):
        params = llama_init(jax.random.PRNGKey(seed), cfg)
        qp = quantize_llama_host(jax.tree_util.tree_map(np.asarray, params))
        del params
        rng = np.random.default_rng(seed)
        toks = jnp.asarray(rng.integers(3, args.vocab - 2, (args.batch, t)))
        lens = jnp.asarray(rng.integers(t // 2, t, args.batch), jnp.int32)

        # the forced sequence: bf16-KV greedy continuation (args.steps ids
        # fed as INPUTS; step i's logits predict token i+1)
        dp = DecodeParams(max_new_tokens=args.steps + 1, eos_token_id=-1)
        forced = jnp.asarray(np.asarray(
            generate(qp, cfg, toks, lens, dp, policy=BF16,
                     cache_len=cache_len).tokens)[:, :args.steps])

        _, ref = jit_forced(qp, toks, lens, forced, kv_int8=False)
        _, got = jit_forced(qp, toks, lens, forced, kv_int8=True)
        ref = np.asarray(ref, np.float32)
        got = np.asarray(got, np.float32)
        sigma = ref.std(axis=-1)                         # (B, steps)
        per_step_err.append(np.abs(got - ref).mean(-1) / sigma)
        argmax_agree.append((got.argmax(-1) == ref.argmax(-1)).mean())
        print(f"seed {seed}: step-mean normalized err "
              f"{per_step_err[-1].mean():.5f}")

    err = np.concatenate(per_step_err, axis=0)           # (N, steps)
    out = {
        "mode": "kv_int8 vs bf16 KV (same W8A8 weights, teacher-forced)",
        "layers": args.layers, "seeds": args.seeds, "batch": args.batch,
        "prompt_len": t, "steps": args.steps,
        "logit_err_per_sigma_mean": round(float(err.mean()), 5),
        "logit_err_per_sigma_p95": round(float(np.percentile(err, 95)), 5),
        "logit_err_last_step": round(float(err[:, -1].mean()), 5),
        "argmax_agreement_teacher_forced": round(
            float(np.mean(argmax_agree)), 4),
        "reference_points": {"bf16_floor": 0.010, "w8a8_default": 0.049,
                             "w4a8_opt_in": 0.402},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
