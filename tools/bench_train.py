#!/usr/bin/env python
"""Single-chip LoRA finetune bench: Vicuna-7B over the int8 frozen base.

The reference finetunes on one GPU only because bitsandbytes holds the base
in int8 (prepare_model_for_int8_training, finetune.py:309) — bf16 7B
(13.5GB) plus activations cannot fit a 16GB chip. This bench demonstrates
the TPU analog (`finetune.py --quantize_base true`): the stacked
{"w_q","scale"} base (6.9GB) + bf16 LoRA/img_proj gradients + per-layer
remat, at the reference's training shape (micro_batch 2, cutoff 600,
finetune.py:160-169 / README.md:105).

Synthetic int8 weights (constant tiles — values don't affect throughput;
on-device randint would transiently allocate 4x in int32). Prints one JSON
line per micro-batch size: ms/step, tokens/s, and the optimizer-visible
loss to prove the step is real.

Usage: python tools/bench_train.py [--cutoff 600] [--micro 2 4 8]
       [--runs 3]
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


def build_q8_train_base(cfg):
    """Synthetic stacked {"w_q","scale"} base at Vicuna-7B shapes (the
    quantize_llama_np layout)."""
    import jax.numpy as jnp

    h, inter, L, V = (cfg.hidden_size, cfg.intermediate_size, cfg.num_layers,
                      cfg.vocab_size)
    kvh = cfg.num_kv_heads * cfg.head_dim

    import numpy as np

    def q(k_dim, n_dim, layers=L, random=False):
        shape = (layers, k_dim, n_dim) if layers else (k_dim, n_dim)
        sshape = (layers, n_dim) if layers else (n_dim,)
        if random:
            # constant weights make softmax-gradient backprop cancel
            # EXACTLY at the vocab projection (columns identical, dlogits
            # sums to zero) — a random lm_head keeps grad_norm a real
            # liveness signal; layer weights stay constant (131MB vs 6.9GB
            # of host randint)
            w = np.random.default_rng(2).integers(
                -127, 128, shape, dtype=np.int8)
            return {"w_q": jnp.asarray(w),
                    "scale": jnp.full(sshape, k_dim ** -0.5 / 127.0,
                                      jnp.float32)}
        return {"w_q": jnp.full(shape, 3, jnp.int8),
                "scale": jnp.full(sshape, k_dim ** -0.5 / 127.0, jnp.float32)}

    layers = {
        "wq": q(h, h), "wk": q(h, kvh), "wv": q(h, kvh), "wo": q(h, h),
        "gate": q(h, inter), "up": q(h, inter), "down": q(inter, h),
        "input_ln": jnp.ones((L, h), jnp.float32),
        "post_ln": jnp.ones((L, h), jnp.float32),
    }
    import jax
    return {
        # random embeddings so hidden states differ per token and the
        # reported grad_norm is a real signal (constant-everything inputs
        # drive LoRA gradients to ~1e-12 by symmetry)
        "embed": (jax.random.normal(jax.random.PRNGKey(1), (V, h))
                  * 0.02).astype(jnp.bfloat16),
        "layers": layers,
        "final_ln": jnp.ones((h,), jnp.float32),
        "lm_head": q(h, V, layers=0, random=True),
    }


def bench_stage1(args) -> None:
    """Q-Former stage-1 (ITC + hard-neg ITM + LM) over RAW 448^2 images with
    the frozen BioViL-T ResNet-50 inside the jitted step — the
    pretraining/train.py hot loop at the reference's batch
    (blip2_pretrain_stage1.yaml:39-48: batch 32/64)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from radialog_tpu.models.blip2 import Blip2Config, blip2_init
    from radialog_tpu.ops.layers import BF16
    from radialog_tpu.train.steps import TrainState, make_stage1_raw_train_step

    cfg = Blip2Config()
    params, state_v = blip2_init(jax.random.PRNGKey(0), cfg, with_vision=True)
    visual_params = params.pop("visual")
    visual_state = state_v["visual"]
    tx = optax.adamw(1e-4)
    step_fn = jax.jit(make_stage1_raw_train_step(
        tx, cfg, policy=BF16, itm_chunks=args.itm_chunks),
        donate_argnums=(0,))
    rng = np.random.default_rng(0)
    t = 128
    for mb in args.micro:
        images = jnp.asarray(rng.random((mb, 448, 448, 3)), jnp.float32)
        ids = rng.integers(106, 30000, (mb, t)).astype(np.int32)
        ids[:, 0] = 101   # [CLS]
        batch = {"images": images, "text_ids": jnp.asarray(ids),
                 "text_mask": jnp.ones((mb, t), jnp.int32)}
        try:
            st = TrainState.create(
                jax.tree_util.tree_map(jnp.array, params), tx)
            key = jax.random.PRNGKey(0)
            st, m = step_fn(st, visual_params, visual_state, batch, key)
            np.asarray(m["loss"])
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                st, m = step_fn(st, visual_params, visual_state, batch, key)
                np.asarray(m["loss"])
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({
                "mode": "stage1", "batch": mb,
                "ms_per_step": round(1e3 * best, 1),
                "images_per_sec": round(mb / best, 1),
                "loss": round(float(m["loss"]), 4),
                "loss_itc": round(float(m["loss_itc"]), 4),
                "loss_itm": round(float(m["loss_itm"]), 4),
                "loss_lm": round(float(m["loss_lm"]), 4)}))
        except Exception as e:
            print(json.dumps({"mode": "stage1", "batch": mb,
                              "error": type(e).__name__,
                              "detail": str(e)[:200]}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cutoff", type=int, default=600)  # README.md:105 (RG)
    ap.add_argument("--micro", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--flash", action="store_true",
                    help="route training attention through the Pallas flash kernel + its custom VJP")
    ap.add_argument("--itm-chunks", type=int, default=1,
                    help="(--stage1) run the 3x-batch hard-negative ITM "
                         "forward as a lax.map over this many chunks — "
                         "math-identical, smaller peak activations + HLO; "
                         "the batch-64 compile-wall lever (docs/PERF.md)")
    ap.add_argument("--stage1", action="store_true",
                    help="bench the Q-Former stage-1 raw-image step instead "
                         "of the LoRA step (--micro then means batch; the "
                         "reference trains at 32/64)")
    args = ap.parse_args()
    if args.stage1:
        bench_stage1(args)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from radialog_tpu.models.llama import VICUNA_7B, lora_init
    from radialog_tpu.ops.layers import BF16
    from radialog_tpu.train.steps import TrainState, make_lora_train_step

    cfg = VICUNA_7B
    base = build_q8_train_base(cfg)
    jax.block_until_ready(jax.tree_util.tree_leaves(base))
    lora = lora_init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
    step_fn = jax.jit(make_lora_train_step(tx, cfg, policy=BF16, remat=True,
                                       flash=args.flash),
                      donate_argnums=(0,))

    rng = np.random.default_rng(0)
    t = args.cutoff
    for mb in args.micro:
        tokens = rng.integers(3, 30000, (mb, t)).astype(np.int32)
        tokens[:, 4:4 + cfg.num_img_tokens] = cfg.img_token_id
        labels = tokens.astype(np.int32).copy()
        labels[:, : t // 2] = -100
        batch = {"tokens": jnp.asarray(tokens), "labels": jnp.asarray(labels),
                 "lengths": jnp.full((mb,), t, jnp.int32),
                 "img_embs": jnp.asarray(
                     rng.normal(size=(mb, cfg.num_img_tokens,
                                      cfg.qformer_dim)), jnp.bfloat16)}
        try:
            # fresh buffers per size: step_fn donates the state, which
            # invalidates the previous size's lora leaves
            state = TrainState.create(
                jax.tree_util.tree_map(jnp.array, lora), tx)
            state, metrics = step_fn(state, base, batch)   # compile + warm
            np.asarray(metrics["loss"])
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                state, metrics = step_fn(state, base, batch)
                np.asarray(metrics["loss"])                # force (tunnel)
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({
                "micro_batch": mb, "cutoff": t,
                "ms_per_step": round(1e3 * best, 1),
                "tokens_per_sec": round(mb * t / best, 1),
                "loss": round(float(metrics["loss"]), 4),
                "grad_norm": float(metrics["grad_norm"])}))
        except Exception as e:  # OOM walls are data, not failures
            print(json.dumps({"micro_batch": mb, "cutoff": t,
                              "error": type(e).__name__,
                              "detail": str(e)[:200]}))


if __name__ == "__main__":
    main()
