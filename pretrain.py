#!/usr/bin/env python
"""Q-Former stage-1 pretraining CLI (reference pretraining/train.py:86-173:
--cfg-path YAML + --options overrides; evaluate:True dumps embeddings).

Mock drive:  python pretrain.py --mock --max-epoch 1 --steps-per-epoch 2
"""
from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser(description="RaDialog-TPU stage-1 pretraining")
    p.add_argument("--cfg-path", default=None)
    p.add_argument("--options", nargs="+", default=None)
    p.add_argument("--mock", action="store_true", default=False)
    p.add_argument("--evaluate", action="store_true", default=False,
                   help="precompute Q-Former embeddings instead of training")
    p.add_argument("--max-epoch", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="mock mode: synthetic batches per sub-epoch")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--output-dir", type=str, default="outputs/stage1")
    p.add_argument("--emb-out", type=str, default="embs.npz")
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from radialog_tpu.core.config import Config
    from radialog_tpu.models.blip2 import (Blip2Config, blip2_init,
                                           blip2_forward_image,
                                           blip2_stage1_losses)
    from radialog_tpu.models.qformer import TINY_QFORMER
    from radialog_tpu.train.runner import (Stage1Config, Stage1Runner,
                                           precompute_embeddings)

    args = parse_args()
    cfg = Config()
    if args.cfg_path:
        cfg = Config.from_yaml(args.cfg_path)
    if args.options:
        cfg = cfg.apply_overrides(args.options)

    run = cfg.get("run", Config())
    scfg = Stage1Config(
        max_epoch=args.max_epoch or run.get("max_epoch", 100),
        init_lr=run.get("init_lr", 1e-4), min_lr=run.get("min_lr", 1e-5),
        warmup_steps=run.get("warmup_steps", 5000),
        weight_decay=run.get("weight_decay", 0.05),
        accum_grad_iters=run.get("accum_grad_iters", 1),
        output_dir=args.output_dir)

    if args.mock:
        bcfg = Blip2Config(qformer=TINY_QFORMER, max_txt_len=16)
        params, _ = blip2_init(jax.random.PRNGKey(0), bcfg, with_vision=False)
        b, spe = 4, args.steps_per_epoch or 2
        rng = np.random.default_rng(0)

        def batches(_sub):
            for _ in range(spe):
                yield {
                    "image_embeds": jnp.asarray(rng.normal(size=(
                        b, 16, bcfg.qformer.encoder_width)), jnp.float32),
                    "text_ids": jnp.asarray(rng.integers(
                        4, bcfg.qformer.bert.vocab_size - 4, (b, 12)), jnp.int32),
                    "text_mask": jnp.ones((b, 12), jnp.int32),
                }

        if args.evaluate:
            fwd = jax.jit(lambda e: blip2_forward_image(params, bcfg, e))
            n = precompute_embeddings(
                fwd, (((f"d{i}", f"d{i+1}"),
                       np.asarray(rng.normal(size=(2, 16, bcfg.qformer.encoder_width)),
                                  np.float32)) for i in range(0, 6, 2)),
                args.emb_out)
            print(f"precomputed {n} embeddings -> {args.emb_out}")
            return

        runner = Stage1Runner(scfg, bcfg, params, steps_per_epoch=spe)
        eval_fn = jax.jit(lambda p, batch, rng: blip2_stage1_losses(
            p, bcfg, batch["image_embeds"], batch["text_ids"],
            batch["text_mask"], rng).loss)
        runner.train(batches, val_batches=lambda: batches(0), eval_fn=eval_fn)
        print("stage-1 mock training done; outputs in", scfg.output_dir)
        return

    raise SystemExit(
        "non-mock stage-1 training needs MIMIC-CXR data + a BERT tokenizer: "
        "point --cfg-path at a YAML with dataset paths (see configs/)")


if __name__ == "__main__":
    main()
