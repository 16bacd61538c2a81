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
    p.add_argument("--raw", action="store_true", default=False,
                   help="train from raw JPEGs (frozen trunk inside the jitted "
                        "step) instead of precomputed embeddings")
    p.add_argument("--use_augs", action="store_true", default=False,
                   help="apply train-time augs (RandomAffine+ColorJitter); "
                        "default off matches the reference, whose stage-1 "
                        "augs are constructed but never applied "
                        "(ReportDataset.py:243)")
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
                                           blip2_generate_caption,
                                           blip2_stage1_losses)
    from radialog_tpu.models.qformer import TINY_QFORMER
    from radialog_tpu.core.mesh import init_distributed
    from radialog_tpu.train.runner import (Stage1Config, Stage1Runner,
                                           precompute_embeddings)

    init_distributed()  # multi-host no-op unless RADIALOG_COORDINATOR etc.
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

    if args.mock and args.raw:
        run_mock_raw(args, scfg)
        return

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
        # per-val-epoch generation QC artifacts (runner_base.py:396-409):
        # greedy Q-Former captions + prediction/GT dumps under output_dir
        gen_fn = jax.jit(lambda p, batch: blip2_generate_caption(
            p, bcfg, batch["image_embeds"], max_length=8, min_length=1))
        decode = lambda row: " ".join(  # noqa: E731 — mock id-decode
            f"t{int(i)}" for i in row if int(i) > 3)
        runner.train(batches, val_batches=lambda: batches(0), eval_fn=eval_fn,
                     generate_fn=gen_fn, decode_fn=decode)
        print("stage-1 mock training done; outputs in", scfg.output_dir)
        return

    raise SystemExit(
        "non-mock stage-1 training needs MIMIC-CXR data + a BERT tokenizer: "
        "point --cfg-path at a YAML with dataset paths (see configs/)")


def run_mock_raw(args, scfg):
    """End-to-end raw-image stage-1 smoke: JPEG -> dataset join -> host decode
    -> device preprocess -> frozen-trunk encode (inside the jitted step,
    stop_gradient) -> ITC+ITM+LM loss. No precomputed embeddings anywhere."""
    import csv
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from radialog_tpu.data.datasets import MimicPaths, Stage1Data
    from radialog_tpu.data.prefetch import DevicePrefetcher, stage1_raw_batches
    from radialog_tpu.data.tokenization import WhitespaceTokenizer
    from radialog_tpu.models.biovil_t import biovil_t_init
    from radialog_tpu.models.blip2 import Blip2Config, blip2_init
    from radialog_tpu.models.qformer import TINY_QFORMER
    from radialog_tpu.train.optim import make_adamw
    from radialog_tpu.train.runner import Stage1Config  # noqa: F401 (surface)
    from radialog_tpu.train.steps import TrainState, make_stage1_raw_train_step

    bcfg = Blip2Config(qformer=TINY_QFORMER, max_txt_len=16)
    rng = np.random.default_rng(0)
    n, b = 8, 4

    # --- synthesize a miniature MIMIC tree: JPEGs + split/sectioned CSVs
    tmp = Path(tempfile.mkdtemp(prefix="stage1_raw_"))
    img_root = tmp / "images"
    captions = ["lungs are clear no effusion", "mild cardiomegaly is seen",
                "right pleural effusion present", "no acute process"]
    rows = []
    for i in range(n):
        folder = f"files/p10/p100000{i:02d}/s5000000{i}"
        d = img_root / folder
        d.mkdir(parents=True)
        dicom = f"dcm-{i:03d}"
        Image.fromarray(rng.integers(0, 255, (96, 80), np.uint8), "L").save(
            d / f"{dicom}.jpg")
        rows.append((dicom, captions[i % len(captions)], folder,
                     f"{dicom}.jpg", f"s5000000{i}.txt"))
    with open(tmp / "split.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["dicom_id", "split"])
        for dicom, *_ in rows:
            w.writerow([dicom, "train"])
    with open(tmp / "sectioned.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["findings", "dicom_id", "Img_Folder", "Img_Filename",
                    "Note_file"])
        for dicom, cap, folder, fn, note in rows:
            w.writerow([cap, dicom, folder, fn, note])

    data = Stage1Data(MimicPaths(split_csv=str(tmp / "split.csv"),
                                 sectioned_csv=str(tmp / "sectioned.csv"),
                                 chexpert_csv="",
                                 image_root=str(img_root)),
                      split="train", custom_epochs_per_epoch=2)
    tok = WhitespaceTokenizer(vocab_size=TINY_QFORMER.bert.vocab_size)

    # --- models: tiny trunk (64px -> 2x2 grid -> 4 tokens) + tiny Q-Former
    key = jax.random.PRNGKey(0)
    kv, kb = jax.random.split(key)
    visual_params, visual_state = biovil_t_init(
        kv, joint_feature_size=TINY_QFORMER.encoder_width)
    params, _ = blip2_init(kb, bcfg, with_vision=False)

    tx = make_adamw(scfg.init_lr, weight_decay=scfg.weight_decay)
    state = TrainState.create(params, tx)
    step_fn = jax.jit(make_stage1_raw_train_step(tx, bcfg,
                                                 augment=args.use_augs))
    jkey = jax.random.PRNGKey(scfg.seed)

    # PRODUCTION input pipeline (the reference's worker DataLoader +
    # PrefetchLoader, dataloader_utils.py:46-109, done TPU-style): the C++
    # libjpeg pool decodes+preprocesses in worker threads
    # (native/loader.py CxrLoader; PIL fallback inside) and DevicePrefetcher
    # stages batches onto the chip ahead of the step loop.
    import itertools

    spe = args.steps_per_epoch or 2
    for epoch in range(args.max_epoch or 1):
        for sub in range(data.custom_epochs_per_epoch):
            batches = itertools.islice(
                itertools.cycle(stage1_raw_batches(
                    data, tok, bcfg.max_txt_len, batch=b, sub_epoch=sub,
                    resize=72, crop=64, threads=2, seed=epoch,
                    drop_last=False)), spe)
            with DevicePrefetcher(batches, depth=2) as pf:
                for it, batch in enumerate(pf):
                    jkey, sk = jax.random.split(jkey)
                    state, metrics = step_fn(state, visual_params,
                                             visual_state, batch, sk)
                    print(f"epoch {epoch}.{sub} it {it}: "
                          f"loss={float(metrics['loss']):.4f} "
                          f"itc={float(metrics['loss_itc']):.4f} "
                          f"itm={float(metrics['loss_itm']):.4f} "
                          f"lm={float(metrics['loss_lm']):.4f}")
    print("raw-image stage-1 mock done (JPEG -> native pool -> loss, "
          "no precomputed embeds)")


if __name__ == "__main__":
    main()
