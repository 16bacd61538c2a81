#!/usr/bin/env python
"""Findings-classifier training / prediction CLI
(reference findings_classifier/chexpert_train.py:182-244:
--run_name/--lr/--epochs/--loss_weighting + train vs save-preds modes).

Mock drive: python chexpert_train.py --mock --epochs 1 --steps 3
"""
from __future__ import annotations

import argparse
import json


def parse_args():
    p = argparse.ArgumentParser(description="CheXpert findings classifier")
    p.add_argument("--run_name", type=str, default="chexpert_train")
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--loss_weighting", type=str, default="log",
                   choices=["none", "lin", "log"])
    p.add_argument("--train", action="store_true", default=False)
    p.add_argument("--save_preds", action="store_true", default=False)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="findings_classifier_out")
    p.add_argument("--mock", action="store_true", default=False)
    p.add_argument("--steps", type=int, default=None, help="mock: steps/epoch")
    p.add_argument("--image_size", type=int, default=488)  # load-bearing crop
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from radialog_tpu.core.checkpoint import BestKeeper
    from radialog_tpu.core.mesh import init_distributed
    from radialog_tpu.models.chexpert import (NUM_CLASSES,
                                              chexpert_classifier_apply,
                                              chexpert_classifier_init)
    from radialog_tpu.train.classifier import (class_weights,
                                               make_classifier_train_step,
                                               multilabel_f1,
                                               save_structured_predictions)
    from radialog_tpu.train.optim import make_adamw
    from radialog_tpu.train.steps import TrainState

    init_distributed()  # multi-host no-op unless RADIALOG_COORDINATOR etc.
    args = parse_args()
    if not args.mock:
        raise SystemExit("real training needs the MIMIC-CXR image tree; "
                         "use --mock for the synthetic smoke run")

    # the 488 crop is load-bearing (SURVEY §7 quirk 3): ResNet stride 32 ->
    # 16x16 grid -> avg_pool(4) -> 4x4 -> fc1 expects 128*4*4 inputs
    size = args.image_size
    rng = np.random.default_rng(0)
    n = 8 if args.mock else 16
    labels = rng.integers(0, 2, (n, NUM_CLASSES)).astype(np.float32)
    # images go through the PRODUCTION input path: JPEG files -> the C++
    # libjpeg pool (native/loader.py CxrLoader, PIL fallback) -> resize-512 /
    # center-crop-`size` float batches — the reference's torch DataLoader +
    # transform stack (chexpert_train.py MIMIC_CXR_Dataset) done native.
    # The mock synthesizes the JPEG tree it loads from.
    import tempfile
    from pathlib import Path

    from PIL import Image

    from radialog_tpu.native.loader import CxrLoader

    img_dir = Path(tempfile.mkdtemp(prefix="chexpert_imgs_"))
    paths = []
    for i in range(n):
        arr = rng.integers(0, 255, (600, 520), np.uint8)
        p = img_dir / f"dcm{i:03d}.jpg"
        Image.fromarray(arr, "L").save(p)
        paths.append(str(p))
    with CxrLoader(paths, batch=n, resize=512, crop=size, threads=2,
                   shuffle=False) as ld:
        batches_all = [(im, ix) for im, ix in ld.epoch()]
    order = np.concatenate([ix for _, ix in batches_all])
    images = np.concatenate([im for im, _ in batches_all])[np.argsort(order)]
    pw = class_weights(labels, args.loss_weighting)
    print("class weights (first 4):", np.round(pw[:4], 3))

    params, state = chexpert_classifier_init(jax.random.PRNGKey(0))
    tx = make_adamw(args.lr, weight_decay=0.0)
    tstate = TrainState.create(params, tx)
    step_fn = jax.jit(make_classifier_train_step(tx, pw))
    predict = jax.jit(lambda p, s, im: jax.nn.sigmoid(
        chexpert_classifier_apply(p, s, im)[0]))

    keeper = BestKeeper(args.output_dir, mode="max")
    bs = 4
    steps = args.steps or (n // bs)
    if args.train or not args.save_preds:
        for epoch in range(args.epochs):
            for it in range(steps):
                sel = rng.integers(0, n, bs)
                batch = {"images": jnp.asarray(images[sel]),
                         "labels": jnp.asarray(labels[sel])}
                tstate, state, metrics = step_fn(tstate, state, batch)
            probs = predict(tstate.params, state, jnp.asarray(images))
            m = multilabel_f1(labels, np.asarray(probs))
            keeper.update(int(tstate.step), m["val_f1"], tstate.params,
                          {"val_f1": m["val_f1"]})
            print(json.dumps({"epoch": epoch, "loss": float(metrics["loss"]),
                              "val_f1": m["val_f1"], "val_acc": m["val_acc"]}))

    if args.save_preds:
        out = f"{args.output_dir}/structured_preds_{args.run_name}.json"
        batches = [([f"dcm{i:03d}" for i in range(j, j + bs)],
                    jnp.asarray(images[j:j + bs])) for j in range(0, n, bs)]
        preds = save_structured_predictions(
            lambda im: predict(tstate.params, state, im), batches, out)
        print(f"wrote {len(preds)} structured predictions -> {out}")


if __name__ == "__main__":
    main()
