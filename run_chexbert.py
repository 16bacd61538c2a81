#!/usr/bin/env python
"""CheXbert labeler CLI: label a predictions CSV, or train the labeler.

Replaces the reference's subprocess-into-a-second-conda-env bridge
(chexbert/run_chexbert.py:5-26 + chexbert/src/label.py:54-149) with an
on-device model call producing the same labels CSV format, and
chexbert/src/run_bert.py's training loop with a jitted step.

  python run_chexbert.py label --reports_path preds.csv --output_path labels.csv [--mock]
  python run_chexbert.py train --mock
"""
from __future__ import annotations

import argparse
import csv


def parse_args():
    p = argparse.ArgumentParser(description="CheXbert labeler")
    sub = p.add_subparsers(dest="cmd", required=True)
    lab = sub.add_parser("label")
    lab.add_argument("--reports_path", required=True,
                     help="CSV with one quoted report per line (test.py:377-379)")
    lab.add_argument("--output_path", required=True)
    lab.add_argument("--checkpoint", default=None)
    lab.add_argument("--bert_tokenizer_path", default=None)
    lab.add_argument("--batch_size", type=int, default=16)
    lab.add_argument("--mock", action="store_true", default=False)
    tr = sub.add_parser("train")
    tr.add_argument("--mock", action="store_true", default=False)
    tr.add_argument("--lr", type=float, default=2e-5)
    tr.add_argument("--steps", type=int, default=6)
    tr.add_argument("--output_dir", default="chexbert_out")
    return p.parse_args()


def cmd_label(args):
    import numpy as np
    from radialog_tpu.apps.pipeline import PipelineConfig, RaDialogPipeline
    from radialog_tpu.apps.evaluate import write_labels_csv_from_raw

    with open(args.reports_path, newline="") as f:
        reports = [row[0] for row in csv.reader(f) if row]
    pipe = RaDialogPipeline(PipelineConfig(
        mock=args.mock, chexbert_checkpoint=args.checkpoint,
        bert_tokenizer_path=args.bert_tokenizer_path))
    labels = pipe.label_reports(reports, batch_size=args.batch_size)
    write_labels_csv_from_raw(labels, reports, args.output_path)
    print(f"labeled {len(reports)} reports -> {args.output_path}")


def cmd_train(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from radialog_tpu.core.checkpoint import BestKeeper
    from radialog_tpu.models.bert import BertConfig
    from radialog_tpu.models.chexbert import chexbert_apply, chexbert_init
    from radialog_tpu.train.chexbert_train import (make_chexbert_train_step,
                                                   mean_kappa)
    from radialog_tpu.train.optim import make_adamw
    from radialog_tpu.train.steps import TrainState

    if not args.mock:
        raise SystemExit("real training needs the CheXbert CSV data; use --mock")

    cfg = BertConfig(vocab_size=256, hidden_size=32, num_layers=2, num_heads=4,
                     intermediate_size=64, max_position=64)
    rng = np.random.default_rng(0)
    n, t = 32, 24
    ids = rng.integers(4, 250, (n, t)).astype(np.int32)
    labels = np.concatenate([rng.integers(0, 4, (n, 13)),
                             rng.integers(0, 2, (n, 1))], axis=1).astype(np.int32)

    params = chexbert_init(jax.random.PRNGKey(0), cfg)
    tx = make_adamw(args.lr, weight_decay=0.0)
    state = TrainState.create(params, tx)
    step_fn = jax.jit(make_chexbert_train_step(tx, cfg))
    predict = jax.jit(lambda p, i, m: chexbert_apply(p, cfg, i, m))
    keeper = BestKeeper(args.output_dir, mode="max")
    key = jax.random.PRNGKey(1)

    bs = 8
    for it in range(args.steps):
        sel = rng.integers(0, n, bs)
        batch = {"input_ids": jnp.asarray(ids[sel]),
                 "attention_mask": jnp.ones((bs, t), jnp.int32),
                 "labels": jnp.asarray(labels[sel])}
        key, sk = jax.random.split(key)
        state, metrics = step_fn(state, batch, sk)
        if it % 2 == 1:
            logits = predict(state.params, jnp.asarray(ids),
                             jnp.ones((n, t), jnp.int32))
            preds = np.stack([np.asarray(l).argmax(-1) for l in logits], axis=1)
            kappa, _ = mean_kappa(labels, preds)
            improved = keeper.update(it, kappa, state.params)
            print(f"step {it}: loss={float(metrics['loss']):.4f} "
                  f"kappa={kappa:.4f} best={improved}")


def main():
    args = parse_args()
    if args.cmd == "label":
        cmd_label(args)
    else:
        cmd_train(args)


if __name__ == "__main__":
    main()
