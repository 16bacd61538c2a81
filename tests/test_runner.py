"""Stage-1 runner tests: epoch mode (sub-epochs + val-best ckpt) and the
iteration-based RunnerIter-equivalent."""
import pytest
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from radialog_tpu.models.blip2 import Blip2Config, blip2_init, blip2_stage1_losses
from radialog_tpu.models.qformer import TINY_QFORMER
from radialog_tpu.train.runner import (Stage1Config, Stage1Runner,
                                       precompute_embeddings)


def _setup(tmp_path, max_epoch=1):
    bcfg = Blip2Config(qformer=TINY_QFORMER, max_txt_len=12)
    params, _ = blip2_init(jax.random.PRNGKey(0), bcfg, with_vision=False)
    cfg = Stage1Config(max_epoch=max_epoch, custom_epochs=2, warmup_steps=2,
                       output_dir=str(tmp_path), log_freq=100)
    runner = Stage1Runner(cfg, bcfg, params, steps_per_epoch=2)
    rng = np.random.default_rng(0)

    def batch():
        return {"image_embeds": jnp.asarray(rng.normal(size=(
                    2, 8, bcfg.qformer.encoder_width)), jnp.float32),
                "text_ids": jnp.asarray(rng.integers(
                    4, 100, (2, 8)), jnp.int32),
                "text_mask": jnp.ones((2, 8), jnp.int32)}

    eval_fn = jax.jit(lambda p, b, r: blip2_stage1_losses(
        p, bcfg, b["image_embeds"], b["text_ids"], b["text_mask"], r).loss)
    return runner, batch, eval_fn


@pytest.mark.slow
def test_epoch_mode_trains_and_checkpoints(tmp_path):
    runner, batch, eval_fn = _setup(tmp_path)
    state = runner.train(lambda sub: (batch() for _ in range(2)),
                         val_batches=lambda: (batch() for _ in range(1)),
                         eval_fn=eval_fn)
    assert int(state.step) == 4  # 1 epoch x 2 sub-epochs x 2 steps
    assert (tmp_path / "best").exists() and (tmp_path / "last").exists()
    assert (tmp_path / "log.txt").read_text().count('"split": "train"') == 2


@pytest.mark.slow
def test_iteration_mode(tmp_path):
    runner, batch, eval_fn = _setup(tmp_path)
    stream = (batch() for _ in itertools.count())
    state = runner.train_iters(stream, iters_per_inner_epoch=3, max_iters=7,
                               val_batches=lambda: (batch() for _ in range(1)),
                               eval_fn=eval_fn)
    assert int(state.step) == 7
    log = (tmp_path / "log.txt").read_text()
    assert log.count('"split": "val"') == 3  # after iters 3, 6, 7


def test_precompute_embeddings(tmp_path):
    out = tmp_path / "embs.npz"
    n = precompute_embeddings(
        lambda images: images.mean(axis=1, keepdims=True).repeat(4, 1),
        [(["d1", "d2"], np.ones((2, 8, 16), np.float32))], out)
    assert n == 2
    z = np.load(out)
    assert set(z.files) == {"d1", "d2"} and z["d1"].shape == (4, 16)


def test_dump_val_generations(tmp_path):
    """Per-val-epoch QC artifacts (runner_base.py:396-409,431-450): one
    double-quoted caption per line in predictions/ + ground_truths/, pairs
    aligned, HTML table rows capped."""
    runner, batch, eval_fn = _setup(tmp_path)

    def gen_fn(params, b):
        # deterministic stand-in generator: echo the first 4 GT ids
        return np.asarray(b["text_ids"])[:, :4]

    decode = lambda row: " ".join(f"t{int(i)}" for i in row if int(i) > 3)
    out = runner.dump_val_generations(
        3, lambda: (batch() for _ in range(2)), gen_fn, decode, html_rows=2)
    pred_f = tmp_path / "predictions" / "predictions_val.txt"
    gt_f = tmp_path / "ground_truths" / "ground_truths_val.txt"
    assert pred_f.exists() and gt_f.exists()
    preds = pred_f.read_text().splitlines()
    gts = gt_f.read_text().splitlines()
    assert len(preds) == len(gts) == 4  # 2 batches x batch 2
    # the reference's byte format: each line is the caption double-quoted
    for line, cap in zip(preds, out["predictions"]):
        assert line == '"' + cap + '"'
    # the stand-in generator echoes a GT prefix -> every pred is a prefix
    for p, g in zip(out["predictions"], out["ground_truths"]):
        assert g.startswith(p)
