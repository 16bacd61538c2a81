#!/usr/bin/env python
"""COMPOSED stage-1 input pipeline, sustained (round-4 verdict #2).

Round 4 measured the halves separately: the native host pool at 152.0
images/s in isolation (tools/bench_loader.py) and the jitted raw-image
stage-1 step at 138.9 images/s with pre-staged device arrays
(tools/bench_train.py --stage1). This tool runs the PRODUCTION composition
the reference runs as worker DataLoader + PrefetchLoader
(runner_base.py:578-655, dataloader_utils.py:46-109):

    CxrLoader(threads) -> stage1_raw_batches (decode + resize-512 +
    crop-448 + normalize + caption tokenize/pad) -> DevicePrefetcher(depth)
    -> jitted make_stage1_raw_train_step (frozen ResNet-50 inside)

for >= ``--steps`` steps on one chip, and reports the SUSTAINED images/s —
host decode, tokenization, H2D staging and the device step all sharing this
container's ONE host core. Captions are tokenized with the whitespace
tokenizer (the BERT wordpiece of a real run costs more host CPU; the
decode dominates either way — see the host-rate table in docs/PERF.md).

Usage: python tools/bench_pipeline.py [--batch 32] [--steps 50]
       [--threads 2] [--depth 2] [--imgs 96] [--tiny]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


class _Records:
    """Minimal Stage1Data-shaped source for stage1_raw_batches: a fixed
    record list (img_path + caption); custom-epoch subsetting is identity
    (the bench streams one synthetic epoch)."""

    def __init__(self, recs):
        self._recs = recs

    def set_custom_epoch(self, _sub):
        pass

    def __len__(self):
        return len(self._recs)

    def __getitem__(self, i):
        return self._recs[i]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--imgs", type=int, default=96,
                    help="unique synthetic 512^2 JPEGs (decode cost is "
                         "per-read; paths repeat to fill the epoch)")
    ap.add_argument("--max-txt-len", type=int, default=128)
    ap.add_argument("--tiny", action="store_true",
                    help="TINY models on CPU: protocol smoke, not a number")
    ap.add_argument("--no-step", action="store_true",
                    help="feed + device_put only (skip the train step): "
                         "isolates the host+transfer half of the composition")
    ap.add_argument("--no-prefetch", action="store_true",
                    help="serial loop (next -> blocking device_put -> step) "
                         "without the DevicePrefetcher thread")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from PIL import Image

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from radialog_tpu.data.prefetch import DevicePrefetcher, stage1_raw_batches
    from radialog_tpu.data.tokenization import WhitespaceTokenizer
    from radialog_tpu.models.biovil_t import biovil_t_init
    from radialog_tpu.models.blip2 import Blip2Config, blip2_init
    from radialog_tpu.ops.layers import BF16, FP32
    from radialog_tpu.train.steps import TrainState, make_stage1_raw_train_step

    if args.tiny:
        from radialog_tpu.models.qformer import TINY_QFORMER
        bcfg = Blip2Config(qformer=TINY_QFORMER, max_txt_len=16)
        policy, crop, resize = FP32, 64, 72
    else:
        bcfg = Blip2Config(max_txt_len=args.max_txt_len)
        policy, crop, resize = BF16, 448, 512

    # ---- synthetic JPEG corpus (bench_loader.py protocol: 512^2 gradients
    # + noise so libjpeg does real work)
    rng = np.random.default_rng(0)
    tmp = Path(tempfile.mkdtemp(prefix="bench_pipe_"))
    side = 512 if not args.tiny else 96
    paths = []
    for i in range(args.imgs):
        g = np.linspace(0, 255, side, dtype=np.float32)
        img = (g[None, :] * 0.5 + g[:, None] * 0.5
               + rng.normal(0, 24, (side, side))).clip(0, 255).astype(np.uint8)
        p = tmp / f"cxr_{i:03d}.jpg"
        Image.fromarray(img, "L").save(p, quality=90)
        paths.append(str(p))
    captions = ["lungs are clear with no pleural effusion or pneumothorax",
                "mild cardiomegaly with pulmonary vascular congestion",
                "right basilar opacity concerning for pneumonia",
                "no acute cardiopulmonary process identified today"]
    n_total = args.steps * args.batch + args.batch  # one spare batch
    recs = [{"img_path": paths[i % len(paths)],
             "text_output": captions[i % len(captions)]}
            for i in range(n_total)]

    tok = WhitespaceTokenizer(vocab_size=bcfg.qformer.bert.vocab_size)

    # ---- model + step (bench_train.py --stage1 construction)
    key = jax.random.PRNGKey(0)
    kv, kb = jax.random.split(key)
    if args.tiny:
        visual_params, visual_state = biovil_t_init(
            kv, joint_feature_size=bcfg.qformer.encoder_width,
            resnet_layers=(1, 1, 1, 1), bottleneck=False)
        params, _ = blip2_init(kb, bcfg, with_vision=False)
    else:
        params, state_v = blip2_init(kb, bcfg, with_vision=True)
        visual_params = params.pop("visual")
        visual_state = state_v["visual"]
    tx = optax.adamw(1e-4)
    step_fn = jax.jit(make_stage1_raw_train_step(tx, bcfg, policy=policy),
                      donate_argnums=(0,))
    st = TrainState.create(jax.tree_util.tree_map(jnp.array, params), tx)
    jkey = jax.random.PRNGKey(0)

    def batches():
        return stage1_raw_batches(_Records(recs), tok, bcfg.max_txt_len,
                                  args.batch, sub_epoch=0, resize=resize,
                                  crop=crop, threads=args.threads,
                                  drop_last=True)

    # warm: compile the step on the first composed batch
    it = iter(batches())
    b0 = next(it)
    st, m = step_fn(st, visual_params, visual_state,
                    jax.device_put(b0), jkey)
    np.asarray(m["loss"])
    it.close()   # tear down the warmup loader's worker pool — its threads
    # otherwise keep decoding (and holding the core) into the measured run

    # ---- sustained run: fresh loader epoch through the prefetcher
    done = 0
    per_step = []
    t0 = time.perf_counter()
    last = t0
    if args.no_prefetch:
        for hb in batches():
            batch = jax.device_put(hb)
            if not args.no_step:
                st, m = step_fn(st, visual_params, visual_state, batch, jkey)
            else:
                jax.block_until_ready(batch)
            done += 1
            now = time.perf_counter()
            per_step.append(now - last)
            last = now
            if done >= args.steps:
                break
    else:
        with DevicePrefetcher(batches(), depth=args.depth) as pf:
            for batch in pf:
                if not args.no_step:
                    st, m = step_fn(st, visual_params, visual_state, batch,
                                    jkey)
                else:
                    jax.block_until_ready(batch)
                done += 1
                now = time.perf_counter()
                per_step.append(now - last)
                last = now
                if done >= args.steps:
                    break
    if not args.no_step:
        np.asarray(m["loss"])       # drain the async dispatch queue
    wall = time.perf_counter() - t0
    ps = sorted(per_step)

    imgs = done * args.batch
    print(json.dumps({
        "mode": "stage1-composed", "batch": args.batch, "steps": done,
        "threads": args.threads, "depth": args.depth,
        "wall_s": round(wall, 2),
        "images_per_sec": round(imgs / wall, 1),
        "ms_per_step": round(1e3 * wall / done, 1),
        "no_step": bool(args.no_step),
        "no_prefetch": bool(args.no_prefetch),
        "step_ms_p50": round(1e3 * ps[len(ps) // 2], 1),
        "step_ms_p90": round(1e3 * ps[int(len(ps) * 0.9)], 1),
        "first5_ms": [round(1e3 * x, 1) for x in per_step[:5]],
        "note": "sustained: host decode + tokenize + H2D staging + device "
                "step on one host core (isolated halves: docs/PERF.md)"}))


if __name__ == "__main__":
    main()
