#!/usr/bin/env python
"""Compile the fused serving step AOT and report which buffers XLA's
rematerialization pass compresses/copies (the int8-KV capacity cliff,
docs/PERF.md): greps the optimized HLO for remat/compressed ops and prints
the largest HLO temp allocations.

Usage: python tools/dump_hlo_mem.py --batch 30 --kv-int8 --shared-prefix 48
"""
from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=30)
    ap.add_argument("--kv-int8", action="store_true")
    ap.add_argument("--w4", action="store_true")
    ap.add_argument("--cache-len", type=int, default=448)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--new-tokens", type=int, default=300)
    ap.add_argument("--shared-prefix", type=int, default=0)
    ap.add_argument("--out", default=None, help="also write full HLO here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from bench import build_serving_params
    from radialog_tpu.decode.engine import (DecodeParams, generate,
                                            generate_shared_prefix)
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

    B = args.batch
    p0 = args.shared_prefix
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, 448, 448, 3)), jnp.float32)
    if p0:
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
    lane_cache = args.cache_len - p0
    dp = DecodeParams(max_new_tokens=args.new_tokens, eos_token_id=-1)

    @jax.jit
    def fused_step(vis_params, vis_state, qf_params, params, lora, images,
                   tokens, lengths):
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

    lowered = fused_step.lower(vis_params, vis_state, qf_params, params,
                               lora, images, tokens, lengths)
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    print(f"argument {m.argument_size_in_bytes/2**30:.3f}G "
          f"output {m.output_size_in_bytes/2**30:.3f}G "
          f"temp {m.temp_size_in_bytes/2**30:.3f}G "
          f"alias {m.alias_size_in_bytes/2**30:.3f}G")
    txt = compiled.as_text()
    if args.out:
        Path(args.out).write_text(txt)
        print(f"wrote {args.out} ({len(txt)/2**20:.1f} MiB)")

    # remat / compression fingerprints
    pats = Counter()
    for line in txt.splitlines():
        if "remat" in line or "compress" in line:
            mm = re.search(r"%?([\w.\-]*(?:remat|compress)[\w.\-]*)", line)
            if mm:
                pats[mm.group(1)[:80]] += 1
    print("\n== remat/compress op-name histogram ==")
    for name, n in pats.most_common(30):
        print(f"{n:6d}  {name}")

    # largest single allocations from buffer-assignment comments if present
    sizes = Counter()
    for mm in re.finditer(r"(\w[\w.\-]*) = (\w+)\[([\d,]*)\]", txt):
        name, dt, dims = mm.groups()
        if not dims:
            continue
        try:
            n = 1
            for d in dims.split(","):
                n *= int(d)
        except ValueError:
            continue
        bpe = {"f32": 4, "bf16": 2, "s8": 1, "u8": 1, "s32": 4, "u32": 4,
               "pred": 1, "f16": 2, "s4": 0.5, "u4": 0.5}.get(dt)
        if bpe is None:
            continue
        sz = n * bpe
        if sz >= 2**28:  # >=256MB
            sizes[f"{dt}[{dims}] {name[:60]}"] += 1
    print("\n== ops producing >=256MB values (count) ==")
    for k, n in sizes.most_common(40):
        print(f"{n:6d}  {k}")


if __name__ == "__main__":
    main()
