#!/usr/bin/env python
"""Headline benchmark: chest-X-ray -> radiology-report e2e throughput on one
TPU chip (BASELINE.json north star: reports/sec/chip).

Pipeline measured (the test.py eval path of the reference, full model sizes):
  448x448 image -> BioViL-T (ResNet-50 + projector, J=1408)
               -> Q-Former (BERT-base + cross-attn, 32 queries)
               -> <IMG>-spliced Vicuna-7B (int8 W8A8 weights) prefill
               -> greedy decode over the bf16 KV cache, 300 new tokens
                  (test.py:344)

The measured configuration IS the serving default (apps/pipeline.py):
fused prefill+decode executable, int8 W8A8 Pallas weight matmuls, the
int8 token-flat KV cache (Pallas MXU flash-decode, ops/flash_decode.py),
and SHARED-PREFIX serving (decode/engine.py generate_shared_prefix): the
48 prompt tokens every RaDialog report request shares (Vicuna system
prompt + "USER: Image information: ", data/prompts.py — everything before
the per-request <IMG> run) are prefilled once and read once per decode
step instead of once per lane, and each lane's cache drops those 48
slots. Shared-prefix is token-exact vs plain generate on the bf16 cache
(tests/test_shared_prefix.py; the int8 composition is kernel-exact +
mechanism-tested, tests/test_kv_int8.py); the int8 cache's measured quality budget —
teacher-forced per-step logit error vs the bf16 cache at Vicuna-7B widths
(tools/measure_kv_logit_err.py) — is 0.048 of the logit std,
statistically identical to the accepted W8A8 weight default itself
(0.049, tools/measure_quant.py), which is why it ships as the default.
The halved cache moves the OOM wall out: batch 56 x lane-cache 384 is the
single-chip optimum (pre-qbd-fix int8+shared sweep: b28 5.25, b32 5.39,
b40 6.29, b48 6.69, b56 7.01 reports/s at unroll=1, 7.07 at the unroll=2
default, b60 runtime-OOM — tools/bench_sweep.py; the bf16-KV fallback,
kv_int8=False, peaks at 5.73 at b38). Reference value at this
default: **8.6149 reports/s** (round-5: lane-grouped gl=8 + 64-row
fine-block flash-decode DMAs + decode unroll 3; the gl=4 interim
default measured 8.4621-8.4775 across four runs)
(2026-08-19). Full batch x kv-dtype map + the per-op profile + the fixed
scale-buffer remat cliff: docs/PERF.md.

vs_baseline is measured against the reference configuration's estimated GPU
throughput: HF greedy generate, fp16 Vicuna-7B, batch 12, max_new_tokens 300
(test.py:279,339-348) on an A40-class GPU ~= 0.40 reports/s (≈8-12 tok/s/seq
batched; the repo ships no published numbers, BASELINE.md).

Derivation + sensitivity bracket for that 0.40 (it is an estimate, so the
headline ratio inherits its error bar): a report is ~300 greedy tokens
(test.py:344); HF's unfused generate on fp16 7B is HBM-bound at roughly
8-12 tok/s/seq for batch 12 on A40-class bandwidth (~700 GB/s, 14 GB of
weights re-read per token plus growing KV reads and per-token Python/launch
overhead). Batch 12 / (300 tok / [8..12] tok/s) = 0.32-0.48 reports/s;
widening for hardware variance (A6000/A100 spread) gives a defensible
bracket of [0.27, 0.60] reports/s. A measured value of V reports/s
therefore implies vs_baseline in [V/0.60, V/0.27] — e.g. 4.87 reports/s
is 8.1x at worst, 18x at best, 12.2x at the 0.40 point estimate. The
JSON line reports the point estimate; this bracket is the honesty bound
on it.

This number is the THROUGHPUT half of the north star; the QUALITY half
(CheXbert-F1 parity, untestable without real weights in this container)
rests on the verified chain recorded in BASELINE.md §"Why we believe
CheXbert-F1 parity transfers": converter parity (≤2e-4) → token-exact
greedy decode vs the reference classes → measured 0.048σ/0.049σ quant
budgets → metric-implementation parity.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

REFERENCE_REPORTS_PER_SEC = 0.40   # documented estimate, see module docstring
MAX_NEW_TOKENS = 300               # test.py:344
PROMPT_LEN = 128                   # system + findings + instruction, typical
SHARED_PREFIX = 48                 # tokens every report request shares: the
# Vicuna v1.3 system prompt (~41 tok) + "USER: Image information: " — the
# prompt boilerplate before the per-request <IMG> run (data/prompts.py,
# reference vicuna_prompts.json). apps/pipeline.py measures it per batch as
# the longest common token prefix capped before the first <IMG>.
BATCH = 56                         # the single-chip optimum (docs/PERF.md):
# the serving path stores the 7B weights as pre-tiled int8 (ops/q8_matmul.py
# W8A8 Pallas kernel, ~6.9GB) plus the int8 token-flat KV cache (~6.4GB at
# 56 lanes x 384 slots after the shared 48 prefix slots move out of every
# lane, + 0.4GB of dense-lane scales) — one 16GB v5e. Measured int8+shared
# sweep (P0=48, unroll=1, pre-qbd-fix): b28 5.25, b32 5.39, b40 6.29,
# b48 6.69, b56 7.01 reports/s (7.07 at the unroll=2 default; 7.86 after
# the round-4 qbd fix), b60 runtime-OOM.
# bf16-KV fallback sweep for comparison:
# b32 5.31, b38 5.73 (its optimum), b40 runtime-OOM.
# Weight VALUES here are synthetic (randomly init'd / constant tiles) — the
# metric measures the serving engine's throughput at the real model shapes,
# matching how the bf16 baseline was measured.


def build_serving_params(cfg, key, bits: int = 8):
    """int8 serving weights at the real shapes (fused qkv / gateup layout of
    ops/quant.py quantize_llama_host). Constant int8 tiles: the random
    values don't affect throughput, and on-device randint would transiently
    allocate 4x in int32. Shared with tools/bench_sweep.py. bits=4 builds
    the W4A8 layer leaves (ops/q4_matmul.py); lm_head stays int8 as in
    quantize_llama_host."""
    import jax.numpy as jnp
    import jax

    from radialog_tpu.ops.q4_matmul import GROUP, PackedQ4
    from radialog_tpu.ops.q8_matmul import TILE_BN, PackedQ8, pick_bk

    h, inter, L, V = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers, cfg.vocab_size
    kvh = cfg.num_kv_heads * cfg.head_dim

    def qleaf8(layers, k_dim, n_dim):
        bk = pick_bk(k_dim)
        kp = -(-k_dim // bk) * bk
        npad = -(-n_dim // TILE_BN) * TILE_BN
        shape = (kp // bk, npad // TILE_BN, bk, TILE_BN)
        if layers:
            shape = (layers,) + shape
        scale_shape = (layers, npad) if layers else (npad,)
        return PackedQ8(jnp.full(shape, 3, jnp.int8),
                        jnp.full(scale_shape, k_dim ** -0.5 / 127.0, jnp.float32),
                        n_dim)

    def qleaf4(k_dim, n_dim):
        bk = pick_bk(k_dim)
        kp = -(-k_dim // bk) * bk
        npad = -(-n_dim // TILE_BN) * TILE_BN
        w_t = jnp.full((kp // bk, npad // TILE_BN, bk // 2, TILE_BN),
                       0x21, jnp.int8)                 # nibbles 2|1
        gscale = jnp.full((kp // GROUP, npad), k_dim ** -0.5 / 7.0,
                          jnp.float32)
        # production packs are asymmetric (pack_q4 mode="asym"): carry a
        # goff so the bench runs the same kernel variant (per-group row-sum
        # + rank-1 update) the real serving path dispatches
        goff = jnp.full((kp // GROUP, npad), 1e-6, jnp.float32)
        return PackedQ4(w_t, gscale, n_dim, GROUP, None, goff)

    qleaf = qleaf8 if bits == 8 else (lambda layers, k, n: qleaf4(k, n))

    return {
        "embed": jax.random.normal(key, (V, h), jnp.bfloat16) * jnp.bfloat16(0.02),
        # unrolled serving layout: per-layer weight buffers (zero-copy reads
        # from the Pallas kernels; see models/llama.py unrolled path)
        "layers": [{
            "wqkv": qleaf(0, h, h + 2 * kvh),
            "wo": qleaf(0, h, h),
            "gateup": qleaf(0, h, 2 * inter),
            "down": qleaf(0, inter, h),
            "input_ln": jnp.ones((h,), jnp.float32),
            "post_ln": jnp.ones((h,), jnp.float32),
        } for _ in range(L)],
        "final_ln": jnp.ones((h,), jnp.float32),
        "lm_head": qleaf8(0, h, V),  # int8 either way (quantize_llama_host)
    }


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from radialog_tpu.decode.engine import DecodeParams, generate_shared_prefix
    from radialog_tpu.models.biovil_t import biovil_t_apply, biovil_t_init, \
        patch_tokens_for_qformer
    from radialog_tpu.models.blip2 import Blip2Config, blip2_forward_image
    from radialog_tpu.models.llama import VICUNA_7B, llama_init, lora_init
    from radialog_tpu.models.qformer import qformer_init
    from radialog_tpu.ops.layers import BF16, layernorm, layernorm_init

    cfg = VICUNA_7B
    bcfg = Blip2Config()
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    params = build_serving_params(cfg, k1)
    lora = lora_init(k2, cfg, dtype=jnp.bfloat16)
    vis_params, vis_state = biovil_t_init(k3, joint_feature_size=bcfg.qformer.encoder_width)
    qf_params = {"qformer": qformer_init(k4, bcfg.qformer),
                 "ln_vision": layernorm_init(bcfg.qformer.encoder_width)}
    jax.block_until_ready(jax.tree_util.tree_leaves(params))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, 448, 448, 3)), jnp.float32)
    # shared boilerplate prefix + per-request remainder carrying the <IMG>
    # run — the apps/pipeline.py prompt split (longest common token prefix,
    # capped before the first <IMG>)
    prefix_tokens = jnp.asarray(
        rng.integers(3, 30000, (SHARED_PREFIX,)).astype(np.int32))
    t1 = PROMPT_LEN - SHARED_PREFIX
    rem = rng.integers(3, 30000, (BATCH, t1)).astype(np.int32)
    rem[:, 4:4 + cfg.num_img_tokens] = cfg.img_token_id
    tokens = jnp.asarray(rem)
    lengths = jnp.full((BATCH,), t1, jnp.int32)
    dp = DecodeParams(max_new_tokens=MAX_NEW_TOKENS, eos_token_id=-1,
                      unroll=3)  # full-length; unroll=3 decodes three tokens
    # per while_loop trip (token-identical, tests/test_llama_decode.py) —
    # amortizes the ~0.9 ms/iteration fixed loop cost: measured 6.97 -> 7.07
    # reports/s same-session (docs/PERF.md "Decode-loop unroll"). The
    # pipeline default matches (PipelineConfig.decode_unroll).

    lane_cache = 384  # t1 + MAX_NEW_TOKENS = 380 rounded up to the int8
    # flash-decode kernel's 32-row block multiple; 56 lanes x 384 int8 slots
    # ~= 6.4GB of cache next to 6.9GB of int8 weights (b60 runtime-OOMs)

    @jax.jit
    def report_step(vis_params, vis_state, qf_params, params, lora, images,
                    prefix_tokens, tokens, lengths):
        # ONE fused executable (vision + prefix prefill + per-lane prefill
        # + decode): the cache is born inside the program so the decode
        # loop aliases it in place — the serving default shape
        # (apps/pipeline.py, docs/PERF.md)
        out, _ = biovil_t_apply(vis_params, vis_state, images, policy=BF16)
        patch = patch_tokens_for_qformer(out.projected_patch_embeddings)
        patch = layernorm(qf_params["ln_vision"], patch)
        embs = blip2_forward_image(qf_params, bcfg, patch, policy=BF16)
        return generate_shared_prefix(params, cfg, prefix_tokens, tokens,
                                      lengths, dp, img_embs=embs, lora=lora,
                                      policy=BF16, cache_len=lane_cache,
                                      kv_int8=True)

    # warmup / compile
    res = report_step(vis_params, vis_state, qf_params, params, lora, images,
                      prefix_tokens, tokens, lengths)
    np.asarray(res.tokens)

    n_runs = 3
    t0 = time.time()
    for i in range(n_runs):
        res = report_step(vis_params, vis_state, qf_params, params, lora,
                          images, prefix_tokens, tokens, lengths)
        np.asarray(res.tokens)  # force completion + D2H
    dt = time.time() - t0

    reports_per_sec = n_runs * BATCH / dt
    print(json.dumps({
        "metric": "reports_per_sec_per_chip",
        "value": round(reports_per_sec, 4),
        "unit": ("reports/s (image->300-token report e2e, Vicuna-7B shapes, "
                 "int8 W8A8 Pallas weights + int8 token-flat KV + "
                 "shared-prefix serving — the serving default — batch 56)"),
        "vs_baseline": round(reports_per_sec / REFERENCE_REPORTS_PER_SEC, 3),
    }))


def fallback() -> None:
    """Emergency path: decode-only microbench on a reduced-depth model so the
    driver always gets a JSON line even if the full pipeline cannot run."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from radialog_tpu.decode.engine import DecodeParams, generate
    from radialog_tpu.models.llama import VICUNA_7B, llama_init
    from radialog_tpu.ops.layers import BF16

    cfg = dataclasses.replace(VICUNA_7B, num_layers=8)
    params = llama_init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tokens = jnp.asarray(np.full((1, 64), 13, np.int32))
    lengths = jnp.full((1,), 64, jnp.int32)
    dp = DecodeParams(max_new_tokens=64, eos_token_id=-1)
    gen = jax.jit(lambda p, t, l: generate(p, cfg, t, l, dp, policy=BF16,
                                           cache_len=256))
    np.asarray(gen(params, tokens, lengths).tokens)
    t0 = time.time()
    np.asarray(gen(params, tokens, lengths).tokens)
    dt = time.time() - t0
    tps = 64 / dt
    print(json.dumps({
        "metric": "decode_tokens_per_sec_8layer_proxy",
        "value": round(tps, 1),
        "unit": "tok/s (8-layer 4096-wide decode proxy; full bench failed)",
        "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — always emit a line for the driver
        print(f"bench main failed: {e!r}; running fallback", file=sys.stderr)
        fallback()
