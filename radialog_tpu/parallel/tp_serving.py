"""Tensor-parallel QUANTIZED serving: shard_map over a (data, model) mesh.

The bf16 stacked layout shards through jit + NamedSharding (partition.py):
XLA's SPMD partitioner handles plain dots. The int8 serving layout cannot go
that route — its matmuls are Pallas custom calls (ops/q8_matmul.py,
ops/flash_decode.py), which SPMD would gather-and-replicate instead of
partitioning. Here the sharding is explicit and Megatron-shaped:

  * weights are split on the HOST before packing, so every shard holds its
    own contiguous PackedQ8 tiles (no re-tiling of a sharded array):
      - wqkv / gateup: column parallel — each shard owns a head group
        (q|k|v slices re-fused per shard) / an FFN slice;
      - wo / down: row parallel — each shard owns the input rows matching
        its heads/FFN slice; the partial outputs are psum'd over `model`
        before the residual add (llama_apply(axis_name=...));
      - embed / lm_head / norms: replicated (lm_head int8 is 131MB for
        Vicuna-7B — replication costs little and saves a logits gather);
  * the int8 KV cache is created inside shard_map, so each shard holds
    (L, B_local, S, H_local*D) — the token-flat flash-decode kernel runs
    unchanged on its local head group;
  * the batch shards over `data`; greedy selection runs on replicated
    logits, identical on every model shard.

On non-TPU backends the same code path runs the XLA-reference q8 matmuls,
which is how the 8-device CPU-mesh equality test validates the sharding.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS
from ..decode.engine import DecodeParams, GenerationResult, generate
from ..models.llama import LlamaConfig
from ..ops.layers import BF16, DTypePolicy
from ..ops.q4_matmul import PackedQ4
from ..ops.q8_matmul import PackedQ8

def _shard_map(f, mesh, in_specs, out_specs):
    """jax.shard_map across the API churn: check_vma (>=0.8) / check_rep.
    Replication checking is off — the decode while_loop + Pallas custom
    calls defeat the static rep analysis even though the psum'd logits are
    genuinely replicated over `model`."""
    import inspect

    sm = getattr(jax, "shard_map", None)
    if sm is None:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as sm
    kw = {}
    params = inspect.signature(sm).parameters
    if "check_vma" in params:
        kw["check_vma"] = False
    elif "check_rep" in params:  # pragma: no cover
        kw["check_rep"] = False
    return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)


def shard_config(cfg: LlamaConfig, n_shards: int) -> LlamaConfig:
    """Per-shard view: head/KV-head/FFN counts divided, head_dim pinned."""
    if cfg.num_heads % n_shards or cfg.num_kv_heads % n_shards:
        raise ValueError(f"{cfg.num_heads} heads / {cfg.num_kv_heads} KV heads "
                         f"not divisible by model axis {n_shards}")
    if cfg.intermediate_size % n_shards:
        raise ValueError(f"intermediate {cfg.intermediate_size} not divisible "
                         f"by model axis {n_shards}")
    return dataclasses.replace(
        cfg, num_heads=cfg.num_heads // n_shards,
        num_kv_heads=cfg.num_kv_heads // n_shards,
        intermediate_size=cfg.intermediate_size // n_shards,
        override_head_dim=cfg.head_dim)


def _slice_float_tree(params: Dict, cfg: LlamaConfig, shard: int,
                      n_shards: int) -> Dict:
    """Megatron split of the STACKED float tree (llama_init/convert_llama
    layout) for one shard: columns of wq/wk/wv/gate/up, rows of wo/down."""
    hd = cfg.head_dim
    qs = slice(shard * (cfg.num_heads // n_shards) * hd,
               (shard + 1) * (cfg.num_heads // n_shards) * hd)
    ks = slice(shard * (cfg.num_kv_heads // n_shards) * hd,
               (shard + 1) * (cfg.num_kv_heads // n_shards) * hd)
    fs = slice(shard * (cfg.intermediate_size // n_shards),
               (shard + 1) * (cfg.intermediate_size // n_shards))
    src = params["layers"]
    layers = {
        "wq": {"w": np.asarray(src["wq"]["w"])[:, :, qs]},
        "wk": {"w": np.asarray(src["wk"]["w"])[:, :, ks]},
        "wv": {"w": np.asarray(src["wv"]["w"])[:, :, ks]},
        "wo": {"w": np.asarray(src["wo"]["w"])[:, qs, :]},
        "gate": {"w": np.asarray(src["gate"]["w"])[:, :, fs]},
        "up": {"w": np.asarray(src["up"]["w"])[:, :, fs]},
        "down": {"w": np.asarray(src["down"]["w"])[:, fs, :]},
        "input_ln": np.asarray(src["input_ln"]),
        "post_ln": np.asarray(src["post_ln"]),
    }
    out = {"embed": np.asarray(params["embed"]), "layers": layers,
           "final_ln": np.asarray(params["final_ln"]),
           "lm_head": {"w": np.asarray(params["lm_head"]["w"])}}
    if "img_proj" in params:
        out["img_proj"] = {k: np.asarray(v)
                           for k, v in params["img_proj"].items()}
    return out


_REPLICATED_KEYS = ("input_ln", "post_ln", "final_ln", "embed", "lm_head")


def shard_quantized_llama(params: Dict, cfg: LlamaConfig, n_shards: int,
                          device=None, bits: int = 8) -> Tuple[Dict, Dict]:
    """Stacked float tree (host) -> (global serving tree, spec tree).

    Per-shard slices are quantized/packed independently (each shard gets
    clean contiguous tiles), then stacked on a new leading axis with spec
    P(MODEL_AXIS, ...); replicated leaves (norms, embed, lm_head) keep one
    copy with spec P(). Per-shard packing also means per-shard quant scales —
    identical to the unsharded scales because pack_q8's scales are
    per-output-channel and column slicing preserves channels. (Row-parallel
    wo/down re-quantize per shard — scales over the shard's K rows; and at
    bits=4 the group-wise K scales restart at the shard boundary — so >1-way
    TP tokens can diverge slightly, see tests/test_tp_serving.py.)

    ``bits=4`` packs the layer shards as PackedQ4 (W4A8, ops/q4_matmul.py).
    """
    from ..ops.quant import quantize_llama_host

    trees = [quantize_llama_host(_slice_float_tree(params, cfg, s, n_shards),
                                 device=None, bits=bits)
             for s in range(n_shards)]

    def put(x):
        return jax.device_put(x, device) if device is not None else jnp.asarray(x)

    def stack_packed(packs):
        if isinstance(packs[0], PackedQ4):
            w_t = put(np.stack([np.asarray(p.w_t) for p in packs]))
            gscale = put(np.stack([np.asarray(p.gscale) for p in packs]))
            b = None
            if packs[0].b is not None:
                b = put(np.stack([np.asarray(p.b) for p in packs]))
            goff = None
            if packs[0].goff is not None:
                goff = put(np.stack([np.asarray(p.goff) for p in packs]))
            g = PackedQ4(w_t, gscale, packs[0].n, packs[0].group, b, goff)
            spec = PackedQ4(P(MODEL_AXIS), P(MODEL_AXIS), packs[0].n,
                            packs[0].group,
                            None if b is None else P(MODEL_AXIS),
                            None if goff is None else P(MODEL_AXIS))
            return g, spec
        w_t = put(np.stack([np.asarray(p.w_t) for p in packs]))
        scale = put(np.stack([np.asarray(p.scale) for p in packs]))
        b = None
        if packs[0].b is not None:
            b = put(np.stack([np.asarray(p.b) for p in packs]))
        n = packs[0].n
        g = PackedQ8(w_t, scale, n, b)
        spec = PackedQ8(P(MODEL_AXIS), P(MODEL_AXIS), n,
                        None if b is None else P(MODEL_AXIS))
        return g, spec

    g_layers, s_layers = [], []
    for li in range(len(trees[0]["layers"])):
        gl: Dict = {}
        sl: Dict = {}
        for name, leaf in trees[0]["layers"][li].items():
            if name in _REPLICATED_KEYS:
                gl[name] = put(leaf)
                sl[name] = P()
            else:
                gl[name], sl[name] = stack_packed(
                    [t["layers"][li][name] for t in trees])
        g_layers.append(gl)
        s_layers.append(sl)

    gparams: Dict = {"layers": g_layers, "final_ln": put(trees[0]["final_ln"]),
                     "embed": put(trees[0]["embed"])}
    specs: Dict = {"layers": s_layers, "final_ln": P(), "embed": P()}
    if "img_proj" in trees[0]:
        gparams["img_proj"] = {k: put(v) for k, v in trees[0]["img_proj"].items()}
        specs["img_proj"] = {k: P() for k in trees[0]["img_proj"]}
    lm = trees[0]["lm_head"]
    if isinstance(lm, PackedQ8):
        gparams["lm_head"] = PackedQ8(put(lm.w_t), put(lm.scale), lm.n,
                                      None if lm.b is None else put(lm.b))
        specs["lm_head"] = PackedQ8(P(), P(), lm.n,
                                    None if lm.b is None else P())
    else:
        gparams["lm_head"] = {"w": put(lm["w"])}
        specs["lm_head"] = {"w": P()}
    return gparams, specs


def shard_lora(lora: Dict, cfg: LlamaConfig, n_shards: int) -> Tuple[Dict, Dict]:
    """LoRA adapters for the TP serving path: `a` replicated, `b` column-split
    to the shard's head group (targets wq/wk/wv only — wo would need
    row-split `a`)."""
    hd = cfg.head_dim
    widths = {"wq": cfg.num_heads * hd, "wk": cfg.num_kv_heads * hd,
              "wv": cfg.num_kv_heads * hd}
    glayers: Dict = {}
    slayers: Dict = {}
    for t, ab in lora["layers"].items():
        if t not in widths:
            raise ValueError(f"TP serving LoRA supports q/k/v targets, got {t}")
        w = widths[t]
        if w % n_shards:
            raise ValueError(f"{t} width {w} not divisible by {n_shards}")
        per = w // n_shards
        b = np.asarray(ab["b"])
        glayers[t] = {
            "a": jnp.asarray(np.asarray(ab["a"])),
            "b": jnp.asarray(np.stack(
                [b[..., s * per:(s + 1) * per] for s in range(n_shards)])),
        }
        slayers[t] = {"a": P(), "b": P(MODEL_AXIS)}
    g = {"layers": glayers, "scale": jnp.asarray(np.asarray(lora["scale"]))}
    s = {"layers": slayers, "scale": P()}
    if "img_proj" in lora:
        g["img_proj"] = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), lora["img_proj"])
        s["img_proj"] = jax.tree_util.tree_map(lambda _: P(), g["img_proj"])
    return g, s


def _is_spec(x) -> bool:
    return isinstance(x, P)


def _unstack(tree: Any, specs: Any) -> Any:
    """Drop the leading stacked-shard axis from P(MODEL_AXIS, ...) leaves
    (local block size 1 inside shard_map)."""
    return jax.tree_util.tree_map(
        lambda x, s: x[0] if (s and s[0] == MODEL_AXIS) else x,
        tree, specs, is_leaf=_is_spec)


def tp_generate(mesh: Mesh, gparams: Dict, param_specs: Dict,
                cfg: LlamaConfig, tokens, lengths,
                dp: DecodeParams = DecodeParams(),
                img_embs=None, glora: Optional[Dict] = None,
                lora_specs: Optional[Dict] = None,
                policy: DTypePolicy = BF16,
                cache_len: Optional[int] = None,
                kv_int8: bool = True) -> GenerationResult:
    """Sharded prefill + decode over the quantized serving layout.

    tokens (B, T) right-padded / lengths (B,) / img_embs (B, n_img, q_dim)
    are GLOBAL host arrays; B must divide by the data axis. Greedy only —
    per-shard RNG streams under sampling are a separate design decision.

    One-shot convenience: it builds a FRESH jitted program per call (the
    jit cache keys on the function object), so a serving loop should call
    ``make_tp_generate`` once and reuse the returned callable — otherwise
    every request retraces (and cold-compiles without a persistent cache).
    """
    fn = make_tp_generate(mesh, param_specs, cfg, dp,
                          has_img=img_embs is not None,
                          lora_specs=lora_specs if glora is not None else None,
                          policy=policy, cache_len=cache_len,
                          kv_int8=kv_int8)
    return fn(gparams, tokens, lengths, img_embs=img_embs, glora=glora)


def make_tp_generate(mesh: Mesh, param_specs: Dict, cfg: LlamaConfig,
                     dp: DecodeParams = DecodeParams(), *,
                     has_img: bool = False,
                     lora_specs: Optional[Dict] = None,
                     policy: DTypePolicy = BF16,
                     cache_len: Optional[int] = None,
                     kv_int8: bool = True,
                     shared_prefix: bool = False,
                     num_beams: int = 1):
    """Compile-once factory for the sharded serving step: returns
    fn(gparams, tokens, lengths, img_embs=None, glora=None[,
    prefix_tokens=...]) -> GenerationResult. Reuse the SAME returned
    callable across requests — the jit cache then hits on every call after
    the first per token shape.

    shared_prefix=True builds the single-chip serving DEFAULT under TP:
    the run callable then takes ``prefix_tokens`` ((P0,) int32, replicated
    — the batch-wide common prompt boilerplate) plus per-lane REMAINDER
    tokens/lengths, and each shard runs generate_shared_prefix over its
    head shard (decode/engine.py; the per-shard prefix K/V covers the
    shard's local heads, merged by the same per-shard softmax).

    num_beams>1 lifts the quality path (decode/beam.py split-cache beam
    search — the reference's --num_beams, modeling_llama_imgemb.py:795-836)
    onto the TP shards: each shard prefills its local heads into a bf16
    prompt cache and beam-decodes its local generated KV; the reorder
    gather is driven by the psum'd replicated logits, so all shards pick
    identical beams. Requires kv_int8=False (beam is the bf16 quality
    path) and is exclusive with shared_prefix."""
    if dp.do_sample:
        raise NotImplementedError(
            "tp_generate is deterministic (greedy or beam); per-shard RNG "
            "streams under sampling are a separate design decision")
    if num_beams > 1:
        if kv_int8:
            raise ValueError("beam search uses the bf16 KV cache (quality "
                             "path); build the factory with kv_int8=False")
        if shared_prefix:
            raise ValueError("num_beams>1 and shared_prefix are exclusive "
                             "(the beam split-cache owns its prompt region)")
    n_model = mesh.shape[MODEL_AXIS]
    cfg_local = shard_config(cfg, n_model)
    clen = cache_len
    has_lora = lora_specs is not None

    data_spec = P(DATA_AXIS)
    tok_spec = P(DATA_AXIS, None)
    img_spec = P(DATA_AXIS, None, None)
    R = P()

    in_specs = [param_specs, tok_spec, data_spec]
    if shared_prefix:
        in_specs.append(R)                 # prefix replicated on every chip
    if has_img:
        in_specs.append(img_spec)
    if has_lora:
        in_specs.append(lora_specs)

    def body(params, tokens, lengths, *rest):
        rest = list(rest)
        prefix = rest.pop(0) if shared_prefix else None
        imgs = rest.pop(0) if has_img else None
        lora_g = rest.pop(0) if has_lora else None
        local = _unstack(params, param_specs)
        lora_l = _unstack(lora_g, lora_specs) if has_lora else None
        if num_beams > 1:
            from ..decode.beam import generate_beam
            res = generate_beam(local, cfg_local, tokens, lengths, dp,
                                num_beams, img_embs=imgs, lora=lora_l,
                                policy=policy, cache_len=clen,
                                axis_name=MODEL_AXIS)
        elif shared_prefix:
            from ..decode.engine import generate_shared_prefix
            res = generate_shared_prefix(
                local, cfg_local, prefix, tokens, lengths, dp,
                img_embs=imgs, lora=lora_l, policy=policy, cache_len=clen,
                axis_name=MODEL_AXIS, kv_int8=kv_int8)
        else:
            res = generate(local, cfg_local, tokens, lengths, dp,
                           img_embs=imgs, lora=lora_l, policy=policy,
                           cache_len=clen, kv_int8=kv_int8,
                           axis_name=MODEL_AXIS)
        return res.tokens, res.lengths, res.prompt_lengths

    jit_fn = jax.jit(_shard_map(body, mesh, tuple(in_specs),
                                (tok_spec, data_spec, data_spec)))

    def run(gparams, tokens, lengths, img_embs=None, glora=None,
            prefix_tokens=None) -> GenerationResult:
        args = [gparams, jnp.asarray(tokens), jnp.asarray(lengths)]
        if shared_prefix:
            if prefix_tokens is None:
                raise ValueError("factory built with shared_prefix=True")
            args.append(jnp.asarray(prefix_tokens))
        if has_img:
            if img_embs is None:
                raise ValueError("factory built with has_img=True")
            args.append(jnp.asarray(img_embs))
        if has_lora:
            if glora is None:
                raise ValueError("factory built with lora_specs")
            args.append(glora)
        toks, glens, plens = jit_fn(*args)
        return GenerationResult(toks, glens, plens)

    return run
