"""Int8 weight-only quantization for memory-bound decode.

Decode throughput on TPU is HBM-bandwidth-bound: each token step streams the
full weight set. Storing the LLaMA projections as int8 with per-output-channel
scales halves the bytes vs bf16 (13.5GB -> 6.75GB for Vicuna-7B), which (a)
nearly doubles tokens/sec and (b) frees HBM for a batch-12 KV cache on one
v5e chip — the reference's eval batch size (test.py:279).

The reference's analog is bitsandbytes int8 *training* prep
(prepare_model_for_int8_training, finetune.py:309); here int8 is an inference
serving path. Quality: symmetric per-channel weight-only int8 is lossless to
~1e-2 relative per matmul; LoRA deltas and all activations stay bf16/fp32.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """(..., in, out) float -> {"w_q": int8, "scale": f32 per-out-channel}."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale.squeeze(-2)}


def dequantize_weight(q: Dict[str, jax.Array], dtype=jnp.float32) -> jax.Array:
    return (q["w_q"].astype(jnp.float32) * q["scale"][..., None, :]).astype(dtype)


def on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def linear_q8(q: Dict[str, jax.Array], x: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Simple (unpacked) int8 leaf: y = (x @ w_q) * scale (+ b) via XLA.
    The serving path uses PackedQ8 + the Pallas kernel instead (q8_matmul.py)
    — this form exists for tests and low-stakes matmuls."""
    y = jnp.dot(x.astype(compute_dtype), q["w_q"].astype(compute_dtype),
                preferred_element_type=compute_dtype)
    y = y * q["scale"].astype(compute_dtype)
    if "b" in q:
        y = y + q["b"].astype(compute_dtype)
    return y


_QUANT_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def quantize_llama(params: Dict, quantize_embed: bool = True) -> Dict:
    """LLaMA param tree -> same tree with projection leaves replaced by
    {"w_q","scale"}. Norms stay float; lm_head/embed optionally quantized
    (embed lookup dequantizes per row; lm_head is one matmul per step)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in _QUANT_TARGETS:
        layers[name] = quantize_weight(layers[name]["w"])
    out["layers"] = layers
    if quantize_embed:
        out["lm_head"] = quantize_weight(params["lm_head"]["w"])
        # embed stays float: row-gather of int8 + per-channel scale loses the
        # bandwidth advantage and the table is only 0.26GB in bf16
        out["embed"] = params["embed"].astype(jnp.bfloat16)
    return out


def quantize_llama_np(params: Dict, device=None,
                      quantize_embed: bool = True) -> Dict:
    """Host-side (numpy) quantize_llama into the STACKED training layout.

    The QLoRA-style single-chip finetune base (apps/finetune_lora.py
    quantize_base): projection leaves become {"w_q" int8, "scale" f32},
    streamed to ``device`` leaf by leaf so the bf16 float copy (13.5GB for
    Vicuna-7B) never exists on the chip — the reference needs bitsandbytes
    int8 for the same single-GPU fit (finetune.py:309
    prepare_model_for_int8_training). Gradients flow through linear_q8's
    dequant matmul w.r.t. activations only (the int8 base is frozen; LoRA +
    img_proj train), so no straight-through estimator is needed."""
    import numpy as np

    def put(x, dtype=None):
        x = np.asarray(x)
        arr = jnp.asarray(x, dtype) if dtype else jnp.asarray(x)
        return jax.device_put(arr, device) if device is not None else arr

    def put_q(w) -> Dict[str, jax.Array]:
        q = quantize_weight_np(w)
        return {"w_q": put(q["w_q"]), "scale": put(q["scale"])}

    src = params["layers"]
    layers = {name: put_q(src[name]["w"]) for name in _QUANT_TARGETS}
    layers["input_ln"] = put(src["input_ln"], jnp.float32)
    layers["post_ln"] = put(src["post_ln"], jnp.float32)
    out = {
        "layers": layers,
        "final_ln": put(params["final_ln"], jnp.float32),
    }
    if quantize_embed:
        out["lm_head"] = put_q(params["lm_head"]["w"])
        out["embed"] = put(params["embed"], jnp.bfloat16)
    else:
        out["lm_head"] = {"w": put(params["lm_head"]["w"])}
        out["embed"] = put(params["embed"])
    if "img_proj" in params:
        out["img_proj"] = {k: put(v) for k, v in params["img_proj"].items()}
    return out


def is_quantized(p: Any) -> bool:
    return isinstance(p, dict) and "w_q" in p


def quantize_weight_np(w) -> Dict[str, Any]:
    """Host-side (numpy) variant of quantize_weight — quantize during weight
    conversion so the device never holds the float copy (a 7B bf16 + fp32
    transient OOMs a 16GB chip)."""
    import numpy as np
    wf = np.asarray(w, np.float32)
    scale = np.maximum(np.abs(wf).max(axis=-2, keepdims=True) / 127.0, 1e-8)
    w_q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return {"w_q": w_q, "scale": scale.squeeze(-2).astype(np.float32)}


def quantize_llama_host(params: Dict, device=None,
                        quantize_embed: bool = True,
                        fuse: bool = True, bits: int = 8,
                        w4_mode: str = "asym") -> Dict:
    """quantize_llama on host arrays into the SERVING layout.

    Each projection becomes a PackedQ8 (pre-tiled contiguous int8,
    ops/q8_matmul.py), streamed leaf-by-leaf to ``device`` so the float copy
    never lives on the chip. ``fuse`` concatenates q|k|v and gate|up into
    single matmuls. Layers are emitted as a LIST of per-layer dicts (the
    unrolled serving path in models/llama.py): separate HBM buffers per layer
    let the Pallas custom-calls read weights with zero copies, where scanning
    stacked weights would copy each layer's slice every step.

    ``bits=4`` packs the LAYER projections as PackedQ4 (nibble-packed int4
    with group-wise scales, ops/q4_matmul.py) — the opt-in capacity/speed
    mode (~25% faster weight sweep, tools/microbench_w4.py). The lm_head
    stays int8 either way: the vocab projection decides the argmax, is read
    once per step (~130MB), and int4 error there flips tokens directly."""
    import numpy as np
    from .q4_matmul import PackedQ4, pack_q4
    from .q8_matmul import PackedQ8, pack_q8

    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    if bits == 4:
        # w4_mode="asym" (default) = MSE-optimal clipped asymmetric grids;
        # "sym" reproduces the round-3 symmetric absmax quality baseline
        # (tools/measure_quant.py --w4-mode sweeps both)
        pack_layer = functools.partial(pack_q4, mode=w4_mode)
    else:
        pack_layer = pack_q8

    def put(x, dtype=None):
        x = jnp.asarray(np.asarray(x), dtype) if dtype else jnp.asarray(np.asarray(x))
        return jax.device_put(x, device) if device is not None else x

    def put_packed(p):
        if isinstance(p, PackedQ4):
            return PackedQ4(put(p.w_t), put(p.gscale), p.n, p.group,
                            None if p.b is None else put(p.b),
                            None if p.goff is None else put(p.goff))
        return PackedQ8(put(p.w_t), put(p.scale), p.n,
                        None if p.b is None else put(p.b))

    out = {"final_ln": put(params["final_ln"])}
    src = params["layers"]
    num_layers = np.asarray(src["wq"]["w"]).shape[0]
    layers = []
    for i in range(num_layers):
        layer: Dict = {
            "input_ln": put(np.asarray(src["input_ln"])[i]),
            "post_ln": put(np.asarray(src["post_ln"])[i]),
        }
        if fuse:
            wqkv = np.concatenate([np.asarray(src["wq"]["w"][i]),
                                   np.asarray(src["wk"]["w"][i]),
                                   np.asarray(src["wv"]["w"][i])], axis=-1)
            layer["wqkv"] = put_packed(pack_layer(wqkv))
            gateup = np.concatenate([np.asarray(src["gate"]["w"][i]),
                                     np.asarray(src["up"]["w"][i])], axis=-1)
            layer["gateup"] = put_packed(pack_layer(gateup))
            for name in ("wo", "down"):
                layer[name] = put_packed(pack_layer(np.asarray(src[name]["w"][i])))
        else:
            for name in _QUANT_TARGETS:
                layer[name] = put_packed(pack_layer(np.asarray(src[name]["w"][i])))
        layers.append(layer)
    out["layers"] = layers
    if quantize_embed:
        out["lm_head"] = put_packed(pack_q8(np.asarray(params["lm_head"]["w"])))
        out["embed"] = put(params["embed"], jnp.bfloat16)
    else:
        out["lm_head"] = {"w": put(params["lm_head"]["w"])}
        out["embed"] = put(params["embed"])
    if "img_proj" in params:
        # base-model img_proj_layer (convert_llama carries it from
        # model.img_proj_layer.*) — tiny, stays float for splice fidelity
        out["img_proj"] = {k: put(v) for k, v in params["img_proj"].items()}
    return out
