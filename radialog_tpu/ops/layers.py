"""Functional neural-net building blocks (pure JAX, NHWC layouts).

These replace the torch.nn layers used throughout the reference
(biovil_t/*, Qformer.py, modeling_llama_imgemb.py) with TPU-friendly
functional equivalents: NHWC convs (XLA's preferred layout on TPU),
fused norms, and bf16-policy-aware compute.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Parameter / compute / output dtypes. TPU default: bf16 compute."""

    param: jnp.dtype = jnp.float32
    compute: jnp.dtype = jnp.bfloat16
    output: jnp.dtype = jnp.float32

    def cast(self, x: jax.Array) -> jax.Array:
        return x.astype(self.compute)


FP32 = DTypePolicy(param=jnp.float32, compute=jnp.float32, output=jnp.float32)
BF16 = DTypePolicy()


# --------------------------------------------------------------------------- init
# Per-layer init draws run HOST-SIDE via numpy, seeded deterministically from
# the JAX key. Rationale: a fresh model init makes one jax.random call per
# layer, and every distinct shape is its own tiny XLA program — a ResNet-50
# init was measured at ~160 CPU compiles / 20+ s on one core (the dominant
# cost of every mock-pipeline test). These are init-time-only small arrays;
# the big 7B-scale draws (llama_init) stay on jax.random so they generate
# on-device. A traced key falls back to jax.random (never the case today —
# inits are eager — but keeps the helpers jit-safe).
def _host_rng(key: jax.Array) -> np.random.Generator:
    data = np.asarray(jax.random.key_data(key)).astype(np.uint32).ravel()
    words = np.frombuffer(data.tobytes()[:16].ljust(16, b"\x00"),
                          dtype=np.uint64)  # Philox takes a 2x64-bit key
    return np.random.Generator(np.random.Philox(key=words))


def _is_traced(key) -> bool:
    return isinstance(key, jax.core.Tracer)


def trunc_normal(key: jax.Array, shape: Sequence[int], std: float = 0.02,
                 dtype=jnp.float32) -> jax.Array:
    """Truncated normal in [-2std, 2std] (timm trunc_normal_ convention)."""
    if _is_traced(key):
        return std * jax.random.truncated_normal(
            key, -2.0, 2.0, tuple(shape), jnp.float32).astype(dtype)
    rng = _host_rng(key)
    n = int(np.prod(shape)) if len(tuple(shape)) else 1
    out = np.empty(0, np.float32)
    while out.size < n:  # rejection sampling; ~4.6% of draws fall outside
        draw = rng.standard_normal(int(n * 1.1) + 16, dtype=np.float32)
        out = np.concatenate([out, draw[(draw > -2.0) & (draw < 2.0)]])
    return jnp.asarray(std * out[:n].reshape(tuple(shape)), dtype)


def _fan_in_uniform(key, shape, fan_in, dtype):
    bound = 1.0 / math.sqrt(max(fan_in, 1))
    if _is_traced(key):
        return jax.random.uniform(key, tuple(shape), jnp.float32,
                                  -bound, bound).astype(dtype)
    u = _host_rng(key).random(tuple(shape), dtype=np.float32)
    return jnp.asarray((u * 2.0 - 1.0) * bound, dtype)


def normal_init(key: jax.Array, shape: Sequence[int],
                std: float = 1.0, dtype=jnp.float32) -> jax.Array:
    """Host-side N(0, std²) init draw (same compile-avoidance rationale)."""
    if _is_traced(key):
        return (jax.random.normal(key, tuple(shape), jnp.float32)
                * std).astype(dtype)
    draw = _host_rng(key).standard_normal(tuple(shape), dtype=np.float32)
    return jnp.asarray(draw * std, dtype)


# ------------------------------------------------------------------------- linear
def linear_init(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    p = {"w": _fan_in_uniform(kw, (in_dim, out_dim), in_dim, dtype)}
    if bias:
        p["b"] = _fan_in_uniform(kb, (out_dim,), in_dim, dtype)
    return p


def linear(p: dict, x: jax.Array, policy: DTypePolicy = FP32) -> jax.Array:
    if type(p).__name__ == "PackedQ8":  # pre-tiled W8A8 serving leaf
        from .quant import on_tpu
        from .q8_matmul import q8_matmul_packed, q8_matmul_reference
        fn = q8_matmul_packed if on_tpu() else q8_matmul_reference
        return fn(x, p, out_dtype=policy.compute)
    if type(p).__name__ == "PackedQ4":  # nibble-packed W4A8 serving leaf
        from .quant import on_tpu
        from .q4_matmul import q4_matmul_packed, q4_matmul_reference
        fn = q4_matmul_packed if on_tpu() else q4_matmul_reference
        return fn(x, p, out_dtype=policy.compute)
    if "w_q" in p:  # simple int8 leaf (ops/quant.py)
        from .quant import linear_q8
        return linear_q8(p, x, compute_dtype=policy.compute)
    y = jnp.dot(policy.cast(x), policy.cast(p["w"]),
                preferred_element_type=policy.compute)
    if "b" in p:
        y = y + policy.cast(p["b"])
    return y


# ------------------------------------------------------------------------- conv2d
def conv2d_init(key: jax.Array, in_ch: int, out_ch: int, kernel: int | Tuple[int, int],
                bias: bool = False, dtype=jnp.float32) -> dict:
    kh, kw_ = (kernel, kernel) if isinstance(kernel, int) else kernel
    fan_in = in_ch * kh * kw_
    kw1, kb = jax.random.split(key)
    # He-normal init (torch Conv2d default is kaiming_uniform; close enough for
    # fresh training — pretrained paths overwrite these anyway).
    w = normal_init(kw1, (kh, kw_, in_ch, out_ch),
                    std=math.sqrt(2.0 / fan_in), dtype=dtype)
    p = {"w": w}
    if bias:
        p["b"] = _fan_in_uniform(kb, (out_ch,), fan_in, dtype)
    return p


def conv2d(p: dict, x: jax.Array, stride: int | Tuple[int, int] = 1,
           padding: str | int | Tuple[int, int] = "SAME", dilation: int = 1,
           policy: DTypePolicy = FP32) -> jax.Array:
    """NHWC conv. ``x``: (B,H,W,C), weight: (kh,kw,Cin,Cout)."""
    strides = (stride, stride) if isinstance(stride, int) else stride
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    y = lax.conv_general_dilated(
        policy.cast(x), policy.cast(p["w"]),
        window_strides=strides,
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=policy.compute,
    )
    if "b" in p:
        y = y + policy.cast(p["b"])
    return y


# -------------------------------------------------------------------------- norms
def batchnorm_init(dim: int, dtype=jnp.float32) -> tuple[dict, dict]:
    """Returns (params, state): scale/bias trainable, running stats as state."""
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), jnp.float32), "var": jnp.ones((dim,), jnp.float32),
             "count": jnp.zeros((), jnp.float32)}
    return params, state


def batchnorm(p: dict, s: dict, x: jax.Array, train: bool = False,
              momentum: float = 0.1, eps: float = 1e-5,
              axis_name: Optional[str] = None):
    """BatchNorm over all axes but the last. Returns (y, new_state).

    In train mode uses batch statistics (optionally all-reduced over
    ``axis_name`` for data-parallel training) and updates running stats with
    torch's momentum convention: run = (1-m)*run + m*batch.
    """
    reduce_axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    if train:
        mean = xf.mean(reduce_axes)
        var = xf.var(reduce_axes)
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            var = lax.pmean(var, axis_name)
        n = x.size / x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
            "count": s["count"] + 1.0,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = lax.rsqrt(var + eps)
    y = (xf - mean) * inv * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype), new_s


def layernorm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm(p: dict, x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """LayerNorm in fp32 (matches the reference's fp16-safe LayerNorm,
    blip2.py:199-205), cast back to input dtype."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rmsnorm(scale: jax.Array, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LLaMA RMSNorm (modeling_llama_imgemb.py LlamaRMSNorm): fp32 variance,
    scale applied in input dtype."""
    xf = x.astype(jnp.float32)
    inv = lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * inv).astype(x.dtype) * scale


# ---------------------------------------------------------------------- misc ops
def embedding_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    return jnp.take(table, ids, axis=0)


def gelu_exact(x: jax.Array) -> jax.Array:
    """erf-based GELU (torch nn.GELU default, used by BERT + ViT pooler)."""
    return jax.nn.gelu(x, approximate=False)


def dropout(key: Optional[jax.Array], x: jax.Array, rate: float, train: bool) -> jax.Array:
    if not train or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def max_pool2d(x: jax.Array, window: int, stride: int, padding: int = 0) -> jax.Array:
    """NHWC max pool (torch MaxPool2d semantics with symmetric int padding)."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max, (1, window, window, 1), (1, stride, stride, 1), pads)


def avg_pool2d(x: jax.Array, window: int, stride: Optional[int] = None) -> jax.Array:
    stride = stride or window
    summed = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        (1, window, window, 1), (1, stride, stride, 1), "VALID")
    return (summed / (window * window)).astype(x.dtype)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """(B,H,W,C) -> (B,C) — torch adaptive_avg_pool2d(·, (1,1)) + flatten."""
    return x.mean(axis=(1, 2))
