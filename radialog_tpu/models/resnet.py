"""Functional ResNet-18/50 trunk (torchvision-v1.5-compatible), NHWC.

Behavioral contract from the reference (biovil_t/resnet.py:15-80): forward
returns the penultimate feature map x4 — for a 448x448 input, a
(B, 14, 14, 2048) patch grid (stride 32); 488 input gives 16x16 (the findings
classifier depends on that, chexpert_model.py:12-18).

Weight layout is HWIO (NHWC convs — XLA's native TPU layout); the torch
importer (models/import_torch.py) transposes OIHW -> HWIO.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..ops.layers import (DTypePolicy, FP32, batchnorm, batchnorm_init, conv2d,
                          conv2d_init, max_pool2d)

RESNET50_LAYERS = (3, 4, 6, 3)
RESNET18_LAYERS = (2, 2, 2, 2)


# ----------------------------------------------------------------------- blocks
def _bottleneck_init(key, in_ch: int, width: int, stride: int) -> Tuple[dict, dict]:
    ks = jax.random.split(key, 4)
    out_ch = width * 4
    p: Dict = {}
    s: Dict = {}
    p["conv1"] = conv2d_init(ks[0], in_ch, width, 1)
    p["bn1"], s["bn1"] = batchnorm_init(width)
    p["conv2"] = conv2d_init(ks[1], width, width, 3)
    p["bn2"], s["bn2"] = batchnorm_init(width)
    p["conv3"] = conv2d_init(ks[2], width, out_ch, 1)
    p["bn3"], s["bn3"] = batchnorm_init(out_ch)
    if stride != 1 or in_ch != out_ch:
        p["down_conv"] = conv2d_init(ks[3], in_ch, out_ch, 1)
        p["down_bn"], s["down_bn"] = batchnorm_init(out_ch)
    return p, s


def _bottleneck(p, s, x, stride: int, train: bool, policy: DTypePolicy):
    ns = {}
    y = conv2d(p["conv1"], x, 1, "SAME", policy=policy)
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], y, train)
    y = jax.nn.relu(y)
    y = conv2d(p["conv2"], y, stride, 1, policy=policy)  # stride on 3x3 (v1.5)
    y, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], y, train)
    y = jax.nn.relu(y)
    y = conv2d(p["conv3"], y, 1, "SAME", policy=policy)
    y, ns["bn3"] = batchnorm(p["bn3"], s["bn3"], y, train)
    if "down_conv" in p:
        idn = conv2d(p["down_conv"], x, stride, "SAME", policy=policy)
        idn, ns["down_bn"] = batchnorm(p["down_bn"], s["down_bn"], idn, train)
    else:
        idn = x
    return jax.nn.relu(y + idn), ns


def _basic_init(key, in_ch: int, width: int, stride: int) -> Tuple[dict, dict]:
    ks = jax.random.split(key, 3)
    p: Dict = {}
    s: Dict = {}
    p["conv1"] = conv2d_init(ks[0], in_ch, width, 3)
    p["bn1"], s["bn1"] = batchnorm_init(width)
    p["conv2"] = conv2d_init(ks[1], width, width, 3)
    p["bn2"], s["bn2"] = batchnorm_init(width)
    if stride != 1 or in_ch != width:
        p["down_conv"] = conv2d_init(ks[2], in_ch, width, 1)
        p["down_bn"], s["down_bn"] = batchnorm_init(width)
    return p, s


def _basic(p, s, x, stride: int, train: bool, policy: DTypePolicy):
    ns = {}
    y = conv2d(p["conv1"], x, stride, 1, policy=policy)
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], y, train)
    y = jax.nn.relu(y)
    y = conv2d(p["conv2"], y, 1, 1, policy=policy)
    y, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], y, train)
    if "down_conv" in p:
        idn = conv2d(p["down_conv"], x, stride, "SAME", policy=policy)
        idn, ns["down_bn"] = batchnorm(p["down_bn"], s["down_bn"], idn, train)
    else:
        idn = x
    return jax.nn.relu(y + idn), ns


# ------------------------------------------------------------------------ model
def resnet_init(key: jax.Array, layers: Tuple[int, ...] = RESNET50_LAYERS,
                bottleneck: bool = True) -> Tuple[dict, dict]:
    """Init (params, state). Channels: stem 64; stages 64/128/256/512 widths."""
    ks = list(jax.random.split(key, 2 + sum(layers)))
    p: Dict = {"conv1": conv2d_init(ks.pop(), 3, 64, 7)}
    s: Dict = {}
    p["bn1"], s["bn1"] = batchnorm_init(64)
    in_ch = 64
    expansion = 4 if bottleneck else 1
    init_fn = _bottleneck_init if bottleneck else _basic_init
    for stage, n_blocks in enumerate(layers):
        width = 64 * (2 ** stage)
        blocks_p: List = []
        blocks_s: List = []
        for b in range(n_blocks):
            stride = 2 if (b == 0 and stage > 0) else 1
            bp, bs = init_fn(ks.pop(), in_ch, width, stride)
            blocks_p.append(bp)
            blocks_s.append(bs)
            in_ch = width * expansion
        p[f"layer{stage + 1}"] = blocks_p
        s[f"layer{stage + 1}"] = blocks_s
    return p, s


def resnet_apply(p: dict, s: dict, x: jax.Array, train: bool = False,
                 bottleneck: bool | None = None, policy: DTypePolicy = FP32):
    """x: (B,H,W,3) -> x4 feature map (B,H/32,W/32,C). Returns (x4, new_state).
    Block type is inferred from the param tree when ``bottleneck`` is None."""
    if bottleneck is None:
        bottleneck = "conv3" in p["layer1"][0]
    ns: Dict = {}
    y = conv2d(p["conv1"], x, 2, 3, policy=policy)
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], y, train)
    y = jax.nn.relu(y)
    y = max_pool2d(y, 3, 2, 1)
    block_fn = _bottleneck if bottleneck else _basic
    for stage in range(1, 5):
        blocks_ns = []
        for b, (bp, bs) in enumerate(zip(p[f"layer{stage}"], s[f"layer{stage}"])):
            stride = 2 if (b == 0 and stage > 1) else 1
            y, bns = block_fn(bp, bs, y, stride, train, policy)
            blocks_ns.append(bns)
        ns[f"layer{stage}"] = blocks_ns
    return y, ns
