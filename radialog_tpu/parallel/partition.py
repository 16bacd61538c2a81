"""Parameter partition specs: tensor parallelism for the LLaMA decoder.

The reference has no tensor parallelism — its "model parallel" is accelerate's
layer-placement `device_map='auto'` (test.py:289-292, finetune.py:245-248).
The TPU-native design shards the matmuls themselves over the `model` mesh axis
(Megatron-style column/row split) and the batch over `data`:

  * wq/wk/wv, gate/up:   (H, out) sharded on out  -> column parallel
  * wo, down:            (in, H)  sharded on in   -> row parallel
    (XLA inserts the psum over `model` after the row-parallel matmul)
  * embed, lm_head:      vocab-sharded on `model` (output logits gathered)
  * norms, biases:       replicated
  * LoRA: a replicated (small), b sharded like its base layer's out dim

With `jax.jit` + NamedSharding on params and inputs, XLA's SPMD partitioner
derives the collectives; nothing here issues communication explicitly.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS


def llama_partition_specs(params: Dict) -> Dict:
    """PartitionSpec pytree matching `llama_init`'s tree (layer params are
    stacked with a leading num_layers axis, which stays unsharded).

    Also covers the int8-quantized stacked training base
    (ops/quant.py quantize_llama / quantize_llama_np — the finetune
    quantize_base path): {"w_q","scale"} leaves shard like their float
    counterparts, with the per-output-channel scale following the output
    dim (column-sharded projections split N, so the scale splits with it;
    row-sharded projections split K, scale replicated)."""

    def proj(leaf: Dict, col: bool) -> Dict:
        if "w_q" in leaf:
            wq = leaf["w_q"]
            stacked = wq.ndim == 3 if hasattr(wq, "ndim") else True
            lead = (None,) if stacked else ()
            if col:
                return {"w_q": P(*lead, None, MODEL_AXIS),
                        "scale": P(*lead, MODEL_AXIS)}
            return {"w_q": P(*lead, MODEL_AXIS, None),
                    "scale": P(*lead, None)}
        if col:
            return {"w": P(None, None, MODEL_AXIS)}
        return {"w": P(None, MODEL_AXIS, None)}

    lyr = params["layers"]
    specs = {
        "embed": P(MODEL_AXIS, None),
        "layers": {
            "wq": proj(lyr["wq"], True), "wk": proj(lyr["wk"], True),
            "wv": proj(lyr["wv"], True), "wo": proj(lyr["wo"], False),
            "gate": proj(lyr["gate"], True), "up": proj(lyr["up"], True),
            "down": proj(lyr["down"], False),
            "input_ln": P(), "post_ln": P(),
        },
        "final_ln": P(),
    }
    head = params["lm_head"]
    if "w_q" in head:
        specs["lm_head"] = {"w_q": P(None, MODEL_AXIS), "scale": P(MODEL_AXIS)}
    else:
        specs["lm_head"] = {"w": P(None, MODEL_AXIS)}
    if "img_proj" in params:
        specs["img_proj"] = jax.tree_util.tree_map(lambda _: P(),
                                                   params["img_proj"])
    return specs


def lora_partition_specs(lora: Dict) -> Dict:
    """LoRA adapters: `a` replicated, `b` column-sharded to match the base
    projection's output sharding; img_proj replicated (tiny)."""
    return {
        "layers": {t: {"a": P(), "b": P(None, None, MODEL_AXIS)}
                   for t in lora["layers"]},
        "img_proj": jax.tree_util.tree_map(lambda _: P(), lora["img_proj"]),
        "scale": P(),
    }


def shard_params(mesh: Mesh, params: Any, specs: Any) -> Any:
    """device_put a param pytree with the given PartitionSpec pytree."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, P))


def with_sharding_constraints(tree: Any, specs: Any) -> Any:
    """Apply lax.with_sharding_constraint leaf-wise (inside jit)."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.lax.with_sharding_constraint(x, s),
        tree, specs,
        is_leaf=lambda x: isinstance(x, P))


def batch_specs(tree: Any) -> Any:
    """P(data, None, ...) for each leaf of a batch pytree."""
    return jax.tree_util.tree_map(
        lambda x: P(DATA_AXIS, *([None] * (x.ndim - 1))) if hasattr(x, "ndim") and x.ndim > 0 else P(),
        tree)


def replicated_specs(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda _: P(), tree)


def make_sharding(mesh: Mesh, spec_tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec_tree,
        is_leaf=lambda x: isinstance(x, P))
