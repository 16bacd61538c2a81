"""int8-base LoRA training (the finetune `quantize_base` path).

The reference needs bitsandbytes int8 to fit Vicuna-7B finetuning on one
GPU (prepare_model_for_int8_training, finetune.py:309); here the frozen
base is the stacked {"w_q","scale"} tree (ops/quant.py quantize_llama) and
gradients flow through linear_q8's DEQUANT matmul w.r.t. activations only —
QLoRA-style: int8 weights, full-precision activations, no straight-through
estimator (nothing differentiates the round()).

Pinned contracts: gradients through the int8 base equal gradients through
the explicitly dequantized float base (same weights, so the only difference
is where the dequant multiplication sits); training reduces the loss; the
quantized tree shards under the same partition specs as the float tree.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from radialog_tpu.models.llama import TINY_LLAMA, llama_init, lora_init
from radialog_tpu.ops.layers import FP32
from radialog_tpu.ops.quant import dequantize_weight, quantize_llama
from radialog_tpu.train.steps import (TrainState, lora_loss_fn,
                                      make_lora_train_step)

CFG = TINY_LLAMA
RNG = np.random.default_rng(5)


def _batch(b=2, t=16):
    tokens = RNG.integers(3, CFG.vocab_size, (b, t)).astype(np.int32)
    labels = tokens.astype(np.int32).copy()
    labels[:, : t // 2] = -100
    return {"tokens": jnp.asarray(tokens), "labels": jnp.asarray(labels),
            "lengths": jnp.full((b,), t, jnp.int32)}


def _dequant_tree(q):
    """{"w_q","scale"} leaves -> {"w"} float leaves holding the SAME
    (rounded) weights the int8 path multiplies by."""
    def walk(p):
        if isinstance(p, dict) and "w_q" in p:
            return {"w": dequantize_weight(p)}
        if isinstance(p, dict):
            return {k: walk(v) for k, v in p.items()}
        return p
    return walk(q)


def test_lora_grads_match_dequantized_base():
    base = llama_init(jax.random.PRNGKey(0), CFG)
    q = quantize_llama(base)
    deq = _dequant_tree(q)
    lora = lora_init(jax.random.PRNGKey(1), CFG)
    batch = _batch()
    g_q = jax.grad(lora_loss_fn)(lora, q, CFG, batch, FP32, False)
    g_d = jax.grad(lora_loss_fn)(lora, deq, CFG, batch, FP32, False)
    for a, b in zip(jax.tree_util.tree_leaves(g_q),
                    jax.tree_util.tree_leaves(g_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_lora_loss_decreases_on_int8_base():
    base = quantize_llama(llama_init(jax.random.PRNGKey(0), CFG))
    lora = lora_init(jax.random.PRNGKey(1), CFG)
    tx = optax.adam(5e-3)
    step = jax.jit(make_lora_train_step(tx, CFG, policy=FP32, remat=True))
    state = TrainState.create(lora, tx)
    batch = _batch()
    losses = []
    for _ in range(8):
        state, metrics = step(state, base, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.05, losses
    # the frozen base must be untouched (only LoRA + img_proj train)
    assert base["layers"]["wq"]["w_q"].dtype == jnp.int8


def test_quantized_base_shards_and_matches_unsharded():
    from radialog_tpu.core.mesh import MeshSpec, make_mesh
    from radialog_tpu.parallel.partition import (llama_partition_specs,
                                                 lora_partition_specs,
                                                 shard_params)
    base = quantize_llama(llama_init(jax.random.PRNGKey(0), CFG))
    lora = lora_init(jax.random.PRNGKey(1), CFG)
    batch = _batch()
    want = lora_loss_fn(lora, base, CFG, batch, FP32, False)
    mesh = make_mesh(MeshSpec(model=2))
    with mesh:
        base_s = shard_params(mesh, base, llama_partition_specs(base))
        lora_s = shard_params(mesh, lora, lora_partition_specs(lora))
        got = jax.jit(lora_loss_fn, static_argnames=("cfg", "policy", "remat")
                      )(lora_s, base_s, CFG, batch, FP32, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_finetune_cli_quantize_base(tmp_path):
    from radialog_tpu.apps.finetune_lora import FinetuneConfig, train
    logs = []
    train(FinetuneConfig(mock=True, data_path="tests/fixtures/instruct.json",
                         batch_size=4, micro_batch_size=2, num_epochs=1,
                         max_steps=4, cutoff_len=48, eval_steps=2,
                         use_embs=True, use_instruct_data=True,
                         quantize_base=True, val_set_size=2,
                         output_dir=str(tmp_path)),
          log_fn=logs.append)
    losses = [m["loss"] for m in logs if "loss" in m]
    assert losses, logs
    assert all(np.isfinite(losses))
