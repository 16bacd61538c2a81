"""Stage-1 (ITC/ITM/LM) under SPMD data parallelism on the 8-device mesh.

SURVEY §5 names the global-batch contrastive loss as the one algorithm in the
reference that genuinely wants all_gather (the commented-out multi-GPU ITC/ITM
path, blip2_qformer.py:134-280 + GatherLayer base_model.py:199-251). The
claim in train/steps.py is that SPMD subsumes it: with the batch sharded over
`data`, the in-batch (B,B) similarity matrix IS the global-batch similarity
matrix and XLA inserts the gathers. These tests verify that claim directly:
the same global batch must produce the same losses, gradients, and updated
params whether it runs on 1 device or sharded over 8 — i.e. the 8-device run
really does compute global-batch ITC/ITM (a per-shard in-batch loss would
give a different value: smaller negative sets change the softmax).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from radialog_tpu.core.mesh import MeshSpec, make_mesh
from radialog_tpu.models.blip2 import Blip2Config, blip2_init, blip2_stage1_losses
from radialog_tpu.models.qformer import TINY_QFORMER
from radialog_tpu.train.steps import TrainState, make_stage1_train_step

import dataclasses
_Q2 = dataclasses.replace(
    TINY_QFORMER,
    bert=dataclasses.replace(TINY_QFORMER.bert, num_layers=2))
# 2 layers, not TINY's 4: the global-batch equality claim is
# depth-independent and the 8-device ITC+ITM+LM compile dominates this
# test's CI cost (round-5 suite re-budget)
CFG = Blip2Config(qformer=_Q2, embed_dim=16, max_txt_len=12)
B, T, NIMG = 8, 10, 6


def _batch(rng):
    return {
        "image_embeds": jnp.asarray(
            rng.normal(size=(B, NIMG, CFG.qformer.encoder_width)), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(1, 100, (B, T)), jnp.int32),
        "text_mask": jnp.asarray(
            (np.arange(T)[None] < rng.integers(4, T, (B, 1))).astype(np.int32)),
    }


def _shard_batch(mesh, batch):
    return {k: jax.device_put(v, NamedSharding(mesh, P("data")))
            for k, v in batch.items()}


def test_stage1_loss_global_batch_equality():
    """8-device DP loss == 1-device loss on the same global batch."""
    params, _ = blip2_init(jax.random.PRNGKey(0), CFG, with_vision=False)
    batch = _batch(np.random.default_rng(0))
    rng = jax.random.PRNGKey(7)

    # reference value computed eagerly — compiling the single-device graph
    # a second time costs ~25s of CI budget and proves nothing extra
    ref = blip2_stage1_losses(params, CFG, batch["image_embeds"],
                              batch["text_ids"], batch["text_mask"], rng)

    mesh = make_mesh(MeshSpec(data=8, model=1))
    with mesh:
        sbatch = _shard_batch(mesh, batch)
        got = jax.jit(lambda p, b, r: blip2_stage1_losses(
            p, CFG, b["image_embeds"], b["text_ids"], b["text_mask"], r))(
            params, sbatch, rng)

    for name in ("loss", "loss_itc", "loss_itm", "loss_lm"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(ref, name)),
                                   atol=1e-5, rtol=1e-5, err_msg=name)
    # The half-batch "smaller negative sets change ITC" demonstration moved
    # to the slow train-step test (round-5 suite re-budget): its B=4 shapes
    # forced a full eager recompile (~11s) and the 1e-5 sharded-vs-unsharded
    # equality above is the load-bearing global-batch evidence.


@pytest.mark.slow
def test_stage1_train_step_dp_equality():
    """One full optimizer step: sharded and unsharded runs must agree on
    metrics and on the updated parameters. SGD, not Adam: losses/grads agree
    to ~1e-7 across shardings (reduction order), but Adam's step-1 update is
    grad/|grad| — a pure sign() that amplifies that noise unboundedly for
    near-zero-gradient elements. SGD keeps updates linear in the gradient,
    so equality here certifies the sharded gradients themselves."""
    params, _ = blip2_init(jax.random.PRNGKey(1), CFG, with_vision=False)
    batch = _batch(np.random.default_rng(1))
    rng = jax.random.PRNGKey(3)
    tx = optax.sgd(0.1)
    step = make_stage1_train_step(tx, CFG)

    state0 = TrainState.create(params, tx)
    ref_state, ref_metrics = jax.jit(step)(state0, batch, rng)

    mesh = make_mesh(MeshSpec(data=8, model=1))
    with mesh:
        sbatch = _shard_batch(mesh, batch)
        state0 = TrainState.create(params, tx)
        got_state, got_metrics = jax.jit(step)(state0, sbatch, rng)

    for k in ref_metrics:
        np.testing.assert_allclose(np.asarray(got_metrics[k]),
                                   np.asarray(ref_metrics[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)
    flat_ref = jax.tree_util.tree_leaves(ref_state.params)
    flat_got = jax.tree_util.tree_leaves(got_state.params)
    for a, b in zip(flat_got, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)
    # the ITC loss must really be global-batch: recompute on each half alone
    # (per-shard in-batch negatives) and check it differs
    from radialog_tpu.models.blip2 import blip2_stage1_losses
    full = blip2_stage1_losses(params, CFG, batch["image_embeds"],
                               batch["text_ids"], batch["text_mask"], rng)
    half = {k: v[:4] for k, v in batch.items()}
    half_loss = blip2_stage1_losses(params, CFG, half["image_embeds"],
                                    half["text_ids"], half["text_mask"], rng)
    assert not np.allclose(float(half_loss.loss_itc), float(full.loss_itc),
                           atol=1e-3)
