"""Jitted train steps: LoRA finetune (LLM) and Q-Former stage-1.

One trainer design replaces the reference's three (HF Trainer subclasses in
finetune.py:74-118, LAVIS RunnerBase/BaseTask hot loop base_task.py:200-247,
Lightning in findings_classifier): a pure step function under jit over the
device mesh. Data parallelism comes from batch sharding; the global-batch
contrastive loss the reference left commented out (blip2_qformer.py:134-280,
GatherLayer) is subsumed by SPMD — the in-batch similarity matrix is computed
over the *global* batch and XLA inserts the all_gather over ICI. Verified,
not just claimed: tests/test_stage1_multichip.py pins 8-device-DP loss/grads/
updated-params equality vs the single-device run on the same global batch,
and __graft_entry__.dryrun_multichip executes the sharded stage-1 step.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.blip2 import Blip2Config, blip2_stage1_losses, blip2_trunk_tokens
from ..models.llama import LlamaConfig, find_img_start, llama_apply, prefill_bias
from ..ops.augment import augment_cxr_batch
from ..ops.layers import DTypePolicy, FP32, layernorm

IGNORE_INDEX = -100  # HF convention, finetune.py:283-307 masks prompt tokens


class TrainState(NamedTuple):
    params: Any          # trainable params (LoRA tree, or stage-1 params)
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(params, tx.init(params), jnp.zeros((), jnp.int32))


def masked_ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Next-token CE ignoring IGNORE_INDEX labels (shift-by-one, the HF
    contract the reference trains under)."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != IGNORE_INDEX
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, nll, 0.0).sum() / denom


def lora_loss_fn(lora: Dict, base_params: Dict, cfg: LlamaConfig,
                 batch: Dict[str, jax.Array],
                 policy: DTypePolicy = FP32, remat: bool = False,
                 flash: bool = False) -> jax.Array:
    """Full-sequence forward with <IMG> splice + masked CE.

    batch: tokens (B,T) right-padded, labels (B,T) with -100 on prompt/pad,
    lengths (B,), img_embs (B,32,768) optional.
    """
    tokens, labels, lengths = batch["tokens"], batch["labels"], batch["lengths"]
    b, t = tokens.shape
    positions = jnp.arange(t)[None, :].repeat(b, 0)
    bias = prefill_bias(lengths, t)
    img_embs = batch.get("img_embs")
    img_start = find_img_start(tokens, cfg.img_token_id) if img_embs is not None else None
    # flash: the Pallas flash-attention kernel has a custom FA2-style VJP
    # (ops/flash_attention.py), so training CAN route through it. Default
    # False by measurement, not necessity: at the reference shape (micro 2,
    # cutoff 600) XLA attention + remat runs 349 ms/step vs flash's 403
    # (docs/PERF.md) — the MXU-bound step prefers XLA's fused backward at
    # these short sequences. bench_train.py --flash re-measures.
    logits, _ = llama_apply(base_params, cfg, tokens, positions, bias,
                            img_embs=img_embs, img_start=img_start,
                            lora=lora, policy=policy, remat=remat,
                            lengths=lengths, flash=flash)
    return masked_ce(logits, labels)


def make_lora_train_step(tx: optax.GradientTransformation, cfg: LlamaConfig,
                         policy: DTypePolicy = FP32, remat: bool = True,
                         flash: bool = False) -> Callable:
    """Returns step(state, base_params, batch) -> (state, metrics). Only the
    LoRA tree (adapters + img_proj, finetune.py:309-323) receives gradients;
    the 7B base stays frozen. flash routes attention through the Pallas
    kernel + its custom VJP (ops/flash_attention.py)."""

    def step(state: TrainState, base_params: Dict, batch: Dict) -> Tuple[TrainState, Dict]:
        loss, grads = jax.value_and_grad(lora_loss_fn)(
            state.params, base_params, cfg, batch, policy, remat, flash)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": loss, "grad_norm": gnorm})

    return step


def make_stage1_train_step(tx: optax.GradientTransformation, cfg: Blip2Config,
                           policy: DTypePolicy = FP32,
                           itm_chunks: int = 1) -> Callable:
    """Q-Former stage-1 (ITC+ITM+LM). Trains everything in the blip2 param
    tree except the frozen visual trunk (blip2_qformer.py:66-71) — callers
    pass image_embeds already encoded (and therefore gradient-free), matching
    the reference where the ViT is under no_grad. itm_chunks: see
    blip2_stage1_losses (the batch-64 HBM lever, docs/PERF.md)."""

    def loss_fn(params, batch, rng):
        out = blip2_stage1_losses(params, cfg, batch["image_embeds"],
                                  batch["text_ids"], batch["text_mask"],
                                  rng, policy=policy, itm_chunks=itm_chunks)
        return out.loss, out

    def step(state: TrainState, batch: Dict, rng: jax.Array) -> Tuple[TrainState, Dict]:
        (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": out.loss, "loss_itc": out.loss_itc,
                 "loss_itm": out.loss_itm, "loss_lm": out.loss_lm})

    return step


def make_stage1_raw_train_step(tx: optax.GradientTransformation,
                               cfg: Blip2Config,
                               policy: DTypePolicy = FP32,
                               augment: bool = False,
                               itm_chunks: int = 1) -> Callable:
    """Stage-1 step over RAW images: the frozen BioViL trunk runs inside the
    jitted step under stop_gradient (the reference runs the ViT forward per
    batch under no_grad, blip2_qformer.py:96), ln_vision stays trainable
    (only visual_encoder params are frozen, blip2_qformer.py:66-71).

    state.params is the blip2 tree WITHOUT the 'visual' subtree; the frozen
    trunk (visual_params, visual_state) is a separate argument so it never
    enters the optimizer.

    batch: images (B,448,448,3) float [0,1], text_ids/text_mask (B,T).
    ``augment=True`` additionally applies the reference's train augs on
    device — NOTE the reference *constructs* these for stage-1 but never
    applies them (ReportDataset.py:243 vis_augs is dead code), so the
    parity default is False.
    """

    def loss_fn(params, visual_params, visual_state, batch, rng):
        images = batch["images"]
        if images.dtype == jnp.uint8:
            # uint8 loader contract (CxrLoader(emit_u8=True)): expand to
            # the f32 3-channel form ON DEVICE — bit-identical values,
            # 12x smaller host->device batches (ops/image.expand_cxr_u8)
            from ..ops.image import expand_cxr_u8
            images = expand_cxr_u8(images)
        if augment:
            rng, ka = jax.random.split(rng)
            images = augment_cxr_batch(images, ka)
        tokens = jax.lax.stop_gradient(
            blip2_trunk_tokens(visual_params, visual_state, images, policy))
        image_embeds = layernorm(params["ln_vision"], tokens)
        out = blip2_stage1_losses(params, cfg, image_embeds,
                                  batch["text_ids"], batch["text_mask"],
                                  rng, policy=policy,
                                  itm_chunks=itm_chunks)
        return out.loss, out

    def step(state: TrainState, visual_params: Dict, visual_state: Dict,
             batch: Dict, rng: jax.Array) -> Tuple[TrainState, Dict]:
        (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, visual_params, visual_state, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": out.loss, "loss_itc": out.loss_itc,
                 "loss_itm": out.loss_itm, "loss_lm": out.loss_lm})

    return step
