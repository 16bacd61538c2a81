"""Optimizer + LR schedules.

Replaces the reference's AdamW with weight-decay param-group split
(runner_base.py:121-150: no decay for ndim < 2 params — norms/biases) and the
LinearWarmupCosine / LinearWarmupStep schedulers (common/optims.py:13-117),
expressed as optax transforms so the whole update is one jittable function.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def linear_warmup_cosine(init_lr: float, min_lr: float, warmup_steps: int,
                         total_steps: int, warmup_start_lr: float = -1.0
                         ) -> optax.Schedule:
    """optims.py:77-117: linear warmup then cosine decay to min_lr."""
    start = warmup_start_lr if warmup_start_lr >= 0 else init_lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = start + (init_lr - start) * jnp.minimum(step, warmup_steps) / max(warmup_steps, 1)
        t = jnp.clip((step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        cos = min_lr + 0.5 * (init_lr - min_lr) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def linear_warmup_step(init_lr: float, min_lr: float, warmup_steps: int,
                       decay_rate: float, steps_per_epoch: int,
                       warmup_start_lr: float = -1.0) -> optax.Schedule:
    """optims.py LinearWarmupStepLRScheduler: warmup then per-epoch decay."""
    start = warmup_start_lr if warmup_start_lr >= 0 else init_lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = start + (init_lr - start) * jnp.minimum(step, warmup_steps) / max(warmup_steps, 1)
        epoch = jnp.floor(step / max(steps_per_epoch, 1))
        stepped = jnp.maximum(init_lr * (decay_rate ** epoch), min_lr)
        return jnp.where(step < warmup_steps, warm, stepped)

    return schedule


def _decay_mask(params: Any) -> Any:
    """True (apply weight decay) only for >=2-D weights — mirrors the
    reference's param-group split (runner_base.py:128-142: skip ndim<2,
    biases, norm scales)."""
    return jax.tree_util.tree_map(lambda p: jnp.ndim(p) >= 2, params)


def make_adamw(learning_rate: float | optax.Schedule, weight_decay: float = 0.05,
               b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
               grad_clip: Optional[float] = None,
               accum_steps: int = 1) -> optax.GradientTransformation:
    """AdamW with wd masking, optional global-norm clip and grad accumulation
    (base_task.py:229-235 accum_grad_iters)."""
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                             weight_decay=weight_decay, mask=_decay_mask))
    tx = optax.chain(*parts)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def make_optimizer(name: str = "adamw", **kw) -> optax.GradientTransformation:
    if name == "adamw":
        return make_adamw(**kw)
    if name == "sgd":
        return optax.sgd(kw.get("learning_rate", 1e-3), momentum=kw.get("momentum", 0.9))
    raise ValueError(f"unknown optimizer '{name}'")
