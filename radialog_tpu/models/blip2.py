"""BLIP-2 stage-1 model: frozen BioViL-T + Q-Former + ITC/ITM/LM heads.

Re-implements Blip2Qformer (blip2_qformer.py:27-399) functionally:

  image -> biovil_t (frozen, J=1408) -> projected patches, channel-major
  reshape to (B,196,1408) (quirk, blip2_qformer.py:96) -> ln_vision ->
  Q-Former query pass (use_cache) -> ITC + ITM(hard negatives) + LM losses.

Differences by design (TPU-first):
  * hard-negative multinomial sampling uses jax.random.categorical so the
    whole loss is one jittable function (reference loops on host with
    torch.multinomial, blip2_qformer.py:314-330);
  * the optional cross-device global-batch contrastive variant (the
    commented-out path at blip2_qformer.py:134-280) is provided via
    ``axis_name`` + jax.lax.all_gather in train/steps.py (stage-1 step) /
    train/runner.py (Stage1Runner).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.layers import (DTypePolicy, FP32, layernorm, layernorm_init,
                          linear, linear_init)
from .biovil_t import biovil_t_apply, biovil_t_init, patch_tokens_for_qformer
from .qformer import (QFormerConfig, lm_loss, qformer_image_grounded,
                      qformer_init, qformer_lm, qformer_multimodal,
                      qformer_text)


@dataclasses.dataclass(frozen=True)
class Blip2Config:
    qformer: QFormerConfig = QFormerConfig()
    embed_dim: int = 256            # ITC projection dim (blip2_qformer.py:55)
    max_txt_len: int = 256          # blip2_pretrain_stage1.yaml:13
    image_size: int = 448


class Stage1Losses(NamedTuple):
    loss: jax.Array
    loss_itc: jax.Array
    loss_itm: jax.Array
    loss_lm: jax.Array


def blip2_init(key, cfg: Blip2Config, with_vision: bool = True) -> Tuple[Dict, Dict]:
    """Init (params, state). ``with_vision=False`` skips the BioViL trunk
    (for tests or when image embeddings are precomputed)."""
    ks = jax.random.split(key, 6)
    h = cfg.qformer.bert.hidden_size
    params: Dict = {
        "qformer": qformer_init(ks[0], cfg.qformer),
        "ln_vision": layernorm_init(cfg.qformer.encoder_width),
        "vision_proj": linear_init(ks[1], h, cfg.embed_dim),
        "text_proj": linear_init(ks[2], h, cfg.embed_dim),
        "itm_head": linear_init(ks[3], h, 2),
        "temp": jnp.asarray(0.07, jnp.float32),
    }
    state: Dict = {}
    if with_vision:
        params["visual"], state["visual"] = biovil_t_init(ks[4], joint_feature_size=cfg.qformer.encoder_width)
    return params, state


def blip2_trunk_tokens(visual_params: Dict, visual_state: Dict,
                       images: jax.Array,
                       policy: DTypePolicy = FP32) -> jax.Array:
    """images (B,448,448,3) -> RAW patch tokens (B,196,1408), pre-ln_vision.

    This is the frozen part: the reference freezes only visual_encoder
    (blip2_qformer.py:66-71) while ln_vision stays trainable, so the
    stop_gradient boundary for stage-1 training sits exactly here."""
    out, _ = biovil_t_apply(visual_params, visual_state, images,
                            train=False, policy=policy)
    return patch_tokens_for_qformer(out.projected_patch_embeddings)


def blip2_encode_image(params: Dict, state: Dict, images: jax.Array,
                       policy: DTypePolicy = FP32) -> jax.Array:
    """images (B,448,448,3) -> ln_vision'd patch tokens (B,196,1408).
    The trunk is frozen (blip2_qformer.py:66-71): callers should wrap the
    blip2_trunk_tokens part in lax.stop_gradient for training."""
    tokens = blip2_trunk_tokens(params["visual"], state["visual"], images,
                                policy=policy)
    return layernorm(params["ln_vision"], tokens)


def blip2_forward_image(params: Dict, cfg: Blip2Config, image_embeds: jax.Array,
                        policy: DTypePolicy = FP32) -> jax.Array:
    """Q-Former query embeddings for the LLM (blip2_qformer.py:467-484).
    Returns (B, 32, 768)."""
    hidden, _ = qformer_image_grounded(params["qformer"], cfg.qformer,
                                       image_embeds, policy=policy)
    return hidden


def _normalize(x: jax.Array) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def blip2_stage1_losses(params: Dict, cfg: Blip2Config, image_embeds: jax.Array,
                        text_ids: jax.Array, text_mask: jax.Array,
                        rng: jax.Array, policy: DTypePolicy = FP32,
                        itm_chunks: int = 1) -> Stage1Losses:
    """ITC + ITM + LM over one in-batch sample set (blip2_qformer.py:281-399).

    image_embeds: (B, 196, 1408) ln_vision'd (frozen-trunk) patch tokens.
    text_ids/text_mask: (B, T) CLS-first BERT tokens, T <= max_txt_len.
    itm_chunks > 1 runs the hard-negative ITM forward (a 3B-batch Q-Former
    pass, the step's peak activation) as a REMAT'd lax.map over that many
    equal-size chunks: per-sample math is unchanged (the Q-Former has no
    cross-batch ops), and jax.checkpoint around the chunk body means the
    backward recomputes one chunk's Q-Former activations at a time instead
    of keeping all 3B rows' residuals live — peak ITM activation memory
    drops by the chunk factor (a bare lax.map does NOT help: scan stacks
    every iteration's residuals, measured 17.6G -> 38.8G at b64). This is
    the lever that moves the stage-1 batch-64 HBM wall
    (tools/bench_train.py --stage1 --itm-chunks, docs/PERF.md).
    """
    qcfg = cfg.qformer
    b = image_embeds.shape[0]
    nq = qcfg.num_query_tokens

    # ---- query pass (cached for LM) + text pass
    query_hidden, query_cache = qformer_image_grounded(
        params["qformer"], qcfg, image_embeds, use_cache=True, policy=policy)
    image_feats = _normalize(linear(params["vision_proj"], query_hidden, policy)
                             .astype(jnp.float32))                 # (B,nq,E)
    text_hidden = qformer_text(params["qformer"], qcfg, text_ids, text_mask,
                               policy=policy)
    text_feat = _normalize(linear(params["text_proj"], text_hidden[:, 0], policy)
                           .astype(jnp.float32))                   # (B,E)

    # ---- ITC (in-batch; blip2_qformer.py:281-305)
    sim_q2t = jnp.einsum("iqe,te->itq", image_feats, text_feat)
    sim_i2t = sim_q2t.max(-1) / params["temp"]                     # (B,B)
    sim_t2i = sim_i2t.T  # max over queries is symmetric in this in-batch case
    targets = jnp.arange(b)
    loss_itc = 0.5 * (_smoothed_ce(sim_i2t, targets, 0.1) +
                      _smoothed_ce(sim_t2i, targets, 0.1))

    # ---- ITM hard negatives (blip2_qformer.py:307-370)
    eye = jnp.eye(b, dtype=bool)
    w_t2i = jnp.where(eye, 0.0, jax.nn.softmax(jax.lax.stop_gradient(sim_t2i), -1) + 1e-4)
    w_i2t = jnp.where(eye, 0.0, jax.nn.softmax(jax.lax.stop_gradient(sim_i2t), -1) + 1e-4)
    k1, k2 = jax.random.split(rng)
    neg_img_idx = jax.random.categorical(k1, jnp.log(w_t2i))       # (B,)
    neg_txt_idx = jax.random.categorical(k2, jnp.log(w_i2t))

    text_ids_all = jnp.concatenate([text_ids, text_ids, text_ids[neg_txt_idx]], 0)
    text_mask_all = jnp.concatenate([text_mask, text_mask, text_mask[neg_txt_idx]], 0)
    image_all = jnp.concatenate([image_embeds, image_embeds[neg_img_idx], image_embeds], 0)
    attn_all = jnp.concatenate(
        [jnp.ones((3 * b, nq), text_mask.dtype), text_mask_all], axis=1)
    if itm_chunks > 1:
        if (3 * b) % itm_chunks:
            raise ValueError(f"itm_chunks {itm_chunks} must divide 3*batch "
                             f"({3 * b})")
        cb = 3 * b // itm_chunks

        @jax.checkpoint
        def _chunk(qparams, ids, attn, img):
            hid = qformer_multimodal(qparams, qcfg, ids, attn, img,
                                     policy=policy)
            return hid[:, :nq]

        itm_q = jax.lax.map(lambda a: _chunk(params["qformer"], *a), (
            text_ids_all.reshape(itm_chunks, cb, -1),
            attn_all.reshape(itm_chunks, cb, -1),
            image_all.reshape(itm_chunks, cb, *image_all.shape[1:]),
        )).reshape(3 * b, nq, -1)
    else:
        itm_hidden = qformer_multimodal(params["qformer"], qcfg, text_ids_all,
                                        attn_all, image_all, policy=policy)
        itm_q = itm_hidden[:, :nq]
    itm_logits = linear(params["itm_head"], itm_q, policy).mean(axis=1)
    itm_labels = jnp.concatenate([jnp.ones((b,), jnp.int32),
                                  jnp.zeros((2 * b,), jnp.int32)])
    loss_itm = _smoothed_ce(itm_logits.astype(jnp.float32), itm_labels, 0.0)

    # ---- LM captioning over cached queries (blip2_qformer.py:372-391)
    dec_ids = text_ids.at[:, 0].set(qcfg.bos_token_id)
    labels = jnp.where(dec_ids == qcfg.pad_token_id, -100, dec_ids)
    lm_mask = jnp.concatenate([jnp.ones((b, nq), text_mask.dtype), text_mask], axis=1)
    logits = qformer_lm(params["qformer"], qcfg, dec_ids, lm_mask, query_cache,
                        policy=policy)
    loss_lm = lm_loss(logits, labels, label_smoothing=0.1)

    return Stage1Losses(loss=loss_itc + loss_itm + loss_lm,
                        loss_itc=loss_itc, loss_itm=loss_itm, loss_lm=loss_lm)


def blip2_generate_caption(params: Dict, cfg: Blip2Config,
                           image_embeds: jax.Array, max_length: int = 30,
                           min_length: int = 10,
                           policy: DTypePolicy = FP32) -> jax.Array:
    """Greedy caption token ids from the Q-Former LM
    (Blip2Qformer.generate, blip2_qformer.py:401-465: [DEC] bos, SEP as eos,
    min_length enforced by masking the eos logit).

    Returns (B, max_length) int32 ids, SEP-padded after the first SEP.
    The text side is short (<=30 tokens) and the query prefix K/V are
    computed once — each step re-runs only the text stack over the prefix
    cache, so a while_loop of full text passes stays cheap.
    """
    qcfg = cfg.qformer
    b = image_embeds.shape[0]
    _, query_cache = qformer_image_grounded(params["qformer"], qcfg,
                                            image_embeds, use_cache=True,
                                            policy=policy)
    nq = qcfg.num_query_tokens
    bos, eos = qcfg.bos_token_id, qcfg.sep_token_id

    ids0 = jnp.full((b, max_length), qcfg.pad_token_id, jnp.int32)
    ids0 = ids0.at[:, 0].set(bos)

    def body(t, state):
        ids, done = state
        mask = jnp.concatenate(
            [jnp.ones((b, nq), jnp.int32),
             (jnp.arange(max_length) <= t)[None].astype(jnp.int32).repeat(b, 0)],
            axis=1)
        logits = qformer_lm(params["qformer"], qcfg, ids, mask, query_cache,
                            policy=policy)
        step_logits = jax.lax.dynamic_index_in_dim(logits, t, 1, keepdims=False)
        step_logits = jnp.where(
            (t + 1 < min_length) & (jnp.arange(logits.shape[-1]) == eos)[None],
            -1e30, step_logits)
        nxt = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos, nxt)
        ids = jax.lax.cond(t + 1 < max_length,
                           lambda a: a.at[:, t + 1].set(nxt), lambda a: a, ids)
        return ids, done | (nxt == eos)

    ids, _ = jax.lax.fori_loop(0, max_length - 1, body,
                               (ids0, jnp.zeros((b,), bool)))
    return ids


def _smoothed_ce(logits: jax.Array, targets: jax.Array, smoothing: float) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    if smoothing > 0:
        smooth = -logp.mean(-1)
        nll = (1 - smoothing) * nll + smoothing * smooth
    return nll.mean()
