"""BLIP-2 Q-Former: BERT-base with image cross-attention + query tokens.

Re-implements model/lavis/models/blip2_models/Qformer.py (1216 LoC of patched
HF BERT) as a small set of pure functions. Architectural contract:

  * 12 BERT layers; cross-attention to image tokens inserted every
    ``cross_attention_freq=2`` layers (layers 0,2,4,...; Qformer.py:385-395),
    with K/V projections from ``encoder_width``=1408 image features.
  * 32 learned query tokens prepended to (optional) text embeddings
    (Qformer.py:96-103). Cross-attention runs on the query part only;
    queries use a separate FFN (``intermediate_query``/``output_query``,
    Qformer.py:399-400,429-464) initialised from the text FFN weights
    (blip2_qformer.py:76-80).
  * Text generation is UniLM-style: queries form a bidirectional prefix whose
    per-layer K/V are cached and reused by a causally-masked text decoder
    (Qformer.py:713-802 get_extended_attention_mask; blip2_qformer.py:106-112
    use_cache -> 383-391 past_key_values).
  * LM head: transform(dense+gelu+LN) then decoder tied to word embeddings
    (HF BertLMHeadModel); loss is label-smoothed (0.1) shifted CE
    (Qformer.py:1060-1077).

Four entry points mirror how RaDialog drives the model:
  ``qformer_image_grounded``  — queries x image (forward_image / ITC image leg)
  ``qformer_text``            — text-only BERT (ITC text leg)
  ``qformer_multimodal``      — [queries; text] x image, bidirectional (ITM)
  ``qformer_lm``              — causal text over cached query prefix (LM loss)
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import NEG_INF, combine_bias, mha, padding_mask_bias
from ..ops.layers import (DTypePolicy, FP32, dropout, embedding_lookup,
                          gelu_exact, layernorm, layernorm_init, linear,
                          linear_init, trunc_normal)
from .bert import (BertConfig, bert_ffn, bert_ffn_init, bert_self_attention_init)


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    bert: BertConfig = BertConfig(vocab_size=30523)  # bert-base + [DEC]
    num_query_tokens: int = 32
    encoder_width: int = 1408
    cross_attention_freq: int = 2
    bos_token_id: int = 30522   # [DEC]
    pad_token_id: int = 0
    sep_token_id: int = 102     # used as EOS


TINY_QFORMER = QFormerConfig(
    bert=BertConfig(vocab_size=128, hidden_size=32, num_layers=4, num_heads=4,
                    intermediate_size=64, max_position=64),
    num_query_tokens=8, encoder_width=48, bos_token_id=120)


# ------------------------------------------------------------------------- init
def qformer_init(key, cfg: QFormerConfig) -> Dict:
    b = cfg.bert
    ks = jax.random.split(key, 6)
    layers = []
    for i in range(b.num_layers):
        kl = jax.random.fold_in(ks[0], i)
        ka, kc, kf, kfq = jax.random.split(kl, 4)
        layer = {
            "attn": bert_self_attention_init(ka, b),
            "ffn": bert_ffn_init(kf, b),
            "ffn_query": bert_ffn_init(kfq, b),
        }
        if i % cfg.cross_attention_freq == 0:
            layer["cross"] = bert_self_attention_init(kc, b, kv_width=cfg.encoder_width)
        layers.append(layer)
    return {
        "embeddings": {
            "word": trunc_normal(ks[1], (b.vocab_size, b.hidden_size)),
            "position": trunc_normal(ks[2], (b.max_position, b.hidden_size)),
            "ln": layernorm_init(b.hidden_size),
        },
        "layers": layers,
        "query_tokens": trunc_normal(ks[3], (cfg.num_query_tokens, b.hidden_size)),
        "cls": {
            "transform": linear_init(ks[4], b.hidden_size, b.hidden_size),
            "transform_ln": layernorm_init(b.hidden_size),
            "decoder_bias": jnp.zeros((b.vocab_size,), jnp.float32),
        },
    }


# ------------------------------------------------------------------- core layer
def _split_attention(p: Dict, cfg: BertConfig, x: jax.Array, policy: DTypePolicy,
                     bias: Optional[jax.Array],
                     kv_prefix: Optional[Tuple[jax.Array, jax.Array]] = None,
                     return_kv: bool = False):
    """BERT self-attention where K/V may be extended by a cached prefix."""
    bsz, t, _ = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    q = linear(p["q"], x, policy).reshape(bsz, t, h, hd)
    k = linear(p["k"], x, policy).reshape(bsz, t, h, hd)
    v = linear(p["v"], x, policy).reshape(bsz, t, h, hd)
    if kv_prefix is not None:
        k = jnp.concatenate([kv_prefix[0], k], axis=1)
        v = jnp.concatenate([kv_prefix[1], v], axis=1)
    o = mha(q, k, v, bias=bias).reshape(bsz, t, cfg.hidden_size)
    o = linear(p["out"], o, policy)
    o = layernorm(p["out_ln"], o + x, cfg.layer_norm_eps)
    if return_kv:
        return o, (k, v)
    return o


def _cross_attention(p: Dict, cfg: BertConfig, x: jax.Array, image: jax.Array,
                     image_bias: Optional[jax.Array], policy: DTypePolicy) -> jax.Array:
    bsz, t, _ = x.shape
    s = image.shape[1]
    h, hd = cfg.num_heads, cfg.head_dim
    q = linear(p["q"], x, policy).reshape(bsz, t, h, hd)
    k = linear(p["k"], image, policy).reshape(bsz, s, h, hd)
    v = linear(p["v"], image, policy).reshape(bsz, s, h, hd)
    o = mha(q, k, v, bias=image_bias).reshape(bsz, t, cfg.hidden_size)
    o = linear(p["out"], o, policy)
    return layernorm(p["out_ln"], o + x, cfg.layer_norm_eps)


def _layer(lp: Dict, cfg: BertConfig, x: jax.Array, n_query: int,
           bias: Optional[jax.Array],
           image: Optional[jax.Array], image_bias: Optional[jax.Array],
           kv_prefix=None, return_kv: bool = False, policy: DTypePolicy = FP32):
    """One Q-Former layer. First ``n_query`` positions are query tokens:
    they get cross-attention (if present) and the query FFN; the remainder
    uses the text FFN (Qformer.py:402-474)."""
    res = _split_attention(lp["attn"], cfg, x, policy, bias, kv_prefix, return_kv)
    if return_kv:
        x, kv = res
    else:
        x, kv = res, None
    if n_query > 0:
        xq, xt = x[:, :n_query], x[:, n_query:]
        if "cross" in lp and image is not None:
            xq = _cross_attention(lp["cross"], cfg, xq, image, image_bias, policy)
        xq = bert_ffn(lp["ffn_query"], cfg, xq, policy)
        if xt.shape[1] > 0:
            xt = bert_ffn(lp["ffn"], cfg, xt, policy)
            x = jnp.concatenate([xq, xt], axis=1)
        else:
            x = xq
    else:
        x = bert_ffn(lp["ffn"], cfg, x, policy)
    return (x, kv) if return_kv else x


def _embed_text(p: Dict, cfg: BertConfig, input_ids: jax.Array,
                position_offset: int = 0) -> jax.Array:
    t = input_ids.shape[-1]
    x = embedding_lookup(p["word"], input_ids)
    return x + p["position"][position_offset:position_offset + t][None]


def _embed(p: Dict, cfg: BertConfig, query: Optional[jax.Array],
           input_ids: Optional[jax.Array]) -> jax.Array:
    """Queries ++ text, then shared LayerNorm (Qformer.py:78-107: the
    embedding LayerNorm runs over the concatenated sequence)."""
    parts = []
    if query is not None:
        parts.append(query)
    if input_ids is not None:
        parts.append(_embed_text(p, cfg, input_ids).astype(parts[0].dtype if parts else jnp.float32))
    x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    return layernorm(p["ln"], x, cfg.layer_norm_eps)


# ------------------------------------------------------------------ entry points
def qformer_image_grounded(params: Dict, cfg: QFormerConfig, image_embeds: jax.Array,
                           image_mask: Optional[jax.Array] = None,
                           use_cache: bool = False,
                           policy: DTypePolicy = FP32):
    """Query tokens attend the image (blip2_qformer.py:106-112, forward_image
    467-484). Returns hidden (B, nq, H) and, if use_cache, the per-layer query
    K/V for the LM pass."""
    b = image_embeds.shape[0]
    bert = cfg.bert
    query = jnp.broadcast_to(params["query_tokens"][None],
                             (b, cfg.num_query_tokens, bert.hidden_size))
    x = _embed(params["embeddings"], bert, query, None)
    image_bias = padding_mask_bias(image_mask) if image_mask is not None else None
    cache: List = []
    for lp in params["layers"]:
        x, kv = _layer(lp, bert, x, cfg.num_query_tokens, None, image_embeds,
                       image_bias, return_kv=True, policy=policy)
        cache.append(kv)
    return (x, cache) if use_cache else (x, None)


def qformer_text(params: Dict, cfg: QFormerConfig, input_ids: jax.Array,
                 attention_mask: jax.Array, policy: DTypePolicy = FP32) -> jax.Array:
    """Text-only BERT encoding (ITC text leg, blip2_qformer.py:125-129)."""
    bert = cfg.bert
    x = _embed(params["embeddings"], bert, None, input_ids)
    bias = padding_mask_bias(attention_mask)
    for lp in params["layers"]:
        x = _layer(lp, bert, x, 0, bias, None, None, policy=policy)
    return x


def qformer_multimodal(params: Dict, cfg: QFormerConfig, input_ids: jax.Array,
                       attention_mask: jax.Array, image_embeds: jax.Array,
                       image_mask: Optional[jax.Array] = None,
                       policy: DTypePolicy = FP32) -> jax.Array:
    """[queries; text] with bidirectional self-attention and image
    cross-attention on the query part (ITM pass, blip2_qformer.py:353-364).

    ``attention_mask``: (B, nq + T) — ones over queries ++ text mask.
    """
    b = input_ids.shape[0]
    bert = cfg.bert
    query = jnp.broadcast_to(params["query_tokens"][None],
                             (b, cfg.num_query_tokens, bert.hidden_size))
    x = _embed(params["embeddings"], bert, query, input_ids)
    bias = padding_mask_bias(attention_mask)
    image_bias = padding_mask_bias(image_mask) if image_mask is not None else None
    for lp in params["layers"]:
        x = _layer(lp, bert, x, cfg.num_query_tokens, bias, image_embeds,
                   image_bias, policy=policy)
    return x


def qformer_lm(params: Dict, cfg: QFormerConfig, input_ids: jax.Array,
               attention_mask: jax.Array, query_cache: List,
               policy: DTypePolicy = FP32) -> jax.Array:
    """Causal text decoding over the cached query prefix
    (blip2_qformer.py:383-391). ``attention_mask``: (B, nq+T).
    Returns logits (B, T, vocab)."""
    bert = cfg.bert
    nq = cfg.num_query_tokens
    t = input_ids.shape[1]
    x = _embed(params["embeddings"], bert, None, input_ids)
    # causal over text, all-ones prefix over cached queries
    # (get_extended_attention_mask, Qformer.py:755-790)
    qi = jnp.arange(t)[:, None]
    kj = jnp.arange(t)[None, :]
    causal = jnp.where(kj <= qi, 0.0, NEG_INF)
    prefix = jnp.zeros((t, nq))
    pos_bias = jnp.concatenate([prefix, causal], axis=-1)[None, None]  # (1,1,T,nq+T)
    bias = combine_bias(pos_bias, padding_mask_bias(attention_mask))
    for lp, kv in zip(params["layers"], query_cache):
        x = _layer(lp, bert, x, 0, bias, None, None, kv_prefix=kv, policy=policy)
    return qformer_lm_head(params, x, policy)


def qformer_lm_head(params: Dict, hidden: jax.Array,
                    policy: DTypePolicy = FP32) -> jax.Array:
    """BertLMPredictionHead: dense+gelu+LN then decoder tied to word
    embeddings + bias."""
    c = params["cls"]
    h = gelu_exact(linear(c["transform"], hidden, policy))
    h = layernorm(c["transform_ln"], h)
    word = params["embeddings"]["word"]
    logits = jnp.dot(policy.cast(h), policy.cast(word).T,
                     preferred_element_type=jnp.float32)
    return logits + c["decoder_bias"]


def lm_loss(logits: jax.Array, labels: jax.Array, label_smoothing: float = 0.1,
            ignore_index: int = -100) -> jax.Array:
    """Shifted CE with label smoothing, mean over valid tokens
    (Qformer.py:1060-1077 reduction='mean' + 0.1 smoothing)."""
    logits = logits[:, :-1].astype(jnp.float32)
    labels = labels[:, 1:]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    n_cls = logits.shape[-1]
    conf = 1.0 - label_smoothing
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    smooth = -logp.mean(axis=-1)
    per_tok = conf * nll + label_smoothing * smooth
    per_tok = jnp.where(valid, per_tok, 0.0)
    return per_tok.sum() / jnp.maximum(valid.sum(), 1)
