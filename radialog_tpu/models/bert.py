"""Standard BERT encoder (bert-base class models), functional JAX.

Foundation for the CheXbert labeler (chexbert/src/models/bert_labeler.py:5-51)
and the text-only path of the Q-Former. The Q-Former's cross-attention /
query-FFN variant lives in models/qformer.py and reuses these primitives.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import mha, padding_mask_bias
from ..ops.layers import (DTypePolicy, FP32, dropout, embedding_lookup,
                          gelu_exact, layernorm, layernorm_init, linear,
                          linear_init, trunc_normal)


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    pad_token_id: int = 0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


TINY_BERT = BertConfig(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                       intermediate_size=64, max_position=64)


def bert_embeddings_init(key, cfg: BertConfig, with_token_type: bool = True) -> Dict:
    ks = jax.random.split(key, 3)
    p = {
        "word": trunc_normal(ks[0], (cfg.vocab_size, cfg.hidden_size)),
        "position": trunc_normal(ks[1], (cfg.max_position, cfg.hidden_size)),
        "ln": layernorm_init(cfg.hidden_size),
    }
    if with_token_type:
        p["token_type"] = trunc_normal(ks[2], (cfg.type_vocab_size, cfg.hidden_size))
    return p


def bert_embeddings(p: Dict, cfg: BertConfig, input_ids: jax.Array,
                    token_type_ids: Optional[jax.Array] = None,
                    position_offset: int = 0,
                    train: bool = False, key=None) -> jax.Array:
    t = input_ids.shape[-1]
    x = embedding_lookup(p["word"], input_ids)
    pos = jnp.arange(position_offset, position_offset + t)
    x = x + p["position"][pos][None]
    if "token_type" in p:
        tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
        x = x + embedding_lookup(p["token_type"], tt)
    x = layernorm(p["ln"], x, cfg.layer_norm_eps)
    return dropout(key, x, cfg.hidden_dropout, train)


def bert_self_attention_init(key, cfg: BertConfig, kv_width: Optional[int] = None) -> Dict:
    kv_width = kv_width or cfg.hidden_size
    ks = jax.random.split(key, 4)
    return {
        "q": linear_init(ks[0], cfg.hidden_size, cfg.hidden_size),
        "k": linear_init(ks[1], kv_width, cfg.hidden_size),
        "v": linear_init(ks[2], kv_width, cfg.hidden_size),
        "out": linear_init(ks[3], cfg.hidden_size, cfg.hidden_size),
        "out_ln": layernorm_init(cfg.hidden_size),
    }


def bert_self_attention(p: Dict, cfg: BertConfig, x: jax.Array,
                        kv: Optional[jax.Array] = None,
                        bias: Optional[jax.Array] = None,
                        policy: DTypePolicy = FP32,
                        train: bool = False, key=None) -> jax.Array:
    """Post-norm BERT attention block: attn -> dense -> dropout -> LN(res+x)."""
    b, t, _ = x.shape
    src = kv if kv is not None else x
    s = src.shape[1]
    h, hd = cfg.num_heads, cfg.head_dim
    q = linear(p["q"], x, policy).reshape(b, t, h, hd)
    k = linear(p["k"], src, policy).reshape(b, s, h, hd)
    v = linear(p["v"], src, policy).reshape(b, s, h, hd)
    o = mha(q, k, v, bias=bias).reshape(b, t, cfg.hidden_size)
    o = linear(p["out"], o, policy)
    o = dropout(key, o, cfg.hidden_dropout, train)
    return layernorm(p["out_ln"], o + x, cfg.layer_norm_eps)


def bert_ffn_init(key, cfg: BertConfig) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "inter": linear_init(k1, cfg.hidden_size, cfg.intermediate_size),
        "out": linear_init(k2, cfg.intermediate_size, cfg.hidden_size),
        "out_ln": layernorm_init(cfg.hidden_size),
    }


def bert_ffn(p: Dict, cfg: BertConfig, x: jax.Array, policy: DTypePolicy = FP32,
             train: bool = False, key=None) -> jax.Array:
    h = gelu_exact(linear(p["inter"], x, policy))
    h = linear(p["out"], h, policy)
    h = dropout(key, h, cfg.hidden_dropout, train)
    return layernorm(p["out_ln"], h + x, cfg.layer_norm_eps)


def bert_encoder_init(key, cfg: BertConfig) -> Dict:
    layers = []
    for i in range(cfg.num_layers):
        ka, kf = jax.random.split(jax.random.fold_in(key, i))
        layers.append({"attn": bert_self_attention_init(ka, cfg),
                       "ffn": bert_ffn_init(kf, cfg)})
    return {"layers": layers}


def bert_init(key, cfg: BertConfig, with_pooler: bool = True) -> Dict:
    ke, kl, kp = jax.random.split(key, 3)
    p = {"embeddings": bert_embeddings_init(ke, cfg),
         "encoder": bert_encoder_init(kl, cfg)}
    if with_pooler:
        p["pooler"] = linear_init(kp, cfg.hidden_size, cfg.hidden_size)
    return p


def bert_apply(p: Dict, cfg: BertConfig, input_ids: jax.Array,
               attention_mask: Optional[jax.Array] = None,
               token_type_ids: Optional[jax.Array] = None,
               policy: DTypePolicy = FP32, train: bool = False,
               key=None) -> jax.Array:
    """Returns last hidden state (B, T, H)."""
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)
    bias = padding_mask_bias(attention_mask)
    kk = (lambda i, tag: jax.random.fold_in(key, i * 4 + tag)) if key is not None else (lambda i, tag: None)
    x = bert_embeddings(p["embeddings"], cfg, input_ids, token_type_ids,
                        train=train, key=kk(0, 0))
    for i, lp in enumerate(p["encoder"]["layers"]):
        x = bert_self_attention(lp["attn"], cfg, x, bias=bias, policy=policy,
                                train=train, key=kk(i, 1))
        x = bert_ffn(lp["ffn"], cfg, x, policy=policy, train=train, key=kk(i, 2))
    return x
