"""Torch/HF checkpoint -> JAX param-tree converters.

The reference loads five torch checkpoint families (SURVEY §2.1): HF
LlamaForCausalLM (vicuna-7b), PEFT LoRA adapters (+ spliced img_proj,
finetune.py:86-150), HF BERT (CheXbert, bert_labeler.py), LAVIS Blip2Qformer
.pth, and BioViL-T / Lightning classifier .ckpt. Each converter maps a torch
state dict (tensor or ndarray values) into this package's param trees:

  conventions: torch Linear (out,in) -> {"w": (in,out)} transpose;
               torch Conv2d OIHW -> HWIO; layer params stacked over depth for
               the LLaMA scan; BatchNorm running stats go to the state tree.

Works without torch installed (accepts numpy); tensors are converted via
``.detach().cpu().numpy()`` when present.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def t2n(x: Any) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _lin(sd: Dict, name: str, bias: bool = True) -> Dict:
    p = {"w": t2n(sd[f"{name}.weight"]).T}
    if bias and f"{name}.bias" in sd:
        p["b"] = t2n(sd[f"{name}.bias"])
    return p


def _conv(sd: Dict, name: str) -> Dict:
    p = {"w": t2n(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}  # OIHW->HWIO
    if f"{name}.bias" in sd:
        p["b"] = t2n(sd[f"{name}.bias"])
    return p


def _ln(sd: Dict, name: str) -> Dict:
    return {"scale": t2n(sd[f"{name}.weight"]), "bias": t2n(sd[f"{name}.bias"])}


def _bn(sd: Dict, name: str) -> Tuple[Dict, Dict]:
    params = {"scale": t2n(sd[f"{name}.weight"]), "bias": t2n(sd[f"{name}.bias"])}
    state = {"mean": t2n(sd[f"{name}.running_mean"]),
             "var": t2n(sd[f"{name}.running_var"]),
             "count": t2n(sd.get(f"{name}.num_batches_tracked", 0)).astype(np.float32)}
    return params, state


# ---------------------------------------------------------------------- llama
def convert_llama(sd: Dict, num_layers: int) -> Dict:
    """HF LlamaForCausalLM state dict -> llama_init tree (stacked layers)."""
    def stack(fmt: str, transpose: bool = True):
        ws = [t2n(sd[fmt.format(i=i)]) for i in range(num_layers)]
        ws = [w.T if transpose else w for w in ws]
        return np.stack(ws)

    layers = {
        "wq": {"w": stack("model.layers.{i}.self_attn.q_proj.weight")},
        "wk": {"w": stack("model.layers.{i}.self_attn.k_proj.weight")},
        "wv": {"w": stack("model.layers.{i}.self_attn.v_proj.weight")},
        "wo": {"w": stack("model.layers.{i}.self_attn.o_proj.weight")},
        "gate": {"w": stack("model.layers.{i}.mlp.gate_proj.weight")},
        "up": {"w": stack("model.layers.{i}.mlp.up_proj.weight")},
        "down": {"w": stack("model.layers.{i}.mlp.down_proj.weight")},
        "input_ln": stack("model.layers.{i}.input_layernorm.weight", transpose=False),
        "post_ln": stack("model.layers.{i}.post_attention_layernorm.weight", transpose=False),
    }
    params = {
        "embed": t2n(sd["model.embed_tokens.weight"]),
        "layers": layers,
        "final_ln": t2n(sd["model.norm.weight"]),
        "lm_head": {"w": t2n(sd["lm_head.weight"]).T},
    }
    # the reference attaches img_proj_layer onto the base model
    # (finetune.py:254, test.py:295) — carry it if present
    if "model.img_proj_layer.weight" in sd:
        params["img_proj"] = _lin(sd, "model.img_proj_layer")
    return params


# matches both the reference-era format (lora_A.weight, finetune.py:86-150)
# and modern PEFT state dicts that include the adapter name (lora_A.default.weight)
_PEFT_RE = re.compile(
    r"base_model\.model\.model\.layers\.(\d+)\.self_attn\.(\w+)_proj\."
    r"lora_(A|B)(?:\.\w+)?\.weight")


def convert_peft_lora(sd: Dict, num_layers: int, rank: int | None = None,
                      alpha: float | None = None,
                      adapter_config: Dict | None = None) -> Dict:
    """PEFT adapter_model.bin -> lora_init tree.

    Handles the reference's save format (finetune.py:86-150): lora_A/lora_B
    per target projection plus the img_proj_layer spliced into the adapter
    dict under base_model.model.model.img_proj_layer.*.

    rank/alpha resolve in order: explicit args > adapter_config
    ({"r": ..., "lora_alpha": ...}, the adapter_config.json next to the
    weights) > reference defaults r=8, alpha=16 (finetune.py:311-318). The
    rank is always cross-checked against the loaded lora_A shapes — a
    mismatched scale (alpha/r) silently degrades generations.
    """
    if adapter_config:
        rank = rank if rank is not None else adapter_config.get("r")
        alpha = alpha if alpha is not None else adapter_config.get("lora_alpha")
    per_target: Dict[str, Dict[str, List]] = {}
    for key, val in sd.items():
        m = _PEFT_RE.match(key)
        if not m:
            continue
        i, target, ab = int(m.group(1)), "w" + m.group(2), m.group(3)
        slot = per_target.setdefault(target, {"a": [None] * num_layers,
                                              "b": [None] * num_layers})
        slot["a" if ab == "A" else "b"][i] = t2n(val).T  # (in,r) / (r,out)
    layers = {}
    for target, ab in sorted(per_target.items()):
        if any(x is None for x in ab["a"] + ab["b"]):
            raise ValueError(f"missing LoRA layers for target {target}")
        layers[target] = {"a": np.stack(ab["a"]), "b": np.stack(ab["b"])}

    loaded_ranks = {t: ab["a"].shape[-1] for t, ab in layers.items()}
    if layers:
        if len(set(loaded_ranks.values())) != 1:
            raise ValueError(f"inconsistent LoRA ranks across targets: {loaded_ranks}")
        loaded_rank = next(iter(loaded_ranks.values()))
        if rank is not None and rank != loaded_rank:
            raise ValueError(
                f"adapter rank mismatch: config says r={rank} but lora_A "
                f"shapes give r={loaded_ranks}")
        rank = loaded_rank
    rank = rank if rank is not None else 8
    alpha = alpha if alpha is not None else 16.0

    lora: Dict = {"layers": layers, "scale": np.asarray(alpha / rank, np.float32)}
    for prefix in ("base_model.model.model.img_proj_layer",
                   "base_model.model.img_proj_layer"):
        if f"{prefix}.weight" in sd:
            lora["img_proj"] = {"w": t2n(sd[f"{prefix}.weight"]).T,
                                "b": t2n(sd[f"{prefix}.bias"])}
            break
    return lora


# ----------------------------------------------------------------------- bert
def convert_bert(sd: Dict, num_layers: int, prefix: str = "bert.",
                 with_pooler: bool = False) -> Dict:
    """HF BertModel state dict -> bert_init tree."""
    p = prefix
    emb = {
        "word": t2n(sd[f"{p}embeddings.word_embeddings.weight"]),
        "position": t2n(sd[f"{p}embeddings.position_embeddings.weight"]),
        "ln": _ln(sd, f"{p}embeddings.LayerNorm"),
    }
    if f"{p}embeddings.token_type_embeddings.weight" in sd:
        emb["token_type"] = t2n(sd[f"{p}embeddings.token_type_embeddings.weight"])
    layers = []
    for i in range(num_layers):
        q = f"{p}encoder.layer.{i}"
        layers.append({
            "attn": {
                "q": _lin(sd, f"{q}.attention.self.query"),
                "k": _lin(sd, f"{q}.attention.self.key"),
                "v": _lin(sd, f"{q}.attention.self.value"),
                "out": _lin(sd, f"{q}.attention.output.dense"),
                "out_ln": _ln(sd, f"{q}.attention.output.LayerNorm"),
            },
            "ffn": {
                "inter": _lin(sd, f"{q}.intermediate.dense"),
                "out": _lin(sd, f"{q}.output.dense"),
                "out_ln": _ln(sd, f"{q}.output.LayerNorm"),
            },
        })
    out = {"embeddings": emb, "encoder": {"layers": layers}}
    if with_pooler and f"{p}pooler.dense.weight" in sd:
        out["pooler"] = _lin(sd, f"{p}pooler.dense")
    return out


def convert_chexbert(sd: Dict, num_layers: int = 12) -> Dict:
    """chexbert bert_labeler state dict (bert.* + linear_heads.{i}.*)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}  # DataParallel
    heads = [_lin(sd, f"linear_heads.{i}") for i in range(14)]
    return {"bert": convert_bert(sd, num_layers, prefix="bert."),
            "heads": heads}


# -------------------------------------------------------------------- qformer
def convert_qformer(sd: Dict, num_layers: int = 12,
                    cross_attention_freq: int = 2,
                    prefix: str = "Qformer.") -> Dict:
    """LAVIS Qformer (BertLMHeadModel) weights -> qformer_init tree."""
    p = prefix
    layers = []
    for i in range(num_layers):
        q = f"{p}bert.encoder.layer.{i}"
        layer = {
            "attn": {
                "q": _lin(sd, f"{q}.attention.self.query"),
                "k": _lin(sd, f"{q}.attention.self.key"),
                "v": _lin(sd, f"{q}.attention.self.value"),
                "out": _lin(sd, f"{q}.attention.output.dense"),
                "out_ln": _ln(sd, f"{q}.attention.output.LayerNorm"),
            },
            "ffn": {
                "inter": _lin(sd, f"{q}.intermediate.dense"),
                "out": _lin(sd, f"{q}.output.dense"),
                "out_ln": _ln(sd, f"{q}.output.LayerNorm"),
            },
            "ffn_query": {
                "inter": _lin(sd, f"{q}.intermediate_query.dense"),
                "out": _lin(sd, f"{q}.output_query.dense"),
                "out_ln": _ln(sd, f"{q}.output_query.LayerNorm"),
            },
        }
        if i % cross_attention_freq == 0:
            layer["cross"] = {
                "q": _lin(sd, f"{q}.crossattention.self.query"),
                "k": _lin(sd, f"{q}.crossattention.self.key"),
                "v": _lin(sd, f"{q}.crossattention.self.value"),
                "out": _lin(sd, f"{q}.crossattention.output.dense"),
                "out_ln": _ln(sd, f"{q}.crossattention.output.LayerNorm"),
            }
        layers.append(layer)
    return {
        "embeddings": {
            "word": t2n(sd[f"{p}bert.embeddings.word_embeddings.weight"]),
            "position": t2n(sd[f"{p}bert.embeddings.position_embeddings.weight"]),
            "ln": _ln(sd, f"{p}bert.embeddings.LayerNorm"),
        },
        "layers": layers,
        "query_tokens": t2n(sd["query_tokens"]).reshape(-1, t2n(sd["query_tokens"]).shape[-1]),
        "cls": {
            "transform": _lin(sd, f"{p}cls.predictions.transform.dense"),
            "transform_ln": _ln(sd, f"{p}cls.predictions.transform.LayerNorm"),
            "decoder_bias": t2n(sd[f"{p}cls.predictions.bias"]),
        },
    }


def convert_blip2(sd: Dict, num_layers: int = 12,
                  with_vision: bool = True) -> Tuple[Dict, Dict]:
    """Full Blip2Qformer checkpoint['model'] -> (blip2 params, state)."""
    params = {
        "qformer": convert_qformer(sd, num_layers),
        "ln_vision": _ln(sd, "ln_vision"),
        "vision_proj": _lin(sd, "vision_proj"),
        "text_proj": _lin(sd, "text_proj"),
        "itm_head": _lin(sd, "itm_head"),
        "temp": t2n(sd["temp"]),
    }
    state: Dict = {}
    if with_vision and "visual_encoder.encoder.encoder.conv1.weight" in sd:
        params["visual"], state["visual"] = convert_biovil_t(
            sd, prefix="visual_encoder.")
    return params, state


# -------------------------------------------------------------------- biovil-t
def _convert_resnet(sd: Dict, prefix: str,
                    layers: Tuple[int, ...] = (3, 4, 6, 3)) -> Tuple[Dict, Dict]:
    p: Dict = {"conv1": _conv(sd, f"{prefix}conv1")}
    s: Dict = {}
    p["bn1"], s["bn1"] = _bn(sd, f"{prefix}bn1")
    for stage, n_blocks in enumerate(layers, start=1):
        bp_list, bs_list = [], []
        for b in range(n_blocks):
            q = f"{prefix}layer{stage}.{b}"
            bp: Dict = {}
            bs: Dict = {}
            for c in (1, 2, 3):
                if f"{q}.conv{c}.weight" not in sd:
                    break
                bp[f"conv{c}"] = _conv(sd, f"{q}.conv{c}")
                bp[f"bn{c}"], bs[f"bn{c}"] = _bn(sd, f"{q}.bn{c}")
            if f"{q}.downsample.0.weight" in sd:
                bp["down_conv"] = _conv(sd, f"{q}.downsample.0")
                bp["down_bn"], bs["down_bn"] = _bn(sd, f"{q}.downsample.1")
            bp_list.append(bp)
            bs_list.append(bs)
        p[f"layer{stage}"] = bp_list
        s[f"layer{stage}"] = bs_list
    return p, s


def _convert_vit_pooler(sd: Dict, prefix: str, num_blocks: int = 3,
                        grid: Tuple[int, int] = (14, 14)) -> Dict:
    from ..models.vit_pooler import sine_position_embedding
    blocks = []
    for i in range(num_blocks):
        q = f"{prefix}blocks.{i}"
        blocks.append({
            "norm1": _ln(sd, f"{q}.norm1"),
            "q": _lin(sd, f"{q}.attn.proj_q"),
            "k": _lin(sd, f"{q}.attn.proj_k"),
            "v": _lin(sd, f"{q}.attn.proj_v"),
            "proj": _lin(sd, f"{q}.attn.proj"),
            "norm2": _ln(sd, f"{q}.norm2"),
            "fc1": _lin(sd, f"{q}.mlp.fc1"),
            "fc2": _lin(sd, f"{q}.mlp.fc2"),
        })
    type_embed = t2n(sd[f"{prefix}type_embed"])  # (2,1,C)
    dim = type_embed.shape[-1]
    return {
        "blocks": blocks,
        "norm_post": _ln(sd, f"{prefix}norm_post"),
        "type_embed": type_embed.reshape(2, dim),
        "_pos": np.asarray(sine_position_embedding(grid, dim // 2)),
    }


def convert_biovil_t(sd: Dict, prefix: str = "",
                     layers: Tuple[int, ...] = (3, 4, 6, 3)) -> Tuple[Dict, Dict]:
    """BioViL-T ImageModel state dict -> biovil_t_init (params, state).

    prefix '' for a bare ImageModel checkpoint; 'visual_encoder.' inside a
    Blip2 checkpoint; 'model.biovil_encoder.' inside the Lightning classifier.
    """
    p = prefix
    params: Dict = {}
    state: Dict = {}
    params["resnet"], state["resnet"] = _convert_resnet(sd, f"{p}encoder.encoder.", layers)
    params["backbone_to_vit"] = _conv(sd, f"{p}encoder.backbone_to_vit")
    params["vit_pooler"] = _convert_vit_pooler(sd, f"{p}encoder.vit_pooler.")
    params["missing_previous_emb"] = t2n(sd[f"{p}encoder.missing_previous_emb"]).reshape(-1)
    params["proj1"] = _conv(sd, f"{p}projector.model.0")
    params["proj_bn"], state["proj_bn"] = _bn(sd, f"{p}projector.model.1")
    params["proj2"] = _conv(sd, f"{p}projector.model.3")
    return params, state


def convert_chexpert_classifier(sd: Dict) -> Tuple[Dict, Dict]:
    """Lightning LitIGClassifier checkpoint['state_dict'] -> classifier tree
    (chexpert_train.py: self.model = ChexpertClassifier; attrs
    biovil_encoder/fc1/fc2)."""
    params: Dict = {}
    params["biovil"], biovil_state = convert_biovil_t(sd, prefix="model.biovil_encoder.")
    params["fc1"] = _lin(sd, "model.fc1")
    params["fc2"] = _lin(sd, "model.fc2")
    return params, {"biovil": biovil_state}
