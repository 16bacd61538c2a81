"""LoRA finetuning driver — the logic behind the repo-root finetune.py.

Replaces the reference's HF-Trainer-based finetune.py:153-474 with one jitted
train step over the device mesh: AdamW + warmup-cosine, micro-batch grad
accumulation (batch_size/micro_batch_size, finetune.py:220-229), prompt-masked
labels, balanced report/instruct sampling (finetune.py:57-81), best/last
checkpoints, and optional adapter export in the reference's
adapter_model.bin format (finetune.py:121-150).
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import BestKeeper, load_checkpoint
from ..core.mesh import MeshSpec, make_mesh, shard_batch
from ..data.datasets import balanced_epoch_indices, split_report_instruct
from ..data.tokenization import (Prompter, WhitespaceTokenizer, pad_batch_right,
                                 pad_labels_right, tokenize_with_masked_prompt)
from ..models.llama import LlamaConfig, TINY_LLAMA, VICUNA_7B, llama_init, lora_init
from ..ops.layers import BF16, FP32
from ..parallel.partition import (batch_specs, llama_partition_specs,
                                  lora_partition_specs, make_sharding,
                                  shard_params)
from ..train.optim import linear_warmup_cosine, make_adamw
from ..train.steps import TrainState, make_lora_train_step


@dataclasses.dataclass
class FinetuneConfig:
    """Reference kwargs surface (finetune.py:153-188)."""

    base_model: str = ""
    lora_weights: Optional[str] = None
    data_path: str = ""
    output_dir: str = "./lora-cxr"
    batch_size: int = 128
    micro_batch_size: int = 2
    num_epochs: int = 10
    learning_rate: float = 3e-4
    cutoff_len: int = 1024
    val_set_size: int = 5
    lora_r: int = 8
    lora_alpha: float = 16
    lora_dropout: float = 0.05
    train_on_inputs: bool = False
    add_eos_token: bool = False
    resume_from_checkpoint: Optional[str] = None
    use_embs: bool = False
    use_instruct_data: bool = False
    emb_cache: Optional[str] = None
    eval_steps: int = 400                  # finetune.py:432-435
    mock: bool = False
    mesh_model: int = 1
    seed: int = 42
    max_steps: Optional[int] = None        # cap for smoke runs
    # int8 frozen base (QLoRA-style): the reference's
    # prepare_model_for_int8_training analog (finetune.py:309) — fits
    # Vicuna-7B LoRA training on ONE 16GB chip (6.9GB int8 base vs 13.5GB
    # bf16). Gradients reach only LoRA + img_proj; the dequant matmul
    # (ops/quant.py linear_q8) is differentiable w.r.t. activations.
    quantize_base: bool = False
    # route attention through the Pallas flash kernel + its FA2 custom VJP
    # (ops/flash_attention.py). Off by measurement, not necessity: XLA
    # attention+remat 349 vs flash 403 ms/step at micro 2 / cutoff 600
    # (docs/PERF.md; tools/bench_train.py --flash re-measures).
    flash: bool = False


def _load_records(path: str) -> List[Dict]:
    return json.loads(Path(path).read_text())


def _make_batcher(records: List[Dict], tokenizer, cfg: FinetuneConfig,
                  llama_cfg: LlamaConfig, emb_cache: Dict[str, np.ndarray]):
    """Tokenize once; yield micro-batches as device-ready dicts."""
    prompter = Prompter()
    toks = [tokenize_with_masked_prompt(tokenizer, prompter, r,
                                        cutoff_len=cfg.cutoff_len,
                                        train_on_inputs=cfg.train_on_inputs,
                                        add_eos_token=cfg.add_eos_token)
            for r in records]

    def batch_at(indices: List[int]) -> Dict[str, np.ndarray]:
        chosen = [toks[i] for i in indices]
        tokens, lengths = pad_batch_right([c["input_ids"] for c in chosen],
                                          tokenizer.pad_token_id,
                                          pad_to=cfg.cutoff_len)
        labels = pad_labels_right([c["labels"] for c in chosen], tokens.shape[1])
        batch = {"tokens": tokens, "labels": labels, "lengths": lengths}
        if cfg.use_embs:
            embs = []
            for i in indices:
                d = str(records[i].get("dicom", ""))
                if d in emb_cache:
                    embs.append(np.asarray(emb_cache[d], np.float32))
                else:  # deterministic placeholder (mock / missing
                    # cache); crc32 because str hash() is per-process random
                    import zlib
                    r = np.random.default_rng(zlib.crc32(d.encode()))
                    embs.append(r.normal(size=(llama_cfg.num_img_tokens,
                                                llama_cfg.qformer_dim))
                                .astype(np.float32))
            batch["img_embs"] = np.stack(embs)
        return batch

    return batch_at


def train(cfg: FinetuneConfig,
          log_fn: Callable[[Dict], None] = lambda m: print(json.dumps(m))):
    rng = np.random.default_rng(cfg.seed)

    # ---- model
    if cfg.mock:
        llama_cfg = dataclasses.replace(TINY_LLAMA, num_img_tokens=32)
        tokenizer = WhitespaceTokenizer(vocab_size=llama_cfg.vocab_size,
                                        num_img_tokens=32,
                                        img_token_id=llama_cfg.img_token_id)
        base = llama_init(jax.random.PRNGKey(0), llama_cfg)
        policy = FP32
        if cfg.quantize_base:
            from ..ops.quant import quantize_llama
            base = quantize_llama(base)
            policy = BF16   # dequant matmuls compute bf16, like the real run
    else:
        from ..data.tokenization import load_vicuna_tokenizer
        from .pipeline import RaDialogPipeline, _load_hf_state_dict
        from ..utils.hf_weights import convert_llama
        llama_cfg = VICUNA_7B
        tokenizer = load_vicuna_tokenizer(cfg.base_model)
        sd = _load_hf_state_dict(cfg.base_model)
        converted = convert_llama(sd, llama_cfg.num_layers)
        if cfg.quantize_base:
            # host-side quantize + leaf-streamed device_put: the bf16 copy
            # never lives on the chip (13.5GB would OOM a 16GB v5e)
            from ..ops.quant import quantize_llama_np
            base = quantize_llama_np(converted)
        else:
            base = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16), converted)
        policy = BF16

    lora = lora_init(jax.random.PRNGKey(cfg.seed), llama_cfg, rank=cfg.lora_r,
                     alpha=cfg.lora_alpha)
    if cfg.lora_weights:
        from ..utils.hf_weights import convert_peft_lora
        from .pipeline import _torch_load
        lora = jax.tree_util.tree_map(
            jnp.asarray, convert_peft_lora(_torch_load(cfg.lora_weights),
                                           llama_cfg.num_layers,
                                           rank=cfg.lora_r, alpha=cfg.lora_alpha))

    # ---- mesh + shardings
    mesh = make_mesh(MeshSpec(model=cfg.mesh_model))
    data_size = mesh.shape["data"]
    if cfg.micro_batch_size % data_size != 0:
        new_mb = ((cfg.micro_batch_size + data_size - 1) // data_size) * data_size
        log_fn({"note": f"micro_batch_size {cfg.micro_batch_size} -> {new_mb} "
                        f"(must divide data axis {data_size})"})
        cfg = dataclasses.replace(cfg, micro_batch_size=new_mb)
    with mesh:
        base = shard_params(mesh, base, llama_partition_specs(base))
        lora = shard_params(mesh, lora, lora_partition_specs(lora))

        # ---- data
        records = _load_records(cfg.data_path)
        val_records = records[:cfg.val_set_size]
        train_records = records[cfg.val_set_size:]
        emb_cache: Dict[str, np.ndarray] = {}
        if cfg.emb_cache and Path(cfg.emb_cache).exists():
            emb_cache = dict(np.load(cfg.emb_cache))
        batch_at = _make_batcher(train_records, tokenizer, cfg, llama_cfg, emb_cache)
        val_batch_at = _make_batcher(val_records, tokenizer, cfg, llama_cfg, emb_cache)

        accum = max(1, cfg.batch_size // cfg.micro_batch_size)
        steps_per_epoch = max(1, len(train_records) // cfg.batch_size) * accum
        total = steps_per_epoch * cfg.num_epochs
        if cfg.max_steps:
            total = min(total, cfg.max_steps)

        tx = make_adamw(linear_warmup_cosine(cfg.learning_rate,
                                             cfg.learning_rate / 10,
                                             warmup_steps=100, total_steps=total),
                        weight_decay=0.0, grad_clip=1.0, accum_steps=accum)
        state = TrainState.create(lora, tx)
        step_fn = jax.jit(make_lora_train_step(tx, llama_cfg, policy=policy,
                                               flash=cfg.flash),
                          donate_argnums=(0,))
        from ..train.steps import lora_loss_fn
        eval_fn = jax.jit(lambda p, b: lora_loss_fn(p, base, llama_cfg, b,
                                                    policy, flash=cfg.flash))

        if cfg.resume_from_checkpoint:
            tree, meta = load_checkpoint(Path(cfg.resume_from_checkpoint).parent,
                                         Path(cfg.resume_from_checkpoint).name,
                                         target=state)
            state = TrainState(*tree) if not isinstance(tree, TrainState) else tree
            log_fn({"resumed_step": int(meta.get("step", 0))})

        keeper = BestKeeper(cfg.output_dir, mode="min")
        rep_idxs, inst_idxs = split_report_instruct(train_records)

        # ---- loop
        step = 0
        t0 = time.time()
        for epoch in range(cfg.num_epochs):
            if cfg.use_instruct_data and rep_idxs and inst_idxs:
                order = balanced_epoch_indices(rep_idxs, inst_idxs, rng)
            else:
                order = rng.permutation(len(train_records)).tolist()
            for i0 in range(0, len(order) - cfg.micro_batch_size + 1,
                            cfg.micro_batch_size):
                batch = shard_batch(mesh, batch_at(order[i0:i0 + cfg.micro_batch_size]))
                state, metrics = step_fn(state, base, batch)
                step += 1
                if step % 50 == 0 or step == 1:
                    log_fn({"epoch": epoch, "step": step,
                            "loss": float(metrics["loss"]),
                            "grad_norm": float(metrics["grad_norm"]),
                            "sec": round(time.time() - t0, 1)})
                if step % cfg.eval_steps == 0 or step == total:
                    val_losses = []
                    for j0 in range(0, len(val_records), cfg.micro_batch_size):
                        idxs = list(range(j0, min(j0 + cfg.micro_batch_size,
                                                  len(val_records))))
                        while len(idxs) % cfg.micro_batch_size:  # pad to shard
                            idxs.append(idxs[-1])
                        vb = shard_batch(mesh, val_batch_at(idxs))
                        val_losses.append(float(eval_fn(state.params, vb)))
                    vl = float(np.mean(val_losses)) if val_losses else float("nan")
                    improved = keeper.update(step, vl, state.params)
                    log_fn({"step": step, "val_loss": vl, "best": improved})
                if cfg.max_steps and step >= cfg.max_steps:
                    break
            if cfg.max_steps and step >= cfg.max_steps:
                break

        keeper.update(step, float("inf") if keeper.best is None else keeper.best,
                      state.params)  # ensure a 'last' exists
        return state


def export_adapter(lora_params, out_path: str, targets=("q", "v")) -> None:
    """Write the reference's adapter_model.bin format (finetune.py:121-150):
    lora_A/lora_B per layer + img_proj_layer keys, torch-loadable."""
    import torch
    sd = {}
    layers = lora_params["layers"]
    num_layers = np.asarray(layers[next(iter(layers))]["a"]).shape[0]
    for tname, ab in layers.items():
        proj = tname.lstrip("w") + "_proj"  # wq -> q_proj
        a = np.asarray(ab["a"])
        b = np.asarray(ab["b"])
        for i in range(num_layers):
            pre = f"base_model.model.model.layers.{i}.self_attn.{proj}"
            sd[f"{pre}.lora_A.weight"] = torch.tensor(a[i].T.copy())
            sd[f"{pre}.lora_B.weight"] = torch.tensor(b[i].T.copy())
    if "img_proj" in lora_params:
        sd["base_model.model.model.img_proj_layer.weight"] = torch.tensor(
            np.asarray(lora_params["img_proj"]["w"]).T.copy())
        sd["base_model.model.model.img_proj_layer.bias"] = torch.tensor(
            np.asarray(lora_params["img_proj"]["b"]).copy())
    torch.save(sd, out_path)
