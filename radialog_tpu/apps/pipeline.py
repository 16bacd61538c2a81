"""The assembled RaDialog pipeline: models + tokenizer + decode engine.

This is the runtime object behind the CLI apps (test.py / demo.py), replacing
the reference's ad-hoc module-level model loading (test.py:288-304,
demo.py:143-243). Components load from real checkpoints when paths are given
(via utils/hf_weights converters) or from seeded tiny configs in mock mode —
the mock path keeps every CLI drivable end-to-end in CI containers without
the 7B weights.

Image embeddings are passed in-memory through the forward signature
(replacing the reference's pickle-at-init + current_chat_img.pt disk handoffs,
modeling_llama_imgemb.py:454-462, demo.py:273 — SURVEY §7 quirk 4), with an
optional npz cache for LoRA-training throughput.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tokenization import (WhitespaceTokenizer, load_vicuna_tokenizer,
                                 pad_batch_right)
from ..decode.engine import (DecodeParams, default_cache_len,
                             generate_fused_jit, generate_shared_jit)
from ..models.bert import BertConfig
from ..models.biovil_t import biovil_t_apply, biovil_t_init, patch_tokens_for_qformer
from ..models.blip2 import Blip2Config, blip2_forward_image
from ..models.chexbert import chexbert_apply, chexbert_init, logits_to_labels
from ..models.chexpert import (CHEXPERT_CLASSES, chexpert_classifier_apply,
                               chexpert_classifier_init, predicted_findings)
from ..models.llama import LlamaConfig, TINY_LLAMA, VICUNA_7B, llama_init, lora_init
from ..models.qformer import QFormerConfig, TINY_QFORMER, qformer_init
from ..ops.layers import BF16, DTypePolicy, FP32, layernorm, layernorm_init

# Minimum common-prefix length (tokens) worth the extra prefix-prefill
# dispatch; below this the saved per-lane KV reads are noise. The RaDialog
# report template shares ~48 tokens (system prompt + "USER: Image
# information: ", data/prompts.py) so real batches clear this easily.
SHARED_PREFIX_MIN = 16


@dataclasses.dataclass
class PipelineConfig:
    vicuna_path: Optional[str] = None        # HF dir with tokenizer + weights
    lora_path: Optional[str] = None          # adapter_model.bin
    blip2_checkpoint: Optional[str] = None   # stage-1 .pth
    classifier_checkpoint: Optional[str] = None  # Lightning .ckpt
    chexbert_checkpoint: Optional[str] = None
    bert_tokenizer_path: Optional[str] = None
    emb_cache: Optional[str] = None          # npz: dicom -> (32,768)
    mock: bool = False                       # tiny seeded models, no weights
    bf16: bool = True
    quantize: bool = False                   # int8 W8A8 serving (ops/quant.py)
    kv_int8: Optional[bool] = None           # int8 token-flat KV cache + MXU
    # flash-decode (ops/flash_decode.py). None = DEFAULT ON whenever
    # quantize=True: the measured quality budget (teacher-forced per-step
    # logit error vs the bf16 cache, tools/measure_kv_logit_err.py) is
    # 0.048 of the logit std — statistically identical to the accepted
    # W8A8 weight default itself (0.049, tools/measure_quant.py) and ~5x
    # the bf16 rounding floor (0.010), i.e. the int8 cache adds no more
    # error than the weight quantization everyone serves with. (The
    # round-1 "diverges within ~6 steps" number was free-running greedy on
    # RANDOM weights — near-uniform logits flip argmax on ANY rounding;
    # even W8A8 weights only 'agree' ~15% there. Meaningless metric, see
    # docs/PERF.md.) The halved cache also moves the batch OOM wall out:
    # int8+shared-prefix serves batch 40+ where bf16 stops at 38
    # (docs/PERF.md). Explicit False keeps the bf16 cache.
    weight_bits: int = 8                     # 4 = W4A8 nibble-packed layers
    # (ops/q4_matmul.py). EXPLICIT OPT-IN capacity/speed mode (unlike
    # kv_int8 above, which defaults on with quantize):
    # ~25% faster weight sweep + 3.4GB HBM freed at 7B, but 15-level
    # group-wise weights are NOT the near-lossless default — use only where
    # the quality budget has been validated on real weights.
    shared_prefix: bool = True               # prefill the batch's common
    # token prefix ONCE (decode/engine.py generate_shared_prefix) on the
    # quantized greedy path (both KV dtypes). Token-EXACT vs plain generate
    # on the concatenated prompts (tests/test_shared_prefix.py) and strictly less
    # HBM traffic — the RaDialog report prompts share the system prompt +
    # "USER: Image information: " boilerplate (~48 tokens), read once per
    # decode step instead of once per lane. Auto-disabled when the batch's
    # common prefix is shorter than SHARED_PREFIX_MIN tokens.
    max_new_tokens: int = 300                # test.py:344
    decode_unroll: Optional[int] = None      # tokens decoded per while_loop
    # trip (DecodeParams.unroll — token-identical to 1, amortizes the
    # ~0.9 ms/iteration fixed loop cost of this runtime). None = 3 on the
    # quantized serving path (round-5 re-sweeps: unroll 2 -> 3 measured
    # 8.39 -> 8.47 at the gl=4/bs=64 kernel and 3 stays the peak at the
    # shipped gl=8 kernel, 8.618 vs 8.603 at unroll 4 — the faster kernel
    # shifted the loop-overhead balance; docs/PERF.md "Decode-loop
    # unroll" + "Lane grouping"), 1 elsewhere (CPU/mock paths keep the
    # smaller loop body -> faster test compiles).
    seed: int = 42

    def use_kv_int8(self) -> bool:
        if self.kv_int8:
            if not self.quantize:
                raise ValueError(
                    "kv_int8=True requires quantize=True: the int8 KV cache "
                    "runs on the unrolled quantize_llama_host serving params")
            return True
        if self.kv_int8 is None:
            return self.quantize    # serving default (see the field comment)
        return False

    def __post_init__(self):
        if self.weight_bits != 8 and not self.quantize:
            raise ValueError(
                "weight_bits=4 requires quantize=True (the W4A8 path runs "
                "on the unrolled quantize_llama_host serving params)")


class RaDialogPipeline:
    """Bundles the five models and a generate() over the decode engine."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.policy: DTypePolicy = BF16 if cfg.bf16 and not cfg.mock else FP32
        key = jax.random.PRNGKey(cfg.seed)
        kl, kq, kv, kc, kb = jax.random.split(key, 5)
        dtype = jnp.bfloat16 if self.policy is BF16 else jnp.float32

        # ---- LLM + LoRA
        if cfg.mock:
            # mock keeps the REAL interface contract: 32 <IMG> slots, 32
            # query tokens, matching qformer_dim — only widths/depths shrink
            self.llama_cfg = dataclasses.replace(
                TINY_LLAMA, num_img_tokens=32, max_position=512,
                qformer_dim=TINY_QFORMER.bert.hidden_size)
            self.tokenizer = WhitespaceTokenizer(
                vocab_size=self.llama_cfg.vocab_size,
                num_img_tokens=self.llama_cfg.num_img_tokens,
                img_token_id=self.llama_cfg.img_token_id)
            self.llama = llama_init(kl, self.llama_cfg, dtype=dtype)
            if cfg.quantize:
                # honor the serving layout in mock mode too (int8 KV and the
                # unrolled-layer kernels require quantize_llama_host params)
                from ..ops.quant import quantize_llama_host
                self.llama = quantize_llama_host(
                    jax.tree_util.tree_map(np.asarray, self.llama),
                    bits=cfg.weight_bits)
            self.lora = lora_init(kl, self.llama_cfg, dtype=dtype)
        else:
            if cfg.vicuna_path is None:
                raise ValueError("vicuna_path required (or use mock=True)")
            self.llama_cfg = VICUNA_7B
            self.tokenizer = load_vicuna_tokenizer(cfg.vicuna_path)
            self.llama = self._load_llama(cfg.vicuna_path, dtype)
            self.lora = (self._load_lora(cfg.lora_path, dtype)
                         if cfg.lora_path else lora_init(kl, self.llama_cfg, dtype=dtype))

        # ---- vision + Q-Former (blip2)
        if cfg.mock:
            self.qformer_cfg = dataclasses.replace(TINY_QFORMER,
                                                   num_query_tokens=32)
            self.blip2 = {"qformer": qformer_init(kq, self.qformer_cfg),
                          "ln_vision": layernorm_init(self.qformer_cfg.encoder_width)}
            self.visual, self.visual_state = biovil_t_init(
                kv, joint_feature_size=self.qformer_cfg.encoder_width)
        else:
            self.qformer_cfg = QFormerConfig()
            if cfg.blip2_checkpoint:
                self.blip2, vis_state = self._load_blip2(cfg.blip2_checkpoint)
                self.visual = self.blip2.get("visual")
                self.visual_state = vis_state.get("visual")
            else:
                self.blip2 = {"qformer": qformer_init(kq, self.qformer_cfg),
                              "ln_vision": layernorm_init(self.qformer_cfg.encoder_width)}
                self.visual, self.visual_state = biovil_t_init(
                    kv, joint_feature_size=self.qformer_cfg.encoder_width)

        # ---- findings classifier
        if cfg.mock or not cfg.classifier_checkpoint:
            self.classifier, self.classifier_state = chexpert_classifier_init(kc)
        else:
            from ..utils.hf_weights import convert_chexpert_classifier
            sd = _torch_load(cfg.classifier_checkpoint)
            sd = sd.get("state_dict", sd)
            self.classifier, self.classifier_state = convert_chexpert_classifier(sd)

        # ---- chexbert labeler
        self.chexbert_cfg = BertConfig()
        if cfg.mock or not cfg.chexbert_checkpoint:
            mock_bert = BertConfig(vocab_size=512, hidden_size=32, num_layers=2,
                                   num_heads=4, intermediate_size=64,
                                   max_position=128)
            self.chexbert_cfg = mock_bert if cfg.mock else self.chexbert_cfg
            self.chexbert = chexbert_init(kb, self.chexbert_cfg)
            self.bert_tokenizer = WhitespaceTokenizer(vocab_size=self.chexbert_cfg.vocab_size)
        else:
            from ..utils.hf_weights import convert_chexbert
            sd = _torch_load(cfg.chexbert_checkpoint)
            sd = sd.get("model_state_dict", sd.get("state_dict", sd))
            self.chexbert = convert_chexbert(sd)
            from transformers import AutoTokenizer
            self.bert_tokenizer = AutoTokenizer.from_pretrained(
                cfg.bert_tokenizer_path or "bert-base-uncased")

        self.emb_cache: Dict[str, np.ndarray] = {}
        if cfg.emb_cache and Path(cfg.emb_cache).exists():
            self.emb_cache = dict(np.load(cfg.emb_cache))

    # ------------------------------------------------------------- loaders
    def _load_llama(self, path: str, dtype) -> Dict:
        from ..utils.hf_weights import convert_llama
        sd = _load_hf_state_dict(path)
        params = convert_llama(sd, VICUNA_7B.num_layers)
        if self.cfg.quantize:
            # int8 W8A8 serving: quantize on host, stream packed tiles to the
            # chip (the bf16 copy never touches HBM — 7B bf16 + transients
            # would OOM a 16GB v5e)
            from ..ops.quant import quantize_llama_host
            return quantize_llama_host(params, device=jax.devices()[0],
                                       bits=self.cfg.weight_bits)
        return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)

    def _load_lora(self, path: str, dtype) -> Dict:
        import json
        from ..utils.hf_weights import convert_peft_lora
        acfg = None
        cfg_path = Path(path).parent / "adapter_config.json"
        if cfg_path.exists():
            acfg = json.loads(cfg_path.read_text())
        lora = convert_peft_lora(_torch_load(path), self.llama_cfg.num_layers,
                                 adapter_config=acfg)
        return jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x), dtype), lora)

    def _load_blip2(self, path: str) -> Tuple[Dict, Dict]:
        from ..utils.hf_weights import convert_blip2
        ckpt = _torch_load(path)
        return convert_blip2(ckpt.get("model", ckpt))

    # ------------------------------------------------------------- vision
    def embed_images(self, images: np.ndarray,
                     dicoms: Optional[Sequence[str]] = None) -> jax.Array:
        """(B,448,448,3) float [0,1] -> Q-Former query embeddings (B,32,768)
        (demo.py:269-273 / pretraining embedding precompute)."""
        if dicoms is not None and self.emb_cache:
            hits = [self.emb_cache.get(str(d)) for d in dicoms]
            if all(h is not None for h in hits):
                return jnp.asarray(np.stack(hits))
        out, _ = biovil_t_apply(self.visual, self.visual_state,
                                jnp.asarray(images), policy=self.policy)
        patch = patch_tokens_for_qformer(out.projected_patch_embeddings)
        patch = layernorm(self.blip2["ln_vision"], patch)
        bcfg = Blip2Config(qformer=self.qformer_cfg)
        return blip2_forward_image(self.blip2, bcfg, patch, policy=self.policy)

    def classify_findings(self, images_488: np.ndarray) -> List[List[str]]:
        """(B,488,488,3) -> positive finding names (demo.py:253-261)."""
        logits, _ = chexpert_classifier_apply(self.classifier, self.classifier_state,
                                              jnp.asarray(images_488),
                                              policy=self.policy)
        mask = np.asarray(predicted_findings(logits))
        return [[CHEXPERT_CLASSES[j] for j in range(len(CHEXPERT_CLASSES)) if row[j]]
                for row in mask]

    # ------------------------------------------------------------ labeling
    def label_reports(self, texts: Sequence[str], batch_size: int = 16) -> np.ndarray:
        """CheXbert labels (N,14) in {nan,1,0,-1} — on-device replacement for
        the chexbert subprocess (chexbert/run_chexbert.py:5-26)."""
        out = []
        for i in range(0, len(texts), batch_size):
            chunk = list(texts[i:i + batch_size])
            ids = [self.bert_tokenizer(t, truncation=True, max_length=512)["input_ids"]
                   for t in chunk]
            toks, lengths = pad_batch_right(ids, 0)
            mask = (np.arange(toks.shape[1])[None] < lengths[:, None]).astype(np.int32)
            logits = chexbert_apply(self.chexbert, self.chexbert_cfg,
                                    jnp.asarray(toks), jnp.asarray(mask),
                                    policy=self.policy)
            out.append(logits_to_labels([np.asarray(l) for l in logits]))
        return np.concatenate(out, axis=0)

    # ------------------------------------------------------------ generate
    def _shared_prefix_len(self, ids: List[List[int]],
                           img_embs: Optional[jax.Array]
                           ) -> Tuple[int, bool]:
        """Longest common token prefix usable for prefix-sharing serving.

        Returns (p0, img_in_prefix); p0=0 when the mode doesn't apply
        (opt-out, non-quantized stacked layout, batch of one). Composes
        with the int8 KV cache (the remainder prefill attends the
        compute-dtype prefix; the decode loop reads an int8-rounded copy —
        decode/engine.py generate_shared_prefix). The prefix is capped
        BEFORE the first <IMG> token when image embeddings DIFFER across
        lanes (the <IMG> ids are batch-identical but their K/V depends on
        the spliced embeddings) — but when every lane carries the SAME
        embeddings (the downstream QA passes ask 14 questions about ONE
        study, test.py:536-610), the <IMG> run joins the prefix and the
        whole shared conversation history incl. the image is prefilled
        once (img_in_prefix=True). Also capped at min_len-1 — the last
        prompt token must be per-lane so each row gets its own first
        logits."""
        if (not self.cfg.shared_prefix or not self.cfg.quantize
                or len(ids) < 2):
            return 0, False
        first = ids[0]
        p0 = min(len(s) for s in ids)
        for s in ids[1:]:
            i = 0
            while i < p0 and s[i] == first[i]:
                i += 1
            p0 = i
        p0 = min(p0, min(len(s) for s in ids) - 1)
        img_in_prefix = False
        if img_embs is not None and any(
                self.llama_cfg.img_token_id in s for s in ids):
            img_id = self.llama_cfg.img_token_id
            img_cap = min(s.index(img_id) for s in ids if img_id in s)
            # tiny probe first: hauling the full (B,32,768) tensor host-side
            # per generate call violates the tunnel rule (CLAUDE.md: D2H is
            # ~1 GB/s); different images essentially always differ in the
            # first few dims, so the common case transfers <1 KB
            probe = np.asarray(img_embs[:, :1, :8])
            same_image = bool(np.all(probe == probe[:1]))
            if same_image:
                arr = np.asarray(img_embs)
                same_image = bool(np.all(arr == arr[:1]))
            # the <IMG> run must lie ENTIRELY inside the prefix — a
            # partially-shared splice would mix prefix/remainder K/V
            img_end = img_cap + self.llama_cfg.num_img_tokens
            if same_image and p0 >= img_end:
                img_in_prefix = True
            else:
                p0 = min(p0, img_cap)
        return p0, img_in_prefix

    def generate_texts(self, prompts: Sequence[str],
                       img_embs: Optional[jax.Array] = None,
                       max_new_tokens: Optional[int] = None,
                       do_sample: bool = False, temperature: float = 1.0,
                       num_beams: int = 1) -> List[str]:
        """Tokenize -> prefill -> decode -> full decoded conversations
        (prompt + generation, mirroring batch_decode at test.py:351)."""
        ids = [self.tokenizer(p)["input_ids"] for p in prompts]
        tokens, lengths = pad_batch_right(ids, _pad_id(self.tokenizer))
        unroll = self.cfg.decode_unroll if self.cfg.decode_unroll is not None \
            else (3 if self.cfg.quantize and not self.cfg.mock else 1)
        if unroll < 1:
            raise ValueError(f"decode_unroll must be >= 1, got {unroll}")
        dp = DecodeParams(
            max_new_tokens=max_new_tokens or self.cfg.max_new_tokens,
            eos_token_id=self.tokenizer.eos_token_id,
            do_sample=do_sample, temperature=temperature, seed=self.cfg.seed,
            unroll=1 if num_beams > 1 else unroll)
        cache_len = default_cache_len(tokens.shape[1], dp)
        if num_beams > 1:
            from ..decode.beam import generate_beam
            res = generate_beam(self.llama, self.llama_cfg,
                                jnp.asarray(tokens), jnp.asarray(lengths), dp,
                                num_beams=num_beams, img_embs=img_embs,
                                lora=self.lora, policy=self.policy,
                                cache_len=cache_len)
        elif ((sp := self._shared_prefix_len(ids, img_embs))[0]
              >= SHARED_PREFIX_MIN):
            # prefix-sharing serving: the common prefix's K/V is computed
            # once and read once per step; the per-lane cache covers only
            # the remainder. When the batch shows ONE image (QA passes),
            # the <IMG> splice moves into the shared prefix too.
            p0, img_in_prefix = sp
            rems = [s[p0:] for s in ids]
            tokens, lengths = pad_batch_right(rems, _pad_id(self.tokenizer))
            cache_len = default_cache_len(tokens.shape[1], dp)
            res = generate_shared_jit(
                self.llama, self.llama_cfg,
                jnp.asarray(np.asarray(ids[0][:p0], np.int32)),
                jnp.asarray(tokens), jnp.asarray(lengths), dp,
                img_embs=None if img_in_prefix else img_embs,
                prefix_img_embs=(jnp.asarray(img_embs)[:1]
                                 if img_in_prefix else None),
                lora=self.lora, policy=self.policy,
                cache_len=cache_len, kv_int8=self.cfg.use_kv_int8())
        else:
            # fused serving: prefill + decode in ONE executable so the cache
            # is born inside the program and the decode while_loop updates it
            # in place. Measured on v5e (tools/bench_sweep.py): the split
            # two-phase variant allocates a full extra cache of program temp
            # — XLA double-buffers the loop carry against the donated cache
            # argument — and OOMs exactly the large-batch configs it was
            # meant to unlock (see decode/engine.py generate_two_phase).
            res = generate_fused_jit(self.llama, self.llama_cfg,
                                     jnp.asarray(tokens), jnp.asarray(lengths),
                                     dp, img_embs=img_embs, lora=self.lora,
                                     policy=self.policy, cache_len=cache_len,
                                     kv_int8=self.cfg.use_kv_int8())
        gen = np.asarray(res.tokens)
        out = []
        for i, p in enumerate(prompts):
            n = int(res.lengths[i])
            text = self.tokenizer.decode(gen[i][:n], skip_special_tokens=True)
            out.append(p + " " + text)
        return out

    def generate_texts_ring(self, prompts: Sequence[str],
                            max_new_tokens: Optional[int] = None,
                            lanes: int = 12,
                            steps_per_call: int = 4,
                            img_embs: Optional[jax.Array] = None,
                            spec_k: Optional[int] = None) -> List[str]:
        """generate_texts through the CONTINUOUS-BATCHING ring
        (decode/continuous.RingBatcher) instead of one fixed-batch
        executable — the teacher-LLM serving shape for instruct-data
        generation (the reference drives its Vicuna-13B teacher one prompt
        at a time inside a DataLoader loop, create_data.py:305,379-400;
        here requests of wildly different prompt lengths stream through a
        shared ring at eval batch width, test.py:279). Same greedy
        numerics as generate_texts; ordering of outputs matches
        ``prompts``.

        img_embs: optional (len(prompts), n_img, qformer_dim) per-request
        Q-Former embeddings, spliced at each prompt's <IMG> run at admit.
        spec_k: route through BATCHED SPECULATION
        (decode/spec_ring.SpecCompactBatcher, prompt-lookup drafts
        verified k+1 wide, accepted rows relocated to contiguous per-lane
        frontiers after every verify) — token-identical to the plain ring,
        fewer forwards when outputs quote their prompts (the correction
        pass, test.py:440-534; measured economics in docs/PERF.md
        "Batched speculative decoding"). The compacting design costs only
        k+1 scratch slots over the plain-decode cache (the ring variant's
        (k+1)-slots-per-verify sizing did NOT fit 8 lanes x 300 tokens
        next to the 7B weights) and composes with either KV dtype; the
        cache dtype follows the pipeline's kv_int8 setting."""
        from ..decode.continuous import RingBatcher
        ids = [self.tokenizer(p)["input_ids"] for p in prompts]
        max_new = max_new_tokens or self.cfg.max_new_tokens
        tpad = max(-(-max(len(x) for x in ids) // 32) * 32, 32)
        nv = (-(-max(max_new - 1, 1) // steps_per_call) * steps_per_call
              + steps_per_call)
        dp = DecodeParams(max_new_tokens=max_new,
                          eos_token_id=self.tokenizer.eos_token_id,
                          seed=self.cfg.seed)
        if spec_k is not None:
            from ..decode.spec_ring import SpecCompactBatcher
            # plain-decode-sized cache + (k+1) scratch; keep the parent
            # ring-life guard satisfied (chunk-rounded span + headroom).
            # Final ceil-to-32: nv is a steps_per_call multiple, not a
            # 32-multiple, and int8 lane-cache lengths must be 32-multiples
            # (flash-decode block rule — tpad already is one)
            gen = -(-max(max_new + spec_k + 1, nv + 32) // 32) * 32
            rb = SpecCompactBatcher(self.llama, self.llama_cfg,
                                    lanes=min(lanes, len(ids)),
                                    cache_len=tpad + gen, prompt_len=tpad,
                                    dp=dp, lora=self.lora,
                                    policy=self.policy,
                                    steps_per_call=steps_per_call,
                                    spec_k=spec_k,
                                    kv_int8=self.cfg.use_kv_int8())
        else:
            # ring must exceed a session's chunk-rounded span (continuous.py)
            ring = max(-(-nv // 32) * 32, 64)
            rb = RingBatcher(self.llama, self.llama_cfg,
                             lanes=min(lanes, len(ids)),
                             cache_len=tpad + ring, prompt_len=tpad, dp=dp,
                             lora=self.lora, policy=self.policy,
                             steps_per_call=steps_per_call,
                             kv_int8=self.cfg.use_kv_int8())
        if img_embs is None:
            embs = None
        else:
            e = jnp.asarray(img_embs)   # one H2D transfer, reused for shape
            embs = e.reshape(len(ids), 1, *e.shape[-2:])
        sids = [rb.submit(x, img_embs=None if embs is None else embs[i])
                for i, x in enumerate(ids)]
        done = rb.run()
        out = []
        for p, sid in zip(prompts, sids):
            toks = done[sid].tokens
            if self.tokenizer.eos_token_id in toks:
                toks = toks[:toks.index(self.tokenizer.eos_token_id) + 1]
            text = self.tokenizer.decode(np.asarray(toks, np.int32),
                                         skip_special_tokens=True)
            out.append(p + " " + text)
        return out


def _pad_id(tok) -> int:
    pid = getattr(tok, "pad_token_id", None)
    return pid if pid is not None else 0


def _torch_load(path: str):
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def _load_hf_state_dict(path: str) -> Dict:
    """Load an HF checkpoint dir (safetensors shards or pytorch bins)."""
    p = Path(path)
    sds: Dict = {}
    st_files = sorted(p.glob("*.safetensors"))
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            sds.update(load_file(str(f)))
        return sds
    bins = sorted(p.glob("pytorch_model*.bin"))
    if not bins:
        raise FileNotFoundError(f"no model weights found under {path}")
    for f in bins:
        sds.update(_torch_load(str(f)))
    return sds
