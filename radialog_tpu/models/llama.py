"""LLaMA decoder (Vicuna-7B v1.3) with LoRA adapters + image-embedding splice.

Re-implements modeling_llama_imgemb.py (965 LoC of vendored HF LLaMA) as a
functional, static-shape, TPU-first decoder:

  * Right-padded prompts with per-sequence lengths (the reference left-pads,
    test.py:288-304; both give identical RoPE positions because the reference
    computes positions as cumsum(attention_mask)-1,
    modeling_llama_imgemb.py:805-810 — here positions are simply 0..len-1).
  * The 32 <IMG> placeholder tokens (id 32000) are replaced at prefill by
    projected Q-Former embeddings with a vmapped dynamic_update_slice —
    replacing the per-row python split loop (split_at_img,
    modeling_llama_imgemb.py:498-520, the #1 pattern NOT to replicate).
  * Pre-allocated KV cache (L, B, S_max, H, D); decode writes every
    sequence's K/V at a shared STATIC slot (prompt_pad + step) with one
    contiguous in-place dynamic_update_slice, while RoPE positions and
    attention masks stay per-sequence (decode_bias_static_slot) — a
    per-sequence scatter forces XLA to copy the full cache every step.
    Static shapes end to end -> one compile per bucket.
  * Two layer layouts: STACKED (leaves carry a leading num_layers axis,
    lax.scan forward — O(1) compile depth, used for training) and UNROLLED
    (list of per-layer dicts from ops/quant.quantize_llama_host — per-layer
    weight buffers feed the Pallas serving kernels with zero copies).
  * LoRA (r=8, alpha=16 on q_proj/v_proj per finetune.py:309-318) applied as
    y = Wx + (alpha/r) * B(Ax), with the trainable img_proj_layer (768->4096,
    finetune.py:254,321-323) stored alongside the adapters.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import NEG_INF, mha, mha_shared_prefix
from ..ops.layers import DTypePolicy, FP32, embedding_lookup, linear, rmsnorm
from ..ops.rotary import apply_rope, rope_tables


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32001          # 32000 + <IMG> (finetune.py:257-258)
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    intermediate_size: int = 11008
    max_position: int = 2048
    rms_eps: float = 1e-6
    rope_theta: float = 10000.0
    img_token_id: int = 32000
    num_img_tokens: int = 32
    qformer_dim: int = 768           # img_proj_layer input (test.py:295)
    bos_token_id: int = 1
    eos_token_id: int = 2
    pad_token_id: int = 0            # unk-as-pad at eval (test.py:304)
    # set when num_heads is a per-shard count under tensor parallelism
    # (parallel/tp_serving.py) and hidden_size//num_heads no longer holds
    override_head_dim: Optional[int] = None

    @property
    def head_dim(self) -> int:
        if self.override_head_dim is not None:
            return self.override_head_dim
        return self.hidden_size // self.num_heads


VICUNA_7B = LlamaConfig()
TINY_LLAMA = LlamaConfig(vocab_size=256, hidden_size=64, num_layers=2,
                         num_heads=4, num_kv_heads=4, intermediate_size=128,
                         max_position=128, img_token_id=250, num_img_tokens=4,
                         qformer_dim=32)


class KVCache(NamedTuple):
    """Per-layer pre-allocated cache. k/v: (L, B, S_max, Hkv, D).

    bf16 by default; int8 in the quantized serving mode, stored TOKEN-FLAT
    as (L, B, S_max, Hkv*D) with per-token-per-head scales (k_scale/v_scale
    (L, B, S_max, Hkv) BF16) — halves the cache HBM footprint (batch 24 fits
    one v5e next to int8 7B weights). The flat layout is what lets the
    Pallas flash-decode kernel (ops/flash_decode.py) feed each (bs, H*D)
    cache block to the MXU as one block-diagonal-q matmul with no relayout.

    The scales are deliberately bf16 AND padded to a dense 128-lane minor
    dim (SCALE_LANES): XLA's rematerialization pass "compresses"
    loop-carried buffers whose minor dim wastes tile space — a (..., H=32)
    bf16 buffer occupies 4x its logical bytes in (8,128) lane tiles, so
    under HBM pressure XLA relayouts it compact and copies it back around
    EVERY use inside the decode while_loop (59 `remat_compressed` copies of
    the scale DUS chain in the b30 compile dump = the measured 2-4x "remat
    cliff", docs/PERF.md). Padding the stored scales to (..., 128) makes
    the buffer dense — physical == logical bytes — so the compression pass
    has nothing to save and leaves the loop carry alone. The kernel slices
    lanes [:H] back out; writers pad with pad_scale_lanes. Quantization
    divides by the bf16-ROUNDED scale, so dequant stays consistent; the
    extra scale rounding (~2^-9 relative) is far below the int8 step
    itself."""

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


SCALE_LANES = 128   # dense minor-dim width for loop-carried scale buffers


def scale_lanes(num_heads: int) -> int:
    """Stored lane width for per-token-per-head KV scales: the smallest
    multiple of 128 >= num_heads (see KVCache — dense layout starves XLA's
    remat-compression of the loop-carried cache)."""
    return -(-num_heads // SCALE_LANES) * SCALE_LANES


def pad_scale_lanes(s: jax.Array) -> jax.Array:
    """Pad a (..., H) scale array to the stored (..., scale_lanes(H))."""
    h = s.shape[-1]
    sl = scale_lanes(h)
    if sl == h:
        return s
    return jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(0, sl - h)],
                   constant_values=1)


def init_cache(cfg: LlamaConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16, quantized: bool = False) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if quantized:
        if cfg.num_kv_heads != cfg.num_heads:
            # the int8 decode paths (_attention_int8_kv + the flash-decode
            # kernel's block-diagonal q) index the token-flat cache by the
            # QUERY head count — GQA would need an in-kernel head-group
            # broadcast that is not built. The bf16 paths support GQA
            # (jnp.repeat in _attention_block); fail here with the real
            # constraint instead of a shape error at first decode.
            raise NotImplementedError(
                f"int8 KV cache requires num_kv_heads == num_heads "
                f"(got {cfg.num_kv_heads} != {cfg.num_heads}); use the "
                f"bf16 cache (kv_int8=False) for GQA configs")
        flat = shape[:3] + (cfg.num_kv_heads * cfg.head_dim,)
        sc = shape[:3] + (scale_lanes(cfg.num_kv_heads),)
        return KVCache(jnp.zeros(flat, jnp.int8), jnp.zeros(flat, jnp.int8),
                       jnp.ones(sc, jnp.bfloat16),
                       jnp.ones(sc, jnp.bfloat16))
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def quantize_kv(x: jax.Array,
                scale_dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
    """(..., D) float -> (int8 (..., D), scale (...)) per-row symmetric.

    The scale is rounded to `scale_dtype` FIRST and the quantization divides
    by the rounded value, so int8 * scale dequant is exact w.r.t. the stored
    scale. bf16 default matches the KVCache scale buffers (see KVCache on why
    f32 loop-carried scales trigger XLA's remat-compression cliff); the
    transient q/p quantizations inside attention pass f32.

    CONTRACT: at scale_dtype=f32 this must stay bitwise-identical to
    ops/q8_matmul.quantize_act and to the inline q-quantization in
    ops/flash_decode.flash_decode_int8 — the int8-KV exactness tests
    compare kernel vs reference paths that quantize q independently
    (pinned by tests/test_quant.py::test_act_quant_implementations_agree).
    """
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    scale = scale.astype(scale_dtype)
    x8 = jnp.clip(jnp.round(xf / scale.astype(jnp.float32)[..., None]),
                  -127, 127).astype(jnp.int8)
    return x8, scale


# ------------------------------------------------------------------------- init
# Layer params are STACKED: every leaf under params["layers"] carries a
# leading (num_layers,) axis so the forward is a lax.scan over layers — one
# compiled layer body instead of a 32x-unrolled graph (compile time and HLO
# size scale O(1) in depth).
def _dense(key, shape, dtype):
    # generate directly in target dtype: no fp32 transient at 7B scale
    fan_in = shape[-2]
    return jax.random.normal(key, shape, dtype) * jnp.asarray(fan_in ** -0.5, dtype)


def llama_init(key, cfg: LlamaConfig, dtype=jnp.float32) -> Dict:
    kq, kk, kv, ko, kg, ku, kd, ke, kl = jax.random.split(key, 9)
    h, inter, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    kvh = cfg.num_kv_heads * cfg.head_dim
    layers = {
        "wq": {"w": _dense(kq, (L, h, h), dtype)},
        "wk": {"w": _dense(kk, (L, h, kvh), dtype)},
        "wv": {"w": _dense(kv, (L, h, kvh), dtype)},
        "wo": {"w": _dense(ko, (L, h, h), dtype)},
        "gate": {"w": _dense(kg, (L, h, inter), dtype)},
        "up": {"w": _dense(ku, (L, h, inter), dtype)},
        "down": {"w": _dense(kd, (L, inter, h), dtype)},
        "input_ln": jnp.ones((L, h), dtype),
        "post_ln": jnp.ones((L, h), dtype),
    }
    return {
        "embed": jax.random.normal(ke, (cfg.vocab_size, h), dtype) * jnp.asarray(0.02, dtype),
        "layers": layers,
        "final_ln": jnp.ones((h,), dtype),
        "lm_head": {"w": _dense(kl, (h, cfg.vocab_size), dtype)},
    }


def lora_init(key, cfg: LlamaConfig, rank: int = 8, alpha: float = 16.0,
              targets: Tuple[str, ...] = ("wq", "wv"), dtype=jnp.float32) -> Dict:
    """LoRA adapters (stacked over layers) + img_proj_layer — the full
    trainable set of the reference's finetune stage (finetune.py:309-323)."""
    h, L = cfg.hidden_size, cfg.num_layers
    kvh = cfg.num_kv_heads * cfg.head_dim
    out_dims = {"wq": h, "wk": kvh, "wv": kvh, "wo": h}
    layers = {}
    for j, t in enumerate(targets):
        ka = jax.random.fold_in(key, j)
        layers[t] = {
            "a": (jax.random.normal(ka, (L, h, rank)) * (h ** -0.5)).astype(dtype),
            "b": jnp.zeros((L, rank, out_dims[t]), dtype),
        }
    kp = jax.random.fold_in(key, 10_000)
    img_proj = {
        "w": (jax.random.normal(kp, (cfg.qformer_dim, h)) * (cfg.qformer_dim ** -0.5)).astype(dtype),
        "b": jnp.zeros((h,), dtype),
    }
    return {"layers": layers, "img_proj": img_proj,
            "scale": jnp.asarray(alpha / rank, jnp.float32)}


def _index_lora(lora_layers, i: int):
    """Static per-layer slice of the stacked LoRA tree (tiny arrays)."""
    if lora_layers is None:
        return None
    return jax.tree_util.tree_map(lambda a: a[i], lora_layers)


def _lora_delta(lora_layer: Dict, name: str, x: jax.Array, lora_scale,
                policy: DTypePolicy):
    if name not in lora_layer:
        return 0.0
    la = lora_layer[name]
    return lora_scale * linear({"w": la["b"]}, linear({"w": la["a"]}, x, policy), policy)


def _proj(p: Dict, lora_layer: Optional[Dict], name: str, x: jax.Array,
          lora_scale, policy: DTypePolicy) -> jax.Array:
    y = linear(p[name], x, policy)
    if lora_layer is not None and name in lora_layer:
        y = y + _lora_delta(lora_layer, name, x, lora_scale, policy)
    return y


# ---------------------------------------------------------------------- forward
def splice_image_embeddings(embeds: jax.Array, img_embs: jax.Array,
                            img_start: jax.Array) -> jax.Array:
    """Replace the run of <IMG> token embeddings with projected image
    embeddings. embeds (B,T,H); img_embs (B,n_img,H); img_start (B,) int.
    Sequences with img_start < 0 are left untouched."""
    def one(e, im, st):
        spliced = jax.lax.dynamic_update_slice(e, im.astype(e.dtype), (st, 0))
        return jnp.where(st >= 0, spliced, e)
    return jax.vmap(one)(embeds, img_embs, img_start)


def find_img_start(tokens: jax.Array, img_token_id: int) -> jax.Array:
    """(B,T) -> (B,) index of the first <IMG> token, -1 if absent."""
    is_img = tokens == img_token_id
    any_img = is_img.any(axis=1)
    first = jnp.argmax(is_img, axis=1)
    return jnp.where(any_img, first, -1)


def qkv_proj(lp: Dict, lora_layer, lora_scale, cfg: LlamaConfig,
             x: jax.Array, policy: DTypePolicy):
    """Q/K/V projections for one layer, handling both weight layouts: the
    fused "wqkv" packed matmul of the quantized serving params
    (quantize_llama_host) with LoRA deltas added to the slices, and the
    separate wq/wk/wv of the stacked training layout. Returns head-split
    (B,T,nh,hd) / (B,T,nkv,hd) / (B,T,nkv,hd), pre-RoPE."""
    b, t, _ = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "wqkv" in lp:
        qkv = linear(lp["wqkv"], x, policy)
        q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
        if lora_layer is not None:
            q = q + _lora_delta(lora_layer, "wq", x, lora_scale, policy)
            k = k + _lora_delta(lora_layer, "wk", x, lora_scale, policy)
            v = v + _lora_delta(lora_layer, "wv", x, lora_scale, policy)
        return (q.reshape(b, t, nh, hd), k.reshape(b, t, nkv, hd),
                v.reshape(b, t, nkv, hd))
    return (_proj(lp, lora_layer, "wq", x, lora_scale, policy).reshape(b, t, nh, hd),
            _proj(lp, lora_layer, "wk", x, lora_scale, policy).reshape(b, t, nkv, hd),
            _proj(lp, lora_layer, "wv", x, lora_scale, policy).reshape(b, t, nkv, hd))


def _attention_block(lp: Dict, lora_layer, lora_scale, cfg: LlamaConfig,
                     x: jax.Array, positions: jax.Array,
                     rope: Tuple[jax.Array, jax.Array],
                     bias: jax.Array,
                     cache_layer: Optional[Tuple[jax.Array, jax.Array]],
                     write_pos: Optional[jax.Array],
                     policy: DTypePolicy,
                     direct_cache=None,
                     lengths: Optional[jax.Array] = None,
                     slot_info=None,
                     shared_layer=None,
                     verify: bool = False,
                     flash: bool = True,
                     defer: bool = False):
    """One layer's attention. cache_layer: (B,S,H,D) k/v for this layer, or
    None at prefill (fresh K/V are returned for bulk cache install);
    direct_cache: (ck_full, cv_full, static layer idx) for the unrolled
    serving path; shared_layer: (k0, v0) each (P0, Hkv, D) — this layer's
    KV for a batch-wide shared prompt prefix (prefix-sharing serving,
    decode/engine.py generate_shared_prefix): attention merges
    [shared | per-lane] via one softmax, reading the prefix bytes once per
    step instead of once per lane."""
    b, t, h = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q, k, v = qkv_proj(lp, lora_layer, lora_scale, cfg, x, policy)
    cos, sin = rope
    q = apply_rope(q, cos, sin, positions)
    k = apply_rope(k, cos, sin, positions)

    if direct_cache is not None:
        # Unrolled serving path: write the step's K/V straight into the FULL
        # (L,B,S,H,D) cache at a static layer index + shared slot — one small
        # in-place dynamic_update_slice. (The scan path's slice-out /
        # modify / write-back costs two 50MB copies per layer per step.)
        full_cache, layer_idx = direct_cache
        if full_cache.quantized:
            k8, ks = quantize_kv(k)
            v8, vs = quantize_kv(v)
            # token-flat int8 layout: (B, T, H, D) -> (B, T, H*D)
            k8 = k8.reshape(b, t, nkv * hd)
            v8 = v8.reshape(b, t, nkv * hd)
            ksp, vsp = pad_scale_lanes(ks), pad_scale_lanes(vs)
            if defer:
                # IN-KERNEL-WRITE decode (opt-in, measured perf-neutral —
                # docs/PERF.md "In-kernel cache writes"): the step's K/V
                # go to the kernel as a direct operand (its mask shrinks
                # to exclude the current slot) and the kernel inserts the
                # row into the cache in-place via aliased outputs — no
                # per-layer dynamic_update_slice at all (a deferred
                # stacked write instead made XLA double-buffer the 2.6 GB
                # cache carry and OOM).
                sl, p0 = (shared_layer if shared_layer is not None
                          else (None, None))
                pp, st = slot_info
                o, new_cache = _attention_int8_kv(
                    q, full_cache, layer_idx, bias, hd,
                    lengths=lengths, slot_info=(pp, st - 1),
                    shared_layer=sl, p0=p0,
                    current=(k8, ksp, v8, vsp), write_cache=True)
                o = o.reshape(b, t, nh * hd)
                return (_proj(lp, lora_layer, "wo", o, lora_scale, policy),
                        new_cache)
            new_cache = KVCache(
                jax.lax.dynamic_update_slice(
                    full_cache.k, k8[None], (layer_idx, 0, write_pos, 0)),
                jax.lax.dynamic_update_slice(
                    full_cache.v, v8[None], (layer_idx, 0, write_pos, 0)),
                jax.lax.dynamic_update_slice(
                    full_cache.k_scale, ksp[None],
                    (layer_idx, 0, write_pos, 0)),
                jax.lax.dynamic_update_slice(
                    full_cache.v_scale, vsp[None],
                    (layer_idx, 0, write_pos, 0)))
            if t > 1 and not verify:
                # DIRECT PREFILL into the int8 cache: attention runs on this
                # layer's own bf16 K/V (prefill numerics identical to the
                # bf16 path — the int8 rounding only affects DECODE reads),
                # while the quantized copy lands in the cache above. Avoids
                # materializing a stacked (L,B,T,H,D) bf16 fresh-KV +
                # quantize pass after the forward (~1.9GB of HLO temp at
                # batch 28 — the headroom loss behind the remat cliff,
                # docs/PERF.md).
                k_loc, v_loc = k, v
                if nkv != nh:
                    rep = nh // nkv
                    k_loc = jnp.repeat(k_loc, rep, axis=2)
                    v_loc = jnp.repeat(v_loc, rep, axis=2)
                if shared_layer is not None:
                    # remainder prefill attends the COMPUTE-dtype prefix
                    # (same contract as the bf16 path — the int8 rounding
                    # only affects decode reads): shared_layer = (k0, v0)
                    # each (P0, Hkv, D) in the compute dtype.
                    k0, v0 = shared_layer
                    k0 = k0.astype(x.dtype)
                    v0 = v0.astype(x.dtype)
                    if nkv != nh:
                        rep = nh // nkv
                        k0 = jnp.repeat(k0, rep, axis=1)
                        v0 = jnp.repeat(v0, rep, axis=1)
                    o = mha_shared_prefix(q, k0, v0, k_loc, v_loc,
                                          bias1=bias[..., :t])
                else:
                    o = mha(q, k_loc, v_loc, bias=bias[..., :t])
            else:
                # decode: shared_layer (if any) is the QUANTIZED prefix —
                # (k0_8, ks0, v0_8, vs0) + live length p0 (threaded through
                # slot_info by the decode loop when prefix-sharing)
                sl, p0 = (shared_layer if shared_layer is not None
                          else (None, None))
                o = _attention_int8_kv(q, new_cache, layer_idx, bias, hd,
                                       lengths=lengths, slot_info=slot_info,
                                       shared_layer=sl, p0=p0)
            o = o.reshape(b, t, nh * hd)
            return (_proj(lp, lora_layer, "wo", o, lora_scale, policy),
                    new_cache)
        ck_full = jax.lax.dynamic_update_slice(
            full_cache.k, k[None].astype(full_cache.k.dtype),
            (layer_idx, 0, write_pos, 0, 0))
        cv_full = jax.lax.dynamic_update_slice(
            full_cache.v, v[None].astype(full_cache.v.dtype),
            (layer_idx, 0, write_pos, 0, 0))
        new_cache_layer = KVCache(ck_full, cv_full)
        if shared_layer is not None:
            k0, v0 = shared_layer
            k0 = k0.astype(x.dtype)
            v0 = v0.astype(x.dtype)
            if nkv != nh:
                rep = nh // nkv
                k0 = jnp.repeat(k0, rep, axis=1)
                v0 = jnp.repeat(v0, rep, axis=1)
        if t > 1 and not verify:
            # DIRECT PREFILL into the bf16 cache: attend this layer's own
            # fresh K/V in the compute dtype (numerics identical to the
            # no-cache prefill), store to the cache above — no stacked
            # fresh-KV array, no separate install pass (see the quantized
            # branch's rationale). ``verify`` (speculative decoding,
            # decode/speculative.py) instead attends the FULL cache with a
            # t-token query block — the static-layer-slice path below.
            k_loc, v_loc = k, v
            if nkv != nh:
                rep = nh // nkv
                k_loc = jnp.repeat(k_loc, rep, axis=2)
                v_loc = jnp.repeat(v_loc, rep, axis=2)
            if shared_layer is not None:
                o = mha_shared_prefix(q, k0, v0, k_loc, v_loc,
                                      bias1=bias[..., :t])
            else:
                o = mha(q, k_loc, v_loc, bias=bias[..., :t])
            o = o.reshape(b, t, nh * hd)
            return (_proj(lp, lora_layer, "wo", o, lora_scale, policy),
                    new_cache_layer)
        # static layer slice: fuses into the attention matmul, no copy
        k_all = ck_full[layer_idx].astype(x.dtype)
        v_all = cv_full[layer_idx].astype(x.dtype)
        if shared_layer is not None:
            if nkv != nh:
                rep = nh // nkv
                k_all = jnp.repeat(k_all, rep, axis=2)
                v_all = jnp.repeat(v_all, rep, axis=2)
            o = mha_shared_prefix(q, k0, v0, k_all, v_all, bias1=bias
                                  ).reshape(b, t, nh * hd)
            return (_proj(lp, lora_layer, "wo", o, lora_scale, policy),
                    new_cache_layer)
    elif cache_layer is not None:
        if jnp.ndim(write_pos) == 0:
            # static-slot decode: every sequence writes the SAME slot, so the
            # update is one contiguous dynamic_update_slice. A per-sequence
            # scatter here forces a full-cache copy every step.
            ck = jax.lax.dynamic_update_slice(
                cache_layer[0], k.astype(cache_layer[0].dtype), (0, write_pos, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cache_layer[1], v.astype(cache_layer[1].dtype), (0, write_pos, 0, 0))
        else:
            # per-sequence offsets (ragged writes): scatter path
            bi = jnp.arange(b)[:, None]
            ti = write_pos[:, None] + jnp.arange(t)[None, :]
            ck = cache_layer[0].at[bi, ti].set(k.astype(cache_layer[0].dtype))
            cv = cache_layer[1].at[bi, ti].set(v.astype(cache_layer[1].dtype))
        new_cache_layer = (ck, cv)
        k_all, v_all = ck.astype(x.dtype), cv.astype(x.dtype)
    else:
        new_cache_layer = (k, v)
        k_all, v_all = k, v

    if nkv != nh:  # GQA broadcast
        rep = nh // nkv
        k_all = jnp.repeat(k_all, rep, axis=2)
        v_all = jnp.repeat(v_all, rep, axis=2)

    if flash and _use_flash(cache_layer, direct_cache, lengths, t):
        from ..ops.flash_attention import flash_attention
        o = flash_attention(q, k_all, v_all, lengths,
                            causal=True).reshape(b, t, nh * hd)
    else:
        o = mha(q, k_all, v_all, bias=bias).reshape(b, t, nh * hd)
    return _proj(lp, lora_layer, "wo", o, lora_scale, policy), new_cache_layer


def _attention_int8_kv(q: jax.Array, cache: KVCache, layer_idx,
                       bias: jax.Array, head_dim: int,
                       lengths: Optional[jax.Array] = None,
                       slot_info=None,
                       shared_layer=None,
                       p0: Optional[jax.Array] = None,
                       current=None, write_cache: bool = False):
    """Decode attention over an int8 KV cache, fully on the int8 MXU.

    q: (B, T, H, D) float. scores = (q8 . k8) * q_scale * k_scale;
    the value pass folds the per-token v_scale into the softmax weights
    before re-quantizing them (p' = softmax * v_scale; o = (p'8 . v8) * p's).
    Keeping both matmuls int8 avoids the VPU int8->bf16 convert wall that
    makes naive dequantization slower than bf16.

    shared_layer: optional (k0_8, ks0, v0_8, vs0) — one layer of an
    int8-quantized batch-wide shared prompt prefix (k0_8/v0_8 (P0p, H*D)
    token-flat int8, scales (P0p, H)); p0: live prefix length (rows >= p0
    are padding). The prefix scores join the same softmax as the per-lane
    region, and its bytes are read once per step instead of once per lane
    (decode/engine.py generate_shared_prefix, kv_int8 mode).
    """
    b, t, nh, hd = q.shape
    from ..ops.flash_decode import flash_decode_available
    if (t == 1 and slot_info is not None and lengths is not None
            and flash_decode_available()):
        # fused Pallas flash-decode: int8 DMA + block-diagonal-q MXU matmuls.
        # slot_info is either the batch engine's global (prompt_pad, step)
        # static-slot mask or the RingBatcher's per-lane closed intervals
        # (a1, b1, a2, b2) over the rotating generation window.
        # current: the step's own K/V row as a direct kernel operand
        # (in-kernel-cache-write decode, llama_apply defer path) — the
        # caller has already shrunk slot_info to exclude the current slot.
        # write_cache: the kernel also inserts the row into the cache
        # in-place (aliased outputs); returns (o, new KVCache).
        from ..ops.flash_decode import (flash_decode_force_interpret,
                                        flash_decode_int8)
        interp = (flash_decode_force_interpret()
                  and jax.default_backend() not in ("tpu", "axon"))
        kshared = (tuple(x[None] for x in shared_layer)
                   if shared_layer is not None else None)
        if len(slot_info) == 4:
            assert not write_cache, \
                "in-kernel cache writes support the static-slot mask only"
            o = flash_decode_int8(q[:, 0], cache.k, cache.k_scale,
                                  cache.v, cache.v_scale, lengths,
                                  layer_idx=layer_idx,
                                  scale=head_dim ** -0.5,
                                  shared=kshared, p0=p0,
                                  gen_intervals=slot_info,
                                  current=current, interpret=interp)
        else:
            prompt_pad, step = slot_info
            o = flash_decode_int8(q[:, 0], cache.k, cache.k_scale,
                                  cache.v, cache.v_scale,
                                  lengths, prompt_pad, step,
                                  layer_idx=layer_idx,
                                  scale=head_dim ** -0.5,
                                  shared=kshared, p0=p0,
                                  current=current, interpret=interp,
                                  write_cache=write_cache)
        if write_cache:
            o, (k8n, ksn, v8n, vsn) = o
            return (o[:, None].astype(q.dtype),
                    KVCache(k8n, v8n, ksn, vsn))
        return o[:, None].astype(q.dtype)
    assert current is None, \
        "in-kernel KV writes require the Pallas flash-decode path"
    s_max = cache.k.shape[2]
    # token-flat (B,S,H*D) -> (B,S,H,D); free on the CPU/fallback path
    k8 = cache.k[layer_idx].reshape(b, s_max, nh, hd)
    v8 = cache.v[layer_idx].reshape(b, s_max, nh, hd)
    # stored scales carry dense lane padding -> slice the live heads back out
    ks = cache.k_scale[layer_idx][..., :nh].astype(jnp.float32)   # (B,S,H)
    vs = cache.v_scale[layer_idx][..., :nh].astype(jnp.float32)
    qt = q.transpose(0, 2, 1, 3)             # (B,H,T,D) — small (T=1 decode)
    q8, qs = quantize_kv(qt, jnp.float32)    # qs (B,H,T)
    # keep K/V in their native (B,S,H,D) cache layout: transposing 400MB of
    # int8 per layer per step costs more than the attention itself; dot
    # batch dims may sit at different positions on each operand
    scores = jax.lax.dot_general(
        q8, k8, (((3,), (3,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.int32)    # (B,H,T,S)
    scale = head_dim ** -0.5
    s = (scores.astype(jnp.float32) * qs[..., None]
         * ks.transpose(0, 2, 1)[:, :, None, :] * scale)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    elif slot_info is not None and lengths is not None:
        # kernel-path parity: the Pallas path ignores bias and masks from
        # slot_info; without this branch a bias=None caller got SILENT
        # garbage attention over uninitialized pad-gap slots on the
        # fallback. Same validity rule as ops/flash_decode.py _kernel:
        # prompt region | generated interval(s).
        pos = jnp.arange(s_max)[None, :]
        if len(slot_info) == 2:
            pp, st = slot_info
            valid = ((pos < lengths[:, None])
                     | ((pos >= pp) & (pos <= pp + st)))
        else:
            a1, b1, a2, b2 = slot_info
            valid = ((pos < lengths[:, None])
                     | ((pos >= a1[:, None]) & (pos <= b1[:, None]))
                     | ((pos >= a2[:, None]) & (pos <= b2[:, None])))
        s = jnp.where(valid[:, None, None, :], s, NEG_INF)
    if shared_layer is not None:
        # prefix scores: (q8 . k0_8) * qs * ks0 — same int8 math as the
        # per-lane region; one softmax over the concatenation
        k0_8, ks0, v0_8, vs0 = shared_layer
        p0p = k0_8.shape[0]
        k0 = k0_8.reshape(p0p, nh, hd)
        s0 = jnp.einsum("bhtd,phd->bhtp", q8.astype(jnp.int32),
                        k0.astype(jnp.int32)).astype(jnp.float32)
        s0 = (s0 * qs[..., None]
              * ks0[..., :nh].astype(jnp.float32).T[None, :, None, :]
              * scale)
        s0 = jnp.where(jnp.arange(p0p)[None, None, None, :] < p0, s0, NEG_INF)
        s = jnp.concatenate([s0, s], axis=-1)            # (B,H,T,P0p+S)
        p = jax.nn.softmax(s, axis=-1)
        pfx, p = p[..., :p0p], p[..., p0p:]
        pv0 = pfx * vs0[..., :nh].astype(jnp.float32).T[None, :, None, :]
        o0 = jnp.einsum("bhtp,phd->bhtd", pv0,
                        v0_8.reshape(p0p, nh, hd).astype(jnp.float32))
    else:
        p = jax.nn.softmax(s, axis=-1)       # (B,H,T,S)
        o0 = 0.0
    pv = p * vs.transpose(0, 2, 1)[:, :, None, :]
    p8, ps = quantize_kv(pv, jnp.float32)    # ps (B,H,T)
    o = jax.lax.dot_general(
        p8, v8, (((3,), (1,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.int32)    # (B,H,T,D)
    o = o.astype(jnp.float32) * ps[..., None] + o0
    return o.transpose(0, 2, 1, 3).astype(q.dtype)


def _use_flash(cache_layer, direct_cache, lengths, t: int) -> bool:
    """Pallas flash attention on TPU for long prefill/training sequences; the
    XLA path stays for decode (KV streaming), short sequences, and CPU.

    Differentiable: ops/flash_attention.py carries a custom FA2-style VJP,
    so jax.grad works through it. Training still defaults to
    llama_apply(flash=False) by MEASUREMENT (349 vs 403 ms/step at the
    reference finetune shape — docs/PERF.md), not because grads are
    unavailable; train/steps.py threads the choice through."""
    return (cache_layer is None and direct_cache is None
            and lengths is not None and t >= 256
            and jax.default_backend() in ("tpu", "axon"))


def _psum_if(y: jax.Array, axis_name: Optional[str]) -> jax.Array:
    return jax.lax.psum(y, axis_name) if axis_name is not None else y


def _mlp(lp: Dict, x: jax.Array, policy: DTypePolicy) -> jax.Array:
    if "gateup" in lp:  # fused serving path
        gu = linear(lp["gateup"], x, policy)
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = jax.nn.silu(linear(lp["gate"], x, policy))
        u = linear(lp["up"], x, policy)
        return linear(lp["down"], g * u, policy)
    return linear(lp["down"], jax.nn.silu(g) * u, policy)


def llama_apply(params: Dict, cfg: LlamaConfig, tokens: jax.Array,
                positions: jax.Array, bias: jax.Array,
                cache: Optional[KVCache] = None,
                write_pos: Optional[jax.Array] = None,
                img_embs: Optional[jax.Array] = None,
                img_start: Optional[jax.Array] = None,
                lora: Optional[Dict] = None,
                policy: DTypePolicy = FP32,
                remat: bool = False,
                lengths: Optional[jax.Array] = None,
                slot_info=None,
                axis_name: Optional[str] = None,
                last_pos: Optional[jax.Array] = None,
                shared_kv: Optional[KVCache] = None,
                shared_p0: Optional[jax.Array] = None,
                verify: bool = False,
                flash: bool = True,
                defer_kv: Optional[bool] = None):
    """Core transformer. Returns (logits, new_cache).
    verify: static — speculative-decoding verification step
    (decode/speculative.py): a t>1 query block that attends the FULL cache
    (plus its own freshly written slots) instead of being treated as a
    prefill. Only meaningful on the unrolled serving path; the stacked scan
    path's cached decode already attends the full cache for any t.
    shared_kv: (L, P0, Hkv, D) k/v of a batch-wide shared prompt prefix
    (unrolled serving layout + bf16 cache only) — each layer's attention
    merges [shared | per-lane] regions in one softmax so the prefix bytes
    are read once per decode step, not once per lane
    (decode/engine.py generate_shared_prefix).
    last_pos: (B,) int — when given, logits are computed ONLY at these
    positions (returned shape (B, 1, V)); used by prefill to skip the
    (B, T, V) full-prompt vocab projection.
    axis_name: tensor-parallel mesh axis when running per-shard under
    shard_map (parallel/tp_serving.py) — attention/MLP outputs are partial
    sums over the sharded head/ffn dims and get psum'd before the residual
    (Megatron row-parallel reduction).
    slot_info: (prompt_pad, step) int32 scalars during static-slot decode —
    lets the int8-KV flash-decode kernel build its own mask. The RingBatcher
    passes per-lane closed intervals (a1, b1, a2, b2) instead, each (B,)
    int32, describing its rotating generation window (ops/flash_decode.py).
    defer_kv: True routes eligible single-token int8-KV kernel steps
    through IN-KERNEL cache writes (the layer's K/V row is inserted into
    the cache from INSIDE the flash-decode kernel via aliased outputs,
    replacing the per-layer dynamic_update_slice chain — see the unrolled
    branch below). Default (None) reads RADIALOG_DEFER_KV, which defaults
    OFF: measured 7.81 vs 7.85 reports/s at the b56 serving default — the
    DUS chain's 1.91 ms/step of xplane time overlaps the kernels' DMA
    queues rather than extending the critical path, while the kernel
    write pays real 8-row-slab write amplification (docs/PERF.md
    "In-kernel cache writes"). The written slot row is identical either
    way; rows past the write slot inside its 8-row slab are undefined
    under the kernel write (each is overwritten in turn as THE slot
    before any mask can see it). CONTRACT: the defer branch derives its
    write slot from slot_info — the kernel is passed (pp, st-1) and
    writes at b1[b]+1 = prompt_pad + step — and IGNORES write_pos;
    callers combining defer_kv with an explicit write_pos must keep
    write_pos == prompt_pad + step (the engine's decode loop does,
    decode/engine.py:374) or the two write paths would target different
    slots.

    tokens: (B, T); positions: (B, T) absolute positions for RoPE;
    bias: (B|1, 1, T, S) additive attention bias over the KV axis
    (S = cache length when cache given, else T);
    img_embs: (B, n_img, qformer_dim) raw Q-Former outputs — projected and
    spliced at the <IMG> run when img_start >= 0 (prefill only, mirroring
    modeling_llama_imgemb.py:571-594).
    """
    x = embedding_lookup(params["embed"], tokens).astype(policy.compute)
    lora_scale = lora["scale"] if lora is not None else None
    if img_embs is not None and img_start is not None:
        proj = lora["img_proj"] if (lora is not None and "img_proj" in lora) else params["img_proj"]
        projected = linear(proj, img_embs.astype(policy.compute), policy)
        x = splice_image_embeddings(x, projected, img_start)

    rope = rope_tables(cfg.head_dim, cfg.max_position, cfg.rope_theta)
    lora_layers = lora["layers"] if lora is not None else None

    if isinstance(params["layers"], (list, tuple)):
        # UNROLLED serving path (quantize_llama_host(..., stacked=False)):
        # per-layer weight buffers feed the Pallas custom-calls directly —
        # lax.scan's per-layer slices of stacked weights materialize an
        # HBM->HBM copy of every layer's weights each step (profiled at
        # ~8.5ms/step for Vicuna-7B on v5e) because custom-calls cannot
        # consume fused slices.
        if shared_kv is not None and cache is None:
            raise ValueError("shared_kv requires a pre-allocated per-lane "
                             "cache (the direct serving path)")
        if verify and shared_kv is not None:
            raise ValueError("speculative verification does not compose "
                             "with prefix sharing (the shared-region merge "
                             "is single-query)")
        if verify and cache is None:
            raise ValueError("verify=True needs a pre-allocated cache — a "
                             "verification block attends prior context")
        from ..ops.flash_decode import flash_decode_available
        # IN-KERNEL CACHE WRITES (single-token int8-KV decode on the Pallas
        # kernel path only): each layer hands its quantized K/V row to the
        # kernel as a direct operand and the kernel inserts it into the
        # cache in-place (aliased outputs) — zero cache-write dispatches
        # instead of 4 tiny dynamic_update_slice ops per layer. Gated to
        # the static-slot mask form; the RingBatcher's per-lane intervals
        # keep per-layer writes. defer_kv=None reads RADIALOG_DEFER_KV,
        # default OFF — measured perf-neutral-to-negative at the b56
        # serving default (the DUS chain overlaps the kernels' DMA queues;
        # docs/PERF.md "In-kernel cache writes"); an explicit True/False
        # wins (tests pin in-kernel vs per-layer writes equal at the slot).
        if defer_kv is None:
            defer_kv = os.environ.get("RADIALOG_DEFER_KV", "0") == "1"
        defer_kv = (defer_kv and cache is not None and cache.quantized
                    and tokens.shape[1] == 1 and not verify
                    and slot_info is not None and len(slot_info) == 2
                    and lengths is not None and flash_decode_available())
        cur_cache = cache
        fresh_k, fresh_v = [], []
        for i, lp in enumerate(params["layers"]):
            ll = _index_lora(lora_layers, i)
            h = rmsnorm(lp["input_ln"], x, cfg.rms_eps)
            direct = (cur_cache, i) if cache is not None else None
            if shared_kv is None:
                shared_layer = None
            elif not isinstance(shared_kv, KVCache) and \
                    isinstance(shared_kv, (tuple, list)):
                # NB KVCache is itself a NamedTuple — it must be excluded
                # before the tuple test or a stacked prefix cache would be
                # misread as the pre-split form (masked by nothing: it
                # fails with 'too many values to unpack' only at trace
                # time of a shared-prefix call, which the CPU suite's tiny
                # graphs DO hit — but the fallback-free bench caught it
                # first; regression pinned in test_shared_prefix.py)
                # PRE-SPLIT per-layer form (decode/engine.py
                # generate_shared_prefix): 4-tuple = int8 prefix entry,
                # 2-tuple = bf16. Splitting before the decode while_loop
                # makes each layer's prefix loop-invariant by construction
                # (measured perf-neutral vs the stacked in-body slices —
                # XLA already hoisted them; decode/engine.py note).
                entry = shared_kv[i]
                shared_layer = ((tuple(entry), shared_p0)
                                if len(entry) == 4 else tuple(entry))
            elif shared_kv.quantized:
                # int8 decode: ((k0_8, ks0, v0_8, vs0), live prefix length)
                shared_layer = ((shared_kv.k[i], shared_kv.k_scale[i],
                                 shared_kv.v[i], shared_kv.v_scale[i]),
                                shared_p0)
            else:
                shared_layer = (shared_kv.k[i], shared_kv.v[i])
            attn_out, cache_out = _attention_block(
                lp, ll, lora_scale, cfg, h, positions, rope, bias,
                None, write_pos, policy, direct_cache=direct,
                lengths=lengths, slot_info=slot_info,
                shared_layer=shared_layer, verify=verify, flash=flash,
                defer=defer_kv)
            if cache is not None:
                cur_cache = cache_out
            else:
                fresh_k.append(cache_out[0])
                fresh_v.append(cache_out[1])
            x = x + _psum_if(attn_out, axis_name)
            h = rmsnorm(lp["post_ln"], x, cfg.rms_eps)
            x = x + _psum_if(_mlp(lp, h, policy), axis_name)
        logits = _final_logits(params, cfg, x, policy, last_pos)
        if cache is not None:
            return logits, cur_cache
        return logits, KVCache(jnp.stack(fresh_k), jnp.stack(fresh_v))

    if shared_kv is not None:
        raise ValueError("shared_kv (prefix sharing) is a serving feature "
                         "of the unrolled weight layout; the stacked scan "
                         "path has no per-layer merge point")
    if cache is not None:
        if cache.quantized:
            raise ValueError(
                "int8 KV caches require the unrolled serving params "
                "(quantize_llama_host layout with list-of-layers)")
        # Decode: the FULL stacked cache rides the scan CARRY so XLA aliases
        # the update in place. Returning per-layer cache slices as stacked
        # scan outputs instead forces a copy of the whole (L,B,S,H,D) cache
        # every step — measured +23ms/step at batch 12, cache 512 on v5e.
        def layer_fn(carry, scanned):
            x, ck, cv = carry
            lp, ll, i = scanned
            h = rmsnorm(lp["input_ln"], x, cfg.rms_eps)
            layer_cache = (jax.lax.dynamic_index_in_dim(ck, i, 0, keepdims=False),
                           jax.lax.dynamic_index_in_dim(cv, i, 0, keepdims=False))
            attn_out, (nk, nv) = _attention_block(
                lp, ll, lora_scale, cfg, h, positions, rope, bias,
                layer_cache, write_pos, policy, flash=flash)
            ck = jax.lax.dynamic_update_index_in_dim(ck, nk, i, 0)
            cv = jax.lax.dynamic_update_index_in_dim(cv, nv, i, 0)
            x = x + _psum_if(attn_out, axis_name)
            h = rmsnorm(lp["post_ln"], x, cfg.rms_eps)
            x = x + _psum_if(_mlp(lp, h, policy), axis_name)
            return (x, ck, cv), None

        body = jax.checkpoint(layer_fn) if remat else layer_fn
        (x, new_k, new_v), _ = jax.lax.scan(
            body, (x, cache.k, cache.v),
            (params["layers"], lora_layers, jnp.arange(cfg.num_layers)))
    else:
        # Prefill: fresh per-layer K/V are genuinely new arrays — collect
        # them as stacked scan outputs for the bulk cache install.
        def layer_fn(x, scanned):
            lp, ll = scanned
            h = rmsnorm(lp["input_ln"], x, cfg.rms_eps)
            attn_out, new_cache_layer = _attention_block(
                lp, ll, lora_scale, cfg, h, positions, rope, bias,
                None, write_pos, policy, lengths=lengths, flash=flash)
            x = x + _psum_if(attn_out, axis_name)
            h = rmsnorm(lp["post_ln"], x, cfg.rms_eps)
            x = x + _psum_if(_mlp(lp, h, policy), axis_name)
            return x, new_cache_layer

        body = jax.checkpoint(layer_fn) if remat else layer_fn
        x, (new_k, new_v) = jax.lax.scan(
            body, x, (params["layers"], lora_layers))

    logits = _final_logits(params, cfg, x, policy, last_pos)
    # cache given: updated full cache. cache None: fresh per-layer prefill KV.
    return logits, KVCache(new_k, new_v)


def _final_logits(params: Dict, cfg: LlamaConfig, x: jax.Array,
                  policy: DTypePolicy, last_pos) -> jax.Array:
    """final_ln + lm_head. With ``last_pos`` (B,) int — the prefill case,
    where only each sequence's last prompt position feeds the decode loop —
    the hidden states are gathered to (B,1,H) BEFORE the vocab projection:
    projecting all T positions materializes a (B,T,V) f32 logits buffer
    (459MB at batch 28, prompt 128, the single biggest prefill temp) and
    pays T x the lm_head MXU work for rows that are thrown away."""
    x = rmsnorm(params["final_ln"], x, cfg.rms_eps)
    if last_pos is not None:
        b = x.shape[0]
        x = x[jnp.arange(b)[:, None], last_pos[:, None].astype(jnp.int32)]
    return linear(params["lm_head"], x, policy).astype(jnp.float32)


# ------------------------------------------------------------------ mask helpers
def prefill_bias(lengths: jax.Array, t: int, dtype=jnp.float32) -> jax.Array:
    """(B,1,T,T) causal bias; padding tail is harmless under right-padding
    (pad queries are never read) but we mask KV > len anyway for hygiene."""
    qi = jnp.arange(t)[None, :, None]
    kj = jnp.arange(t)[None, None, :]
    causal = kj <= qi
    valid = kj < lengths[:, None, None]
    return jnp.where(causal & valid, 0.0, NEG_INF).astype(dtype)[:, None]


def decode_bias(kv_valid_len: jax.Array, s_max: int, dtype=jnp.float32) -> jax.Array:
    """(B,1,1,S) bias for single-token decode: attend kv j < kv_valid_len."""
    kj = jnp.arange(s_max)[None, :]
    ok = kj < kv_valid_len[:, None]
    return jnp.where(ok, 0.0, NEG_INF).astype(dtype)[:, None, None, :]


def decode_bias_static_slot(lengths: jax.Array, prompt_pad: int, step,
                            s_max: int, dtype=jnp.float32) -> jax.Array:
    """(B,1,1,S) bias for static-slot decode: prefill KV live at j < len_i;
    generated KV live at prompt_pad <= j <= prompt_pad + step. The pad gap
    between len_i and prompt_pad holds garbage and is masked."""
    kj = jnp.arange(s_max)[None, :]
    in_prompt = kj < lengths[:, None]
    in_generated = (kj >= prompt_pad) & (kj <= prompt_pad + step)
    ok = in_prompt | in_generated
    return jnp.where(ok, 0.0, NEG_INF).astype(dtype)[:, None, None, :]
