"""Tensor-parallel continuous batching: RingBatcher over a `model` mesh.

docs/PERF.md establishes that single-chip serving tops out at batch 32
(bf16 KV) / 24 (int8 KV) on one v5e and that "larger aggregate batch goes
through tensor parallelism". This module is that path for the INTERACTIVE
workload (BASELINE config 5): the same shared-ring static-slot continuous
batcher (decode/continuous.py RingBatcher — admit/evict at chunk
granularity, one pre-allocated per-lane cache), with every device program
running under ``shard_map`` over the quantized Megatron-sharded weights of
parallel/tp_serving.py:

  * weights: column-parallel wqkv/gateup, row-parallel wo/down (partial
    outputs psum'd over `model` inside llama_apply), replicated
    embed/norms/lm_head — the ``shard_quantized_llama`` layout;
  * KV cache: (L, lanes, S, Hkv, D) bf16 with the HEAD axis sharded over
    `model` — each chip holds heads/n of every lane's cache, so the
    per-chip cache (and with it the OOM wall / remat cliff of docs/PERF.md)
    shrinks by the TP degree while `lanes` grows;
  * logits are replicated after the final psum, so greedy argmax and all
    host-side admit/evict bookkeeping are identical on every chip.

Model-axis only — no `data` sharding of lanes. Serving data-parallelism is
request-level and embarrassingly parallel: replicas share nothing per
step, so the framework composes it as one (TP)RingBatcher per replica
group behind a router (apps/serve.py RaDialogServer wraps any batcher),
rather than paying a cross-replica collective in the hot loop for a
scheduler that each replica can run alone.

Reference behavior contract: same per-session greedy exactness as the
single-chip batcher (demo.py one-conversation-per-GPU is the reference
analog; tests/test_tp_ring.py asserts staggered TP sessions == serial
unsharded generate at model=1, and first-token prefill equality at
model=2, where per-shard re-quantization of row-parallel activations can
legitimately flip later greedy argmaxes — same caveat as
tests/test_tp_serving.py).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS
from ..decode.continuous import RingBatcher
from ..decode.engine import DecodeParams
from ..models.llama import (KVCache, find_img_start, init_cache, llama_apply,
                            prefill_bias)
from ..ops.layers import BF16, DTypePolicy
from .tp_serving import _shard_map, _unstack, shard_config


class TPRingBatcher(RingBatcher):
    """Continuous batching with the decode step sharded over a TP mesh.

    Drop-in for RingBatcher (same submit/step/run/validate_request host
    interface, so apps/serve.py RaDialogServer serves it unchanged), built
    from the global sharded-weight tree + spec tree of
    ``shard_quantized_llama`` (and optionally ``shard_lora``).
    """

    def __init__(self, mesh: Mesh, gparams: Dict, param_specs: Dict,
                 cfg, lanes: int = 4, cache_len: int = 512,
                 prompt_len: int = 256, dp: DecodeParams = DecodeParams(),
                 glora: Optional[Dict] = None,
                 lora_specs: Optional[Dict] = None,
                 policy: DTypePolicy = BF16, steps_per_call: int = 1,
                 donate_cache: bool = True):
        if DATA_AXIS in mesh.shape and mesh.shape[DATA_AXIS] != 1:
            raise ValueError(
                "TPRingBatcher shards the model axis only (lanes are global "
                "on every chip); run one batcher per data replica — serving "
                "data-parallelism is request-level (see module docstring)")
        if glora is not None and lora_specs is None:
            raise ValueError("glora requires lora_specs (shard_lora)")
        self.mesh = mesh
        self.param_specs = param_specs
        self.lora_specs = lora_specs if glora is not None else None
        self.n_model = mesh.shape[MODEL_AXIS]
        self.cfg_local = shard_config(cfg, self.n_model)
        super().__init__(gparams, cfg, lanes=lanes, cache_len=cache_len,
                         prompt_len=prompt_len, dp=dp, lora=glora,
                         policy=policy, steps_per_call=steps_per_call,
                         donate_cache=donate_cache)

    # ------------------------------------------------------------------ hooks
    def _cache_spec(self) -> KVCache:
        s = P(None, None, None, MODEL_AXIS, None)
        return KVCache(s, s)

    def _make_cache(self) -> KVCache:
        cache = init_cache(self.cfg, self.lanes, self.cache_len)
        sh = NamedSharding(self.mesh, P(None, None, None, MODEL_AXIS, None))
        return KVCache(jax.device_put(cache.k, sh), jax.device_put(cache.v, sh))

    def _build_fns(self) -> None:
        mesh, cfg_l, policy = self.mesh, self.cfg_local, self.policy
        pspecs, lspecs = self.param_specs, self.lora_specs
        prompt_len, ring_len = self.prompt_len, self.ring_len
        k, img_token_id = self.steps_per_call, self.cfg.img_token_id
        cache_spec = self._cache_spec()
        R = P()  # replicated: host scalars/vectors + psum'd logits products
        NEG = -1e30

        # prompt_lens/ring_writes are the int8-ring interval state — unused
        # by the bf16 TP ring (kv_int8 under TP ships via the batch engine's
        # tp_serving path; a quantized TP ring would shard the token-flat
        # H*D dim and is not implemented), but the host loop passes them.
        def step_body(params, lora_g, cache, valid, last_tok, cur_lens,
                      active, ring_base, prompt_lens, ring_writes):
            local = _unstack(params, pspecs)
            lora_l = _unstack(lora_g, lspecs) if lspecs is not None else None

            def body(carry, i):
                cache, valid, last_tok, cur_lens = carry
                slot = prompt_len + jax.lax.rem(ring_base + i, ring_len)
                valid = jax.lax.dynamic_update_slice(
                    valid, active[:, None], (0, slot))
                bias = jnp.where(valid, 0.0, NEG)[:, None, None, :]
                pos = cur_lens[:, None]
                logits, cache = llama_apply(
                    local, cfg_l, last_tok[:, None], pos, bias, cache=cache,
                    write_pos=slot, lora=lora_l, policy=policy,
                    axis_name=MODEL_AXIS)
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                last_tok = jnp.where(active, nxt, last_tok)
                cur_lens = cur_lens + active.astype(jnp.int32)
                return (cache, valid, last_tok, cur_lens), nxt

            (cache, valid, last_tok, cur_lens), toks = jax.lax.scan(
                body, (cache, valid, last_tok, cur_lens),
                jnp.arange(k, dtype=jnp.int32))
            return cache, valid, last_tok, cur_lens, toks

        step_jit = jax.jit(
            _shard_map(step_body, mesh,
                       (pspecs, lspecs, cache_spec, R, R, R, R, R, R, R),
                       (cache_spec, R, R, R, R)),
            donate_argnums=(2, 3) if self.donate_cache else ())
        self._step_fn = step_jit

        def make_prefill(t: int, has_img: bool):
            def body(params, lora_g, cache, valid, tokens, length, lane,
                     *rest):
                local = _unstack(params, pspecs)
                lora_l = (_unstack(lora_g, lspecs)
                          if lspecs is not None else None)
                imgs = rest[0] if has_img else None
                positions = jnp.arange(t)[None]
                bias = prefill_bias(length[None], t)
                img_start = (find_img_start(tokens, img_token_id)
                             if has_img else None)
                logits, fresh = llama_apply(
                    local, cfg_l, tokens, positions, bias, cache=None,
                    img_embs=imgs, img_start=img_start, lora=lora_l,
                    policy=policy, lengths=length[None],
                    last_pos=length[None] - 1, axis_name=MODEL_AXIS)
                kk = jax.lax.dynamic_update_slice(
                    cache.k, fresh.k.astype(cache.k.dtype), (0, lane, 0, 0, 0))
                vv = jax.lax.dynamic_update_slice(
                    cache.v, fresh.v.astype(cache.v.dtype), (0, lane, 0, 0, 0))
                row = (jnp.arange(cache.k.shape[2]) < length)[None]
                valid = jax.lax.dynamic_update_slice(valid, row, (lane, 0))
                first = jnp.argmax(logits[0, 0], axis=-1).astype(jnp.int32)
                return KVCache(kk, vv), valid, first

            in_specs = [pspecs, lspecs, cache_spec, R, R, R, R]
            if has_img:
                in_specs.append(R)
            return jax.jit(
                _shard_map(body, mesh, tuple(in_specs), (cache_spec, R, R)),
                donate_argnums=(2, 3))

        prefill_cache: Dict = {}

        def prefill_dispatch(params, lora_g, cache, valid, tokens, length,
                             lane, img_embs, t: int):
            key = (t, img_embs is not None)
            fn = prefill_cache.get(key)
            if fn is None:
                fn = prefill_cache[key] = make_prefill(*key)
            args = [params, lora_g, cache, valid, tokens, length, lane]
            if img_embs is not None:
                args.append(jnp.asarray(img_embs))
            return fn(*args)

        self._prefill_fn = prefill_dispatch
