"""int8 KV-cache decode tests (unrolled serving layout, CPU reference)."""
import jax
import jax.numpy as jnp
import numpy as np

from radialog_tpu.decode.engine import DecodeParams, generate
from radialog_tpu.models.llama import TINY_LLAMA, llama_init, quantize_kv
from radialog_tpu.ops.quant import quantize_llama_host

CFG = TINY_LLAMA
RNG = np.random.default_rng(0)


def _unrolled_params():
    params = llama_init(jax.random.PRNGKey(0), CFG)
    return params, quantize_llama_host(
        jax.tree_util.tree_map(np.asarray, params))


def test_quantize_kv_roundtrip():
    x = jnp.asarray(RNG.normal(size=(2, 5, 4, 8)), jnp.float32)
    x8, s = quantize_kv(x)
    assert x8.dtype == jnp.int8 and s.shape == (2, 5, 4)
    back = x8.astype(jnp.float32) * s[..., None]
    rel = np.abs(np.asarray(back - x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 0.01


def test_int8_kv_generate_close_to_bf16_cache():
    _, qp = _unrolled_params()
    toks = jnp.asarray(RNG.integers(3, 200, (2, 8)))
    lens = jnp.asarray([8, 6])
    dp = DecodeParams(max_new_tokens=6, eos_token_id=1)
    ref = generate(qp, CFG, toks, lens, dp, cache_len=32, kv_int8=False)
    got = generate(qp, CFG, toks, lens, dp, cache_len=32, kv_int8=True)
    agree = (np.asarray(ref.tokens) == np.asarray(got.tokens)).mean()
    # int8 KV is an explicit OPT-IN capacity mode, not an output-parity mode:
    # measured at realistic widths (tools/measure_kv_int8.py) greedy decode
    # diverges from the bf16 cache within a few steps, which is why it is no
    # longer the quantized-serving default (apps/pipeline.py use_kv_int8).
    # This floor is a mechanism smoke check (the int8 path decodes sane
    # tokens from the same cache contents), not a quality gate.
    assert agree >= 0.5, f"greedy agreement {agree}"
    assert got.tokens.shape == ref.tokens.shape


def test_int8_kv_rejects_scan_params():
    params, _ = _unrolled_params()
    toks = jnp.asarray(RNG.integers(3, 200, (1, 6)))
    import pytest
    with pytest.raises(ValueError):
        generate(params, CFG, toks, jnp.asarray([6]),
                 DecodeParams(max_new_tokens=2, eos_token_id=1),
                 cache_len=16, kv_int8=True)


def test_flash_decode_int8_kernel_interpret_matches_reference():
    """Pallas MXU flash-decode (interpret mode) vs a dense masked reference
    over the same int8 cache contents + static-slot mask."""
    from radialog_tpu.ops.flash_decode import flash_decode_int8

    L, B, S, H, D = 2, 3, 16, 4, 8
    bs = 8
    rng = np.random.default_rng(7)
    kf = rng.normal(size=(L, B, S, H, D)).astype(np.float32)
    vf = rng.normal(size=(L, B, S, H, D)).astype(np.float32)
    k8, ks = quantize_kv(jnp.asarray(kf))
    v8, vs = quantize_kv(jnp.asarray(vf))
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    lengths = jnp.asarray([5, 16, 9], jnp.int32)
    prompt_pad, step, li = 12, 2, 1

    got = flash_decode_int8(
        q, k8.reshape(L, B, S, H * D), ks, v8.reshape(L, B, S, H * D), vs,
        lengths, prompt_pad, step, layer_idx=li, bs=bs, interpret=True)

    # reference: dequantized (incl. the kernel's q-quantization) dense attn
    qs = np.maximum(np.abs(np.asarray(q)).max(-1), 1e-8) / 127.0
    q8 = np.clip(np.round(np.asarray(q) / qs[..., None]), -127, 127)
    qd = q8 * qs[..., None]
    kd = (np.asarray(k8, np.float32)[li]
          * np.asarray(ks, np.float32)[li][..., None])
    vd = (np.asarray(v8, np.float32)[li]
          * np.asarray(vs, np.float32)[li][..., None])
    scores = np.einsum("bhd,bshd->bhs", qd, kd) * D ** -0.5
    pos = np.arange(S)
    valid = (pos[None] < np.asarray(lengths)[:, None]) | (
        (pos >= prompt_pad) & (pos <= prompt_pad + step))[None]
    scores = np.where(valid[:, None, :], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhs,bshd->bhd", p, vd)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=0.05, atol=0.02)
