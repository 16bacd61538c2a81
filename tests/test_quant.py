"""Int8 weight-only quantization tests: accuracy + end-to-end decode."""
import jax
import jax.numpy as jnp
import numpy as np

from radialog_tpu.decode.engine import DecodeParams, generate
from radialog_tpu.models.llama import (TINY_LLAMA, llama_apply, llama_init,
                                       prefill_bias)
from radialog_tpu.ops.quant import (dequantize_weight, linear_q8,
                                    quantize_llama, quantize_weight)


def test_quantize_roundtrip_accuracy():
    w = np.random.default_rng(0).normal(size=(64, 128)).astype(np.float32)
    q = quantize_weight(jnp.asarray(w))
    assert q["w_q"].dtype == jnp.int8 and q["scale"].shape == (128,)
    back = np.asarray(dequantize_weight(q))
    rel = np.abs(back - w).max() / np.abs(w).max()
    assert rel < 0.01  # 127-level symmetric per-channel


def test_linear_q8_matches_float():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(32, 48)).astype(np.float32)
    x = rng.normal(size=(4, 32)).astype(np.float32)
    q = quantize_weight(jnp.asarray(w))
    got = np.asarray(linear_q8(q, jnp.asarray(x), compute_dtype=jnp.float32))
    ref = x @ w
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.02


def test_quantized_llama_forward_close():
    cfg = TINY_LLAMA
    params = llama_init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_llama(params)
    assert qparams["layers"]["wq"]["w_q"].dtype == jnp.int8
    toks = jnp.asarray(np.random.default_rng(0).integers(3, 200, (2, 12)))
    lens = jnp.asarray([12, 12])
    positions = jnp.arange(12)[None].repeat(2, 0)
    bias = prefill_bias(lens, 12)
    ref, _ = llama_apply(params, cfg, toks, positions, bias)
    got, _ = llama_apply(qparams, cfg, toks, positions, bias)
    # logits shift slightly; ranking of the argmax should be mostly stable
    ref_top = np.asarray(ref).argmax(-1)
    got_top = np.asarray(got).argmax(-1)
    agree = (ref_top == got_top).mean()
    assert agree > 0.8, f"greedy agreement {agree}"
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.2


def test_quantized_generate_runs():
    cfg = TINY_LLAMA
    qparams = quantize_llama(llama_init(jax.random.PRNGKey(0), cfg))
    toks = jnp.asarray(np.random.default_rng(0).integers(3, 200, (2, 6)))
    res = generate(qparams, cfg, toks, jnp.asarray([6, 6]),
                   DecodeParams(max_new_tokens=4, eos_token_id=1), cache_len=32)
    assert res.tokens.shape == (2, 4)


class TestPackedQ8:
    """Serving layout: pre-tiled W8A8 (ops/q8_matmul.py), CPU reference path."""

    def test_pack_roundtrip_and_matmul(self):
        from radialog_tpu.ops.q8_matmul import pack_q8, q8_matmul_reference
        rng = np.random.default_rng(0)
        w = rng.normal(size=(300, 1100)).astype(np.float32)  # forces K+N padding
        packed = jax.tree_util.tree_map(jnp.asarray, pack_q8(w))
        assert packed.w_t.shape[-2] % 128 == 0
        x = jnp.asarray(rng.normal(size=(5, 300)), jnp.float32)
        got = np.asarray(q8_matmul_reference(x, packed))
        assert got.shape == (5, 1100)
        ref = np.asarray(x) @ w
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 0.03  # W8A8: weight + activation quantization error

    def test_packed_llama_generate(self):
        from radialog_tpu.ops.quant import quantize_llama_host
        cfg = TINY_LLAMA
        params = llama_init(jax.random.PRNGKey(0), cfg)
        host = jax.tree_util.tree_map(np.asarray, params)
        qp = quantize_llama_host(host)
        toks = jnp.asarray(np.random.default_rng(0).integers(3, 200, (2, 6)))
        res = generate(qp, cfg, toks, jnp.asarray([6, 6]),
                       DecodeParams(max_new_tokens=4, eos_token_id=1),
                       cache_len=32)
        assert res.tokens.shape == (2, 4)

    def test_packed_matches_simple_quant_argmax(self):
        from radialog_tpu.ops.quant import quantize_llama_host
        cfg = TINY_LLAMA
        params = llama_init(jax.random.PRNGKey(0), cfg)
        qp = quantize_llama_host(jax.tree_util.tree_map(np.asarray, params))
        toks = jnp.asarray(np.random.default_rng(1).integers(3, 200, (2, 10)))
        lens = jnp.asarray([10, 10])
        positions = jnp.arange(10)[None].repeat(2, 0)
        bias = prefill_bias(lens, 10)
        ref, _ = llama_apply(params, cfg, toks, positions, bias)
        got, _ = llama_apply(qp, cfg, toks, positions, bias)
        agree = (np.asarray(ref).argmax(-1) == np.asarray(got).argmax(-1)).mean()
        assert agree > 0.7, f"greedy agreement {agree}"


def test_act_quant_implementations_agree():
    """Three per-row symmetric int8 quantizers exist (round-5 review):
    models/llama.quantize_kv (the cache + attention transients),
    ops/q8_matmul.quantize_act (the W8A8 activation path), and the inline
    q-quantization inside ops/flash_decode.flash_decode_int8. The int8-KV
    kernel-vs-reference exactness tests only hold while all three round
    identically (scale = max|x|/127 rounded to the scale dtype FIRST, then
    divide by the rounded value, clip +-127) — pin quantize_kv(f32) ==
    quantize_act bitwise so a future tweak to one cannot silently
    desynchronize them (the flash_decode copy is covered transitively by
    the kernel-exactness tests in test_kv_int8.py)."""
    import jax.numpy as jnp
    from radialog_tpu.models.llama import quantize_kv
    from radialog_tpu.ops.q8_matmul import quantize_act

    rng = np.random.default_rng(11)
    for shape, scale in (((7, 64), 1.0), ((3, 5, 128), 40.0),
                         ((4, 32), 1e-4)):
        x = jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)
        a8, ascale = quantize_act(x)
        k8, kscale = quantize_kv(x, jnp.float32)
        np.testing.assert_array_equal(np.asarray(a8), np.asarray(k8))
        np.testing.assert_array_equal(np.asarray(ascale), np.asarray(kscale))
