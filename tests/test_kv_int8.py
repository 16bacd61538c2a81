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
    # int8 KV + int8 softmax-weights introduce ~1% attention error; greedy
    # token agreement on a random tiny model stays high
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
