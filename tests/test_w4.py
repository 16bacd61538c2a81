"""W4A8 (int4 weight) kernel + serving-layout tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radialog_tpu.ops.q4_matmul import (PackedQ4, pack_q4, q4_matmul_packed,
                                        q4_matmul_reference)

RNG = np.random.default_rng(0)


def _unpack(p):
    kt, nt, bk2, bn = p.w_t.shape
    flat = p.w_t.transpose(0, 2, 1, 3).reshape(kt * bk2, nt * bn)
    lo = ((flat.astype(np.int32) & 15) ^ 8) - 8
    hi = flat.astype(np.int32) >> 4
    return np.stack([lo, hi], 1).reshape(kt * bk2 * 2, nt * bn)


def test_pack_q4_roundtrip():
    """Nibble pack/unpack + group scales reconstruct the quantized grid
    (mode='sym' pins the round-3 symmetric grid the nibble format was
    designed around)."""
    w = RNG.normal(scale=0.02, size=(96, 64)).astype(np.float32)
    p = pack_q4(w, bn=64, bk=32, mode="sym")
    kt, nt, bk2, bn = p.w_t.shape
    assert (kt, nt, bk2, bn) == (3, 1, 16, 64)
    assert p.gscale.shape == (3, 64)
    assert p.goff is None
    w_q = _unpack(p).reshape(3, 32, 64)
    back = w_q * p.gscale[:, None, :]
    rel = np.abs(back.reshape(96, 64) - w).max() / np.abs(w).max()
    assert rel < 0.08, rel  # 15-level symmetric, group 32


def test_pack_q4_asym_roundtrip_beats_sym():
    """Default (asym) grid: dequant = s*q + m reconstructs with LOWER RMSE
    than the symmetric absmax grid — the round-4 quality fix (MSE-optimal
    clip search + all 16 codes + per-group zero point)."""
    w = RNG.normal(scale=0.02, size=(256, 64)).astype(np.float32)
    pa = pack_q4(w, bn=64, bk=64)           # default mode="asym"
    ps = pack_q4(w, bn=64, bk=64, mode="sym")
    assert pa.goff is not None and pa.gscale.shape == pa.goff.shape
    qa = _unpack(pa).reshape(4, 64, 64)
    back_a = qa * pa.gscale[:, None, :] + pa.goff[:, None, :]
    qs = _unpack(ps).reshape(4, 64, 64)
    back_s = qs * ps.gscale[:, None, :]
    rmse = lambda b: float(np.sqrt(np.mean(  # noqa: E731
        (b.reshape(256, 64) - w) ** 2)))
    assert rmse(back_a) < 0.85 * rmse(back_s), (rmse(back_a), rmse(back_s))
    # all 16 codes are reachable (the sym grid never emits -8)
    assert qa.min() == -8


def test_reference_close_to_float():
    w = RNG.normal(scale=0.02, size=(256, 128)).astype(np.float32)
    x = RNG.normal(size=(8, 256)).astype(np.float32)
    p = pack_q4(w, bn=128, bk=64)
    got = np.asarray(q4_matmul_reference(jnp.asarray(x), p))
    ref = x @ w
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.15, rel  # int4 weights + int8 activations, group 64


def test_group_scales_beat_per_channel():
    """The reason scales are group-wise: layers with outlier rows lose a
    fidelity factor at full-K per-channel int4."""
    w = RNG.normal(scale=0.02, size=(512, 64)).astype(np.float32)
    w[7] *= 30.0  # one outlier row blows up the full-K scale
    x = RNG.normal(size=(4, 512)).astype(np.float32)
    ref = x @ w
    fine = np.asarray(q4_matmul_reference(jnp.asarray(x),
                                          pack_q4(w, bn=64, bk=64)))
    coarse = np.asarray(q4_matmul_reference(jnp.asarray(x),
                                            pack_q4(w, bn=64, bk=512)))
    err = lambda y: np.abs(y - ref).max() / np.abs(ref).max()  # noqa: E731
    assert err(fine) < err(coarse) / 2, (err(fine), err(coarse))


def test_kernel_interpret_matches_reference():
    """Pallas kernel (interpret mode) == the XLA reference path: same int
    math, same per-group f32 accumulation."""
    w = RNG.normal(scale=0.02, size=(300, 200)).astype(np.float32)  # pads K&N
    x = RNG.normal(size=(5, 300)).astype(np.float32)
    p = pack_q4(w, bn=128, bk=64)
    ref = np.asarray(q4_matmul_reference(jnp.asarray(x), p))
    got = np.asarray(q4_matmul_packed(jnp.asarray(x), p,
                                      out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_bias_applied():
    w = RNG.normal(scale=0.02, size=(64, 32)).astype(np.float32)
    b = RNG.normal(size=(32,)).astype(np.float32)
    x = RNG.normal(size=(2, 64)).astype(np.float32)
    p = pack_q4(w, bn=32, bk=32, b=jnp.asarray(b))
    got = np.asarray(q4_matmul_reference(jnp.asarray(x), p))
    rel = np.abs(got - (x @ w + b)).max() / np.abs(x @ w + b).max()
    assert rel < 0.1


class TestServingLayout:
    def test_quantize_llama_host_w4(self):
        from radialog_tpu.models.llama import TINY_LLAMA, llama_init
        from radialog_tpu.ops.quant import quantize_llama_host

        params = llama_init(jax.random.PRNGKey(0), TINY_LLAMA)
        host = jax.tree_util.tree_map(np.asarray, params)
        qp = quantize_llama_host(host, bits=4)
        assert isinstance(qp["layers"], list)
        assert isinstance(qp["layers"][0]["wqkv"], PackedQ4)

    @pytest.mark.slow  # ~10s; W4A8 is the opt-in capacity mode — the
    # kernel-vs-reference parity test stays fast
    def test_w4_generate_internally_consistent(self):
        """End-to-end greedy decode over the w4 serving layout (CPU:
        linear() routes PackedQ4 to q4_matmul_reference) exercises layout
        plumbing, fused projections and cache writes. The checks are
        internal-consistency ones — bf16-vs-w4 token agreement on a TINY
        RANDOM model is meaningless (logit margins are razor thin; the
        int8-KV mode shows the same, tools/measure_kv_int8.py):
          * first generated token == argmax of the no-cache forward
          * tokens are invariant to cache_len (prefill/decode plumbing)
        """
        from radialog_tpu.decode.engine import DecodeParams, generate
        from radialog_tpu.models.llama import (TINY_LLAMA, llama_apply,
                                               llama_init, prefill_bias)
        from radialog_tpu.ops.quant import quantize_llama_host

        cfg = TINY_LLAMA
        params = llama_init(jax.random.PRNGKey(0), cfg)
        host = jax.tree_util.tree_map(np.asarray, params)
        qp = quantize_llama_host(host, bits=4)
        toks = jnp.asarray(RNG.integers(3, 200, (2, 8)))
        lens = jnp.asarray([8, 5])
        res = generate(qp, cfg, toks, lens,
                       DecodeParams(max_new_tokens=5, eos_token_id=-1),
                       cache_len=32)
        assert res.tokens.shape == (2, 5)

        t = toks.shape[1]
        positions = jnp.arange(t)[None].repeat(2, 0)
        bias = prefill_bias(lens, t)
        logits, _ = llama_apply(qp, cfg, toks, positions, bias, lengths=lens)
        first = np.asarray(logits)[np.arange(2), np.asarray(lens) - 1].argmax(-1)
        np.testing.assert_array_equal(np.asarray(res.tokens)[:, 0], first)

        res2 = generate(qp, cfg, toks, lens,
                        DecodeParams(max_new_tokens=5, eos_token_id=-1),
                        cache_len=48)
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(res2.tokens))
