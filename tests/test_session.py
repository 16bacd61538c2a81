"""Interactive session (prefix cache) tests: incremental multi-turn decode
must match monolithic full-conversation re-prefill exactly (greedy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radialog_tpu.decode.engine import DecodeParams, generate
from radialog_tpu.decode.session import InteractiveSession
from radialog_tpu.models.llama import TINY_LLAMA, llama_init, lora_init

CFG = TINY_LLAMA
RNG = np.random.default_rng(0)


def _monolithic(params, ids, dp, img_embs=None, lora=None):
    toks = jnp.asarray(ids, jnp.int32)[None]
    res = generate(params, CFG, toks, jnp.asarray([len(ids)]), dp,
                   img_embs=img_embs, lora=lora, cache_len=128)
    n = int(res.lengths[0])
    return [int(x) for x in np.asarray(res.tokens)[0, :n]]


@pytest.mark.slow
def test_two_turn_matches_monolithic():
    params = llama_init(jax.random.PRNGKey(0), CFG)
    dp = DecodeParams(max_new_tokens=6, eos_token_id=1)
    p1 = [int(x) for x in RNG.integers(3, 200, 7)]
    delta = [int(x) for x in RNG.integers(3, 200, 5)]

    sess = InteractiveSession(params, CFG, cache_len=128)
    sess.append_tokens(p1)
    g1 = sess.generate(dp)
    assert g1 == _monolithic(params, p1, dp)

    sess.append_tokens(delta)
    g2 = sess.generate(dp)
    # monolithic turn 2: history = p1 + non-eos generated tokens + delta
    hist = p1 + [t for t in g1 if t != dp.eos_token_id] + delta
    assert g2 == _monolithic(params, hist, dp)


@pytest.mark.slow
def test_three_turns_with_image_and_lora():
    params = llama_init(jax.random.PRNGKey(2), CFG)
    lora = lora_init(jax.random.PRNGKey(3), CFG)
    dp = DecodeParams(max_new_tokens=4, eos_token_id=1)
    n_img = CFG.num_img_tokens
    p1 = [5, 6] + [CFG.img_token_id] * n_img + [7, 8]
    embs = jnp.asarray(RNG.normal(size=(1, n_img, CFG.qformer_dim)), jnp.float32)

    sess = InteractiveSession(params, CFG, lora=lora, cache_len=128)
    sess.append_tokens(p1, img_embs=embs)
    g1 = sess.generate(dp)
    assert g1 == _monolithic(params, p1, dp, img_embs=embs, lora=lora)

    hist = list(p1) + [t for t in g1 if t != dp.eos_token_id]
    for turn in range(2):
        delta = [int(x) for x in RNG.integers(3, 200, 3 + turn)]
        sess.append_tokens(delta)
        g = sess.generate(dp)
        hist = hist + delta
        # NOTE: the monolithic path re-splices the image each prefill; the
        # session spliced it once in turn 1 — same semantics because the
        # <IMG> run only exists in p1's tokens.
        assert g == _monolithic(params, hist, dp, img_embs=embs, lora=lora)
        hist = hist + [t for t in g if t != dp.eos_token_id]


@pytest.mark.slow
def test_unrolled_params_two_turns_match_monolithic():
    """Serving-layout (unrolled) params through the session: the turn-2
    incremental append must attend the cached history (llama_apply's direct
    prefill only sees fresh K/V — session.py routes unrolled params through
    the full-cache verify path)."""
    from radialog_tpu.ops.layers import BF16
    from radialog_tpu.ops.quant import quantize_llama_host
    params = llama_init(jax.random.PRNGKey(4), CFG)
    qp = quantize_llama_host(jax.tree_util.tree_map(np.asarray, params))
    dp = DecodeParams(max_new_tokens=5, eos_token_id=1)
    p1 = [int(x) for x in RNG.integers(3, 200, 9)]
    delta = [int(x) for x in RNG.integers(3, 200, 4)]

    def mono(ids):
        toks = jnp.asarray(ids, jnp.int32)[None]
        res = generate(qp, CFG, toks, jnp.asarray([len(ids)]), dp,
                       policy=BF16, cache_len=128)
        n = int(res.lengths[0])
        return [int(x) for x in np.asarray(res.tokens)[0, :n]]

    # BF16 policy: compute dtype == cache dtype, so the session's
    # attend-the-cache prefill is bitwise the monolithic attend-fresh-KV
    # prefill (under FP32 the bf16 cache rounds K/V the fresh path doesn't —
    # random-weight greedy amplifies that ulp into token flips, the same
    # caveat as tests/test_shared_prefix.py's int8 note)
    sess = InteractiveSession(qp, CFG, cache_len=128, policy=BF16)
    sess.append_tokens(p1)
    g1 = sess.generate(dp)
    assert g1 == mono(p1)

    sess.append_tokens(delta)
    g2 = sess.generate(dp)
    hist = p1 + [t for t in g1 if t != dp.eos_token_id] + delta
    assert g2 == mono(hist)


@pytest.mark.slow
def test_no_retrace_across_turns():
    """The session jits ONE executable per (shape, dp) signature; the turn
    offset cur_len is traced data, so later turns with the same bucketed
    append shape reuse the compiled programs instead of re-tracing (the
    per-turn recompile tax this module exists to kill)."""
    from radialog_tpu.decode.session import _session_decode, _session_prefill
    params = llama_init(jax.random.PRNGKey(0), CFG)
    dp = DecodeParams(max_new_tokens=4, eos_token_id=1)
    sess = InteractiveSession(params, CFG, cache_len=128)
    sess.append_tokens([5, 6, 7])   # bucket 16
    sess.generate(dp)
    n_pre = _session_prefill._cache_size()
    n_dec = _session_decode._cache_size()
    for ids in ([8, 9], [10, 11, 12]):  # same bucket, different offsets
        sess.append_tokens(ids)
        sess.generate(dp)
    assert _session_prefill._cache_size() == n_pre
    assert _session_decode._cache_size() == n_dec


def test_overflow_raises():
    params = llama_init(jax.random.PRNGKey(0), CFG)
    sess = InteractiveSession(params, CFG, cache_len=16)
    sess.append_tokens([5] * 10)
    import pytest
    with pytest.raises(ValueError):
        sess.generate(DecodeParams(max_new_tokens=20, eos_token_id=1))


def test_reset():
    params = llama_init(jax.random.PRNGKey(0), CFG)
    dp = DecodeParams(max_new_tokens=3, eos_token_id=1)
    sess = InteractiveSession(params, CFG, cache_len=64)
    sess.append_tokens([5, 6, 7])
    g1 = sess.generate(dp)
    sess.reset()
    sess.append_tokens([5, 6, 7])
    assert sess.generate(dp) == g1


def test_warmup_precompiles_then_resets():
    params = llama_init(jax.random.PRNGKey(0), CFG)
    dp = DecodeParams(max_new_tokens=4, eos_token_id=1)
    sess = InteractiveSession(params, CFG, cache_len=128)
    spent = sess.warmup(dp, turn_lengths=(16,), spec_k=2)
    assert spent > 0 and sess.cur_len == 0 and sess.token_ids == []
    # the session still produces correct turns after warmup
    p1 = [int(x) for x in RNG.integers(3, 200, 7)]
    sess.append_tokens(p1)
    assert sess.generate(dp) == _monolithic(params, p1, dp)
