"""Prompt-lookup speculative decoding (decode/speculative.py).

The contract under test: speculative greedy decode emits TOKEN-IDENTICAL
output to plain generate() — drafts only change how many forward passes run
(SpecResult.iters). Covers both serving weight layouts (unrolled bf16 +
int8 KV) and the stacked layout, eos mid-block, the n-gram proposer, the
oracle upper bound (full acceptance -> ceil fewer iterations), and the
session integration.
"""
import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radialog_tpu.decode.engine import DecodeParams, generate
from radialog_tpu.decode.session import InteractiveSession
from radialog_tpu.decode.speculative import (generate_spec, ngram_propose,
                                             spec_decode_loop)
from radialog_tpu.models.llama import TINY_LLAMA, llama_init
from radialog_tpu.ops.quant import quantize_llama_host

CFG = TINY_LLAMA
RNG = np.random.default_rng(11)


def _unrolled_params():
    p = llama_init(jax.random.PRNGKey(0), CFG)
    return quantize_llama_host(jax.tree_util.tree_map(np.asarray, p))


def _prompt(t=24):
    return jnp.asarray(RNG.integers(3, CFG.vocab_size, size=(1, t)))


# ------------------------------------------------------------- proposer unit
def test_ngram_propose_finds_latest_match():
    # hist: ... [5 6] 7 8 ... [5 6] 9 1 ... then pattern [5 6] at the end
    hist = jnp.asarray([5, 6, 7, 8, 2, 5, 6, 9, 1, 3, 5, 6, -1, -1, -1, -1],
                       jnp.int32)
    draft = ngram_propose(hist, jnp.asarray(12), k=3, m=2)
    # latest earlier occurrence of [5, 6] starts at 5 -> continues 9, 1, 3
    np.testing.assert_array_equal(np.asarray(draft), [9, 1, 3])


def test_ngram_propose_no_match_repeats_last():
    hist = jnp.asarray([4, 5, 6, 7, 8, -1, -1, -1], jnp.int32)
    draft = ngram_propose(hist, jnp.asarray(5), k=4, m=2)
    np.testing.assert_array_equal(np.asarray(draft), [8, 8, 8, 8])


def test_ngram_propose_never_sources_from_junk():
    # a match whose continuation runs into the junk region must clip ids
    hist = jnp.asarray([3, 9, 4, 3, 9, -1, -1, -1], jnp.int32)
    draft = ngram_propose(hist, jnp.asarray(5), k=3, m=2)
    assert (np.asarray(draft) >= 0).all()
    assert int(draft[0]) == 4  # the real continuation of the earlier [3, 9]


# ------------------------------------------------- equality vs plain generate
@pytest.mark.slow  # ~18s/variant; spec==plain is also pinned fast by
# test_apps.py::test_chat_session_speculative_matches_plain
@pytest.mark.parametrize("kv_int8", [False, True])
def test_spec_equals_plain_unrolled(kv_int8):
    params = _unrolled_params()
    tokens = _prompt()
    lengths = jnp.asarray([tokens.shape[1]])
    dp = DecodeParams(max_new_tokens=12)
    want = generate(params, CFG, tokens, lengths, dp, kv_int8=kv_int8)
    got = generate_spec(params, CFG, tokens, dp, k=4, m=3, kv_int8=kv_int8)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths),
                                  np.asarray(want.lengths))
    assert int(got.iters) <= dp.max_new_tokens


@pytest.mark.slow
def test_spec_equals_plain_stacked():
    params = llama_init(jax.random.PRNGKey(0), CFG)
    tokens = _prompt()
    lengths = jnp.asarray([tokens.shape[1]])
    dp = DecodeParams(max_new_tokens=10)
    want = generate(params, CFG, tokens, lengths, dp)
    got = generate_spec(params, CFG, tokens, dp, k=3, m=2)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))


@pytest.mark.slow
def test_spec_eos_mid_block():
    """Force eos into an accepted draft: the emit count must truncate at the
    eos and the tail must be eos-padded exactly like the plain loop."""
    params = _unrolled_params()
    tokens = _prompt()
    dp = DecodeParams(max_new_tokens=10)
    want = generate(params, CFG, tokens, jnp.asarray([tokens.shape[1]]), dp)
    plain = np.asarray(want.tokens)[0]

    # oracle proposer that injects the model's true continuation, so blocks
    # get fully accepted — including any eos the model emits
    stream = jnp.asarray(plain, jnp.int32)
    pl = tokens.shape[1]

    def oracle(hist, hist_len, k=4):
        return jax.lax.dynamic_slice(
            jnp.concatenate([stream, jnp.full((k,), dp.eos_token_id,
                                              jnp.int32)]),
            (hist_len - pl,), (k,))

    got = generate_spec(params, CFG, tokens, dp, k=4, m=3, proposer=oracle)
    np.testing.assert_array_equal(np.asarray(got.tokens), plain[None])
    # full acceptance -> ceil((max_new - 1) / (k + 1)) body iterations
    n = int(want.lengths[0])
    assert int(got.iters) <= -(-max(n - 1, 0) // 5) + 1


@pytest.mark.slow  # ~9s; the forward-count economics are also pinned on
# real TPU (tools/bench_spec.py rows in docs/PERF.md); spec==plain
# exactness stays fast below
def test_spec_oracle_cuts_iterations():
    params = _unrolled_params()
    tokens = _prompt()
    dp = DecodeParams(max_new_tokens=12, eos_token_id=-1)  # never stop
    want = generate(params, CFG, tokens, jnp.asarray([tokens.shape[1]]), dp)
    stream = jnp.asarray(np.asarray(want.tokens)[0], jnp.int32)
    pl = tokens.shape[1]
    k = 3

    def oracle(hist, hist_len):
        return jax.lax.dynamic_slice(
            jnp.concatenate([stream, jnp.zeros((k,), jnp.int32)]),
            (hist_len - pl,), (k,))

    got = generate_spec(params, CFG, tokens, dp, k=k, m=2, proposer=oracle)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    # 12 tokens: 1 from prefill + ceil(11 / 4) = 3 verification forwards
    assert int(got.iters) == 3


def test_spec_rejects_batched_and_sampling():
    params = _unrolled_params()
    with pytest.raises(ValueError, match="batch-1"):
        generate_spec(params, CFG, jnp.zeros((2, 8), jnp.int32),
                      DecodeParams(max_new_tokens=4))
    with pytest.raises(ValueError, match="greedy"):
        generate_spec(params, CFG, _prompt(8),
                      DecodeParams(max_new_tokens=4, do_sample=True))


# ------------------------------------------------------------------- session
@pytest.mark.slow
def test_session_generate_spec_matches_plain():
    params = _unrolled_params()
    dp = DecodeParams(max_new_tokens=8)
    prompt = [int(x) for x in np.asarray(_prompt(20))[0]]
    turn2 = [int(x) for x in np.asarray(_prompt(9))[0]]

    ses_a = InteractiveSession(params, CFG, cache_len=128)
    ses_a.append_tokens(prompt)
    r1a = ses_a.generate(dp)
    ses_a.append_tokens(turn2)
    r2a = ses_a.generate(dp)

    ses_b = InteractiveSession(params, CFG, cache_len=128)
    ses_b.append_tokens(prompt)
    r1b = ses_b.generate_spec(dp, k=4, m=3)
    ses_b.append_tokens(turn2)
    r2b = ses_b.generate_spec(dp, k=4, m=3)

    assert r1a == r1b
    assert r2a == r2b
