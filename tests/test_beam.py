"""Beam-search decode tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radialog_tpu.decode.beam import generate_beam
from radialog_tpu.decode.engine import DecodeParams, generate
from radialog_tpu.models.llama import TINY_LLAMA, llama_init

CFG = TINY_LLAMA
RNG = np.random.default_rng(0)


def test_beam1_equals_greedy():
    p = llama_init(jax.random.PRNGKey(0), CFG)
    toks = jnp.asarray(RNG.integers(3, 200, (2, 6)))
    lens = jnp.asarray([6, 5])
    dp = DecodeParams(max_new_tokens=5, eos_token_id=1)
    greedy = generate(p, CFG, toks, lens, dp, cache_len=32)
    beam1 = generate_beam(p, CFG, toks, lens, dp, num_beams=1, cache_len=32)
    np.testing.assert_array_equal(np.asarray(greedy.tokens),
                                  np.asarray(beam1.tokens))


@pytest.mark.slow  # ~9s; beam correctness pinned fast by beam1==greedy
def test_beam_score_not_worse_than_greedy():
    """The selected beam's total log-prob must be >= the greedy rollout's."""
    p = llama_init(jax.random.PRNGKey(1), CFG)
    toks = jnp.asarray(RNG.integers(3, 200, (1, 5)))
    lens = jnp.asarray([5])
    dp = DecodeParams(max_new_tokens=4, eos_token_id=1)

    def seq_logprob(gen_tokens):
        """Score a generated continuation under the model (teacher forcing)."""
        from radialog_tpu.models.llama import llama_apply, prefill_bias
        full = np.concatenate([np.asarray(toks)[0], gen_tokens])
        t = len(full)
        logits, _ = llama_apply(p, CFG, jnp.asarray(full)[None],
                                jnp.arange(t)[None], prefill_bias(jnp.asarray([t]), t))
        logp = jax.nn.log_softmax(np.asarray(logits)[0, 4:t - 1], axis=-1)
        return float(sum(logp[i, full[5 + i]] for i in range(len(gen_tokens))))

    greedy = generate(p, CFG, toks, lens, dp, cache_len=32)
    beam = generate_beam(p, CFG, toks, lens, dp, num_beams=4, cache_len=32)
    g_len = int(greedy.lengths[0])
    b_len = int(beam.lengths[0])
    g_score = seq_logprob(np.asarray(greedy.tokens)[0, :g_len])
    b_score = seq_logprob(np.asarray(beam.tokens)[0, :b_len])
    assert b_score >= g_score - 1e-4, (b_score, g_score)


def test_beam_eos_freezing():
    p = llama_init(jax.random.PRNGKey(0), CFG)
    toks = jnp.asarray(RNG.integers(3, 200, (1, 4)))
    lens = jnp.asarray([4])
    r0 = generate_beam(p, CFG, toks, lens,
                       DecodeParams(max_new_tokens=4, eos_token_id=1),
                       num_beams=2, cache_len=16)
    first = int(np.asarray(r0.tokens)[0, 0])
    # make the first generated token the eos: the beam must freeze
    r1 = generate_beam(p, CFG, toks, lens,
                       DecodeParams(max_new_tokens=4, eos_token_id=first),
                       num_beams=2, cache_len=16)
    got = np.asarray(r1.tokens)[0]
    if got[0] == first:  # the eos beam won
        assert (got[1:] == first).all()


@pytest.mark.slow  # ~9s; beam1==greedy already pinned fast on the stacked
# layout by test_beam1_equals_greedy
def test_beam1_equals_greedy_unrolled_quantized():
    """The split-cache beam's python layer loop (unrolled serving layout,
    bf16 KV) must agree with the engine's greedy decode on the same
    quantized params."""
    from radialog_tpu.ops.quant import quantize_llama_host

    host = jax.tree_util.tree_map(
        np.asarray, llama_init(jax.random.PRNGKey(2), CFG))
    qp = quantize_llama_host(host)
    toks = jnp.asarray(RNG.integers(3, 200, (2, 6)))
    lens = jnp.asarray([6, 4])
    dp = DecodeParams(max_new_tokens=4, eos_token_id=1)
    greedy = generate(qp, CFG, toks, lens, dp, cache_len=16)
    beam1 = generate_beam(qp, CFG, toks, lens, dp, num_beams=1, cache_len=16)
    np.testing.assert_array_equal(np.asarray(greedy.tokens),
                                  np.asarray(beam1.tokens))


def test_beam_rejects_quantized_cache():
    """Beam search is the bf16-KV quality path; an int8 prompt cache must be
    rejected loudly, not silently dequantized."""
    import pytest

    from radialog_tpu.decode.beam import beam_decode
    from radialog_tpu.models.llama import init_cache

    p = llama_init(jax.random.PRNGKey(0), CFG)
    cache = init_cache(CFG, 1, 16, quantized=True)
    logits = jnp.zeros((1, CFG.vocab_size))
    with pytest.raises(ValueError, match="bf16 KV"):
        beam_decode(p, CFG, cache, logits, jnp.asarray([4]), 8,
                    DecodeParams(max_new_tokens=2), num_beams=2)
