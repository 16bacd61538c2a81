"""Continuous batching tests: staggered sessions sharing one decode loop
must reproduce the serial engine token-for-token."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radialog_tpu.decode.continuous import ContinuousBatcher
from radialog_tpu.decode.engine import DecodeParams, generate
from radialog_tpu.models.llama import TINY_LLAMA, llama_init

CFG = TINY_LLAMA
RNG = np.random.default_rng(0)
PARAMS = llama_init(jax.random.PRNGKey(0), CFG)


def _serial_reference(prompt_ids, max_new):
    toks = jnp.asarray(prompt_ids, jnp.int32)[None]
    lens = jnp.asarray([len(prompt_ids)])
    out = generate(PARAMS, CFG, toks, lens,
                   DecodeParams(max_new_tokens=max_new, eos_token_id=1),
                   cache_len=128)
    n = int(out.lengths[0])
    return [int(x) for x in np.asarray(out.tokens)[0, :n]]


def _prompt(n, seed):
    return [int(x) for x in
            np.random.default_rng(seed).integers(3, 200, n)]


class TestContinuousBatching:
    def test_three_staggered_sessions_match_serial(self):
        """The VERDICT acceptance: 3 sessions submitted at different steps
        share one decode loop; each matches its solo-generate output."""
        cb = ContinuousBatcher(PARAMS, CFG, lanes=2, cache_len=128,
                               dp=DecodeParams(max_new_tokens=8,
                                               eos_token_id=1))
        prompts = [_prompt(6, 1), _prompt(9, 2), _prompt(4, 3)]
        sids = [cb.submit(prompts[0])]
        cb.step()
        cb.step()
        sids.append(cb.submit(prompts[1]))   # staggered arrival
        cb.step()
        sids.append(cb.submit(prompts[2]))   # only 2 lanes: this one queues
        finished = cb.run()
        assert set(finished) == set(sids)
        for sid, prompt in zip(sids, prompts):
            expect = _serial_reference(prompt, 8)
            assert finished[sid].tokens == expect, (
                f"sid {sid}: {finished[sid].tokens} != {expect}")

    def test_eviction_frees_lane_for_queued_request(self):
        cb = ContinuousBatcher(PARAMS, CFG, lanes=1, cache_len=128,
                               dp=DecodeParams(max_new_tokens=4,
                                               eos_token_id=1))
        a = cb.submit(_prompt(5, 10))
        b = cb.submit(_prompt(5, 11))   # waits for the single lane
        assert cb.active_lanes <= 1
        finished = cb.run()
        assert set(finished) == {a, b}
        assert finished[a].tokens == _serial_reference(_prompt(5, 10), 4)
        assert finished[b].tokens == _serial_reference(_prompt(5, 11), 4)

    def test_admission_is_step_granular(self):
        """A request submitted mid-decode is admitted on the NEXT step, not
        after the running session finishes."""
        cb = ContinuousBatcher(PARAMS, CFG, lanes=2, cache_len=128,
                               dp=DecodeParams(max_new_tokens=16,
                                               eos_token_id=1))
        cb.submit(_prompt(6, 20))
        cb.step()
        assert cb.active_lanes == 1
        cb.submit(_prompt(6, 21))
        cb.step()   # second session admitted while first still decoding
        assert cb.active_lanes == 2

    def test_rejects_unrolled_params(self):
        from radialog_tpu.ops.quant import quantize_llama_host
        qp = quantize_llama_host(jax.tree_util.tree_map(np.asarray, PARAMS))
        with pytest.raises(ValueError):
            ContinuousBatcher(qp, CFG)

    def test_overflow_guard(self):
        cb = ContinuousBatcher(PARAMS, CFG, lanes=1, cache_len=32,
                               dp=DecodeParams(max_new_tokens=30,
                                               eos_token_id=1))
        cb.submit(_prompt(10, 30))
        with pytest.raises(ValueError):
            cb.step()
