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


class TestRingBatcher:
    """Shared-ring static-slot continuous batching (the quantized-serving
    variant): same per-session exactness contract as ContinuousBatcher."""

    def _ring(self, params, lanes=2, max_new=8):
        from radialog_tpu.decode.continuous import RingBatcher
        return RingBatcher(params, CFG, lanes=lanes, cache_len=96,
                           prompt_len=32,
                           dp=DecodeParams(max_new_tokens=max_new,
                                           eos_token_id=1))

    def test_staggered_sessions_match_serial(self):
        rb = self._ring(PARAMS)
        prompts = [_prompt(6, 1), _prompt(9, 2), _prompt(4, 3)]
        sids = [rb.submit(prompts[0])]
        rb.step()
        rb.step()
        sids.append(rb.submit(prompts[1]))
        rb.step()
        sids.append(rb.submit(prompts[2]))   # queues behind 2 lanes
        finished = rb.run()
        assert set(finished) == set(sids)
        for sid, prompt in zip(sids, prompts):
            expect = _serial_reference(prompt, 8)
            assert finished[sid].tokens == expect, (
                f"sid {sid}: {finished[sid].tokens} != {expect}")

    @pytest.mark.slow
    def test_unrolled_quantized_layout(self):
        """The whole point of the ring: the unrolled int8 serving weights
        (scalar-slot cache writes only) run continuous batching too."""
        from radialog_tpu.ops.quant import quantize_llama_host

        host = jax.tree_util.tree_map(np.asarray, PARAMS)
        qp = quantize_llama_host(host)
        rb = self._ring(qp, lanes=2, max_new=6)
        prompts = [_prompt(5, 21), _prompt(7, 22)]
        sids = [rb.submit(p) for p in prompts]
        rb.step()
        finished = rb.run()
        assert set(finished) == set(sids)
        # exactness vs the solo engine on the SAME quantized params
        for sid, prompt in zip(sids, prompts):
            toks = jnp.asarray(prompt, jnp.int32)[None]
            lens = jnp.asarray([len(prompt)])
            out = generate(qp, CFG, toks, lens,
                           DecodeParams(max_new_tokens=6, eos_token_id=1),
                           cache_len=64)
            n = int(out.lengths[0])
            expect = [int(x) for x in np.asarray(out.tokens)[0, :n]]
            assert finished[sid].tokens == expect

    @pytest.mark.slow
    def test_int8_kv_ring(self):
        """kv_int8=True stores the ring cache int8 (interval-masked
        flash-decode on TPU; bitmask-bias XLA fallback here on CPU).
        Per-session outputs must track the solo int8 engine; agreement is
        gated rather than exact because the ring stores generated KV at
        rotated slot positions, so the (identical) valid scores are summed
        in a different order — with int8 requantization a 1-ulp f32 delta
        can flip a near-tie argmax on a tiny random model (same stance as
        tests/test_shared_prefix.py). Staggered admission exercises ring
        wrap intervals."""
        from radialog_tpu.decode.continuous import RingBatcher
        from radialog_tpu.ops.quant import quantize_llama_host

        host = jax.tree_util.tree_map(np.asarray, PARAMS)
        qp = quantize_llama_host(host)
        rb = RingBatcher(qp, CFG, lanes=2, cache_len=96, prompt_len=32,
                         dp=DecodeParams(max_new_tokens=6, eos_token_id=1),
                         kv_int8=True)
        assert rb.cache.quantized
        prompts = [_prompt(5, 31), _prompt(7, 32), _prompt(4, 33)]
        sids = [rb.submit(prompts[0])]
        rb.step()
        sids.append(rb.submit(prompts[1]))
        rb.step()
        sids.append(rb.submit(prompts[2]))
        finished = rb.run()
        assert set(finished) == set(sids)
        n_tok, n_agree = 0, 0
        for sid, prompt in zip(sids, prompts):
            toks = jnp.asarray(prompt, jnp.int32)[None]
            lens = jnp.asarray([len(prompt)])
            out = generate(qp, CFG, toks, lens,
                           DecodeParams(max_new_tokens=6, eos_token_id=1),
                           cache_len=64, kv_int8=True)
            n = int(out.lengths[0])
            expect = [int(x) for x in np.asarray(out.tokens)[0, :n]]
            got = finished[sid].tokens
            assert len(got) >= 1
            m = min(len(got), len(expect))
            n_tok += m
            n_agree += sum(g == e for g, e in zip(got[:m], expect[:m]))
        assert n_agree / n_tok >= 0.8, (n_agree, n_tok)

    def test_int8_kv_ring_rejects_stacked(self):
        with pytest.raises(ValueError, match="unrolled"):
            from radialog_tpu.decode.continuous import RingBatcher
            RingBatcher(PARAMS, CFG, lanes=1, cache_len=96, prompt_len=32,
                        dp=DecodeParams(max_new_tokens=6, eos_token_id=1),
                        kv_int8=True)

    @pytest.mark.slow
    def test_w4_quantized_layout(self):
        """The W4A8 (PackedQ4) serving layout runs continuous batching too
        — exactness vs the solo engine on the SAME quantized params."""
        from radialog_tpu.ops.quant import quantize_llama_host

        host = jax.tree_util.tree_map(np.asarray, PARAMS)
        qp = quantize_llama_host(host, bits=4)
        rb = self._ring(qp, lanes=2, max_new=5)
        prompts = [_prompt(5, 61), _prompt(7, 62)]
        sids = [rb.submit(p) for p in prompts]
        finished = rb.run()
        assert set(finished) == set(sids)
        for sid, prompt in zip(sids, prompts):
            toks = jnp.asarray(prompt, jnp.int32)[None]
            lens = jnp.asarray([len(prompt)])
            out = generate(qp, CFG, toks, lens,
                           DecodeParams(max_new_tokens=5, eos_token_id=1),
                           cache_len=64)
            n = int(out.lengths[0])
            expect = [int(x) for x in np.asarray(out.tokens)[0, :n]]
            assert finished[sid].tokens == expect

    @pytest.mark.slow  # 12 sequential sessions: ~36s on CPU
    def test_ring_wraps_across_sessions(self):
        """More total generated tokens than the ring has slots: slot reuse
        across successive sessions must not corrupt later sessions."""
        rb = self._ring(PARAMS, lanes=1, max_new=8)   # ring = 96-32 = 64
        prompts = [_prompt(5, 30 + i) for i in range(12)]  # 12*8 = 96 > 64
        sids = [rb.submit(p) for p in prompts]
        finished = rb.run()
        assert set(finished) == set(sids)
        for sid, prompt in zip(sids, prompts):
            assert finished[sid].tokens == _serial_reference(prompt, 8)

    @pytest.mark.slow
    def test_chunked_steps_match_serial(self):
        """steps_per_call>1 (k decode steps per jit call, the dispatch-
        amortizing serving mode) must trim mid-chunk EOS/max_new garbage and
        still match the serial engine token-for-token."""
        from radialog_tpu.decode.continuous import RingBatcher
        rb = RingBatcher(PARAMS, CFG, lanes=2, cache_len=96, prompt_len=32,
                         dp=DecodeParams(max_new_tokens=8, eos_token_id=1),
                         steps_per_call=4)
        prompts = [_prompt(6, 41), _prompt(9, 42), _prompt(4, 43)]
        sids = [rb.submit(prompts[0])]
        rb.step()
        sids.append(rb.submit(prompts[1]))   # admitted at chunk boundary
        rb.step()
        sids.append(rb.submit(prompts[2]))
        finished = rb.run()
        assert set(finished) == set(sids)
        for sid, prompt in zip(sids, prompts):
            expect = _serial_reference(prompt, 8)
            assert finished[sid].tokens == expect, (
                f"sid {sid}: {finished[sid].tokens} != {expect}")

    def test_rejects_oversized_request(self):
        rb = self._ring(PARAMS)
        rb.submit(_prompt(40, 50))       # bucketed to 64 > prompt_len 32
        with pytest.raises(ValueError, match="prompt region"):
            rb.step()
        from radialog_tpu.decode.continuous import RingBatcher
        with pytest.raises(ValueError, match="ring"):
            RingBatcher(PARAMS, CFG, lanes=1, cache_len=64, prompt_len=32,
                        dp=DecodeParams(max_new_tokens=40, eos_token_id=1))


def test_validate_request_chunk_rounded_ring_bound():
    """A session occupies whole steps_per_call CHUNKS of ring writes, so the
    admission bound must reject max_new values whose chunk-rounded span
    reaches ring_len even when the raw count is below it (the overflow would
    wrap onto the session's own live KV with the validity mask still set)."""
    from radialog_tpu.decode.continuous import RingBatcher
    rb = RingBatcher(PARAMS, CFG, lanes=1, cache_len=96, prompt_len=32,
                     dp=DecodeParams(max_new_tokens=8, eos_token_id=1),
                     steps_per_call=8)                 # ring_len = 64
    rb.validate_request(4, max_new_tokens=57)          # 56 writes < 64: ok
    with pytest.raises(ValueError):
        rb.validate_request(4, max_new_tokens=60)      # ceil(59/8)*8 = 64


def test_one_token_budget_emits_exactly_one():
    """Regression (round-5 review): the prefill's first token counts as
    step 1, so max_new_tokens=1 sessions must finish at admission — the
    old _admit only checked eos and every batcher emitted 2 tokens for a
    1-token budget (engine.generate returns exactly max_new). Exercised
    in production by RaDialogServer.warmup (submits max_new=steps_per_call)."""
    from radialog_tpu.decode.continuous import RingBatcher
    from radialog_tpu.ops.quant import quantize_llama_host

    dp = DecodeParams(max_new_tokens=8, eos_token_id=-1)
    cb = ContinuousBatcher(PARAMS, CFG, lanes=2, cache_len=96, dp=dp)
    sid = cb.submit(list(range(3, 10)), max_new_tokens=1)
    assert len(cb.run()[sid].tokens) == 1
    qp = quantize_llama_host(jax.tree_util.tree_map(np.asarray, PARAMS))
    rb = RingBatcher(qp, CFG, lanes=2, cache_len=96, prompt_len=32, dp=dp)
    sid1 = rb.submit(list(range(3, 10)), max_new_tokens=1)
    assert len(rb.run()[sid1].tokens) == 1
    sid3 = rb.submit(list(range(3, 12)), max_new_tokens=3)
    assert len(rb.run()[sid3].tokens) == 3
