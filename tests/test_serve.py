"""RaDialogServer: thread-safe continuous-batching front-end."""
import threading

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from radialog_tpu.apps.serve import RaDialogServer
from radialog_tpu.decode.engine import DecodeParams, generate
from radialog_tpu.models.llama import TINY_LLAMA, llama_init

CFG = TINY_LLAMA
PARAMS = llama_init(jax.random.PRNGKey(0), CFG)


def _prompt(n, seed):
    return [int(x) for x in np.random.default_rng(seed).integers(3, 200, n)]


def _serial(prompt_ids, max_new):
    toks = jnp.asarray(prompt_ids, jnp.int32)[None]
    lens = jnp.asarray([len(prompt_ids)])
    out = generate(PARAMS, CFG, toks, lens,
                   DecodeParams(max_new_tokens=max_new, eos_token_id=1),
                   cache_len=128)
    n = int(out.lengths[0])
    return [int(x) for x in np.asarray(out.tokens)[0, :n]]


@pytest.mark.slow  # ~16s; staggered==serial equality also covered fast by
# test_continuous.py (both batcher flavors)
def test_concurrent_clients_match_serial():
    """5 client threads over 2 lanes: every result matches the solo engine,
    and the server drains cleanly on shutdown."""
    srv = RaDialogServer(PARAMS, CFG, lanes=2, cache_len=96, prompt_len=32,
                         dp=DecodeParams(max_new_tokens=6, eos_token_id=1),
                         steps_per_call=2)
    prompts = [_prompt(4 + i, 70 + i) for i in range(5)]
    results = [None] * len(prompts)

    def client(i):
        results[i] = srv.generate(prompts[i], timeout=300)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    srv.shutdown()
    for i, prompt in enumerate(prompts):
        assert results[i] == _serial(prompt, 6), i


def test_bad_request_fails_its_future_only():
    """An oversized prompt rejects THAT request via its future; the server
    keeps serving others, and resolved sessions are released from the
    batcher (no unbounded finished-session growth)."""
    srv = RaDialogServer(PARAMS, CFG, lanes=1, cache_len=96, prompt_len=32,
                         dp=DecodeParams(max_new_tokens=4, eos_token_id=1),
                         steps_per_call=2)
    bad = srv.submit(_prompt(40, 80))        # buckets to 64 > prompt region
    good = srv.submit(_prompt(5, 81))
    try:
        bad.result(timeout=300)
        raise AssertionError("expected ValueError from the bad request")
    except ValueError:
        pass
    assert good.result(timeout=300) == _serial(_prompt(5, 81), 4)
    assert not srv._rb.finished              # resolved sessions released
    srv.shutdown()


@pytest.mark.slow
def test_serve_int8_ring():
    """kv_int8=True plumbs through to the RingBatcher and serves; outputs
    track the solo int8 engine (agreement-gated — rotated ring slot order
    can flip a near-tie on a tiny random model, tests/test_continuous.py)."""
    from radialog_tpu.ops.quant import quantize_llama_host
    qp = quantize_llama_host(jax.tree_util.tree_map(np.asarray, PARAMS))
    srv = RaDialogServer(qp, CFG, lanes=2, cache_len=96, prompt_len=32,
                         dp=DecodeParams(max_new_tokens=5, eos_token_id=1),
                         steps_per_call=2, kv_int8=True)
    assert srv._rb.cache.quantized
    prompts = [_prompt(4, 60), _prompt(6, 61)]
    futs = [srv.submit(p) for p in prompts]
    outs = [f.result(timeout=300) for f in futs]
    srv.shutdown()
    n_tok = n_agree = 0
    for prompt, got in zip(prompts, outs):
        toks = jnp.asarray(prompt, jnp.int32)[None]
        out = generate(qp, CFG, toks, jnp.asarray([len(prompt)]),
                       DecodeParams(max_new_tokens=5, eos_token_id=1),
                       cache_len=64, kv_int8=True)
        expect = [int(x) for x in
                  np.asarray(out.tokens)[0, :int(out.lengths[0])]]
        m = min(len(got), len(expect))
        n_tok += m
        n_agree += sum(g == e for g, e in zip(got[:m], expect[:m]))
    assert n_tok and n_agree / n_tok >= 0.8, (n_agree, n_tok)


def test_multiturn_correction_and_qa_through_server():
    """BASELINE config 5 end-to-end: multi-turn report correction + QA
    flows (data/downstream.py prompt builders, matching the reference's
    downstream_tasks/) served THROUGH the continuous-batching server —
    each follow-up turn re-encodes the conversation so far and is admitted
    as a new lane, interleaved with the other client's turns."""
    from radialog_tpu.data.conversation import Conversation
    from radialog_tpu.data.downstream import (all_qa_prompt, binary_qa_prompts,
                                              correction_prompt)
    from radialog_tpu.data.tokenization import WhitespaceTokenizer

    tok = WhitespaceTokenizer(vocab_size=CFG.vocab_size,
                              num_img_tokens=CFG.num_img_tokens,
                              img_token_id=CFG.img_token_id)
    srv = RaDialogServer(PARAMS, CFG, lanes=2, cache_len=96, prompt_len=64,
                         dp=DecodeParams(max_new_tokens=4, eos_token_id=1),
                         steps_per_call=2)

    def turn(conv, user_text):
        conv.append_user(user_text)
        conv.append_assistant(None)
        ids = tok(conv.get_prompt())["input_ids"][:48]
        out = srv.generate(ids, timeout=300)
        reply = tok.decode(out, skip_special_tokens=True)
        conv.messages[-1][1] = reply
        return reply

    conv_a, conv_b = Conversation(), Conversation()
    r1 = turn(conv_a, "Write a report.")
    # correction turn (reference downstream_tasks/automated_correction.py)
    corr = correction_prompt(["edema"], ["atelectasis"])
    assert "edema" in corr and "atelectasis" in corr
    r2 = turn(conv_a, corr)
    # interleaved second client: binary QA turn (14 prompts; use the first)
    qa = binary_qa_prompts(r1, ["Atelectasis"])[0]
    r3 = turn(conv_b, qa)
    r4 = turn(conv_b, all_qa_prompt(r3))
    srv.shutdown()
    assert all(isinstance(r, str) and r for r in (r1, r2, r3, r4))
    assert len(conv_a.messages) == 4 and len(conv_b.messages) == 4


def test_streaming_deltas_concat_to_result():
    """submit(on_tokens=...) streams per-chunk token deltas on the server
    thread; the concatenation equals the future's final result and exactly
    one invocation carries done=True."""
    srv = RaDialogServer(PARAMS, CFG, lanes=2, cache_len=96, prompt_len=32,
                         dp=DecodeParams(max_new_tokens=6, eos_token_id=1),
                         steps_per_call=2)
    events = []
    fut = srv.submit(_prompt(5, 70),
                     on_tokens=lambda d, done: events.append((d, done)))
    other = srv.submit(_prompt(7, 71))          # non-streaming neighbor
    result = fut.result(timeout=300)
    other.result(timeout=300)
    srv.shutdown()
    streamed = [t for d, _ in events for t in d]
    assert streamed == result
    assert sum(done for _, done in events) == 1
    assert events[-1][1] is True
    # chunked: more than one delivery unless the session ended in one chunk
    assert len(events) >= max(1, (len(result) - 1) // 2)


def test_submit_after_shutdown_raises():
    srv = RaDialogServer(PARAMS, CFG, lanes=1, cache_len=96, prompt_len=32,
                         dp=DecodeParams(max_new_tokens=4, eos_token_id=1))
    srv.shutdown()
    try:
        srv.submit(_prompt(4, 90))
        raise AssertionError("expected RuntimeError after shutdown")
    except RuntimeError:
        pass


def test_raising_stream_callback_still_gets_final_done():
    """A callback that raises mid-stream is dropped from further deltas, but
    the submit() contract (final invocation has done=True) is still honored
    with one last cb([], True) — a consumer that closes its queue only on
    done=True must not hang. The future itself is unaffected."""
    srv = RaDialogServer(PARAMS, CFG, lanes=1, cache_len=96, prompt_len=32,
                         dp=DecodeParams(max_new_tokens=6, eos_token_id=1),
                         steps_per_call=2)
    events = []

    def cb(delta, done):
        events.append((list(delta), done))
        if len(events) == 1:
            raise RuntimeError("transient consumer failure")

    fut = srv.submit(_prompt(5, 95), on_tokens=cb)
    result = fut.result(timeout=300)
    srv.shutdown()
    assert len(result) > 0                      # future unaffected
    assert events[0][1] is False or len(events) == 1
    assert events[-1] == ([], True)             # the promised final call
    assert len(events) == 2                     # dropped after the failure


def test_server_warmup_then_serves():
    params = llama_init(jax.random.PRNGKey(0), CFG)
    from radialog_tpu.decode.engine import DecodeParams
    srv = RaDialogServer(params, CFG, lanes=2, cache_len=96, prompt_len=32,
                         dp=DecodeParams(max_new_tokens=5, eos_token_id=1),
                         steps_per_call=2)
    try:
        spent = srv.warmup(prompt_buckets=(32,))
        assert spent > 0
        out = srv.generate([int(x) for x in np.random.default_rng(0)
                            .integers(3, 200, 7)])
        assert len(out) >= 1
    finally:
        srv.shutdown()


def test_server_over_spec_ring_batcher():
    """The batched speculative ring serves through the same thread-safe
    front-end (batcher= composition) and stays greedy-exact vs the plain
    ring server."""
    from radialog_tpu.decode.spec_ring import SpecRingBatcher
    params = llama_init(jax.random.PRNGKey(0), CFG)
    from radialog_tpu.decode.engine import DecodeParams
    dp = DecodeParams(max_new_tokens=6, eos_token_id=1)
    prompts = [[int(x) for x in np.random.default_rng(s).integers(3, 200, 7)]
               for s in range(3)]
    plain = RaDialogServer(params, CFG, lanes=2, cache_len=96, prompt_len=32,
                           dp=dp, steps_per_call=2)
    spec = RaDialogServer(batcher=SpecRingBatcher(
        params, CFG, lanes=2, cache_len=96, prompt_len=32, dp=dp,
        spec_k=3, steps_per_call=1))
    try:
        want = [plain.generate(p) for p in prompts]
        futs = [spec.submit(p) for p in prompts]
        got = [f.result(120) for f in futs]
        assert got == want
    finally:
        plain.shutdown()
        spec.shutdown()
