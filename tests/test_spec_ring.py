"""Batched speculative decoding on the static-slot ring: ragged per-lane
acceptance via validity marks must stay token-identical to plain greedy
(fp32 CPU — no float-associativity argmax flips)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radialog_tpu.decode.continuous import RingBatcher
from radialog_tpu.decode.engine import DecodeParams, generate
from radialog_tpu.decode.spec_ring import SpecRingBatcher
from radialog_tpu.models.llama import TINY_LLAMA, llama_init

CFG = TINY_LLAMA
PARAMS = llama_init(jax.random.PRNGKey(0), CFG)
DP = DecodeParams(max_new_tokens=8, eos_token_id=1)


def _prompt(n, seed):
    return [int(x) for x in np.random.default_rng(seed).integers(3, 200, n)]


def _serial(prompt_ids, max_new=8):
    toks = jnp.asarray(prompt_ids, jnp.int32)[None]
    lens = jnp.asarray([len(prompt_ids)])
    out = generate(PARAMS, CFG, toks, lens,
                   DecodeParams(max_new_tokens=max_new, eos_token_id=1),
                   cache_len=128)
    n = int(out.lengths[0])
    return [int(x) for x in np.asarray(out.tokens)[0, :n]]


def _spec_ring(**kw):
    # ring 64 (multiple of k+1=4) holds the worst case: 8 verifies x 4 slots
    kw.setdefault("lanes", 2)
    kw.setdefault("cache_len", 96)
    kw.setdefault("prompt_len", 32)
    kw.setdefault("dp", DP)
    kw.setdefault("spec_k", 3)
    kw.setdefault("steps_per_call", 2)
    return SpecRingBatcher(PARAMS, CFG, **kw)


class TestSpecRing:
    def test_staggered_sessions_match_serial(self):
        """Three sessions with different prompts/acceptance patterns share
        the speculative verify loop; each matches solo greedy generate."""
        rb = _spec_ring()
        prompts = [_prompt(6, 1), _prompt(9, 2), _prompt(4, 3)]
        sids = [rb.submit(prompts[0])]
        rb.step()
        sids.append(rb.submit(prompts[1]))     # staggered arrival
        sids.append(rb.submit(prompts[2]))     # 2 lanes: queues
        finished = rb.run()
        assert set(finished) == set(sids)
        for sid, prompt in zip(sids, prompts):
            expect = _serial(prompt)
            assert finished[sid].tokens == expect, (
                f"sid {sid}: {finished[sid].tokens} != {expect}")
        assert rb.verifies > 0

    def test_repetitive_prompt_accepts_drafts(self):
        """A prompt whose continuation echoes itself (the prompt-lookup
        sweet spot) must finish in FEWER verify forwards than tokens —
        the whole point of speculation — while staying greedy-exact."""
        base = _prompt(5, 40)
        prompt = base * 4                      # strong n-gram structure
        dp = DecodeParams(max_new_tokens=12, eos_token_id=1)
        rb = SpecRingBatcher(PARAMS, CFG, lanes=1, cache_len=128,
                             prompt_len=32, dp=dp, spec_k=3,
                             steps_per_call=1)
        sid = rb.submit(prompt)
        finished = rb.run()
        got = finished[sid].tokens
        assert got == _serial(prompt, 12)
        emitted = len(got)
        assert rb.verifies < emitted, (rb.verifies, emitted)

    def test_matches_plain_ring_batcher(self):
        """Spec ring == plain ring token-for-token on the same workload."""
        prompts = [_prompt(7, 5), _prompt(5, 6)]
        plain = RingBatcher(PARAMS, CFG, lanes=2, cache_len=96,
                            prompt_len=32, dp=DP, steps_per_call=2)
        spec = _spec_ring()
        out_p = {prompts.index(p): None for p in prompts}
        sp = [plain.submit(p) for p in prompts]
        ss = [spec.submit(p) for p in prompts]
        fp, fs = plain.run(), spec.run()
        for i in range(len(prompts)):
            assert fp[sp[i]].tokens == fs[ss[i]].tokens

    def test_quantized_serving_layout_runs(self):
        """Plumbing: the unrolled int8 serving weights verify through the
        same contiguous scalar-slot window write."""
        from radialog_tpu.ops.quant import quantize_llama_host
        qp = quantize_llama_host(
            jax.tree_util.tree_map(np.asarray, PARAMS))
        rb = SpecRingBatcher(qp, CFG, lanes=2, cache_len=96, prompt_len=32,
                             dp=DP, spec_k=3, steps_per_call=2)
        sids = [rb.submit(_prompt(6, 7)), rb.submit(_prompt(8, 8))]
        finished = rb.run()
        assert set(finished) == set(sids)
        assert all(len(finished[s].tokens) >= 1 for s in sids)
        # first token == the no-spec quantized ring's first token (the
        # prefill path is shared; full-sequence equality on RANDOM weights
        # is not asserted for int8 — ulp-level logit ties flip argmaxes)
        plain = RingBatcher(qp, CFG, lanes=2, cache_len=96, prompt_len=32,
                            dp=DP, steps_per_call=2)
        p0 = plain.submit(_prompt(6, 7))
        assert plain.run()[p0].tokens[0] == finished[sids[0]].tokens[0]

    def test_guards(self):
        with pytest.raises(ValueError, match="two-interval|int8"):
            _spec_ring(kv_int8=True)
        with pytest.raises(ValueError, match="multiple"):
            _spec_ring(cache_len=95)           # ring 63 % 4 != 0
        with pytest.raises(ValueError, match="wrap onto live"):
            _spec_ring(cache_len=48)           # ring 16 < 8 verifies * 4
        rb = _spec_ring()
        with pytest.raises(ValueError, match="verifies"):
            rb.validate_request(8, max_new_tokens=60)
        with pytest.raises(ValueError, match="greedy"):
            _spec_ring(dp=DecodeParams(max_new_tokens=8, eos_token_id=1,
                                       do_sample=True))


def test_pipeline_correction_spec_ring_matches_batch1():
    """The PRODUCTION trigger (round-4 verdict #4b): test.py --corr_spec
    routes the correction pass through generate_texts_ring(spec_k=...) —
    SpecRingBatcher with per-request image embeddings. Must be
    token-identical to the reference-shaped batch-1 generate_texts loop
    (fp32 CPU: associativity cannot flip argmaxes)."""
    from radialog_tpu.apps.pipeline import PipelineConfig, RaDialogPipeline

    pipe = RaDialogPipeline(PipelineConfig(mock=True, max_new_tokens=8))
    cfg = pipe.llama_cfg
    img_run = "<IMG>" * cfg.num_img_tokens
    prompts = [
        "A chat. USER: Image information: " + img_run
        + " Report: there is pneumonia. Please correct it. ASSISTANT:",
        "A chat. USER: Image information: " + img_run
        + " Report: the lungs are clear with no effusion seen today."
        + " Remove effusion. ASSISTANT:",
    ]
    rng = np.random.default_rng(7)
    embs = rng.normal(size=(2, cfg.num_img_tokens,
                            cfg.qformer_dim)).astype(np.float32)
    plain = [pipe.generate_texts([p], img_embs=embs[i:i + 1],
                                 max_new_tokens=8)[0]
             for i, p in enumerate(prompts)]
    spec = pipe.generate_texts_ring(prompts, max_new_tokens=8, lanes=2,
                                    img_embs=embs, spec_k=3)
    assert spec == plain


class TestSpecCompact:
    """SpecCompactBatcher (round-5): fixed scratch window + post-verify
    relocation — plain-decode cache size, composes with the int8 KV cache."""

    def _compact(self, **kw):
        from radialog_tpu.decode.spec_ring import SpecCompactBatcher
        kw.setdefault("lanes", 2)
        kw.setdefault("cache_len", 96)     # 32 prompt + 60 gen + 4 window
        kw.setdefault("prompt_len", 32)
        kw.setdefault("dp", DP)
        kw.setdefault("spec_k", 3)
        kw.setdefault("steps_per_call", 2)
        params = kw.pop("params", PARAMS)
        return SpecCompactBatcher(params, CFG, **kw)

    def test_staggered_sessions_match_serial(self):
        rb = self._compact()
        prompts = [_prompt(6, 1), _prompt(9, 2), _prompt(4, 3)]
        sids = [rb.submit(prompts[0])]
        rb.step()
        sids.append(rb.submit(prompts[1]))
        sids.append(rb.submit(prompts[2]))
        finished = rb.run()
        assert set(finished) == set(sids)
        for sid, prompt in zip(sids, prompts):
            assert finished[sid].tokens == _serial(prompt)
        assert rb.verifies > 0

    def test_matches_plain_ring_batcher(self):
        """bf16 compact == plain RingBatcher tokens, lane for lane."""
        prompts = [_prompt(7, 4), _prompt(5, 5)]
        rb = RingBatcher(PARAMS, CFG, lanes=2, cache_len=96, prompt_len=32,
                         dp=DP, steps_per_call=2)
        for p in prompts:
            rb.submit(p)
        plain = rb.run()
        cp = self._compact()
        sids = [cp.submit(p) for p in prompts]
        got = cp.run()
        plain_by_prompt = sorted((tuple(s.tokens) for s in plain.values()))
        got_by_prompt = sorted((tuple(got[s].tokens) for s in sids))
        assert got_by_prompt == plain_by_prompt

    def test_int8_kv_compact_runs_and_is_draft_invariant(self):
        """THE capability the ring provably lacks: batched speculation over
        the int8 KV cache. Token output must be invariant to the drafter
        (oracle/junk/ngram all reduce to the model's own greedy stream
        given exact verification + exact relocation) — fp32 CPU, identical
        numerics path across runs, so bitwise equality is required."""
        from radialog_tpu.ops.quant import quantize_llama_host
        qp = quantize_llama_host(
            jax.tree_util.tree_map(np.asarray, PARAMS))
        prompts = [_prompt(6, 6), _prompt(9, 7)]

        def junk(hist, hist_len, _k=3):
            return jnp.ones((_k,), jnp.int32)

        outs = []
        for proposer in (None, junk):
            cp = self._compact(params=qp, kv_int8=True, proposer=proposer)
            sids = [cp.submit(p) for p in prompts]
            fin = cp.run()
            outs.append([fin[s].tokens for s in sids])
        assert outs[0] == outs[1], (outs, "drafter changed int8 output")
        assert all(len(t) >= 1 for t in outs[0])

    def test_capacity_guards(self):
        from radialog_tpu.decode.spec_ring import SpecCompactBatcher
        with pytest.raises(ValueError, match="generation region"):
            SpecCompactBatcher(PARAMS, CFG, lanes=1, cache_len=44,
                               prompt_len=32, spec_k=3,
                               dp=DecodeParams(max_new_tokens=16,
                                               eos_token_id=1))
        rb = self._compact()
        with pytest.raises(ValueError, match="exceeds the generation"):
            rb.validate_request(8, max_new_tokens=61)


def test_compact_accepts_configs_the_ring_guard_rejects():
    """Regression (round-5 review): SpecCompactBatcher replaces the
    rotating ring with linear frontiers + a fixed scratch window, so
    RingBatcher's ring-span guard must not apply (_ring_wraps=False). The
    shape below fits the compact geometry (gen_cap=251 >= max_new=250)
    but the inherited guard used to raise 'must exceed a session's ring
    span' (life=256 >= ring_len=256). Constructor-only: the compile-heavy
    paths are pinned elsewhere."""
    from radialog_tpu.decode.spec_ring import SpecCompactBatcher, SpecRingBatcher

    dp = DecodeParams(max_new_tokens=250, eos_token_id=-1)
    b = SpecCompactBatcher(PARAMS, CFG, lanes=2, cache_len=512,
                           prompt_len=256, dp=dp, steps_per_call=16,
                           spec_k=4)
    b.validate_request(8)               # also ring-guard-free
    assert b.gen_cap == 251
    with pytest.raises(ValueError, match="ring"):
        SpecRingBatcher(PARAMS, CFG, lanes=2, cache_len=512,
                        prompt_len=256, dp=dp, steps_per_call=16, spec_k=4)
