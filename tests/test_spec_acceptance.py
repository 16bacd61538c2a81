"""tools/spec_acceptance.py — the realistic-text acceptance simulator.

The simulator drives the SHIPPED drafter (decode/speculative.ngram_propose)
under teacher forcing, so what needs pinning is (a) the loop bookkeeping
(emit counting / forwards) against hand-computed transcripts, (b) the
host-side _draft_start mirror against the real drafter, and (c) the
headline claim: prompt-lookup acceptance on realistic correction
transcripts (the reference's batch-1 eval workload, test.py:440-533) is
high, while the no-echo report-generation floor is low.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from spec_acceptance import (_draft_start, make_transcript,  # noqa: E402
                             simulate, tokenize)


def test_echo_transcript_forwards_hand_computed():
    # prompt of 64 distinct tokens; output = a verbatim 30-token slice of
    # it (the pure-echo limit of a correction turn). With all-distinct
    # tokens the only non-tail occurrence of the live trigram is in the
    # prompt, so: 2 warmup iterations (unmatched trigrams straddling the
    # prompt/output boundary emit 1 each), then full k-acceptance,
    # ceil((30-3)/(k+1)) iterations — and zero stale reads, so opt == pess.
    k, m, n = 4, 3, 30
    prompt = np.arange(100, 164, dtype=np.int32)
    output = prompt[5:5 + n].copy()
    expect_iters = 2 + -(-(n - 3) // (k + 1))
    for opt in (True, False):
        r = simulate(prompt, output, k, m, optimistic=opt)
        assert r["iters"] == expect_iters
        assert r["forwards"] == expect_iters + 1
        assert r["stale_reads"] == 0


def test_no_echo_transcript_is_one_token_per_forward():
    # output tokens never occur in the prompt and are all distinct: every
    # draft is rejected, one token per loop iteration
    k, m, n = 4, 3, 12
    prompt = np.arange(100, 140, dtype=np.int32)
    output = np.arange(500, 500 + n, dtype=np.int32)
    r = simulate(prompt, output, k, m, optimistic=False)
    assert r["iters"] == n - 1          # token 0 comes from the prefill
    assert r["forwards"] == n


def test_draft_start_mirror_agrees_with_ngram_propose():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from radialog_tpu.decode.speculative import ngram_propose

    k, m = 4, 3
    rng = np.random.default_rng(7)
    for _ in range(20):
        hl = int(rng.integers(m + 1, 60))
        hist = np.full(72, -1, np.int32)
        hist[:hl] = rng.integers(0, 6, hl)   # tiny vocab -> frequent matches
        got = np.asarray(ngram_propose(jnp.asarray(hist),
                                       jnp.asarray(hl), k=k, m=m))
        start = _draft_start(hist, hl, k, m)
        if start < 0:     # no-match fallback: repeat the last live token
            want = np.full(k, hist[hl - 1])
        else:
            want = np.clip(hist[start:start + k], 0, None)
        np.testing.assert_array_equal(got, want)


def test_realistic_correction_acceptance_high_rg_floor_low():
    # the §7 measurement itself, at test scale: 4 synthesized correction
    # studies (byte-exact correction_prompt turns, realistic report
    # sentences). The corrected output echoes ~7/8 of its sentences from
    # the prompt -> prompt-lookup must land well above 2 accepted
    # tokens/forward even under the pessimistic stale bracket, while the
    # no-echo RG floor stays near 1.
    rng = np.random.default_rng(0)
    vocab = {}
    studies = [make_transcript(rng, vocab) for _ in range(4)]
    k, m = 5, 3

    corr = [simulate(p, y, k, m, optimistic=False) for p, y, _ in studies]
    acc = np.mean([r["out_tokens"] / r["forwards"] for r in corr])
    assert acc > 2.0, f"correction acceptance collapsed: {acc:.2f}/forward"

    sys_ids = tokenize("A chat between a curious user USER: ", vocab)
    rg = [simulate(sys_ids, y, k, m, optimistic=False) for _, _, y in studies]
    acc_rg = np.mean([r["out_tokens"] / r["forwards"] for r in rg])
    assert acc_rg < 2.0, f"no-echo floor suspiciously high: {acc_rg:.2f}"
    assert acc > acc_rg + 1.0
