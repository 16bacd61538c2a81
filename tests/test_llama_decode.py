import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radialog_tpu.decode.engine import DecodeParams, generate, prefill
from radialog_tpu.models.llama import (TINY_LLAMA, find_img_start, llama_apply,
                                       llama_init, lora_init, prefill_bias,
                                       splice_image_embeddings)

CFG = TINY_LLAMA
K = jax.random.PRNGKey(0)
RNG = np.random.default_rng(0)


def _params():
    return llama_init(K, CFG)


def _naive_logits(params, tokens, lengths, img_embs=None, lora=None):
    t = tokens.shape[1]
    positions = jnp.arange(t)[None, :].repeat(tokens.shape[0], 0)
    bias = prefill_bias(lengths, t)
    img_start = find_img_start(tokens, CFG.img_token_id) if img_embs is not None else None
    logits, _ = llama_apply(params, CFG, tokens, positions, bias,
                            img_embs=img_embs, img_start=img_start, lora=lora)
    return logits


def test_causality():
    p = _params()
    toks = jnp.asarray(RNG.integers(3, 200, size=(1, 8)))
    lens = jnp.asarray([8])
    l1 = _naive_logits(p, toks, lens)
    toks2 = toks.at[0, -1].set(7)
    l2 = _naive_logits(p, toks2, lens)
    np.testing.assert_allclose(np.asarray(l1[:, :-1]), np.asarray(l2[:, :-1]), atol=1e-4)


def test_right_padding_invariance():
    p = _params()
    base = RNG.integers(3, 200, size=(1, 6))
    toks_a = jnp.asarray(np.pad(base, ((0, 0), (0, 2))))          # pad 2
    toks_b = jnp.asarray(np.pad(base, ((0, 0), (0, 5))))          # pad 5
    lens = jnp.asarray([6])
    la = _naive_logits(p, toks_a, lens)[:, :6]
    lb = _naive_logits(p, toks_b, lens)[:, :6]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-4)


def test_image_splice():
    p = _params()
    n_img = CFG.num_img_tokens
    toks = np.full((1, 10), 5, np.int64)
    toks[0, 2:2 + n_img] = CFG.img_token_id
    toks = jnp.asarray(toks)
    embs = jnp.asarray(RNG.normal(size=(1, n_img, CFG.qformer_dim)), jnp.float32)
    lora = lora_init(jax.random.PRNGKey(1), CFG)
    l_with = _naive_logits(p, toks, jnp.asarray([10]), img_embs=embs, lora=lora)
    # different image embeddings change logits after the splice point
    embs2 = embs + 1.0
    l_with2 = _naive_logits(p, toks, jnp.asarray([10]), img_embs=embs2, lora=lora)
    assert not np.allclose(np.asarray(l_with[:, -1]), np.asarray(l_with2[:, -1]))
    # positions before the image run are unaffected (causality)
    np.testing.assert_allclose(np.asarray(l_with[:, :2]), np.asarray(l_with2[:, :2]),
                               atol=1e-4)


def test_splice_helper_exact():
    emb = jnp.zeros((2, 6, 4))
    img = jnp.ones((2, 2, 4))
    start = jnp.asarray([1, -1])
    out = np.asarray(splice_image_embeddings(emb, img, start))
    assert out[0, 1:3].sum() == 8 and out[0, 0].sum() == 0 and out[0, 3:].sum() == 0
    assert out[1].sum() == 0  # start=-1 leaves untouched


def test_lora_zero_b_is_identity():
    p = _params()
    lora = lora_init(jax.random.PRNGKey(3), CFG)
    toks = jnp.asarray(RNG.integers(3, 200, size=(2, 7)))
    lens = jnp.asarray([7, 7])
    l0 = _naive_logits(p, toks, lens)
    l1 = _naive_logits(p, toks, lens, lora=lora)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-5)


@pytest.mark.slow  # ~16s (6 growing-shape forward compiles); greedy decode
# correctness is pinned fast AND more strongly by test_reference_parity.py's
# token-exact comparison against the reference's own LlamaForCausalLM
def test_decode_matches_naive_rollout():
    """Cached greedy decode == repeated full forward argmax."""
    p = _params()
    prompt = RNG.integers(3, 200, size=(2, 5))
    prompt[1, 4] = 0  # second sequence shorter (right-padded)
    lens = jnp.asarray([5, 4])
    toks = jnp.asarray(prompt)
    dp = DecodeParams(max_new_tokens=6, eos_token_id=1)  # eos unlikely to fire

    res = generate(p, CFG, toks, lens, dp, cache_len=32)

    # naive rollout without cache
    seqs = [list(prompt[0][:5]), list(prompt[1][:4])]
    for step in range(6):
        cur_len = max(len(s) for s in seqs)
        arr = np.zeros((2, cur_len), np.int64)
        ls = []
        for i, s in enumerate(seqs):
            arr[i, :len(s)] = s
            ls.append(len(s))
        logits = _naive_logits(p, jnp.asarray(arr), jnp.asarray(ls))
        for i, s in enumerate(seqs):
            nxt = int(np.argmax(np.asarray(logits)[i, ls[i] - 1]))
            s.append(nxt)
    gen_naive = [s[5:] for s in [seqs[0]]] + [[t for t in seqs[1][4:]]]
    got = np.asarray(res.tokens)
    np.testing.assert_array_equal(got[0, :6], gen_naive[0])
    np.testing.assert_array_equal(got[1, :6], gen_naive[1])


def test_decode_unroll_token_identical():
    """dp.unroll=2 (two forwards per while trip, amortizing the fixed loop
    overhead) must be bitwise token-identical to unroll=1 — max_new=8 makes
    the last trip (step 6) run one PHANTOM sub-step whose output write must
    be dropped, covering the overrun path."""
    p = _params()
    prompt = RNG.integers(3, 200, size=(3, 5))
    lens = jnp.asarray([5, 5, 4])
    toks = jnp.asarray(prompt)
    ref = generate(p, CFG, toks, lens,
                   DecodeParams(max_new_tokens=8, eos_token_id=1),
                   cache_len=32)
    got = generate(p, CFG, toks, lens,
                   DecodeParams(max_new_tokens=8, eos_token_id=1, unroll=2),
                   cache_len=32)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths),
                                  np.asarray(ref.lengths))


@pytest.mark.slow  # 3 more while_loop compiles (~25s) beyond the fast check
def test_decode_unroll3_and_eos_token_identical():
    """unroll=3 (a trip with TWO phantom sub-steps at max_new=8) and EOS
    early exit under unroll=2 — both bitwise identical to unroll=1."""
    p = _params()
    prompt = RNG.integers(3, 200, size=(3, 5))
    lens = jnp.asarray([5, 5, 4])
    toks = jnp.asarray(prompt)
    ref = generate(p, CFG, toks, lens,
                   DecodeParams(max_new_tokens=8, eos_token_id=1),
                   cache_len=32)
    got = generate(p, CFG, toks, lens,
                   DecodeParams(max_new_tokens=8, eos_token_id=1, unroll=3),
                   cache_len=32)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(ref.tokens))
    # EOS early exit: make sequence 0's first greedy token the eos id
    first = int(np.asarray(ref.tokens)[0, 0])
    ref_e = generate(p, CFG, toks, lens,
                     DecodeParams(max_new_tokens=8, eos_token_id=first),
                     cache_len=32)
    got_e = generate(p, CFG, toks, lens,
                     DecodeParams(max_new_tokens=8, eos_token_id=first,
                                  unroll=2), cache_len=32)
    np.testing.assert_array_equal(np.asarray(got_e.tokens),
                                  np.asarray(ref_e.tokens))
    np.testing.assert_array_equal(np.asarray(got_e.lengths),
                                  np.asarray(ref_e.lengths))


def test_decode_eos_early_exit():
    p = _params()
    toks = jnp.asarray(RNG.integers(3, 200, size=(1, 4)))
    lens = jnp.asarray([4])
    # pick eos == whatever greedy produces first => length 1
    r0 = generate(p, CFG, toks, lens, DecodeParams(max_new_tokens=4, eos_token_id=1),
                  cache_len=16)
    first = int(np.asarray(r0.tokens)[0, 0])
    r1 = generate(p, CFG, toks, lens,
                  DecodeParams(max_new_tokens=4, eos_token_id=first), cache_len=16)
    assert int(r1.lengths[0]) == 1
    assert (np.asarray(r1.tokens)[0, 1:] == first).all()  # eos-padded


@pytest.mark.slow
def test_sampling_filters():
    """top-k / top-p (nucleus) sampling: degenerate filters reduce to
    greedy, a fixed seed reproduces, and the filters never select a token
    outside the allowed set."""
    from radialog_tpu.decode.engine import _select_token
    p = _params()
    toks = jnp.asarray(RNG.integers(3, 200, size=(2, 6)))
    lens = jnp.asarray([6, 4])
    greedy = generate(p, CFG, toks, lens,
                      DecodeParams(max_new_tokens=5, eos_token_id=-1),
                      cache_len=16)
    # top_k=1 and a vanishing nucleus are greedy regardless of temperature
    for dp in (DecodeParams(max_new_tokens=5, eos_token_id=-1,
                            do_sample=True, top_k=1, temperature=3.0),
               DecodeParams(max_new_tokens=5, eos_token_id=-1,
                            do_sample=True, top_p=1e-6, temperature=3.0)):
        r = generate(p, CFG, toks, lens, dp, cache_len=16)
        np.testing.assert_array_equal(np.asarray(r.tokens),
                                      np.asarray(greedy.tokens))
    # seed determinism + seed sensitivity of the sampled path
    dp_a = DecodeParams(max_new_tokens=8, eos_token_id=-1, do_sample=True,
                        temperature=1.5, top_p=0.9, top_k=50, seed=7)
    r1 = generate(p, CFG, toks, lens, dp_a, cache_len=24)
    r2 = generate(p, CFG, toks, lens, dp_a, cache_len=24)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))
    # membership: every sampled token must survive the filter applied to
    # the same logits (checked directly on _select_token)
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(RNG.normal(size=(4, CFG.vocab_size)) * 3,
                         jnp.float32)
    dp_k = DecodeParams(do_sample=True, top_k=5)
    for s in range(10):
        tok = _select_token(logits, dp_k, jax.random.fold_in(key, s))
        topk = jax.lax.top_k(logits, 5)[1]
        assert all(int(tok[i]) in np.asarray(topk[i]) for i in range(4))
    dp_p = DecodeParams(do_sample=True, top_p=0.5)
    probs = jax.nn.softmax(logits, -1)
    order = jnp.argsort(-probs, axis=-1)
    cum = jnp.cumsum(jnp.take_along_axis(probs, order, -1), -1)
    n_keep = (jnp.sum((cum - jnp.take_along_axis(probs, order, -1)) < 0.5,
                      -1))
    for s in range(10):
        tok = _select_token(logits, dp_p, jax.random.fold_in(key, 100 + s))
        for i in range(4):
            allowed = np.asarray(order[i, :int(n_keep[i])])
            assert int(tok[i]) in allowed


@pytest.mark.slow
def test_two_phase_matches_fused_generate():
    """generate_two_phase (separate prefill/decode executables, donated
    cache — the serving configuration, see decode/engine.py) must produce
    the exact tokens of the single-trace generate() on every cache layout."""
    from radialog_tpu.decode.engine import generate_two_phase
    from radialog_tpu.ops.quant import quantize_llama_host

    params = _params()
    qp = quantize_llama_host(jax.tree_util.tree_map(np.asarray, params))
    toks = jnp.asarray(RNG.integers(3, 200, (2, 8)))
    lens = jnp.asarray([8, 5])
    dp = DecodeParams(max_new_tokens=5, eos_token_id=1)
    for p, kv8 in ((params, False), (qp, False), (qp, True)):
        ref = generate(p, CFG, toks, lens, dp, cache_len=32, kv_int8=kv8)
        got = generate_two_phase(p, CFG, toks, lens, dp, cache_len=32,
                                 kv_int8=kv8)
        np.testing.assert_array_equal(np.asarray(ref.tokens),
                                      np.asarray(got.tokens))
        np.testing.assert_array_equal(np.asarray(ref.lengths),
                                      np.asarray(got.lengths))


def test_default_cache_len_has_unroll_headroom():
    """Regression (round-5 review): generate with the serving-default
    unroll=3 and the DEFAULT cache_len must work when t + max_new lands
    exactly on a bucket boundary — decode_loop's phantom-sub-step check
    needs prompt_pad + max_new + unroll - 2 <= cache_len, and the old
    default bucket_length(t + max_new) provided zero headroom (e.g.
    test.py --max_new_tokens 256 with a prompt padding to 128 raised
    'cache too small for unroll 3'). engine.default_cache_len adds the
    max(0, unroll-2) term; tokens must stay identical to unroll=1."""
    from radialog_tpu.decode.engine import bucket_length, default_cache_len

    params = _params()
    t = 24
    toks = jnp.asarray(RNG.integers(3, 200, (2, t)))
    lens = jnp.full((2,), t)
    mn = bucket_length(t + 40) - t          # t + mn == a bucket boundary
    assert bucket_length(t + mn) == t + mn
    dp3 = DecodeParams(max_new_tokens=mn, eos_token_id=-1, unroll=3)
    assert default_cache_len(t, dp3) > t + mn
    got = generate(params, CFG, toks, lens, dp3)        # default cache_len
    ref = generate(params, CFG, toks, lens,
                   DecodeParams(max_new_tokens=mn, eos_token_id=-1))
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(ref.tokens))
