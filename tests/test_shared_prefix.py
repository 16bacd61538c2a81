"""Prefix-sharing serving path (decode/engine.py generate_shared_prefix).

RaDialog's report prompts share a literal common token prefix (the system
prompt + instruction boilerplate, data/conversation.py — reference
vicuna_prompts.json). The shared-prefix engine prefills that prefix ONCE and
merges [shared | per-lane] regions in every attention; these tests pin the
contract: token-exact equality with plain generate() on the concatenated
prompts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radialog_tpu.decode.engine import (DecodeParams, generate,
                                        generate_shared_prefix)
from radialog_tpu.models.llama import TINY_LLAMA, llama_init, lora_init
from radialog_tpu.ops.attention import causal_mask_bias, mha, mha_shared_prefix
from radialog_tpu.ops.quant import quantize_llama_host

CFG = TINY_LLAMA
RNG = np.random.default_rng(7)


def _unrolled_params():
    p = llama_init(jax.random.PRNGKey(0), CFG)
    return quantize_llama_host(jax.tree_util.tree_map(np.asarray, p))


def test_mha_shared_prefix_matches_concat():
    b, t, h, d, p0, s1 = 2, 3, 4, 8, 5, 6
    q = jnp.asarray(RNG.normal(size=(b, t, h, d)), jnp.float32)
    k0 = jnp.asarray(RNG.normal(size=(p0, h, d)), jnp.float32)
    v0 = jnp.asarray(RNG.normal(size=(p0, h, d)), jnp.float32)
    k1 = jnp.asarray(RNG.normal(size=(b, s1, h, d)), jnp.float32)
    v1 = jnp.asarray(RNG.normal(size=(b, s1, h, d)), jnp.float32)
    bias1 = causal_mask_bias(t, s1, offset=s1 - t)
    got = mha_shared_prefix(q, k0, v0, k1, v1, bias1=bias1)
    # reference: one softmax over the concatenated KV, prefix unmasked
    k_cat = jnp.concatenate([jnp.broadcast_to(k0, (b, p0, h, d)), k1], axis=1)
    v_cat = jnp.concatenate([jnp.broadcast_to(v0, (b, p0, h, d)), v1], axis=1)
    bias_cat = jnp.concatenate(
        [jnp.zeros((1, 1, t, p0)), jnp.broadcast_to(bias1, (1, 1, t, s1))],
        axis=-1)
    want = mha(q, k_cat, v_cat, bias=bias_cat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _concat_prompts(prefix, remainders, rem_lens):
    """Right-padded (B, P0+T1) concatenated prompts + their true lengths."""
    b, t1 = remainders.shape
    p0 = prefix.shape[0]
    full = np.zeros((b, p0 + t1), np.int64)
    for i in range(b):
        full[i, :p0] = prefix
        full[i, p0:p0 + rem_lens[i]] = remainders[i, :rem_lens[i]]
    return jnp.asarray(full), jnp.asarray([p0 + int(n) for n in rem_lens])


def test_shared_prefix_tokens_exact():
    # deliberately NOT slow-marked: this is the only default-CI test that
    # traces the full shared-prefix prefill+decode over unrolled params —
    # the round-4 pre-split regression (KVCache being a NamedTuple
    # shadowing the per-layer tuple form, llama.py) was only reachable
    # through this path
    qp = _unrolled_params()
    prefix = RNG.integers(3, 200, size=(6,))
    rems = RNG.integers(3, 200, size=(3, 5))
    rem_lens = [5, 3, 4]
    for i, n in enumerate(rem_lens):
        rems[i, n:] = 0
    dp = DecodeParams(max_new_tokens=6, eos_token_id=1)
    full, full_lens = _concat_prompts(prefix, rems, rem_lens)
    ref = generate(qp, CFG, full, full_lens, dp, cache_len=32)
    got = generate_shared_prefix(qp, CFG, jnp.asarray(prefix),
                                 jnp.asarray(rems), jnp.asarray(rem_lens),
                                 dp, cache_len=32)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(got.lengths))


@pytest.mark.slow
def test_shared_prefix_with_image_splice():
    """The <IMG> run lives in the per-request remainder."""
    qp = _unrolled_params()
    n_img = CFG.num_img_tokens
    prefix = RNG.integers(3, 200, size=(4,))
    t1 = n_img + 4
    rems = np.full((2, t1), 5, np.int64)
    rems[:, 1:1 + n_img] = CFG.img_token_id
    rem_lens = [t1, t1]
    embs = jnp.asarray(RNG.normal(size=(2, n_img, CFG.qformer_dim)),
                       jnp.float32)
    lora = lora_init(jax.random.PRNGKey(1), CFG)  # carries img_proj_layer
    dp = DecodeParams(max_new_tokens=5, eos_token_id=1)
    full, full_lens = _concat_prompts(prefix, rems, rem_lens)
    ref = generate(qp, CFG, full, full_lens, dp, img_embs=embs, lora=lora,
                   cache_len=32)
    got = generate_shared_prefix(qp, CFG, jnp.asarray(prefix),
                                 jnp.asarray(rems), jnp.asarray(rem_lens),
                                 dp, img_embs=embs, lora=lora, cache_len=32)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(got.tokens))


@pytest.mark.slow
def test_shared_prefix_with_image_in_prefix():
    """When every lane shows the SAME image (the 14-questions-per-study QA
    passes), the <IMG> run moves INTO the shared prefix
    (prefix_img_embs) — token-exact vs plain generate over the
    concatenated prompts with per-lane copies of the same embeddings."""
    qp = _unrolled_params()
    n_img = CFG.num_img_tokens
    # prefix: boilerplate + <IMG> run + shared history tail
    prefix = np.full((3 + n_img + 4,), 9, np.int64)
    prefix[3:3 + n_img] = CFG.img_token_id
    rems = RNG.integers(3, 200, size=(2, 5))
    rem_lens = [5, 3]
    rems[1, 3:] = 0
    emb1 = jnp.asarray(RNG.normal(size=(1, n_img, CFG.qformer_dim)),
                       jnp.float32)
    lora = lora_init(jax.random.PRNGKey(1), CFG)
    dp = DecodeParams(max_new_tokens=5, eos_token_id=1)
    full, full_lens = _concat_prompts(prefix, rems, rem_lens)
    ref = generate(qp, CFG, full, full_lens, dp,
                   img_embs=jnp.tile(emb1, (2, 1, 1)), lora=lora,
                   cache_len=32)
    got = generate_shared_prefix(qp, CFG, jnp.asarray(prefix),
                                 jnp.asarray(rems), jnp.asarray(rem_lens),
                                 dp, lora=lora, cache_len=24,
                                 prefix_img_embs=emb1)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(got.tokens))


@pytest.mark.slow
def test_pipeline_qa_batch_shares_image_in_prefix():
    """Pipeline auto-detection: a batch whose rows carry IDENTICAL image
    embeddings (binary-QA: 14 questions about one study) shares the whole
    conversation history INCLUDING the <IMG> run; output text equals the
    plain path. Rows with different embeddings must still cap at <IMG>."""
    import dataclasses
    from radialog_tpu.apps.pipeline import PipelineConfig, RaDialogPipeline
    pipe = RaDialogPipeline(PipelineConfig(mock=True, quantize=True,
                                           bf16=False, kv_int8=False,
                                           max_new_tokens=4))
    n_img = pipe.llama_cfg.num_img_tokens
    img_run = "<IMG>" * n_img
    boiler = " ".join(f"w{i}" for i in range(12))
    hist = "findings include effusion and edema ."
    prompts = [f"{boiler} {img_run} {hist} Is there any Atelectasis? ASSISTANT:",
               f"{boiler} {img_run} {hist} Is there any Edema? ASSISTANT:",
               f"{boiler} {img_run} {hist} Is there any Pneumonia? ASSISTANT:"]
    ids = [pipe.tokenizer(p)["input_ids"] for p in prompts]
    one = RNG.normal(size=(1, n_img, pipe.llama_cfg.qformer_dim))
    same = jnp.asarray(np.repeat(one, 3, axis=0), jnp.float32)
    p0, img_in_prefix = pipe._shared_prefix_len(ids, same)
    img_id = pipe.llama_cfg.img_token_id
    assert img_in_prefix and p0 >= ids[0].index(img_id) + n_img
    with_shared = pipe.generate_texts(prompts, img_embs=same)
    pipe.cfg = dataclasses.replace(pipe.cfg, shared_prefix=False)
    plain = pipe.generate_texts(prompts, img_embs=same)
    assert with_shared == plain


@pytest.mark.slow
def test_pipeline_shared_prefix_matches_plain():
    """The serving pipeline auto-splits the batch's common prompt prefix
    (apps/pipeline.py _shared_prefix_len) with identical output text.

    kv_int8 is pinned OFF here: bitwise equality between the shared and
    plain paths is only a sound invariant for the bf16 cache (its rounding
    absorbs the ulp-level differences between the batch-1 prefix forward
    and the batched full-prompt forward; int8 quantization can amplify a
    1-ulp f32 delta into a +-1 int8 step, whose argmax effect on a tiny
    random model flips with the CPU thread-pool's reduction partitioning —
    observed only when other tests' threads were alive). The int8
    composition is covered by the engine-level tests above and the
    plumbing smoke below; its real-model quality bound is the 0.048 sigma
    teacher-forced budget (tools/measure_kv_logit_err.py)."""
    import dataclasses
    from radialog_tpu.apps.pipeline import (PipelineConfig, RaDialogPipeline,
                                            SHARED_PREFIX_MIN)
    cfg = PipelineConfig(mock=True, quantize=True, bf16=False,
                         kv_int8=False, max_new_tokens=6)
    pipe = RaDialogPipeline(cfg)
    boiler = " ".join(f"word{i}" for i in range(SHARED_PREFIX_MIN + 4))
    prompts = [f"{boiler} patient one has effusion ASSISTANT:",
               f"{boiler} patient two no findings at all ASSISTANT:",
               f"{boiler} third subject ASSISTANT:"]
    ids = [pipe.tokenizer(p)["input_ids"] for p in prompts]
    assert pipe._shared_prefix_len(ids, None)[0] >= SHARED_PREFIX_MIN
    with_shared = pipe.generate_texts(prompts)
    pipe.cfg = dataclasses.replace(cfg, shared_prefix=False)
    plain = pipe.generate_texts(prompts)
    assert with_shared == plain


@pytest.mark.slow
def test_pipeline_prefix_capped_before_img_run():
    """<IMG> token ids are batch-identical but their K/V is per-request —
    the prefix split must stop before the first <IMG>. (kv_int8 pinned off
    for the exact-equality comparison — see the previous test.)"""
    from radialog_tpu.apps.pipeline import PipelineConfig, RaDialogPipeline
    pipe = RaDialogPipeline(PipelineConfig(mock=True, quantize=True,
                                           bf16=False, kv_int8=False,
                                           max_new_tokens=4))
    n_img = pipe.llama_cfg.num_img_tokens
    img_run = "<IMG>" * n_img
    boiler = " ".join(f"w{i}" for i in range(30))
    prompts = [f"{boiler} {img_run} findings: effusion ASSISTANT:",
               f"{boiler} {img_run} findings: none ASSISTANT:"]
    ids = [pipe.tokenizer(p)["input_ids"] for p in prompts]
    embs = jnp.asarray(RNG.normal(size=(2, n_img, pipe.llama_cfg.qformer_dim)),
                       jnp.float32)
    p0, img_in_prefix = pipe._shared_prefix_len(ids, embs)
    img_id = pipe.llama_cfg.img_token_id
    assert p0 <= ids[0].index(img_id) and not img_in_prefix
    with_shared = pipe.generate_texts(prompts, img_embs=embs)
    import dataclasses
    pipe.cfg = dataclasses.replace(pipe.cfg, shared_prefix=False)
    plain = pipe.generate_texts(prompts, img_embs=embs)
    assert with_shared == plain


def test_pipeline_shared_prefix_int8_plumbing():
    """The serving DEFAULT (quantize -> kv_int8 on) routes batched prompts
    through generate_shared_prefix with the int8 cache — smoke the pipeline
    plumbing end to end (numerics of the int8 composition are covered at
    the engine level: test_kv_int8.py shared-prefix tests)."""
    from radialog_tpu.apps.pipeline import (PipelineConfig, RaDialogPipeline,
                                            SHARED_PREFIX_MIN)
    pipe = RaDialogPipeline(PipelineConfig(mock=True, quantize=True,
                                           bf16=False, max_new_tokens=4))
    assert pipe.cfg.use_kv_int8()
    boiler = " ".join(f"word{i}" for i in range(SHARED_PREFIX_MIN + 4))
    prompts = [f"{boiler} patient one ASSISTANT:",
               f"{boiler} patient two ASSISTANT:"]
    ids = [pipe.tokenizer(p)["input_ids"] for p in prompts]
    assert pipe._shared_prefix_len(ids, None)[0] >= SHARED_PREFIX_MIN
    out = pipe.generate_texts(prompts)
    assert len(out) == 2 and all(o.startswith(boiler) for o in out)


def test_shared_prefix_rejects_stacked_layout():
    p = llama_init(jax.random.PRNGKey(0), CFG)
    with pytest.raises(ValueError, match="unrolled"):
        generate_shared_prefix(p, CFG, jnp.arange(4), jnp.ones((1, 3), jnp.int32),
                               jnp.asarray([3]), DecodeParams(max_new_tokens=2))


def test_shared_prefix_int8_pre_split_traces():
    """kv_int8 shared decode threads the PRE-SPLIT 4-tuple prefix entries
    (decode/engine.py round-4) — this traces that exact branch in the
    default CI run (token equality for int8 stays in the slow/ulp-caveat
    tests; the r4 regression was a trace-time unpack error)."""
    qp = _unrolled_params()
    prefix = RNG.integers(3, 200, size=(6,))
    rems = RNG.integers(3, 200, size=(2, 5))
    rem_lens = [5, 4]
    dp = DecodeParams(max_new_tokens=4, eos_token_id=1)
    got = generate_shared_prefix(qp, CFG, jnp.asarray(prefix),
                                 jnp.asarray(rems), jnp.asarray(rem_lens),
                                 dp, cache_len=32, kv_int8=True)
    assert np.asarray(got.tokens).shape == (2, 4)
    assert (np.asarray(got.lengths) >= 1).all()
