"""Numerical parity vs the reference's CUSTOM model classes.

Round-1 parity evidence stopped at stock HF classes (test_hf_parity.py); the
components where divergence would silently destroy F1 parity are the
reference's *patched* classes. These tests import the actual reference code
from /root/reference (via tests/reference_shims.py), seed tiny/real-shaped
models, convert their state dicts with utils/hf_weights, and assert the JAX
forward matches torch:

  (a) modeling_llama_imgemb.LlamaForCausalLM — <IMG> splice + left-padding
      position scheme (split_at_img :498-520, splice :571-594,
      prepare_inputs_for_generation :795-836) vs the right-padded JAX engine;
  (b) Qformer.BertLMHeadModel — query/multimodal/LM passes incl. the
      query-FFN split (:402-474), UniLM mask (:713-802) and query-KV-cache
      reuse between the image pass and the LM pass;
  (c) biovil_t ImageModel — ResNet-50 trunk + missing-prior branch + the
      ViT pooler (prior-image branch) + the channel-major reshape quirk
      (encoder.py:110-136, blip2_qformer.py:96);
  (d) findings_classifier.ChexpertClassifier (chexpert_model.py:7-21).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

import reference_shims as rs

pytestmark = pytest.mark.skipif(
    not os.path.isdir(rs.REFERENCE_ROOT), reason="reference repo not present")

ATOL = 2e-4
RTOL = 1e-3


def _nhwc(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 1))


# ---------------------------------------------------------------- (c) biovil
@pytest.fixture(scope="module")
def ref_biovil():
    ref_model, ref_types = rs.load_ref_biovil()
    torch.manual_seed(7)
    # MultiImageModel: same weights as ImageModel, forward also accepts
    # previous_image (model.py:117-131)
    m = ref_model.MultiImageModel(
        img_encoder_type=ref_types.ImageEncoderType.RESNET50_MULTI_IMAGE,
        joint_feature_size=32, pretrained_model_path=None)
    # one train-mode pass so BatchNorm running stats are non-trivial —
    # otherwise the parity test would not notice a broken BN conversion
    with torch.no_grad():
        m.train()
        m.encoder(torch.rand(2, 3, 448, 448), return_patch_embeddings=True)
    m.eval()
    from radialog_tpu.utils.hf_weights import convert_biovil_t
    params, state = convert_biovil_t(m.state_dict())
    return m, params, state


def test_biovil_t_single_image_parity(ref_biovil):
    """The only branch RaDialog exercises (SURVEY §7 quirk 2): diff features
    are the broadcast missing_previous_emb."""
    from radialog_tpu.models.biovil_t import biovil_t_apply, patch_tokens_for_qformer

    m, params, state = ref_biovil
    torch.manual_seed(0)
    x = torch.rand(2, 3, 448, 448)
    with torch.no_grad():
        ref = m(x)
    got, _ = biovil_t_apply(params, state, _nhwc(x))

    np.testing.assert_allclose(np.asarray(got.img_embedding),
                               ref.img_embedding.detach().numpy(), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(
        np.asarray(got.projected_patch_embeddings).transpose(0, 3, 1, 2),
        ref.projected_patch_embeddings.detach().numpy(), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(got.projected_global_embedding),
                               ref.projected_global_embedding.detach().numpy(),
                               atol=ATOL, rtol=RTOL)

    # channel-major reshape quirk: the Q-Former sees reshape(B, -1, C) of the
    # NCHW tensor (blip2_qformer.py:96), NOT a (B, HW, C) transpose
    ref_tokens = ref.projected_patch_embeddings.reshape(2, -1, 32).detach().numpy()
    got_tokens = np.asarray(patch_tokens_for_qformer(got.projected_patch_embeddings))
    np.testing.assert_allclose(got_tokens, ref_tokens, atol=ATOL, rtol=RTOL)


@pytest.mark.slow
def test_biovil_t_prior_image_pooler_parity(ref_biovil):
    """Prior-image branch: exercises VisionTransformerPooler (sine pos-emb +
    type-emb added to Q/K each block, transformer.py:73-224) — dead code in
    RaDialog's pipelines but part of BioViL-T's API surface."""
    from radialog_tpu.models.biovil_t import biovil_t_apply

    m, params, state = ref_biovil
    torch.manual_seed(1)
    cur, prev = torch.rand(2, 3, 448, 448), torch.rand(2, 3, 448, 448)
    with torch.no_grad():
        ref = m(cur, previous_image=prev)
    got, _ = biovil_t_apply(params, state, _nhwc(cur), previous=_nhwc(prev))
    np.testing.assert_allclose(
        np.asarray(got.projected_patch_embeddings).transpose(0, 3, 1, 2),
        ref.projected_patch_embeddings.detach().numpy(), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(got.img_embedding),
                               ref.img_embedding.detach().numpy(), atol=ATOL, rtol=RTOL)


# -------------------------------------------------------------- (d) chexpert
@pytest.mark.slow
def test_chexpert_classifier_parity():
    from radialog_tpu.models.chexpert import chexpert_classifier_apply
    from radialog_tpu.utils.hf_weights import convert_chexpert_classifier

    ref_cls = rs.load_ref_chexpert()
    torch.manual_seed(11)
    m = ref_cls.ChexpertClassifier(14)
    with torch.no_grad():
        m.train()
        m.biovil_encoder.encoder(torch.rand(2, 3, 488, 488),
                                 return_patch_embeddings=True)
    m.eval()
    # the converter speaks the Lightning checkpoint naming
    # (chexpert_train.py: self.model = ChexpertClassifier)
    sd = {f"model.{k}": v for k, v in m.state_dict().items()}
    params, state = convert_chexpert_classifier(sd)

    torch.manual_seed(2)
    x = torch.rand(2, 3, 488, 488)   # 488 crop is load-bearing (quirk 3)
    with torch.no_grad():
        ref = m(x).detach().numpy()
    got, _ = chexpert_classifier_apply(params, state, _nhwc(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=ATOL, rtol=RTOL)


# --------------------------------------------------------------- (b) qformer
@pytest.fixture(scope="module")
def ref_qformer():
    Q = rs.load_ref_qformer()
    from transformers.models.bert.configuration_bert import BertConfig as HFBertConfig

    hc = HFBertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=4,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=64,
                      attn_implementation="eager")
    # init_Qformer contract (blip2.py:48-62)
    hc.encoder_width = 48
    hc.add_cross_attention = True
    hc.cross_attention_freq = 2
    hc.query_length = 8
    torch.manual_seed(3)
    qm = Q.BertLMHeadModel(hc).eval()
    qt = torch.empty(1, 8, 32).normal_(std=0.02)

    from radialog_tpu.models.bert import BertConfig
    from radialog_tpu.models.qformer import QFormerConfig
    from radialog_tpu.utils.hf_weights import convert_qformer

    cfg = QFormerConfig(
        bert=BertConfig(vocab_size=128, hidden_size=32, num_layers=4,
                        num_heads=4, intermediate_size=64, max_position=64),
        num_query_tokens=8, encoder_width=48)
    sd = {f"Qformer.{k}": v for k, v in qm.state_dict().items()}
    sd["query_tokens"] = qt
    params = convert_qformer(sd, num_layers=4)
    return qm, qt, params, cfg


def _qformer_inputs():
    rng = np.random.default_rng(5)
    img = rng.normal(size=(2, 10, 48)).astype(np.float32)
    ids = rng.integers(1, 128, (2, 6)).astype(np.int64)
    mask = np.ones((2, 6), np.int64)
    mask[1, 4:] = 0
    return img, ids, mask


def test_qformer_image_grounded_parity(ref_qformer):
    """Query pass with cross-attention (blip2_qformer.py:106-112)."""
    from radialog_tpu.models.qformer import qformer_image_grounded

    qm, qt, params, cfg = ref_qformer
    img, _, _ = _qformer_inputs()
    with torch.no_grad():
        ref = qm.bert(query_embeds=qt.expand(2, -1, -1),
                      encoder_hidden_states=torch.tensor(img),
                      encoder_attention_mask=torch.ones(2, 10, dtype=torch.long),
                      use_cache=True, return_dict=True)
    got, _ = qformer_image_grounded(params, cfg, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got),
                               ref.last_hidden_state.numpy(),
                               atol=ATOL, rtol=RTOL)


def test_qformer_multimodal_parity(ref_qformer):
    """[queries; text] ITM-style pass (blip2_qformer.py:353-364): queries get
    cross-attention + query FFN, text gets the text FFN, self-attention is
    bidirectional over the concatenation."""
    from radialog_tpu.models.qformer import qformer_multimodal

    qm, qt, params, cfg = ref_qformer
    img, ids, mask = _qformer_inputs()
    attn = np.concatenate([np.ones((2, 8), np.int64), mask], axis=1)
    with torch.no_grad():
        ref = qm.bert(torch.tensor(ids),
                      attention_mask=torch.tensor(attn),
                      query_embeds=qt.expand(2, -1, -1),
                      encoder_hidden_states=torch.tensor(img),
                      encoder_attention_mask=torch.ones(2, 10, dtype=torch.long),
                      return_dict=True).last_hidden_state.numpy()
    got = np.asarray(qformer_multimodal(params, cfg, jnp.asarray(ids.astype(np.int32)),
                                        jnp.asarray(attn.astype(np.int32)),
                                        jnp.asarray(img)))
    # masked text positions are unconstrained; compare queries + valid text
    np.testing.assert_allclose(got[:, :8], ref[:, :8], atol=ATOL, rtol=RTOL)
    valid = attn[:, 8:].astype(bool)
    np.testing.assert_allclose(got[:, 8:][valid], ref[:, 8:][valid],
                               atol=ATOL, rtol=RTOL)


def test_qformer_lm_with_query_cache_parity(ref_qformer):
    """The UniLM trap (SURVEY §7): causal LM over text with the query K/V
    cached from the image pass (blip2_qformer.py:383-391 past_key_values
    reuse; Qformer.py:713-802 extended mask)."""
    from radialog_tpu.models.qformer import (qformer_image_grounded, qformer_lm)

    qm, qt, params, cfg = ref_qformer
    img, ids, mask = _qformer_inputs()
    attn = np.concatenate([np.ones((2, 8), np.int64), mask], axis=1)
    with torch.no_grad():
        qout = qm.bert(query_embeds=qt.expand(2, -1, -1),
                       encoder_hidden_states=torch.tensor(img),
                       encoder_attention_mask=torch.ones(2, 10, dtype=torch.long),
                       use_cache=True, return_dict=True)
        ref = qm(torch.tensor(ids), attention_mask=torch.tensor(attn),
                 past_key_values=qout.past_key_values,
                 return_dict=True).logits.numpy()

    _, cache = qformer_image_grounded(params, cfg, jnp.asarray(img), use_cache=True)
    got = np.asarray(qformer_lm(params, cfg, jnp.asarray(ids.astype(np.int32)),
                                jnp.asarray(attn.astype(np.int32)), cache))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], atol=2 * ATOL, rtol=RTOL)


# -------------------------------------------------- (a) image-splicing llama
def test_llama_imgemb_splice_and_greedy_parity(tmp_path):
    """Left-padded reference prefill+greedy (with the dicom-keyed pickle
    handoff and <IMG> splice) vs the right-padded JAX engine. Token-for-token
    greedy agreement plus logit parity at the first decode position."""
    from radialog_tpu.decode.engine import DecodeParams, generate
    from radialog_tpu.models.llama import LlamaConfig
    from radialog_tpu.utils.hf_weights import convert_llama

    L = rs.load_ref_llama_imgemb()
    rng = np.random.default_rng(9)
    embs = {f"d{i}": rng.normal(size=(32, 16)).astype(np.float32) * 0.3
            for i in range(2)}
    rs.stage_blip_embeddings(tmp_path, embs)

    hcfg = transformers.LlamaConfig(
        vocab_size=32002, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, rms_norm_eps=1e-6,
        pad_token_id=0, attn_implementation="eager")

    cwd = os.getcwd()
    os.chdir(tmp_path)  # LlamaModel.__init__ pickle-loads relative paths
    try:
        torch.manual_seed(13)
        lm = L.LlamaForCausalLM(hcfg).eval()
        lm.model.img_proj_layer = torch.nn.Linear(16, 64)
    finally:
        os.chdir(cwd)

    # two ragged prompts, <IMG> run at different offsets
    lens = [40, 48]
    t = max(lens)
    rows = []
    for i, n in enumerate(lens):
        row = rng.integers(3, 30000, size=n)
        start = 4 + 2 * i
        row[start:start + 32] = 32000
        rows.append(row)

    # ---- reference: left padding + cumsum position scheme (test.py:288-304)
    ids = np.zeros((2, t), np.int64)
    attn = np.zeros((2, t), np.int64)
    for i, row in enumerate(rows):
        ids[i, t - len(row):] = row
        attn[i, t - len(row):] = 1
    pos = np.cumsum(attn, axis=-1) - 1
    pos[attn == 0] = 1

    max_new = 8
    with torch.no_grad():
        out = lm(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(attn),
                 position_ids=torch.tensor(pos),
                 dicom=["d0", "d1"], use_cache=True)
        ref_first_logits = out.logits[:, -1].numpy()
        past = out.past_key_values
        cur_ids, cur_attn = ids, attn
        ref_tokens = []
        step_logits = out.logits[:, -1]
        for _ in range(max_new):
            nxt = torch.argmax(step_logits, dim=-1).numpy()
            ref_tokens.append(nxt)
            cur_ids = np.concatenate([cur_ids, nxt[:, None]], axis=1)
            cur_attn = np.concatenate([cur_attn, np.ones((2, 1), np.int64)], axis=1)
            mi = lm.prepare_inputs_for_generation(
                torch.tensor(cur_ids), past_key_values=past,
                attention_mask=torch.tensor(cur_attn),
                dicom=["d0", "d1"], use_cache=True)
            step = lm(**mi)
            past = step.past_key_values
            step_logits = step.logits[:, -1]
    ref_tokens = np.stack(ref_tokens, axis=1)  # (2, max_new)

    # ---- JAX engine: right padding + lengths
    cfg = LlamaConfig(vocab_size=32002, hidden_size=64, num_layers=2,
                      num_heads=4, num_kv_heads=4, intermediate_size=128,
                      max_position=128, img_token_id=32000,
                      num_img_tokens=32, qformer_dim=16)
    params = convert_llama(lm.state_dict(), cfg.num_layers)
    assert "img_proj" in params  # model.img_proj_layer carried by converter

    tokens = np.zeros((2, t), np.int32)
    for i, row in enumerate(rows):
        tokens[i, :len(row)] = row
    lengths = np.asarray(lens, np.int32)
    img_embs = jnp.asarray(np.stack([embs["d0"], embs["d1"]]))

    from radialog_tpu.decode.engine import prefill
    cache, first = prefill(params, cfg, jnp.asarray(tokens),
                           jnp.asarray(lengths), cache_len=64,
                           img_embs=img_embs)
    np.testing.assert_allclose(np.asarray(first), ref_first_logits,
                               atol=ATOL, rtol=RTOL)

    res = generate(params, cfg, jnp.asarray(tokens), jnp.asarray(lengths),
                   DecodeParams(max_new_tokens=max_new, eos_token_id=-1),
                   img_embs=img_embs, cache_len=64)
    np.testing.assert_array_equal(np.asarray(res.tokens), ref_tokens)


def test_llama_imgemb_no_image_rows_match(tmp_path):
    """Rows without an <IMG> run: the reference's split_at_img defaults the
    split position to 0 ONLY when no row has the token; our engine handles a
    plain text batch through the img_start=-1 path."""
    from radialog_tpu.models.llama import LlamaConfig, llama_apply, prefill_bias
    from radialog_tpu.utils.hf_weights import convert_llama

    L = rs.load_ref_llama_imgemb()
    rs.stage_blip_embeddings(tmp_path, {})
    hcfg = transformers.LlamaConfig(
        vocab_size=32002, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, rms_norm_eps=1e-6,
        pad_token_id=0, attn_implementation="eager")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        torch.manual_seed(17)
        lm = L.LlamaForCausalLM(hcfg).eval()
    finally:
        os.chdir(cwd)

    rng = np.random.default_rng(21)
    toks = rng.integers(3, 30000, (2, 12)).astype(np.int64)
    with torch.no_grad():
        ref = lm(input_ids=torch.tensor(toks)).logits.numpy()

    cfg = LlamaConfig(vocab_size=32002, hidden_size=64, num_layers=2,
                      num_heads=4, num_kv_heads=4, intermediate_size=128,
                      max_position=128, img_token_id=32000,
                      num_img_tokens=32, qformer_dim=16)
    params = convert_llama(lm.state_dict(), cfg.num_layers)
    t = toks.shape[1]
    positions = jnp.arange(t)[None, :].repeat(2, 0)
    bias = prefill_bias(jnp.asarray([t, t]), t)
    got, _ = llama_apply(params, cfg, jnp.asarray(toks.astype(np.int32)),
                         positions, bias)
    np.testing.assert_allclose(np.asarray(got), ref, atol=ATOL, rtol=RTOL)
