"""Numerical parity: JAX models + converters vs HF torch reference models.

These tests instantiate tiny randomly-initialised HF models (the same classes
the reference drives: LlamaForCausalLM, BertModel), convert their state dicts
with utils/hf_weights, and assert the JAX forward matches torch to fp32
tolerance. This is the strongest weight-fidelity evidence available without
the real checkpoints (SURVEY §7 'hard parts': Vicuna-7B weight fidelity).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from radialog_tpu.models.bert import BertConfig, bert_apply
from radialog_tpu.models.llama import LlamaConfig, llama_apply, prefill_bias
from radialog_tpu.utils.hf_weights import (convert_bert, convert_chexbert,
                                           convert_llama, convert_peft_lora)

ATOL = 2e-4


@pytest.fixture(scope="module")
def hf_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6, attn_implementation="eager")
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    return model, cfg


def test_llama_forward_parity(hf_llama):
    model, hcfg = hf_llama
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, num_layers=3, num_heads=4,
                      num_kv_heads=4, intermediate_size=128, max_position=64)
    params = convert_llama(model.state_dict(), cfg.num_layers)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, (2, 9)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(tokens.astype(np.int64))).logits.numpy()

    t = tokens.shape[1]
    positions = jnp.arange(t)[None, :].repeat(2, 0)
    bias = prefill_bias(jnp.asarray([t, t]), t)
    got, _ = llama_apply(params, cfg, jnp.asarray(tokens), positions, bias)
    np.testing.assert_allclose(np.asarray(got), ref, atol=ATOL, rtol=1e-3)


def test_llama_parity_with_peft_lora(hf_llama):
    peft = pytest.importorskip("peft")
    model, hcfg = hf_llama
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, num_layers=3, num_heads=4,
                      num_kv_heads=4, intermediate_size=128, max_position=64)
    lcfg = peft.LoraConfig(r=4, lora_alpha=16, target_modules=["q_proj", "v_proj"],
                           lora_dropout=0.0, bias="none", task_type="CAUSAL_LM")
    pmodel = peft.get_peft_model(model, lcfg).eval()
    # make B nonzero so the test is non-trivial
    torch.manual_seed(1)
    for name, mod in pmodel.named_modules():
        if hasattr(mod, "lora_B") and "default" in getattr(mod, "lora_B", {}):
            torch.nn.init.normal_(mod.lora_B["default"].weight, std=0.05)

    sd = {k: v for k, v in pmodel.state_dict().items()}
    base_sd = {k.replace("base_model.model.", "").replace(".base_layer", ""): v
               for k, v in sd.items() if "lora_" not in k}
    params = convert_llama(base_sd, cfg.num_layers)
    lora = convert_peft_lora(sd, cfg.num_layers, rank=4, alpha=16)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 128, (1, 7)).astype(np.int32)
    with torch.no_grad():
        ref = pmodel(input_ids=torch.tensor(tokens.astype(np.int64))).logits.numpy()
    t = tokens.shape[1]
    positions = jnp.arange(t)[None, :]
    bias = prefill_bias(jnp.asarray([t]), t)
    got, _ = llama_apply(params, cfg, jnp.asarray(tokens), positions, bias,
                         lora=lora)
    np.testing.assert_allclose(np.asarray(got), ref, atol=ATOL, rtol=1e-3)


@pytest.fixture(scope="module")
def hf_bert():
    cfg = transformers.BertConfig(
        vocab_size=130, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=32, attn_implementation="eager")
    torch.manual_seed(0)
    return transformers.BertModel(cfg).eval(), cfg


def test_bert_forward_parity(hf_bert):
    model, hcfg = hf_bert
    cfg = BertConfig(vocab_size=130, hidden_size=48, num_layers=2, num_heads=4,
                     intermediate_size=96, max_position=32)
    params = convert_bert(model.state_dict(), cfg.num_layers, prefix="")

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 130, (2, 11)).astype(np.int32)
    mask = np.ones((2, 11), np.int32)
    mask[1, 8:] = 0
    with torch.no_grad():
        ref = model(torch.tensor(tokens.astype(np.int64)),
                    attention_mask=torch.tensor(mask.astype(np.int64))
                    ).last_hidden_state.numpy()
    got = bert_apply(params, cfg, jnp.asarray(tokens), jnp.asarray(mask))
    # masked positions may differ (torch still computes them through residuals
    # with masked attention); compare valid positions only
    np.testing.assert_allclose(np.asarray(got)[0], ref[0], atol=ATOL, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got)[1, :8], ref[1, :8], atol=ATOL,
                               rtol=1e-3)


def test_chexbert_converter_shapes():
    """CheXbert head conversion: synthesize the bert_labeler naming."""
    import torch.nn as nn
    torch.manual_seed(0)

    class Labeler(nn.Module):
        def __init__(self):
            super().__init__()
            hf = transformers.BertModel(transformers.BertConfig(
                vocab_size=130, hidden_size=48, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=96,
                max_position_embeddings=32))
            self.bert = hf
            hidden = 48
            self.linear_heads = nn.ModuleList(
                [nn.Linear(hidden, 4) for _ in range(13)] + [nn.Linear(hidden, 2)])

    lab = Labeler().eval()
    params = convert_chexbert(lab.state_dict(), num_layers=2)
    assert len(params["heads"]) == 14
    assert params["heads"][0]["w"].shape == (48, 4)
    assert params["heads"][13]["w"].shape == (48, 2)

    from radialog_tpu.models.chexbert import chexbert_apply
    cfg = BertConfig(vocab_size=130, hidden_size=48, num_layers=2, num_heads=4,
                     intermediate_size=96, max_position=32)
    logits = chexbert_apply(params, cfg, jnp.zeros((2, 5), jnp.int32),
                            jnp.ones((2, 5), jnp.int32))
    assert logits[0].shape == (2, 4) and logits[13].shape == (2, 2)

    # parity against the torch labeler's forward contract (CLS -> heads)
    tokens = np.random.default_rng(0).integers(0, 130, (2, 5))
    with torch.no_grad():
        hid = lab.bert(torch.tensor(tokens)).last_hidden_state[:, 0]
        ref0 = lab.linear_heads[0](hid).numpy()
    got = chexbert_apply(params, cfg, jnp.asarray(tokens.astype(np.int32)),
                         jnp.ones((2, 5), jnp.int32))
    np.testing.assert_allclose(np.asarray(got[0]), ref0, atol=ATOL, rtol=1e-3)
