"""Converter name-mapping contracts for the LAVIS/BioViL checkpoint families.

The LLaMA/BERT/CheXbert converters have torch-forward parity tests
(test_hf_parity.py); these cover the remaining two families by synthesizing
state dicts with the reference's exact key naming and checking that the
converted trees drive the JAX forwards. A key-name mismatch fails HERE
instead of at real-checkpoint load time.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax
import jax.numpy as jnp

from radialog_tpu.models.biovil_t import biovil_t_apply
from radialog_tpu.models.qformer import QFormerConfig, qformer_image_grounded
from radialog_tpu.models.bert import BertConfig
from radialog_tpu.utils.hf_weights import convert_biovil_t, convert_qformer


def _biovil_state_dict(j=32):
    """Reference module-attribute naming (biovil_t/encoder.py:100-108,
    model.py ImageModel: encoder/projector, modules.py MLP: model.{0,1,3})."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = torch.randn(o, i, k, k) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = torch.ones(c)
        sd[f"{name}.bias"] = torch.zeros(c)
        sd[f"{name}.running_mean"] = torch.zeros(c)
        sd[f"{name}.running_var"] = torch.ones(c)
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    p = "encoder.encoder."
    conv(p + "conv1", 64, 3, 7)
    bn(p + "bn1", 64)
    widths = [(64, 64, 3), (256, 128, 4), (512, 256, 6), (1024, 512, 3)]
    in_ch = 64
    for stage, (in0, w, nblocks) in enumerate(widths, start=1):
        for b in range(nblocks):
            q = f"{p}layer{stage}.{b}"
            cin = in_ch if b == 0 else w * 4
            conv(q + ".conv1", w, cin, 1)
            bn(q + ".bn1", w)
            conv(q + ".conv2", w, w, 3)
            bn(q + ".bn2", w)
            conv(q + ".conv3", w * 4, w, 1)
            bn(q + ".bn3", w * 4)
            if b == 0:
                conv(q + ".downsample.0", w * 4, cin, 1)
                bn(q + ".downsample.1", w * 4)
        in_ch = w * 4
    conv("encoder.backbone_to_vit", 256, 2048, 1)
    sd["encoder.missing_previous_emb"] = torch.zeros(1, 256, 1, 1)
    for i in range(3):
        q = f"encoder.vit_pooler.blocks.{i}"
        for ln in (".norm1", ".norm2"):
            sd[q + ln + ".weight"] = torch.ones(256)
            sd[q + ln + ".bias"] = torch.zeros(256)
        for proj in (".attn.proj_q", ".attn.proj_k", ".attn.proj_v"):
            sd[q + proj + ".weight"] = torch.randn(256, 256) * 0.02
        sd[q + ".attn.proj.weight"] = torch.randn(256, 256) * 0.02
        sd[q + ".attn.proj.bias"] = torch.zeros(256)
        sd[q + ".mlp.fc1.weight"] = torch.randn(256, 256) * 0.02
        sd[q + ".mlp.fc1.bias"] = torch.zeros(256)
        sd[q + ".mlp.fc2.weight"] = torch.randn(256, 256) * 0.02
        sd[q + ".mlp.fc2.bias"] = torch.zeros(256)
    sd["encoder.vit_pooler.norm_post.weight"] = torch.ones(256)
    sd["encoder.vit_pooler.norm_post.bias"] = torch.zeros(256)
    sd["encoder.vit_pooler.type_embed"] = torch.zeros(2, 1, 256)
    conv("projector.model.0", j, 512, 1)
    bn("projector.model.1", j)
    conv("projector.model.3", j, j, 1)
    sd["projector.model.3.bias"] = torch.zeros(j)
    return sd


@pytest.mark.slow
def test_biovil_converter_drives_forward():
    sd = _biovil_state_dict(j=32)
    params, state = convert_biovil_t(sd)
    img = jnp.asarray(np.random.default_rng(0).random((1, 96, 96, 3)),
                      jnp.float32)
    out, _ = biovil_t_apply(params, state, img)
    assert out.projected_patch_embeddings.shape == (1, 3, 3, 32)
    # prior-image path (ViT pooler weights) needs the real 448 input — its
    # sine position table is built for the 14x14 grid (encoder.py:104)
    img448 = jnp.asarray(np.random.default_rng(1).random((1, 448, 448, 3)),
                         jnp.float32)
    out2, _ = biovil_t_apply(params, state, img448, previous=img448)
    assert out2.projected_patch_embeddings.shape == (1, 14, 14, 32)
    assert np.isfinite(np.asarray(out2.projected_patch_embeddings)).all()


def _qformer_state_dict(cfg: QFormerConfig):
    b = cfg.bert
    sd = {}

    def lin(name, o, i):
        sd[f"{name}.weight"] = torch.randn(o, i) * 0.02
        sd[f"{name}.bias"] = torch.zeros(o)

    def ln(name, c):
        sd[f"{name}.weight"] = torch.ones(c)
        sd[f"{name}.bias"] = torch.zeros(c)

    h = b.hidden_size
    sd["query_tokens"] = torch.randn(1, cfg.num_query_tokens, h) * 0.02
    p = "Qformer.bert."
    sd[p + "embeddings.word_embeddings.weight"] = torch.randn(b.vocab_size, h) * 0.02
    sd[p + "embeddings.position_embeddings.weight"] = torch.randn(b.max_position, h) * 0.02
    ln(p + "embeddings.LayerNorm", h)
    for i in range(b.num_layers):
        q = f"{p}encoder.layer.{i}"
        for nm in ("attention.self.query", "attention.self.key",
                   "attention.self.value", "attention.output.dense"):
            lin(f"{q}.{nm}", h, h)
        ln(f"{q}.attention.output.LayerNorm", h)
        if i % cfg.cross_attention_freq == 0:
            lin(f"{q}.crossattention.self.query", h, h)
            lin(f"{q}.crossattention.self.key", h, cfg.encoder_width)
            lin(f"{q}.crossattention.self.value", h, cfg.encoder_width)
            lin(f"{q}.crossattention.output.dense", h, h)
            ln(f"{q}.crossattention.output.LayerNorm", h)
        for pre in ("", "_query"):
            lin(f"{q}.intermediate{pre}.dense", b.intermediate_size, h)
            lin(f"{q}.output{pre}.dense", h, b.intermediate_size)
            ln(f"{q}.output{pre}.LayerNorm", h)
    lin("Qformer.cls.predictions.transform.dense", h, h)
    ln("Qformer.cls.predictions.transform.LayerNorm", h)
    sd["Qformer.cls.predictions.bias"] = torch.zeros(b.vocab_size)
    return sd


def test_qformer_converter_drives_forward():
    cfg = QFormerConfig(
        bert=BertConfig(vocab_size=120, hidden_size=32, num_layers=4,
                        num_heads=4, intermediate_size=64, max_position=64),
        num_query_tokens=8, encoder_width=48)
    torch.manual_seed(0)
    params = convert_qformer(_qformer_state_dict(cfg), num_layers=4)
    assert params["query_tokens"].shape == (8, 32)
    assert "cross" in params["layers"][0] and "cross" not in params["layers"][1]
    embs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 48)),
                       jnp.float32)
    hidden, _ = qformer_image_grounded(params, cfg, embs)
    assert hidden.shape == (2, 8, 32)
    assert np.isfinite(np.asarray(hidden)).all()


def test_peft_lora_rank_from_shapes_and_config():
    """convert_peft_lora derives rank from lora_A shapes and alpha from
    adapter_config.json, instead of hardcoding the reference r=8/alpha=16
    (finetune.py:311-318); a config/shape mismatch is an error."""
    import numpy as np
    import pytest
    from radialog_tpu.utils.hf_weights import convert_peft_lora

    def sd_for(rank, num_layers=2, hidden=16):
        sd = {}
        for i in range(num_layers):
            for t in ("q", "v"):
                base = f"base_model.model.model.layers.{i}.self_attn.{t}_proj"
                sd[f"{base}.lora_A.weight"] = np.ones((rank, hidden), np.float32)
                sd[f"{base}.lora_B.weight"] = np.ones((hidden, rank), np.float32)
        return sd

    # rank inferred from shapes; alpha from adapter_config
    lora = convert_peft_lora(sd_for(4), 2, adapter_config={"r": 4, "lora_alpha": 32})
    assert float(lora["scale"]) == 32.0 / 4.0
    # no config at all -> reference defaults for alpha, rank from shapes
    lora = convert_peft_lora(sd_for(4), 2)
    assert float(lora["scale"]) == 16.0 / 4.0
    # config rank contradicting the weights is an error, not a silent scale bug
    with pytest.raises(ValueError, match="rank mismatch"):
        convert_peft_lora(sd_for(4), 2, adapter_config={"r": 8, "lora_alpha": 16})
