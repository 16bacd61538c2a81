import jax
import pytest
import jax.numpy as jnp
import numpy as np

from radialog_tpu.models.biovil_t import (biovil_t_apply, biovil_t_init,
                                          patch_tokens_for_qformer)
from radialog_tpu.models.chexpert import (bce_with_logits_loss,
                                          chexpert_classifier_apply,
                                          chexpert_classifier_init)
from radialog_tpu.models.resnet import resnet_apply, resnet_init
from radialog_tpu.models.vit_pooler import (sine_position_embedding,
                                            vit_pooler_apply, vit_pooler_init)

K = jax.random.PRNGKey(0)


def test_resnet50_shapes_stride32():
    p, s = resnet_init(K, (1, 1, 1, 1), bottleneck=True)  # shallow resnet-50 style
    x = jnp.ones((2, 64, 64, 3))
    y, ns = resnet_apply(p, s, x)
    assert y.shape == (2, 2, 2, 2048)
    # train mode updates bn state
    _, ns2 = resnet_apply(p, s, x, train=True)
    assert float(ns2["bn1"]["count"]) == 1.0


@pytest.mark.slow  # resnet18 is BioViL API surface RaDialog never runs
def test_resnet18_shapes():
    p, s = resnet_init(K, (1, 1, 1, 1), bottleneck=False)
    y, _ = resnet_apply(p, s, jnp.ones((1, 64, 64, 3)), bottleneck=False)
    assert y.shape == (1, 2, 2, 512)


def test_sine_pos_embedding_matches_reference_formula():
    """Cross-check against the torch SinePositionEmbedding (transformer.py:227-266)."""
    import math
    import torch

    grid, dim = (3, 4), 6
    ours = np.asarray(sine_position_embedding(grid, dim))
    mask = torch.ones([1, *grid])
    y_embed = mask.cumsum(1, dtype=torch.float32)
    x_embed = mask.cumsum(2, dtype=torch.float32)
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + 1e-6) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + 1e-6) * scale
    dim_t = torch.arange(dim, dtype=torch.float32)
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / dim)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4).flatten(3)
    ref = torch.cat((pos_y, pos_x), dim=3).view(1, grid[0] * grid[1], dim * 2)[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.slow  # real-width pooler: ~22s of CPU compile
def test_vit_pooler_shapes_and_prior_fusion():
    p = vit_pooler_init(K, dim=32, grid=(4, 4))
    cur = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 32)), jnp.float32)
    prev = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 4, 32)), jnp.float32)
    out = vit_pooler_apply(p, cur, prev, num_heads=4)
    assert out.shape == (2, 4, 4, 32)
    out_noprev = vit_pooler_apply(p, cur, None, num_heads=4)
    assert not np.allclose(np.asarray(out), np.asarray(out_noprev))


def test_biovil_t_output_contract():
    p, s = biovil_t_init(K, joint_feature_size=16)
    x = jnp.ones((2, 64, 64, 3)) * 0.5
    out, ns = biovil_t_apply(p, s, x)
    assert out.patch_embeddings.shape == (2, 2, 2, 512)
    assert out.img_embedding.shape == (2, 512)
    assert out.projected_patch_embeddings.shape == (2, 2, 2, 16)
    assert out.projected_global_embedding.shape == (2, 16)
    # missing-prior branch: diff half of fused == broadcast learned emb
    fused = np.asarray(out.patch_embeddings)
    miss = np.asarray(p["missing_previous_emb"])
    np.testing.assert_allclose(fused[..., 256:], np.broadcast_to(miss, fused[..., 256:].shape),
                               atol=1e-6)


def test_patch_tokens_channel_major_quirk():
    """The (B,C,h,w)->(B,hw,C) raw reshape quirk (blip2_qformer.py:96)."""
    b, h, w, c = 1, 2, 2, 3
    x = jnp.arange(b * h * w * c, dtype=jnp.float32).reshape(b, h, w, c)
    toks = np.asarray(patch_tokens_for_qformer(x))
    import torch

    t = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))  # NCHW
    ref = t.reshape(b, -1, c).numpy()
    np.testing.assert_array_equal(toks, ref)


@pytest.mark.slow  # 488-crop trunk forward: ~29s on CPU
def test_chexpert_classifier_end_to_end_shape():
    p, s = chexpert_classifier_init(K)
    # 128x128 input -> 4x4 grid -> avg_pool(4) -> 1x1... need 488 for 16x16.
    # use 488-crop-contract at reduced scale: 128 -> 4x4 grid; pool 4 -> 1x1
    # so fc1 input 128*1*1 != 2048. Instead test with the real 488 shape once.
    x = jnp.ones((1, 488, 488, 3)) * 0.3
    logits, _ = chexpert_classifier_apply(p, s, x)
    assert logits.shape == (1, 14)
    loss = bce_with_logits_loss(logits, jnp.zeros((1, 14)),
                                pos_weight=jnp.ones((14,)))
    assert np.isfinite(float(loss))
