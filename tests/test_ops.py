import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as tF

from radialog_tpu.ops.attention import causal_mask_bias, mha, padding_mask_bias
from radialog_tpu.ops.image import preprocess_cxr, preprocess_cxr_np, remap_to_uint8_np
from radialog_tpu.ops.layers import (avg_pool2d, batchnorm, batchnorm_init,
                                     conv2d, conv2d_init, layernorm,
                                     layernorm_init, linear, linear_init,
                                     max_pool2d, rmsnorm)
from radialog_tpu.ops.rotary import apply_rope, rope_tables

RNG = np.random.default_rng(0)


def test_linear_matches_torch():
    p = linear_init(jax.random.PRNGKey(0), 16, 8)
    x = RNG.normal(size=(4, 16)).astype(np.float32)
    y = linear(p, jnp.asarray(x))
    ref = x @ np.asarray(p["w"]) + np.asarray(p["b"])
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_conv2d_matches_torch():
    p = conv2d_init(jax.random.PRNGKey(1), 3, 5, 3, bias=True)
    x = RNG.normal(size=(2, 9, 9, 3)).astype(np.float32)
    y = conv2d(p, jnp.asarray(x), stride=2, padding=1)
    tw = torch.tensor(np.asarray(p["w"]).transpose(3, 2, 0, 1))  # HWIO->OIHW
    ty = tF.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), tw,
                   torch.tensor(np.asarray(p["b"])), stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(y), ty.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_batchnorm_train_and_eval_match_torch():
    p, s = batchnorm_init(6)
    x = RNG.normal(size=(4, 5, 5, 6)).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(6)
    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    # train step
    ty = tbn(tx).detach().numpy().transpose(0, 2, 3, 1)
    y, s2 = batchnorm(p, s, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(y), ty, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2["mean"]),
                               tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2["var"]),
                               tbn.running_var.numpy(), atol=1e-4)
    # eval uses running stats
    tbn.eval()
    ty2 = tbn(tx).detach().numpy().transpose(0, 2, 3, 1)
    y2, _ = batchnorm(p, s2, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y2), ty2, atol=1e-4)


def test_layernorm_rmsnorm_match_torch():
    p = layernorm_init(8)
    x = RNG.normal(size=(3, 8)).astype(np.float32)
    y = layernorm(p, jnp.asarray(x), eps=1e-12)
    ty = tF.layer_norm(torch.tensor(x), (8,), eps=1e-12)
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), atol=1e-5)

    scale = jnp.asarray(RNG.normal(size=(8,)).astype(np.float32))
    yr = rmsnorm(scale, jnp.asarray(x))
    tr = torch.tensor(x) * torch.rsqrt(torch.tensor(x).pow(2).mean(-1, keepdim=True) + 1e-6)
    tr = tr * torch.tensor(np.asarray(scale))
    np.testing.assert_allclose(np.asarray(yr), tr.numpy(), atol=1e-5)


def test_pools_match_torch():
    x = RNG.normal(size=(2, 8, 8, 3)).astype(np.float32)
    y = max_pool2d(jnp.asarray(x), 3, 2, 1)
    ty = tF.max_pool2d(torch.tensor(x.transpose(0, 3, 1, 2)), 3, 2, 1)
    np.testing.assert_allclose(np.asarray(y), ty.numpy().transpose(0, 2, 3, 1), atol=1e-6)
    y2 = avg_pool2d(jnp.asarray(x), 4)
    ty2 = tF.avg_pool2d(torch.tensor(x.transpose(0, 3, 1, 2)), 4)
    np.testing.assert_allclose(np.asarray(y2), ty2.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_mha_matches_naive():
    b, t, h, d = 2, 5, 3, 4
    q = jnp.asarray(RNG.normal(size=(b, t, h, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, t, h, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, t, h, d)).astype(np.float32))
    bias = causal_mask_bias(t, t)
    out = mha(q, k, v, bias)
    # naive
    scores = np.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d)
    scores = scores + np.asarray(bias)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.einsum("bhts,bshd->bthd", probs, v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    # padding bias shape
    pb = padding_mask_bias(jnp.asarray([[1, 1, 0, 0, 0], [1, 1, 1, 1, 1]]))
    assert pb.shape == (2, 1, 1, 5)


def test_rope_matches_torch_llama():
    """Check against the HF LLaMA rotary formula (half-rotation layout)."""
    d, L = 8, 16
    cos, sin = rope_tables(d, L)
    x = RNG.normal(size=(1, 5, 2, d)).astype(np.float32)
    pos = np.array([[3, 4, 5, 6, 7]])
    out = apply_rope(jnp.asarray(x), cos, sin, jnp.asarray(pos))

    inv = 1.0 / (10000 ** (np.arange(0, d, 2) / d))
    t = np.arange(L)[:, None] * inv[None]
    emb = np.concatenate([t, t], -1)
    c, s = np.cos(emb), np.sin(emb)
    xq = x
    rot = np.concatenate([-xq[..., d // 2:], xq[..., : d // 2]], -1)
    ref = xq * c[pos][:, :, None, :] + rot * s[pos][:, :, None, :]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_preprocess_matches_reference_semantics():
    img = (RNG.normal(size=(600, 520)) * 300 + 100).astype(np.int16)
    u8 = remap_to_uint8_np(img)
    assert u8.dtype == np.uint8 and u8.min() == 0 and u8.max() == 255
    a = preprocess_cxr_np(u8, resize=64, crop=48)
    b = np.asarray(preprocess_cxr(jnp.asarray(u8), resize=64, crop=48))
    assert a.shape == (48, 48, 3) and b.shape == (48, 48, 3)
    assert (a[..., 0] == a[..., 1]).all()
    # PIL vs XLA antialiased bilinear differ slightly; mean abs diff tiny
    assert np.abs(a - b).mean() < 0.01
