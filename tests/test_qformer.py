import pytest
import jax
import jax.numpy as jnp
import numpy as np

from radialog_tpu.models.blip2 import Blip2Config, blip2_init, blip2_stage1_losses
from radialog_tpu.models.qformer import (TINY_QFORMER, lm_loss,
                                         qformer_image_grounded, qformer_init,
                                         qformer_lm, qformer_multimodal,
                                         qformer_text)

CFG = TINY_QFORMER
K = jax.random.PRNGKey(0)
RNG = np.random.default_rng(0)


def _params():
    return qformer_init(K, CFG)


def test_image_grounded_shapes_and_cache():
    p = _params()
    img = jnp.asarray(RNG.normal(size=(2, 6, CFG.encoder_width)), jnp.float32)
    hidden, cache = qformer_image_grounded(p, CFG, img, use_cache=True)
    assert hidden.shape == (2, CFG.num_query_tokens, CFG.bert.hidden_size)
    assert len(cache) == CFG.bert.num_layers
    k, v = cache[0]
    assert k.shape == (2, CFG.num_query_tokens, CFG.bert.num_heads, CFG.bert.head_dim)


def test_text_only_matches_masked_invariance():
    """Padding tokens must not affect unpadded outputs."""
    p = _params()
    ids = jnp.asarray([[5, 6, 7, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 0, 0]])
    out1 = qformer_text(p, CFG, ids, mask)
    ids2 = jnp.asarray([[5, 6, 7, 9, 9]])  # different pad content
    out2 = qformer_text(p, CFG, ids2, mask)
    np.testing.assert_allclose(np.asarray(out1[:, :3]), np.asarray(out2[:, :3]),
                               atol=1e-5)


def test_multimodal_query_text_split():
    p = _params()
    b, t = 2, 5
    img = jnp.asarray(RNG.normal(size=(b, 6, CFG.encoder_width)), jnp.float32)
    ids = jnp.asarray(RNG.integers(1, 100, size=(b, t)))
    mask = jnp.concatenate([jnp.ones((b, CFG.num_query_tokens), jnp.int32),
                            jnp.ones((b, t), jnp.int32)], axis=1)
    out = qformer_multimodal(p, CFG, ids, mask, img)
    assert out.shape == (b, CFG.num_query_tokens + t, CFG.bert.hidden_size)


def test_lm_causality_over_query_prefix():
    """Logits at position i must not depend on tokens > i (UniLM mask)."""
    p = _params()
    img = jnp.asarray(RNG.normal(size=(1, 6, CFG.encoder_width)), jnp.float32)
    _, cache = qformer_image_grounded(p, CFG, img, use_cache=True)
    t = 6
    ids = jnp.asarray(RNG.integers(1, 100, size=(1, t)))
    mask = jnp.ones((1, CFG.num_query_tokens + t), jnp.int32)
    logits = qformer_lm(p, CFG, ids, mask, cache)
    assert logits.shape == (1, t, CFG.bert.vocab_size)
    # mutate the last token: logits at earlier positions unchanged
    ids2 = ids.at[0, -1].set((ids[0, -1] + 1) % 100)
    logits2 = qformer_lm(p, CFG, ids2, mask, cache)
    np.testing.assert_allclose(np.asarray(logits[:, :-1]),
                               np.asarray(logits2[:, :-1]), atol=1e-5)
    assert not np.allclose(np.asarray(logits[:, -1]), np.asarray(logits2[:, -1]))


def test_lm_loss_matches_torch_label_smoothing():
    import torch

    logits = RNG.normal(size=(2, 5, 11)).astype(np.float32)
    labels = RNG.integers(0, 11, size=(2, 5))
    labels[0, -1] = -100
    ours = float(lm_loss(jnp.asarray(logits), jnp.asarray(labels), 0.1))
    tl = torch.nn.CrossEntropyLoss(reduction="mean", label_smoothing=0.1, ignore_index=-100)
    shift_logits = torch.tensor(logits[:, :-1]).reshape(-1, 11)
    shift_labels = torch.tensor(labels[:, 1:]).reshape(-1)
    ref = float(tl(shift_logits, shift_labels))
    assert abs(ours - ref) < 1e-5


@pytest.mark.slow
def test_stage1_losses_finite_and_jittable():
    cfg = Blip2Config(qformer=CFG, embed_dim=16, max_txt_len=8)
    params, _ = blip2_init(K, cfg, with_vision=False)
    b, t = 4, 8
    img = jnp.asarray(RNG.normal(size=(b, 6, CFG.encoder_width)), jnp.float32)
    ids = jnp.asarray(RNG.integers(1, 100, size=(b, t)))
    mask = jnp.ones((b, t), jnp.int32)
    fn = jax.jit(lambda pr, im, i, m, r: blip2_stage1_losses(pr, cfg, im, i, m, r))
    out = fn(params, img, ids, mask, jax.random.PRNGKey(1))
    for name, val in out._asdict().items():
        assert np.isfinite(float(val)), name
    # grads flow
    g = jax.grad(lambda pr: blip2_stage1_losses(pr, cfg, img, ids, mask,
                                                jax.random.PRNGKey(1)).loss)(params)
    gn = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert np.isfinite(gn) and gn > 0
