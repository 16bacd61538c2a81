"""Flash-attention kernel tests (interpret mode on CPU — exact numerics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radialog_tpu.models.llama import prefill_bias
from radialog_tpu.ops.attention import mha
from radialog_tpu.ops.flash_attention import flash_attention


def _cmp(B, T, H, D, lens, causal=True, bq=64, bk=64):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    lengths = jnp.asarray(lens, jnp.int32)
    got = np.asarray(flash_attention(q, k, v, lengths, causal=causal,
                                     bq=bq, bk=bk, interpret=True))
    ref = np.asarray(mha(q, k, v, bias=prefill_bias(lengths, T)))
    for i, L in enumerate(lens):
        np.testing.assert_allclose(got[i, :L], ref[i, :L], atol=2e-5,
                                   rtol=1e-4)
    return got


def test_full_length():
    _cmp(2, 128, 2, 64, [128, 128])


def test_ragged_lengths():
    _cmp(2, 128, 2, 64, [128, 37])


def test_uneven_blocks():
    # T not a multiple of the block size exercises edge-tile masking
    _cmp(1, 96, 2, 64, [96], bq=64, bk=64)


def test_padding_queries_finite():
    # queries beyond a sequence's length are never read (right padding), but
    # they must stay finite so downstream matmuls don't propagate NaN
    got = _cmp(1, 128, 1, 64, [40])
    assert np.all(np.isfinite(got))


# ---------------------------------------------------------------- backward


def _grad_cmp(B, T, H, D, lens, causal=True, bq=64, bk=64, atol=2e-4):
    """jax.grad through the Pallas kernel (custom FA2 backward) must match
    grad through the XLA mha + prefill_bias reference."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    lengths = jnp.asarray(lens, jnp.int32)
    # weight the loss by a fixed random tensor, zeroed on padding rows (the
    # contract: rows past a sequence's length are never read by the loss)
    w = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    row = np.arange(T)[None, :, None, None]
    w = w * jnp.asarray(row < np.asarray(lens)[:, None, None, None])

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, lengths, causal=causal, bq=bq, bk=bk,
                            interpret=True)
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        if causal:
            bias = prefill_bias(lengths, T)
        else:   # length mask only (prefill_bias bakes in causality)
            kj = jnp.arange(T)[None, None, None, :]
            bias = jnp.where(kj < lengths[:, None, None, None], 0.0, -1e9)
        o = mha(q, k, v, bias=bias)
        return jnp.sum(o * w)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, ref, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=atol,
                                   rtol=1e-3, err_msg=f"d{name}")


def test_grad_full_length():
    _grad_cmp(1, 64, 2, 64, [64], bq=32, bk=32)


def test_grad_ragged_lengths():
    _grad_cmp(2, 64, 1, 64, [64, 37], bq=32, bk=32)


def test_grad_uneven_blocks():
    _grad_cmp(1, 96, 1, 64, [96], bq=64, bk=64)


def test_grad_non_causal():
    _grad_cmp(1, 64, 1, 64, [50], causal=False, bq=32, bk=32)


@pytest.mark.slow
def test_grad_stats_tile_path():
    # bk=128 exercises the lane-broadcast stats WITHOUT the <128 fallback —
    # the layout the real-TPU path uses (also validated on hardware:
    # docs/PERF.md flash-backward section)
    _grad_cmp(1, 256, 1, 64, [256], bq=128, bk=128)


def test_value_unchanged_under_vjp():
    # the primal through custom_vjp must equal the direct forward
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 64, 1, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 64, 1, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 64, 1, 64)), jnp.float32)
    lengths = jnp.asarray([50], jnp.int32)
    direct = flash_attention(q, k, v, lengths, interpret=True)
    via_vjp, _ = jax.vjp(
        lambda q, k, v: flash_attention(q, k, v, lengths, interpret=True),
        q, k, v)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(via_vjp))
