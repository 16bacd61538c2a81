"""Flash-attention kernel tests (interpret mode on CPU — exact numerics)."""
import jax
import jax.numpy as jnp
import numpy as np

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
