"""Parallelism tests on the virtual 8-device CPU mesh (tests/conftest.py):
TP-sharded forward must equal the unsharded forward bit-for-bit (same math,
different placement), and batch sharding must partition over `data`."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from radialog_tpu.core.mesh import MeshSpec, make_mesh, shard_batch
from radialog_tpu.decode.engine import DecodeParams, generate
from radialog_tpu.models.llama import (TINY_LLAMA, llama_apply, llama_init,
                                       lora_init, prefill_bias)
from radialog_tpu.parallel.partition import (batch_specs,
                                             llama_partition_specs,
                                             lora_partition_specs,
                                             shard_params)


def test_mesh_spec_resolution():
    assert MeshSpec(model=2).resolve(8) == (4, 2)
    assert MeshSpec(data=8, model=1).resolve(8) == (8, 1)
    import pytest
    with pytest.raises(ValueError):
        MeshSpec(model=3).resolve(8)


def test_tp_forward_matches_unsharded():
    cfg = TINY_LLAMA
    params = llama_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(3, 200, (4, 10)))
    lens = jnp.full((4,), 10, jnp.int32)
    positions = jnp.arange(10)[None].repeat(4, 0)
    bias = prefill_bias(lens, 10)

    ref, _ = llama_apply(params, cfg, toks, positions, bias)

    mesh = make_mesh(MeshSpec(model=2))
    with mesh:
        sharded = shard_params(mesh, params, llama_partition_specs(params))
        toks_s = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
        got, _ = jax.jit(lambda p, t: llama_apply(p, cfg, t, positions, bias))(
            sharded, toks_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)
    # params must actually be sharded over the model axis
    wq = sharded["layers"]["wq"]["w"]
    assert len(wq.sharding.device_set) == 8 or not wq.sharding.is_fully_replicated


@pytest.mark.slow
def test_tp_generate_matches_unsharded():
    cfg = TINY_LLAMA
    params = llama_init(jax.random.PRNGKey(1), cfg)
    lora = lora_init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(1)
    toks = np.asarray(rng.integers(3, 200, (8, 6)), np.int32)
    toks[:, 2:2 + cfg.num_img_tokens] = cfg.img_token_id
    lens = jnp.full((8,), 6, jnp.int32)
    embs = jnp.asarray(rng.normal(size=(8, cfg.num_img_tokens, cfg.qformer_dim)),
                       jnp.float32)
    dp = DecodeParams(max_new_tokens=4, eos_token_id=1)

    ref = generate(params, cfg, jnp.asarray(toks), lens, dp, img_embs=embs,
                   lora=lora, cache_len=32)

    mesh = make_mesh(MeshSpec(model=2))
    with mesh:
        p_s = shard_params(mesh, params, llama_partition_specs(params))
        l_s = shard_params(mesh, lora, lora_partition_specs(lora))
        batch = shard_batch(mesh, {"toks": toks, "embs": np.asarray(embs)})
        got = jax.jit(lambda p, l, t, e: generate(
            p, cfg, t, lens, dp, img_embs=e, lora=l, cache_len=32))(
            p_s, l_s, batch["toks"], batch["embs"])
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))


def test_shard_batch_partitions_data_axis():
    mesh = make_mesh(MeshSpec(model=1))
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    y = shard_batch(mesh, {"x": x})["x"]
    assert not y.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(y), x)
