import jax
import numpy as np
import pytest

from radialog_tpu.core.config import Config, freeze_dict, get_registered, register
from radialog_tpu.core.mesh import MeshSpec, batch_sharding, make_mesh, shard_batch
from radialog_tpu.core.prng import PRNGSeq


def test_config_merge_and_overrides():
    c = Config({"model": {"dim": 8, "name": "x"}, "run": {"lr": 0.1}})
    c2 = c.merge({"model": {"dim": 16}})
    assert c2.model.dim == 16 and c2.model.name == "x"
    c3 = c.apply_overrides(["model.dim=32", "run.warmup=true", "run.steps=1e3",
                            "data.path=/tmp/x"])
    assert c3.model.dim == 32
    assert c3.run.warmup is True
    assert c3.run.steps == 1000.0
    assert c3.data.path == "/tmp/x"
    # original untouched
    assert c.model.dim == 8
    assert freeze_dict(c3.to_dict())  # hashable
    hash(freeze_dict(c3.to_dict()))


def test_registry():
    @register("thing", "a")
    class A:
        pass

    assert get_registered("thing", "a") is A
    with pytest.raises(KeyError):
        get_registered("thing", "missing")


def test_mesh_and_batch_sharding():
    mesh = make_mesh(MeshSpec(data=4, model=2))
    assert mesh.devices.shape == (4, 2)
    batch = {"x": np.ones((8, 3), np.float32), "y": np.arange(8)}
    out = shard_batch(mesh, batch)
    assert out["x"].sharding == batch_sharding(mesh, 2)
    np.testing.assert_array_equal(np.asarray(out["y"]), np.arange(8))


def test_prng_seq_deterministic():
    a = PRNGSeq(0)
    b = PRNGSeq(0)
    assert jax.numpy.array_equal(a(), b())
    assert jax.numpy.array_equal(a("drop"), b("drop"))
    assert not jax.numpy.array_equal(a(), a())
