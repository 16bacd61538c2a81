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


def test_host_local_batch_slice_composition():
    """The per-host slices must tile the global batch exactly, in rank order
    (the DistributedSampler contract, runner_base.py:607-616) — checked under
    a mocked 4-host process grid."""
    from radialog_tpu.core.mesh import host_local_batch_slice
    got = np.concatenate([np.arange(32)[host_local_batch_slice(32, pi, 4)]
                          for pi in range(4)])
    np.testing.assert_array_equal(got, np.arange(32))
    assert host_local_batch_slice(32, 2, 4) == slice(16, 24)
    with pytest.raises(ValueError):
        host_local_batch_slice(30, 0, 4)  # not divisible by host count
    # single process: identity slice
    assert host_local_batch_slice(8, 0, 1) == slice(0, 8)


def test_init_distributed(monkeypatch):
    """Env-driven multi-host init (reference init_distributed_mode,
    common/dist_utils.py:57-91): no env -> single-process no-op; explicit
    coordinator env -> jax.distributed.initialize with the translated args;
    idempotent on the second call."""
    from radialog_tpu.core import mesh as m

    calls = []
    monkeypatch.setattr(m.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    for var in ("RADIALOG_COORDINATOR", "RADIALOG_NUM_PROCESSES",
                "RADIALOG_PROCESS_ID", "RADIALOG_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)

    monkeypatch.setattr(m, "_distributed_initialized", False)
    assert m.init_distributed() is False          # the "Not using
    assert calls == []                            # distributed mode" path

    monkeypatch.setenv("RADIALOG_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("RADIALOG_NUM_PROCESSES", "4")
    monkeypatch.setenv("RADIALOG_PROCESS_ID", "2")
    assert m.init_distributed() is True
    assert calls == [dict(coordinator_address="10.0.0.1:1234",
                          num_processes=4, process_id=2)]
    assert m.init_distributed() is True           # idempotent: no re-init
    assert len(calls) == 1

    # auto-detect mode: RADIALOG_DISTRIBUTED=1, no explicit coordinator
    monkeypatch.setattr(m, "_distributed_initialized", False)
    monkeypatch.delenv("RADIALOG_COORDINATOR")
    monkeypatch.setenv("RADIALOG_DISTRIBUTED", "1")
    assert m.init_distributed() is True
    assert calls[-1] == {}
    monkeypatch.setattr(m, "_distributed_initialized", False)


def test_prng_seq_deterministic():
    a = PRNGSeq(0)
    b = PRNGSeq(0)
    assert jax.numpy.array_equal(a(), b())
    assert jax.numpy.array_equal(a("drop"), b("drop"))
    assert not jax.numpy.array_equal(a(), a())
