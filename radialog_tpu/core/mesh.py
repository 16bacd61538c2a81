"""Device mesh construction and batch sharding.

The reference's distributed layer is torch.distributed + NCCL with DDP
(model/lavis/common/dist_utils.py:57-91, runners/runner_base.py:110-116).
On TPU the equivalent is a ``jax.sharding.Mesh`` over ICI with named axes and
``NamedSharding`` annotations; XLA inserts the collectives. This module owns:

  * ``MeshSpec``     — declarative (data, model) mesh shape.
  * ``make_mesh``    — build a Mesh from the available devices.
  * ``shard_batch``  — place a host batch onto the data axis.
  * ``host_local_batch_slice`` — per-host slice for multi-host data loading
    (replaces DistributedSampler, runner_base.py:607-616).
  * ``init_distributed`` — multi-host (DCN) process-group init, the analog
    of the reference's init_distributed_mode (common/dist_utils.py:57-91).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

_distributed_initialized = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX over DCN — the reference's
    init_distributed_mode analog (common/dist_utils.py:57-91), env-driven the
    same way (the reference reads RANK/WORLD_SIZE/MASTER_ADDR and downgrades
    to "Not using distributed mode" when absent):

      RADIALOG_COORDINATOR   host:port of process 0 (MASTER_ADDR:PORT)
      RADIALOG_NUM_PROCESSES world size (WORLD_SIZE)
      RADIALOG_PROCESS_ID    this host's rank (RANK)
      RADIALOG_DISTRIBUTED=1 force jax.distributed.initialize() with no
                             explicit args — JAX auto-detects the topology
                             from the TPU pod / cluster metadata.

    Explicit arguments override the environment. Returns True when a
    multi-process group was initialized, False for the single-process no-op.
    Idempotent: a second call returns the first call's outcome. Root
    trainers call this before building a mesh so jax.devices() spans the
    full slice and ``host_local_batch_slice`` sees the real process grid.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    env = os.environ
    coordinator_address = coordinator_address or env.get("RADIALOG_COORDINATOR")
    if num_processes is None and env.get("RADIALOG_NUM_PROCESSES"):
        num_processes = int(env["RADIALOG_NUM_PROCESSES"])
    if process_id is None and env.get("RADIALOG_PROCESS_ID"):
        process_id = int(env["RADIALOG_PROCESS_ID"])
    auto = env.get("RADIALOG_DISTRIBUTED") == "1"
    if coordinator_address is None and not auto:
        return False  # single-process: nothing to do
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    _distributed_initialized = True
    return True


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh shape. ``data * model`` must divide the device count.

    data=-1 means "all remaining devices on the data axis".
    """

    data: int = -1
    model: int = 1

    def resolve(self, n_devices: Optional[int] = None) -> tuple[int, int]:
        n = n_devices if n_devices is not None else jax.device_count()
        model = max(1, self.model)
        if n % model != 0:
            raise ValueError(f"model axis {model} does not divide device count {n}")
        data = self.data if self.data > 0 else n // model
        if data * model != n:
            raise ValueError(f"mesh {data}x{model} != device count {n}")
        return data, model


def make_mesh(spec: MeshSpec = MeshSpec(), devices: Optional[Sequence[Any]] = None) -> Mesh:
    devs = list(devices) if devices is not None else list(jax.devices())
    data, model = spec.resolve(len(devs))
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a pytree of host arrays with batch-dim sharding."""

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, max(x.ndim, 1)))

    return jax.tree_util.tree_map(put, batch)


def host_local_batch_slice(global_batch: int, process_index: Optional[int] = None,
                           process_count: Optional[int] = None) -> slice:
    """Contiguous slice of the global batch this host should load."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc != 0:
        raise ValueError(f"global batch {global_batch} not divisible by host count {pc}")
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)
