"""Device mesh + sharding helpers — the distributed layer.

TPU-native replacement for the reference's torch.distributed/NCCL stack
(utils/dist_utils.py:9-59, DDP wrap at tools/runner_pretrain.py:79-88,
DistributedSampler at tools/builder.py:19, per-rank batch split main.py:57-71):

- one 1-D ``Mesh(('data',))`` over all chips; the batch axis is sharded with
  ``NamedSharding`` and everything else is replicated;
- gradient all-reduce, metric averaging (the reference's explicit
  ``all_reduce``), SyncBN statistics, and probe-feature pooling (the
  reference's ``all_gather``) all become XLA collectives inserted
  automatically by jit over the sharded batch — riding ICI within a slice and
  DCN across slices;
- the same code runs unchanged on 1 chip, a pod, or multi-slice.

TP/PP/SP/EP are not required for parity (models are <=30 M params, token
counts <=129 — SURVEY.md §2.6); the mesh helper accepts extra axes so a 2-D
(data, model) layout remains available for future scaling.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host entry point (role of dist_utils.init_dist / NCCL rendezvous
    in the reference — utils/dist_utils.py:9-29). On TPU pods the arguments
    are auto-detected from the environment; on CPU/GPU fleets pass them
    explicitly. Call once before building the mesh."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def get_mesh(devices: Optional[Sequence[jax.Device]] = None,
             axis_names: Sequence[str] = ("data",),
             shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over all (or given) devices. Default: 1-D data mesh."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def data_sharding(mesh: Mesh, axis: str = "data",
                  dim: int = 0) -> NamedSharding:
    """Sharding for batched arrays: array dim ``dim`` split over the data
    axis (dim=1 for (k, B, ...) multi-step chunks)."""
    return NamedSharding(mesh, P(*((None,) * dim), axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data", dim: int = 0):
    """Place a pytree of host arrays with array dim ``dim`` (the batch dim)
    sharded over the mesh."""
    sh = data_sharding(mesh, axis, dim)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, opt state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
