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


def pad_to_batch(arr: np.ndarray, batch_size: int) -> np.ndarray:
    """Zero-pad a (possibly short tail) batch along axis 0 to ``batch_size``
    so every eval dispatch reuses one compiled shape. Callers slice the
    jit output back to the true count. Shared by every engine eval loop —
    the hand-rolled copies had drifted (double uploads, dtype differences)."""
    n = arr.shape[0]
    if n >= batch_size:
        return arr
    return np.concatenate(
        [arr, np.zeros((batch_size - n,) + arr.shape[1:], arr.dtype)])


def shard_batch(mesh: Mesh, batch, axis: str = "data", dim: int = 0,
                local: bool = False):
    """Place a pytree of host arrays with array dim ``dim`` (the batch dim)
    sharded over the mesh.

    ``local=False`` (default): every process holds the same GLOBAL batch
    and device_put takes each host's addressable part — right for eval
    loaders, which iterate deterministically. ``local=True``: each process
    passes only its per-host slice (train loaders stride with
    ``loader_shard_kwargs``, the DistributedSampler role) and the global
    array is assembled with make_array_from_process_local_data — no host
    loads the full global train batch. Both are identical single-process."""
    sh = data_sharding(mesh, axis, dim)
    if local and jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def loader_shard_kwargs():
    """Per-host striding args for DataLoader (DistributedSampler role:
    per-rank batch split, main.py:57-71 / tools/builder.py:19)."""
    return dict(num_hosts=jax.process_count(), host_id=jax.process_index())


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, opt state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


# ------------------------------------------------- tensor parallelism (TP)

def get_mesh_2d(devices: Optional[Sequence[jax.Device]] = None,
                model_parallel: int = 1) -> Mesh:
    """2-D ('data', 'model') mesh: batch over 'data', large weight matrices
    over 'model' (Megatron column/row pattern — see param_sharding_rules).
    model_parallel=1 degenerates to the 1-D data mesh semantics."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    assert len(devices) % model_parallel == 0, (len(devices), model_parallel)
    return Mesh(devices.reshape(len(devices) // model_parallel,
                                model_parallel), ("data", "model"))


# Megatron-style sharding: the first Dense of each pair splits its OUTPUT
# features (column parallel), the second its INPUT features (row parallel) —
# one all-reduce per block, inserted by GSPMD. Keyed by flax param-path
# suffixes of the ViT blocks, the FLOP-dominant weights of every
# transformer-family model here.
_COLUMN_SUFFIXES = ("attn/qkv/kernel", "mlp_fc1/kernel")
_ROW_SUFFIXES = ("attn/proj/kernel", "mlp_fc2/kernel")
_COLUMN_BIAS = ("attn/qkv/bias", "mlp_fc1/bias")


def param_spec(path: str, ndim: int) -> P:
    """PartitionSpec for one parameter under the ('data', 'model') mesh."""
    if ndim == 2:
        if path.endswith(_COLUMN_SUFFIXES):
            return P(None, "model")
        if path.endswith(_ROW_SUFFIXES):
            return P("model", None)
    if ndim == 1 and path.endswith(_COLUMN_BIAS):
        return P("model")
    return P()


def shard_params(mesh: Mesh, tree):
    """Place a PARAM dict pytree with ViT-block weights sharded over the
    'model' axis (everything else replicated). With jit over a sharded tree,
    GSPMD propagates the layouts through fwd/bwd and inserts the Megatron
    all-reduces on ICI; the train step code is unchanged.

    Optimizer state is NOT passed here: build it AFTER sharding the params
    (optax init ops inherit each param's placement, so Adam moments land
    sharded for free); non-dict pytrees fed to this function are replicated
    as a conservative fallback."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        return replicate(mesh, tree)

    def place(path_tuple, x):
        path = "/".join(str(p) for p in path_tuple)
        if hasattr(x, "ndim"):
            spec = param_spec(path, x.ndim)
            # only shard when the dimension divides evenly
            for d, ax in enumerate(spec):
                if ax is not None and x.shape[d] % mesh.shape["model"] != 0:
                    spec = P()
                    break
            return jax.device_put(x, NamedSharding(mesh, spec))
        return x

    flat = flatten_dict(tree, sep=None) if isinstance(tree, dict) else None
    if flat is None:
        # non-dict pytrees (opt states etc.): replicate
        return replicate(mesh, tree)
    return unflatten_dict({k: place(k, v) for k, v in flat.items()})
