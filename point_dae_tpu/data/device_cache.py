"""Device-resident dataset cache: the TPU-native answer to the reference's
dataloader-worker hot loop (ShapeNet55Dataset.py:90-119, SURVEY §3.1).

The reference streams raw clouds host->device every step because its GPU
memory is owned by large models. Here the flagship model is ~30 M params on
a 16 GB chip, and ShapeNet-55 at (8192, 6) is ~10 GB f32 / ~5 GB f16 — so
the whole pretrain set fits in HBM. Upload once; every epoch after that is
a device-side shuffled gather feeding the jit-fused corrupt->train step,
with ZERO steady-state host->device traffic. tools/bench_pipeline.py r04
measured why this matters end-to-end: the streaming path is capped by
host->device bandwidth (through the axon WAN tunnel: 0.04 GB/s => 163
clouds/sec against a 3,738 clouds/sec device step; on a real TPU VM, PCIe
similarly bounds multi-chip hosts), while the cached path runs at device
speed.

Multi-host: each process caches only its DistributedSampler-role shard
(the same per-host striding the streaming loader uses), draws a local
permutation from a host-count-invariant key, and assembles the global
batch with the same make_array_from_process_local_data contract as
shard_batch(local=True).

Enable with ``dataset.train.others.device_cache: true`` (optional
``device_cache_dtype: float16 | bfloat16 | float32``, default float16 —
coordinate quantization ~1e-3 on unit-sphere clouds, below the sampling
noise every recipe's augmentation adds; float32 doubles HBM if the set
fits).
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


class DeviceCache:
    """Upload a pretrain dataset to device memory once; serve shuffled
    batches as jitted device-side gathers.

    Parameters
    ----------
    points : np.ndarray (M, N, C)
        The per-host shard of the dataset (raw clouds, pre-augmentation —
        augmentation/corruption stays inside the jitted train step).
    mesh : optional jax.sharding.Mesh
        When given, every served batch is sharded over the mesh's data
        axis exactly like ``shard_batch(local=True)`` output, so the train
        step's in_shardings match the streaming path's.
    dtype : storage dtype (jnp.float16 default; compute is f32 after gather)
    seed : permutation PRNG seed (host-count-invariant: combined with
        set_epoch, not with process_index — each host permutes its OWN
        shard, which is already disjoint by the loader striding contract)
    """

    def __init__(self, points: np.ndarray, mesh=None,
                 dtype=jnp.float16, seed: int = 0):
        if points.ndim != 3:
            raise ValueError(f"expected (M, N, C) clouds, got {points.shape}")
        self._mesh = mesh
        self._dtype = jnp.dtype(dtype)
        self._seed = int(seed)
        self._epoch = 0
        t0 = time.time()
        host = np.asarray(points)
        if self._dtype != host.dtype:
            host = host.astype(self._dtype)
        if mesh is not None:
            from ..parallel.mesh import replicated_sharding
            self._data = jax.device_put(host, replicated_sharding(mesh))
        else:
            self._data = jnp.asarray(host)
        self._data.block_until_ready()
        self.upload_seconds = time.time() - t0
        self.nbytes = host.nbytes

        if mesh is not None:
            from ..parallel.mesh import data_sharding
            out_sh = data_sharding(mesh)

            def gather(data, perm, start, bs):
                idx = jax.lax.dynamic_slice_in_dim(perm, start, bs)
                out = jnp.take(data, idx, axis=0).astype(jnp.float32)
                return jax.lax.with_sharding_constraint(out, out_sh)
        else:
            def gather(data, perm, start, bs):
                idx = jax.lax.dynamic_slice_in_dim(perm, start, bs)
                return jnp.take(data, idx, axis=0).astype(jnp.float32)

        self._gather = jax.jit(gather, static_argnums=3)
        self._perm = None

    def __len__(self) -> int:
        return int(self._data.shape[0])

    def steps_per_epoch(self, batch_size: int) -> int:
        # drop_last=True semantics of the reference train loader
        return len(self) // batch_size

    def set_epoch(self, epoch: int) -> None:
        """Draw this epoch's device-side permutation (one tiny dispatch)."""
        self._epoch = int(epoch)
        key = jax.random.key(self._seed)
        key = jax.random.fold_in(key, self._epoch)
        self._perm = jax.random.permutation(key, len(self))

    def batch(self, step: int, batch_size: int) -> jax.Array:
        """The ``step``-th (B, N, C) f32 batch of the current epoch —
        a single on-device gather, no host round-trip."""
        if self._perm is None:
            self.set_epoch(0)
        return self._gather(self._data, self._perm, step * batch_size,
                            batch_size)

    def __iter__(self):
        raise TypeError("DeviceCache is indexed by (epoch, step); use "
                        "set_epoch() + batch() — see engine/pretrain.py")


def build_device_cache(dataset, mesh=None, dtype=jnp.float16,
                       num_hosts: int = 1, host_id: int = 0,
                       max_bytes: Optional[int] = None,
                       logger_name: str = "PointDAE"):
    """Materialize a map-style dataset's clouds into a DeviceCache.

    Iterates the dataset ONCE on host (the only time the loader path runs),
    keeping this host's strided shard — the same per-rank split
    ``loader_shard_kwargs`` gives the streaming DataLoader. Returns None
    (with a log line) when the shard would exceed ``max_bytes`` — caller
    falls back to the streaming loader.
    """
    from ..utils.logger import print_log

    n = len(dataset)
    idxs = range(host_id, n, num_hosts)
    first = dataset[next(iter(idxs))]["points"]
    itemsize = jnp.dtype(dtype).itemsize
    est = len(range(host_id, n, num_hosts)) * first.size * itemsize
    if max_bytes is not None and est > max_bytes:
        print_log(f"[DeviceCache] dataset shard ~{est/2**30:.1f} GiB exceeds "
                  f"budget {max_bytes/2**30:.1f} GiB; streaming loader kept",
                  logger=logger_name)
        return None
    t0 = time.time()
    clouds = np.stack([np.asarray(dataset[i]["points"], np.float32)
                       for i in idxs])
    cache = DeviceCache(clouds, mesh=mesh, dtype=dtype)
    print_log(f"[DeviceCache] cached {clouds.shape[0]} clouds "
              f"({cache.nbytes/2**30:.2f} GiB as {jnp.dtype(dtype).name}) "
              f"on device in {time.time()-t0:.1f}s "
              f"(upload {cache.upload_seconds:.1f}s); steady-state epochs "
              f"run with zero host->device traffic", logger=logger_name)
    return cache
