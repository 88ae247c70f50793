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

Storage layout: ONE global (M_pad, N, C) array row-sharded over the mesh's
'data' axis — each device holds M_pad/n rows, so the cache's HBM cost
divides across the mesh instead of replicating. Multi-host, each process
uploads only its devices' block (``make_array_from_process_local_data``,
the same assembly contract as ``shard_batch(local=True)``) — no host ever
materializes the full set. The epoch shuffle is one GLOBAL permutation
(a fresh reshuffle across shard boundaries every epoch — the same
semantics as the reference's per-epoch ``DistributedSampler`` reshuffle,
tools/builder.py:19), and batches are served by ``gather_global``: each
shard takes the rows it owns and a ``psum_scatter`` over the data axis
deals every device its batch slice — the collective moves one batch of
bytes over ICI, never the dataset.

Enable with ``dataset.train.others.device_cache: true`` (optional
``device_cache_dtype: float16 | bfloat16 | float32``, default float16 —
coordinate quantization ~1e-3 on unit-sphere clouds, below the sampling
noise every recipe's augmentation adds; float32 doubles HBM if the set
fits). The permutation honors ``args.seed`` — note drop_last semantics
(MIGRATING.md): steps_per_epoch = floor(M / batch), vs the streaming
loader's drop_last=False.
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def make_gather(mesh, batch_size: int):
    """Build the (jittable) batch gather: (data (M_pad, N, C) sharded
    P('data'), perm (M,) replicated, start scalar) -> (B, N, C) f32 sharded
    P('data').

    With a mesh, the gather runs as an explicit shard_map so SPMD never
    all-gathers the dataset: each shard gathers the requested rows it owns
    (others contribute exact zeros) and a tiled ``psum_scatter`` over the
    data axis hands every device its own (B/n) slice — ICI traffic is one
    batch, independent of dataset size."""
    if mesh is None:
        def gather(data, perm, start):
            idx = jax.lax.dynamic_slice_in_dim(perm, start, batch_size)
            return jnp.take(data, idx, axis=0).astype(jnp.float32)
        return gather

    from jax import shard_map

    n_shards = mesh.shape["data"]
    assert batch_size % n_shards == 0, (batch_size, n_shards)

    def _shard_fn(dloc, idx):
        rows = dloc.shape[0]
        off = (jax.lax.axis_index("data") * rows).astype(idx.dtype)
        loc = idx - off
        inb = (loc >= 0) & (loc < rows)
        safe = jnp.where(inb, loc, 0)
        vals = jnp.take(dloc, safe, axis=0).astype(jnp.float32)
        vals = jnp.where(inb[:, None, None], vals, 0.0)
        if n_shards == 1:
            return vals
        return jax.lax.psum_scatter(vals, "data", scatter_dimension=0,
                                    tiled=True)

    smapped = shard_map(_shard_fn, mesh=mesh,
                        in_specs=(P("data"), P()), out_specs=P("data"))

    def gather(data, perm, start):
        idx = jax.lax.dynamic_slice_in_dim(perm, start, batch_size)
        return smapped(data, idx)

    return gather


class DeviceCache:
    """Upload a pretrain dataset to device memory once; serve shuffled
    batches as jitted device-side gathers.

    Parameters
    ----------
    points : np.ndarray (M_local, N, C)
        This process's contiguous block of the (padded) global set — the
        whole set single-process. ``build_device_cache`` computes the
        block + wrap-padding; when constructing directly with a mesh, the
        row count must divide by the mesh's data-axis size.
    mesh : optional jax.sharding.Mesh
        When given, storage is row-sharded over the 'data' axis and every
        served batch comes out sharded exactly like ``shard_batch``'s
        output, so the train step's in_shardings match the streaming path.
    dtype : storage dtype (jnp.float16 default; compute is f32 after gather)
    seed : permutation PRNG seed (pass args.seed — identical on every host;
        the permutation is global, so all hosts agree on it)
    total : the TRUE dataset size M (defaults to the local row count);
        permutations only ever index [0, M), so wrap-padded rows are never
        served.
    """

    def __init__(self, points: np.ndarray, mesh=None,
                 dtype=jnp.float16, seed: int = 0,
                 total: Optional[int] = None):
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
        nproc = jax.process_count()
        self._total = int(total) if total is not None \
            else host.shape[0] * (nproc if mesh is not None else 1)
        if mesh is not None:
            from ..parallel.mesh import data_sharding
            sh = data_sharding(mesh)
            if nproc > 1:
                self._data = jax.make_array_from_process_local_data(sh, host)
            else:
                self._data = jax.device_put(host, sh)
        else:
            self._data = jnp.asarray(host)
        jax.block_until_ready(self._data)
        self.upload_seconds = time.time() - t0
        self.nbytes = host.nbytes          # this process's uploaded bytes

        self._gathers = {}
        self._perm = None

    def __len__(self) -> int:
        return self._total

    def steps_per_epoch(self, batch_size: int) -> int:
        # drop_last=True semantics (floor); the streaming train loader is
        # drop_last=False — documented in MIGRATING.md
        return len(self) // batch_size

    def set_epoch(self, epoch: int) -> None:
        """Draw this epoch's device-side global permutation (one tiny
        dispatch; replicated, so every host/shard agrees)."""
        self._epoch = int(epoch)
        key = jax.random.key(self._seed)
        key = jax.random.fold_in(key, self._epoch)
        perm = jax.random.permutation(key, len(self)).astype(jnp.int32)
        if self._mesh is not None:
            from ..parallel.mesh import replicated_sharding
            perm = jax.device_put(perm, replicated_sharding(self._mesh))
        self._perm = jax.block_until_ready(perm)

    def epoch_arrays(self):
        """(data, perm) for staging the gather INSIDE a jitted train step
        (engine/pretrain.make_train_step_multi_cached): the scan body calls
        ``make_gather`` itself, so k gathered steps ride one dispatch."""
        if self._perm is None:
            self.set_epoch(0)
        return self._data, self._perm

    def batch(self, step: int, batch_size: int) -> jax.Array:
        """The ``step``-th (B, N, C) f32 batch of the current epoch —
        a single on-device gather, no host round-trip."""
        if self._perm is None:
            self.set_epoch(0)
        if batch_size not in self._gathers:
            self._gathers[batch_size] = jax.jit(
                make_gather(self._mesh, batch_size))
        return self._gathers[batch_size](self._data, self._perm,
                                         jnp.int32(step * batch_size))

    def __iter__(self):
        raise TypeError("DeviceCache is indexed by (epoch, step); use "
                        "set_epoch() + batch() — see engine/pretrain.py")


def build_device_cache(dataset, mesh=None, dtype=jnp.float16,
                       num_hosts: int = 1, host_id: int = 0,
                       max_bytes: Optional[int] = None,
                       seed: int = 0,
                       logger_name: str = "PointDAE"):
    """Materialize a map-style dataset's clouds into a DeviceCache.

    Iterates (its block of) the dataset ONCE on host — the only time the
    loader path runs. Multi-host, process ``host_id`` loads only rows
    [host_id * M_pad/H, (host_id+1) * M_pad/H) of the wrap-padded set (its
    own devices' shard under the row-major 'data' sharding), so per-host
    work and memory divide by H. Returns None (with a log line) when this
    host's block would exceed ``max_bytes`` — caller falls back to the
    streaming loader.
    """
    from ..utils.logger import print_log

    n = len(dataset)
    n_shards = mesh.shape["data"] if mesh is not None else 1
    n_pad = -(-n // n_shards) * n_shards
    assert n_pad % num_hosts == 0, (n_pad, num_hosts)
    per_host = n_pad // num_hosts
    rows = range(host_id * per_host, (host_id + 1) * per_host) \
        if num_hosts > 1 else range(n_pad)
    first = np.asarray(dataset[0]["points"])
    itemsize = jnp.dtype(dtype).itemsize
    est = len(rows) * first.size * itemsize
    if max_bytes is not None and est > max_bytes:
        print_log(f"[DeviceCache] dataset shard ~{est/2**30:.1f} GiB exceeds "
                  f"budget {max_bytes/2**30:.1f} GiB; streaming loader kept",
                  logger=logger_name)
        return None
    t0 = time.time()
    clouds = np.stack([np.asarray(dataset[i % n]["points"], np.float32)
                       for i in rows])
    cache = DeviceCache(clouds, mesh=mesh, dtype=dtype, seed=seed, total=n)
    print_log(f"[DeviceCache] cached {n} clouds (host block {len(rows)}, "
              f"{cache.nbytes/2**30:.2f} GiB as {jnp.dtype(dtype).name}) "
              f"on device in {time.time()-t0:.1f}s "
              f"(upload {cache.upload_seconds:.1f}s); steady-state epochs "
              f"run with zero host->device traffic", logger=logger_name)
    return cache
