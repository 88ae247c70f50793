"""Fixed-shape point-cloud geometry primitives for TPU.

One module replaces the reference's four separate CUDA stacks:

- ``furthest_point_sample``  <- pointnet2 ``sampling_gpu.cu:73-229`` and
  pointops ``sampling_cuda_kernel.cu:15-171``
- ``knn``                    <- KNN_CUDA wheel and pointops heap kNN
  (``knnquery_cuda_kernel.cu:65-116``)
- ``ball_query``             <- pointnet2 ``ball_query_gpu.cu:12-57``
- ``gather_points`` / ``group_points`` <- pointnet2 ``sampling_gpu.cu:11-71``,
  ``group_points_gpu.cu:11-78``
- ``three_nn`` / ``three_interpolate`` <- pointnet2 ``interpolate_gpu.cu:12-157``

Everything operates on fixed-shape ``(B, N, 3)``/``(B, N, C)`` arrays, is
jit/vmap-compatible, and routes the heavy pairwise-distance work through
MXU matmuls. Validity masks stand in for ragged point counts.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = jnp.float32(1e10)


def pairwise_sqdist(x: Array, y: Array) -> Array:
    """Squared Euclidean distances. x: (..., N, D), y: (..., M, D) -> (..., N, M).

    Computed as ||x||^2 - 2 x.y^T + ||y||^2 so the O(N*M*D) term runs on the
    MXU. Accumulates in float32.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = jnp.sum(x * x, axis=-1, keepdims=True)          # (..., N, 1)
    yy = jnp.sum(y * y, axis=-1, keepdims=True)          # (..., M, 1)
    inner = jnp.matmul(x, jnp.swapaxes(y, -1, -2), preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    d = xx - 2.0 * inner + jnp.swapaxes(yy, -1, -2)
    return jnp.maximum(d, 0.0)


def knn(query: Array, database: Array, k: int,
        db_mask: Optional[Array] = None) -> Tuple[Array, Array]:
    """k nearest neighbours of each query point within database.

    query: (B, M, D), database: (B, N, D) -> (dists (B, M, k), idx (B, M, k)),
    sorted ascending by distance (same convention as KNN_CUDA with
    ``transpose_mode=True``). ``db_mask`` (B, N) marks valid database points;
    invalid ones sort behind every valid one (distance +inf), so they only
    appear as fill when fewer than k valid points exist — and then carry an
    inf distance so callers can exclude them exactly.
    """
    B, N_db = database.shape[0], database.shape[1]
    Nq = query.shape[1]
    if (db_mask is None and jax.default_backend() == "tpu"
            and 512 <= N_db <= 1024 and N_db % 128 == 0
            and Nq % 8 == 0 and 8 <= k <= 64):
        # single-tile Pallas kNN: distance tile stays in VMEM, iterative
        # min-extraction replaces the full sort (61 -> 38 ms at the DGCNN
        # EdgeConv shape, exact up to distance ties). k<8 (three_nn) keeps the
        # XLA path, whose dists stay differentiable; here dists are
        # stop-gradient — the reference's CUDA kNN has no backward either,
        # and every dispatched consumer (grouping, EdgeConv) only uses idx.
        from .pallas_knn import knn_pallas

        # inputs are stop-gradient so AD (incl. remat linearization) treats
        # the kernel as a constant index computation
        d, i = knn_pallas(jax.lax.stop_gradient(query),
                          jax.lax.stop_gradient(database),
                          k, tn=min(Nq, 1024), tm=N_db)
        return d, i
    d = pairwise_sqdist(query, database)                  # (B, M, N)
    if db_mask is not None:
        # +inf, not a large finite sentinel: when fewer than k valid points
        # exist the fill slots are unavoidable, but an inf distance lets
        # callers exclude them exactly (e.g. 1/(inf+eps) interpolation
        # weights collapse to 0; 1e10 would leave tiny nonzero weights)
        d = jnp.where(db_mask[..., None, :], d, jnp.inf)
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx.astype(jnp.int32)


def knn_self(x: Array, k: int) -> Array:
    """Indices of the k nearest neighbours of each point within its own cloud,
    including self (DGCNN convention, ``models/dgcnn_util.py:7-12``).

    x: (B, N, D) -> idx (B, N, k).
    """
    _, idx = knn(x, x, k)
    return idx


def furthest_point_sample(points: Array, n_samples: int,
                          mask: Optional[Array] = None) -> Array:
    """Furthest point sampling. points: (B, N, 3) -> idx (B, n_samples) int32.

    Matches the reference CUDA conventions (SURVEY.md §7 "hard parts"):
    the first selected index is 0 (``sampling_gpu.cu:88-89``), and points with
    squared magnitude <= 1e-3 are never selected (``sampling_gpu.cu:104``), so
    zero-padded points stay out. ``mask`` additionally excludes invalid points.

    Implemented as a batched ``lax.fori_loop`` carrying the running
    min-distance-to-selected-set; each iteration is one fused
    distance-update + masked argmax, which XLA vectorises across the batch.
    On TPU, sizeable problems dispatch to the batched-layout Pallas kernel
    (ops/pallas_fps.py) which runs the whole selection loop on-chip with N on
    the lane dimension — exact-parity, 8.2x at (256, 1024)->64.
    """
    points = points.astype(jnp.float32)
    B, N, _ = points.shape
    if (mask is None and jax.default_backend() == "tpu"
            and N >= 512 and N % 128 == 0):
        # batched-layout kernel: N on lanes, whole batch tile per iteration
        # (8.2x over the per-row kernel at (256, 1024)->64: 13.4 -> 1.6 ms)
        from .pallas_fps import fps_pallas_batched

        return fps_pallas_batched(points, n_samples)
    if (mask is None and jax.default_backend() == "tpu"
            and N >= 512 and N % 8 == 0):
        from .pallas_fps import fps_pallas

        return fps_pallas(points, n_samples)
    mag = jnp.sum(points * points, axis=-1)               # (B, N)
    selectable = mag > 1e-3
    if mask is not None:
        selectable = jnp.logical_and(selectable, mask)

    out = jnp.zeros((B, n_samples), dtype=jnp.int32)
    min_d = jnp.full((B, N), _BIG, dtype=jnp.float32)
    last = jnp.zeros((B,), dtype=jnp.int32)               # first pick = index 0

    def body(i, carry):
        out, min_d, last = carry
        out = out.at[:, i].set(last)
        p_last = jnp.take_along_axis(points, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((points - p_last) ** 2, axis=-1)      # (B, N)
        min_d = jnp.minimum(min_d, d)
        cand = jnp.where(selectable, min_d, -1.0)
        last = jnp.argmax(cand, axis=-1).astype(jnp.int32)
        return out, min_d, last

    out, _, _ = jax.lax.fori_loop(0, n_samples, body, (out, min_d, last))
    return out


def gather_points(points: Array, idx: Array) -> Array:
    """points: (B, N, C), idx: (B, M) -> (B, M, C).

    Role of pointnet2 ``gather_operation`` (channel-last layout here; the
    channel-first torch layout was a CUDA-coalescing artifact)."""
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def group_points(points: Array, idx: Array) -> Array:
    """points: (B, N, C), idx: (B, M, K) -> (B, M, K, C) (pointnet2 grouping).

    Routed through ``gather_rows`` so large backward scatter-adds run as MXU
    one-hot matmuls (ops/pallas_scatter.py); small shapes keep XLA paths."""
    from .pallas_scatter import gather_rows

    B, N, C = points.shape
    M, K = idx.shape[1], idx.shape[2]
    flat = gather_rows(points, idx.reshape(B, M * K))
    return flat.reshape(B, M, K, C)


def ball_query(radius: float, k: int, xyz: Array, new_xyz: Array,
               mask: Optional[Array] = None) -> Array:
    """For each query center, indices of up to k points within ``radius``.

    Matches pointnet2 ``query_ball_point_kernel`` semantics
    (``ball_query_gpu.cu:12-57``): points are taken in original index order;
    when fewer than k qualify, remaining slots repeat the first in-range
    index; when none qualify, slots are 0.

    xyz: (B, N, 3), new_xyz: (B, M, 3) -> idx (B, M, k) int32.
    """
    d = pairwise_sqdist(new_xyz, xyz)                      # (B, M, N)
    in_range = d < radius * radius
    if mask is not None:
        in_range = jnp.logical_and(in_range, mask[:, None, :])
    N = xyz.shape[1]
    order = jax.lax.broadcasted_iota(jnp.int32, in_range.shape, 2)
    # sort key: in-range points keep their index, out-of-range pushed past N
    key = jnp.where(in_range, order, order + N)
    sorted_key = jax.lax.sort(key, dimension=-1)[..., :k]  # (B, M, k)
    cnt = jnp.sum(in_range, axis=-1, dtype=jnp.int32)      # (B, M)
    first = jnp.where(cnt > 0, sorted_key[..., 0] % N, 0)  # first in-range idx
    slot = jax.lax.broadcasted_iota(jnp.int32, sorted_key.shape, 2)
    idx = jnp.where(slot < cnt[..., None], sorted_key % N, first[..., None])
    return idx.astype(jnp.int32)


def three_nn(unknown: Array, known: Array,
             known_mask: Optional[Array] = None) -> Tuple[Array, Array]:
    """3 nearest known points for each unknown point.

    unknown: (B, N, 3), known: (B, M, 3) -> (dist (B, N, 3), idx (B, N, 3)).
    dist is squared distance as in ``interpolate_gpu.cu:12-55``.
    """
    return knn(unknown, known, 3, db_mask=known_mask)


def three_interpolate(features: Array, idx: Array, dist: Array,
                      eps: float = 1e-8) -> Array:
    """Inverse-distance-weighted interpolation (``interpolate_gpu.cu:77-157``).

    features: (B, M, C), idx: (B, N, 3), dist: (B, N, 3) squared distances
    -> (B, N, C).
    """
    w = 1.0 / (dist + eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)             # (B, N, 3)
    neigh = group_points(features, idx)                    # (B, N, 3, C)
    return jnp.sum(neigh * w[..., None], axis=2)


def fps_knn(xyz: Array, num_group: int, group_size: int,
            ) -> Tuple[Array, Array, Array]:
    """FPS centers + kNN patch membership: the patchify front-end shared by
    ``group_neighborhood`` and Drop-Patch corruption.

    xyz: (B, N, 3) -> (fps_idx (B, G) int32, center (B, G, 3),
    idx (B, G, S) int32 ascending by distance).

    On TPU at training shapes this is ONE fused Pallas program
    (ops/pallas_patchify.py): the FPS loop's per-iteration distance rows are
    reused as the kNN distance matrix, so the whole serialized front-end
    (two CUDA kernels + a wheel in the reference) costs a single kernel with
    no HBM round-trips between phases.
    """
    import os

    B, N = xyz.shape[0], xyz.shape[1]
    if (os.environ.get("PDAE_FUSED_PATCHIFY", "auto") != "0"
            and jax.default_backend() == "tpu" and N >= 512 and N % 128 == 0
            and num_group % 8 == 0 and group_size >= 8
            and num_group * N * 4 <= 8 * 2 ** 20):
        from .pallas_patchify import fused_patchify_pallas

        fps_idx, idx = fused_patchify_pallas(
            jax.lax.stop_gradient(xyz.astype(jnp.float32)),
            num_group, group_size)
        center = gather_points(xyz, fps_idx)
        return fps_idx, center, idx
    fps_idx = furthest_point_sample(xyz, num_group)
    center = gather_points(xyz, fps_idx)
    _, idx = knn(center, xyz, group_size)
    return fps_idx, center, idx


def group_neighborhood(xyz: Array, num_group: int, group_size: int,
                       features: Optional[Array] = None,
                       ) -> Tuple[Array, Array]:
    """FPS + kNN patchify (role of ``Group`` in PointCAE_transformer.py:54-86).

    xyz: (B, N, 3) -> (neighborhood (B, G, S, 3) centered on its patch center,
    center (B, G, 3)). If ``features`` (B, N, C) is given, returns
    (neighborhood_with_features (B, G, S, 3+C), center) where only the xyz part
    is centered.
    """
    _, center, idx = fps_knn(xyz, num_group, group_size)
    neighborhood = group_points(xyz, idx)                  # (B, G, S, 3)
    neighborhood = neighborhood - center[:, :, None, :]
    if features is not None:
        extra = group_points(features, idx)
        neighborhood = jnp.concatenate([neighborhood, extra], axis=-1)
    return neighborhood, center


def resample_to(key: jax.Array, points: Array,
                mask: Optional[Array], num: int) -> Array:
    """Sample ``num`` points uniformly (with replacement) from the valid subset.

    TPU-native stand-in for the reference's ragged-output corruptions followed
    by ``random_sample`` back to a fixed count (``ShapeNet55Dataset.py:76-88``):
    we keep static shapes and resample from the masked set directly.

    points: (N, C), mask: (N,) bool -> (num, C). ``mask=None`` means all
    points are valid and skips the argsort packing (a measurable cost at
    pipeline scale: the clean-sample path draws straight indices).
    """
    N = points.shape[0]
    if mask is None:
        draw = jax.random.randint(key, (num,), 0, N)
        return points[draw]
    cnt = jnp.maximum(jnp.sum(mask, dtype=jnp.int32), 1)
    # positions of valid points packed to the front, invalid pushed to the end
    order = jnp.argsort(jnp.where(mask, 0, 1), stable=True)
    draw = jax.random.randint(key, (num,), 0, cnt)
    return points[order[draw]]


def resample_batch(key: jax.Array, points: Array,
                   mask: Optional[Array], num: int) -> Array:
    """Batched ``resample_to``: uniform with-replacement draws from each
    row's valid subset, selected in ONE rank-keyed MXU one-hot gather.

    The per-row path packs valid points with a stable argsort and gathers
    twice (``order[draw]`` then ``points[pos]``) — on TPU that lowers to
    element-at-a-time gathers (~5.5 ms at pipeline scale). Here the q-th
    valid point IS the point whose valid-rank equals q (stable packing
    preserves original order), so the selection becomes
    ``one_hot(rank == draw) @ points`` with rank = cumsum(mask) - 1 —
    bitwise the same choice, no sort, no gather.

    points: (B, N, C), mask: (B, N) bool or None, -> (B, num, C).
    """
    from .pallas_scatter import gather_by_key_small_c_pallas, gather_rows

    B, N, C = points.shape
    if mask is None:
        draw = jax.random.randint(key, (B, num), 0, N)
        return gather_rows(points, draw)
    cnt = jnp.maximum(jnp.sum(mask, axis=1, dtype=jnp.int32), 1)
    draw = jax.random.randint(key, (B, num), 0, cnt[:, None])
    # lower volume floor than the plain gather dispatch (the masked
    # alternative is argsort + TWO gathers, so the kernel wins earlier),
    # same N <= 2048 source ceiling (tools/profile_gather.py: rank-keyed
    # 4.9 vs argsort-pack 6.8 ms at N=2048, but 8.2 vs 7.0 at N=8192 —
    # the kernel's MXU weight-load passes scale with N*Q/128^2)
    use_kernel = (jax.default_backend() == "tpu" and C <= 8
                  and N <= 2048 and N % min(N, 2048) == 0
                  and points.dtype == jnp.float32 and B * num >= 2 ** 16)
    if use_kernel:
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
        keys_ = jnp.where(mask, rank, -1)
        return gather_by_key_small_c_pallas(points, keys_, draw)
    order = jnp.argsort(jnp.where(mask, 0, 1), axis=1, stable=True)
    pos = jnp.take_along_axis(order, draw, axis=1)
    return jnp.take_along_axis(points, pos[..., None], axis=1)


def separate_point_cloud(key: jax.Array, xyz: Array, num_crop: int,
                         fixed_point: Optional[Array] = None,
                         padding_zeros: bool = False
                         ) -> Tuple[Array, Array]:
    """Crop each cloud around a (random or fixed) view direction
    (``seprate_point_cloud``, utils/misc.py:131-184 — reference's
    incomplete-cloud generator for completion visualization).

    xyz: (B, N, 3). The ``num_crop`` points nearest to a unit view vector are
    the crop; the rest are the input. Static shapes: ``num_crop`` is a python
    int (the reference's list-range variant maps to drawing ``num_crop``
    outside and calling this per draw). With ``padding_zeros`` the crop
    points are zeroed in place instead of removed (same toggle as the
    reference).

    Returns (input (B, N-num_crop, 3) or zero-padded (B, N, 3),
    crop (B, num_crop, 3)).
    """
    B, N, _ = xyz.shape
    if fixed_point is None:
        v = jax.random.normal(key, (B, 1, 3))
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    else:
        v = jnp.broadcast_to(jnp.asarray(fixed_point).reshape(1, 1, 3),
                             (B, 1, 3))
    d = jnp.linalg.norm(v - xyz, axis=-1)                    # (B, N)
    order = jnp.argsort(d, axis=-1)                          # ascending
    sorted_pts = jnp.take_along_axis(xyz, order[..., None], axis=1)
    crop = sorted_pts[:, :num_crop]
    if padding_zeros:
        mask = jnp.zeros((B, N), bool).at[
            jnp.arange(B)[:, None], order[:, :num_crop]].set(True)
        return jnp.where(mask[..., None], 0.0, xyz), crop
    return sorted_pts[:, num_crop:], crop
