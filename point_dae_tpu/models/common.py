"""Shared model-level utilities: input dropout corruptions and folding grids.

The reference applies 'dropout_patch_pointmae' / 'dropout_global*' /
'random_dropout' inside ``model.forward`` because FPS/KNN were CUDA-only
(PointCAE_DGCNN.py:106-117, corrupt_util.py:896-924). Here they are ordinary
keyed functions invoked at the top of the model call, fused into the jitted
train step.

Static-shape note: the reference's dropouts shrink the point count; our
equivalents keep (B, N, 3) fixed by resampling the surviving subset with
replacement (duplicates are inert for max-pooled encoders, and the reference
itself pads by resampling — ShapeNet55Dataset.py:76-88).
"""
from __future__ import annotations

import itertools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (fps_knn, furthest_point_sample, gather_points, knn,
                   group_points, resample_batch)

Array = jax.Array


def dropout_patch_pointmae(key: jax.Array, pts: Array,
                           num_group: int = 64, group_size: int = 32) -> Array:
    """Patchify (FPS + kNN) and drop whole patches with prob ~ U(0.5, 0.9)
    (dropout_patch_random, corrupt_util.py:900-924). The patch mask is shared
    across the batch, as in the reference (torch.rand(64) on host).
    Survivors are resampled back to N points."""
    B, N, _ = pts.shape
    k_lv, k_mask, k_rs = jax.random.split(key, 3)
    level = jax.random.uniform(k_lv, (), minval=0.0, maxval=4.0)
    prob = level / 10.0 + 0.5
    _, _, idx = fps_knn(pts, num_group, group_size)         # (B, G, S)
    keep_patch = jax.random.uniform(k_mask, (num_group,)) > prob
    # at least one patch survives (reference: group_mask[0] = True)
    keep_patch = keep_patch.at[0].set(jnp.logical_or(keep_patch[0],
                                                     jnp.sum(keep_patch) == 0))
    neigh = group_points(pts, idx)                          # (B, G, S, 3)
    flat = neigh.reshape(B, num_group * group_size, 3)
    flat_mask = jnp.broadcast_to(keep_patch[None, :, None],
                                 (B, num_group, group_size)
                                 ).reshape(B, num_group * group_size)
    return resample_batch(k_rs, flat, flat_mask, N)


def dropout_global(key: jax.Array, pts: Array, drop_rate: float = 0.5) -> Array:
    """Random global dropout (dropout_global_random, corrupt_util.py:572-588);
    survivors resampled back to N (duplicates inert for max-pool encoders)."""
    B, N, _ = pts.shape
    k_m, k_rs = jax.random.split(key)
    keep_n = int(N * (1.0 - drop_rate))
    r = jax.random.uniform(k_m, (B, N))
    order = jnp.argsort(r, axis=-1)
    rank = jnp.zeros((B, N), jnp.int32).at[
        jnp.arange(B)[:, None], order].set(jnp.arange(N, dtype=jnp.int32)[None])
    mask = rank < keep_n
    return resample_batch(k_rs, pts, mask, N)


def apply_input_dropout(key: jax.Array, pts: Array,
                        corrupt_type: Sequence[str]) -> Array:
    """Dispatch matching the in-forward corruption switch
    (Point_CAE_DGCNN_FCOnly.forward, PointCAE_DGCNN.py:199-220)."""
    for i, item in enumerate(corrupt_type):
        k = jax.random.fold_in(key, i)
        if item == "dropout_patch_pointmae":
            pts = dropout_patch_pointmae(k, pts)
        elif item == "dropout_global":
            pts = dropout_global(k, pts, 0.5)
        elif item.startswith("dropout_global_p"):
            pts = dropout_global(k, pts, int(item[len("dropout_global_p"):]) / 10.0)
        elif item == "random_dropout":
            k1, k2 = jax.random.split(k)
            pts = jax.lax.cond(
                jax.random.uniform(k1) > 0.5,
                lambda p: dropout_patch_pointmae(k2, p),
                lambda p: dropout_global(k2, p, 0.5),
                pts)
        # every other corruption name already ran in the data pipeline
    return pts


def folding_grid(grid_dims: Tuple[int, int],
                 scale: Tuple[float, float] = (-0.3, 0.3)) -> np.ndarray:
    """2-D folding seed grid as itertools.product of linspaces
    (Point_CAE_DGCNN.build_grid / PointCAE_transformer.build_grid)."""
    x = np.linspace(scale[0], scale[1], grid_dims[0])
    y = np.linspace(scale[0], scale[1], grid_dims[1])
    pts = np.array(list(itertools.product(x, y)), dtype=np.float32)
    return pts  # (grid_dims[0]*grid_dims[1], 2)
