"""Batched on-device augmentations for finetune/vote loops
(reference: datasets/data_transforms.py:6-117 — the 'GPU transforms').

All functions are keyed, jit-fusable, and operate on (B, N, 3) arrays.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def pointcloud_scale_and_translate(key: jax.Array, pts: Array,
                                   scale_low: float = 2. / 3.,
                                   scale_high: float = 3. / 2.,
                                   translate_range: float = 0.2) -> Array:
    """PointcloudScaleAndTranslate (data_transforms.py:6-20)."""
    k1, k2 = jax.random.split(key)
    B = pts.shape[0]
    s = jax.random.uniform(k1, (B, 1, 3), minval=scale_low, maxval=scale_high)
    t = jax.random.uniform(k2, (B, 1, 3), minval=-translate_range,
                           maxval=translate_range)
    return pts * s + t


def pointcloud_scale(key: jax.Array, pts: Array, lo: float = 2. / 3.,
                     hi: float = 3. / 2.) -> Array:
    s = jax.random.uniform(key, (pts.shape[0], 1, 3), minval=lo, maxval=hi)
    return pts * s


def pointcloud_translate(key: jax.Array, pts: Array,
                         translate_range: float = 0.2) -> Array:
    t = jax.random.uniform(key, (pts.shape[0], 1, 3),
                           minval=-translate_range, maxval=translate_range)
    return pts + t


def pointcloud_jitter(key: jax.Array, pts: Array, std: float = 0.01,
                      clip: float = 0.05) -> Array:
    """PointcloudJitter: clipped gaussian noise."""
    noise = jnp.clip(std * jax.random.normal(key, pts.shape), -clip, clip)
    return pts + noise


def pointcloud_rotate(key: jax.Array, pts: Array, axis=(0.0, 1.0, 0.0)) -> Array:
    """PointcloudRotate: per-sample rotation about a fixed axis (default y,
    the torch transform's convention)."""
    B = pts.shape[0]
    ang = jax.random.uniform(key, (B,), minval=0.0, maxval=2 * math.pi)
    u = jnp.asarray(axis, jnp.float32)
    u = u / jnp.linalg.norm(u)
    c, s = jnp.cos(ang), jnp.sin(ang)
    C = 1 - c
    ux, uy, uz = u

    def rot(c, s, C):
        return jnp.array([
            [c + ux * ux * C, ux * uy * C - uz * s, ux * uz * C + uy * s],
            [uy * ux * C + uz * s, c + uy * uy * C, uy * uz * C - ux * s],
            [uz * ux * C - uy * s, uz * uy * C + ux * s, c + uz * uz * C]])

    R = jax.vmap(rot)(c, s, C)                                # (B, 3, 3)
    return jnp.einsum("bnd,bde->bne", pts, R,
                      precision=jax.lax.Precision.HIGHEST)


def random_input_dropout(key: jax.Array, pts: Array,
                         max_dropout_ratio: float = 0.875) -> Array:
    """PointcloudRandomInputDropout: per-sample ratio ~ U(0, max); dropped
    points are replaced by the first point (the torch transform's trick)."""
    B, N, _ = pts.shape
    k1, k2 = jax.random.split(key)
    ratio = jax.random.uniform(k1, (B, 1), maxval=max_dropout_ratio)
    drop = jax.random.uniform(k2, (B, N)) <= ratio
    return jnp.where(drop[..., None], pts[:, :1, :], pts)


def random_horizontal_flip(key: jax.Array, pts: Array,
                           upright_axis: int = 2) -> Array:
    """PointcloudRandomHorizontalFlip: flip each non-up axis w.p. 0.5
    (aligned-data convention)."""
    B = pts.shape[0]
    flips = jax.random.bernoulli(key, 0.5, (B, 3))
    flips = flips.at[:, upright_axis].set(False)
    sign = jnp.where(flips, -1.0, 1.0)
    return pts * sign[:, None, :]
