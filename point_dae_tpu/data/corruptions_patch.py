"""Patch-level corruption library for the transformer path.

Re-design of ``datasets/corrupt_util_tensor.py``: the same affine transform is
applied jointly to patch neighbourhoods ``(B, G, S, 3)`` (in absolute
coordinates) and their centers ``(B, G, 3)``, with per-sample transform
parameters. In the reference this runs inside ``model.forward`` because the
patchify ops were CUDA-only (corrupt_util.py:929 comment); here it is simply
part of the jitted train step.

Faithfully preserved reference behaviours (SURVEY.md §7 "quirks"):

- 'affine_r3' pins severity level = 4 (corrupt_util_tensor.py:720);
- the tensor-library translate *multiplies* instead of adding
  (corrupt_util_tensor.py:104-113) — a reference bug that shipped into the
  released transformer checkpoint's training. Pass
  ``fix_translate_bug=True`` to get the (intended) additive translate.
- subset selection for 'affine_r3' is drawn once per call (host-level
  ``random.sample`` in the reference), while transform *parameters* are
  per-sample.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

AFFINE_NAMES = ("translate", "scale_nonorm", "rotate", "reflection", "shear")

# every name corrupt_patches dispatches (config generators/validators check
# transformer model corrupt_type against this so emitted recipes can't
# NotImplementedError at the first train-step trace)
PATCH_SUPPORTED = frozenset(AFFINE_NAMES) | {
    "clean", "Drop-Patch", "affine_r3", "rotate_z", "jitter",
    "dropout_global", "add_local", "scan"}

# geometry transforms must not run at TPU-default (bfloat16) matmul precision
from functools import partial
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def _batched_rot(angles: Array) -> Array:
    """(B, 3) Euler angles -> (B, 3, 3), R = Rz @ Ry @ Rx, row-vector x @ R."""
    ax, ay, az = angles[:, 0], angles[:, 1], angles[:, 2]
    one = jnp.ones_like(ax)
    zero = jnp.zeros_like(ax)

    def m(rows):
        return jnp.stack([jnp.stack(r, -1) for r in rows], -2)

    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rx = m([[one, zero, zero], [zero, cx, -sx], [zero, sx, cx]])
    ry = m([[cy, zero, sy], [zero, one, zero], [-sy, zero, cy]])
    rz = m([[cz, -sz, zero], [sz, cz, zero], [zero, zero, one]])
    return _mm(rz, _mm(ry, rx))


def _params(key: jax.Array, name: str, batch: int, level: float,
            fix_translate_bug: bool) -> Tuple[Array, Array, Array]:
    """Per-sample (A (B,3,3), b_add (B,3), m_mul (B,3)) for one affine family.

    The tensor library applies either a matmul, an additive offset, or (for the
    buggy translate) a multiplicative per-axis factor.
    """
    eye = jnp.broadcast_to(jnp.eye(3), (batch, 3, 3))
    zeros = jnp.zeros((batch, 3))
    ones = jnp.ones((batch, 3))
    if name == "translate":
        # corrupt_tranlate (corrupt_util_tensor.py:88-113): s from level table
        s = [0.1, 0.2, 0.3, 0.4, 0.5][int(level)]
        v = jax.random.uniform(key, (batch, 3), minval=-s, maxval=s)
        if fix_translate_bug:
            return eye, v, ones
        return eye, zeros, v  # reference bug: multiplies
    if name == "scale_nonorm":
        # :59-84: s from level table [1.6..2.0]
        s = [1.6, 1.7, 1.8, 1.9, 2.0][int(level)]
        v = jax.random.uniform(key, (batch, 3), minval=1.0 / s, maxval=s)
        return eye, zeros, v
    if name == "rotate":
        # :139-193: clip = pi*(level+1)/5
        clip = math.pi / 5.0 * (level + 1.0)
        ang = jax.random.uniform(key, (batch, 3), minval=-clip, maxval=clip)
        return _batched_rot(ang), zeros, ones
    if name == "rotate_z":
        # :195-248: full +-pi z rotation (level unused)
        ang = jnp.zeros((batch, 3)).at[:, 2].set(
            jax.random.uniform(key, (batch,), minval=-math.pi, maxval=math.pi))
        return _batched_rot(ang), zeros, ones
    if name == "reflection":
        # :251-292 — reference quirk preserved (round-4 draw-level-oracle
        # finding): the tensor library writes the z-axis flip to matrix
        # entry [0][0] (Rz[:,0,0,0] = reflection[:,2], :278-280), so the
        # effective transform is diag(r0*r2, r1, 1): x gets the product of
        # two coin flips, y one flip, z is NEVER flipped. Equivalent in
        # distribution: two independent +-1 draws on (x, y), z fixed.
        signs = jnp.where(jax.random.bernoulli(key, 0.5, (batch, 2)), 1.0, -1.0)
        return eye, zeros, jnp.concatenate(
            [signs, jnp.ones((batch, 1))], axis=1)
    if name == "shear":
        # :306-343: clip = (level+1)*0.1
        clip = (level + 1.0) * 0.1
        s = jax.random.uniform(key, (batch, 6), minval=-clip, maxval=clip)
        one = jnp.ones((batch,))
        a = jnp.stack([
            jnp.stack([one, s[:, 0], s[:, 1]], -1),
            jnp.stack([s[:, 2], one, s[:, 3]], -1),
            jnp.stack([s[:, 4], s[:, 5], one], -1)], -2)
        return a, zeros, ones
    raise NotImplementedError(name)


def _apply(neigh: Array, center: Array, A: Array, b: Array, m: Array):
    """x -> (x * m) @ A + b on both neighbourhood and centers."""
    neigh = _mm(neigh * m[:, None, None, :], A[:, None, :, :]) + b[:, None, None, :]
    center = _mm(center * m[:, None, :], A) + b[:, None, :]
    return neigh, center


def _sample_affine_r3(key: jax.Array, batch: int, fix_translate_bug: bool):
    """Draw the 'affine_r3' composite parameters once (count, order, and
    per-sample transform params) so multiple tensors — e.g. every scale of a
    Point-M2AE pyramid — receive the identical transform, matching the tensor
    library's list branch (corrupt_util_tensor.py:77-82 etc.)."""
    k_n, k_perm, *k_p = jax.random.split(key, 2 + len(AFFINE_NAMES))
    count = jax.random.randint(k_n, (), 1, 4)
    perm = jax.random.permutation(k_perm, len(AFFINE_NAMES))
    As, bs, ms = [], [], []
    for i, name in enumerate(AFFINE_NAMES):
        A, b, m = _params(k_p[i], name, batch, 4.0, fix_translate_bug)
        As.append(A)
        bs.append(b)
        ms.append(m)
    return count, perm, jnp.stack(As), jnp.stack(bs), jnp.stack(ms)


def _apply_affine_r3(params, neigh: Array, center: Array):
    count, perm, As, bs, ms = params
    B = neigh.shape[0]
    eyeB = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))

    def body(carry, slot):
        neigh, center = carry
        j = perm[slot]
        use = slot < count
        A = jnp.where(use, As[j], eyeB)
        b = jnp.where(use, bs[j], jnp.zeros((B, 3)))
        m = jnp.where(use, ms[j], jnp.ones((B, 3)))
        return _apply(neigh, center, A, b, m), None

    (neigh, center), _ = jax.lax.scan(body, (neigh, center),
                                      jnp.arange(len(AFFINE_NAMES)))
    return neigh, center


def affine_r3_patches(key: jax.Array, neigh: Array, center: Array,
                      fix_translate_bug: bool = False) -> Tuple[Array, Array]:
    """The 'affine_r3' composite at pinned level 4 (corrupt_util_tensor.py:712-721).

    1..3 of the 5 affine families, random order, one subset per call,
    per-sample parameters. neigh: (B, G, S, 3) absolute coords,
    center: (B, G, 3).
    """
    params = _sample_affine_r3(key, neigh.shape[0], fix_translate_bug)
    return _apply_affine_r3(params, neigh, center)


def corrupt_patches_multi(key: jax.Array, neighs, centers, types,
                          fix_translate_bug: bool = False):
    """List variant: the identical per-sample transform applied to every
    (neigh, center) scale pair (the tensor library's isinstance-list branches).
    Only affine families are supported for lists, as in the reference."""
    neighs, centers = list(neighs), list(centers)
    for i, t in enumerate(types):
        k = jax.random.fold_in(key, i)
        if t in ("clean", "Drop-Patch"):
            continue
        elif t == "affine_r3":
            params = _sample_affine_r3(k, neighs[0].shape[0], fix_translate_bug)
            for s in range(len(neighs)):
                neighs[s], centers[s] = _apply_affine_r3(params, neighs[s],
                                                         centers[s])
        elif t in AFFINE_NAMES or t == "rotate_z":
            A, b, m = _params(k, t, neighs[0].shape[0], 4.0, fix_translate_bug)
            for s in range(len(neighs)):
                neighs[s], centers[s] = _apply(neighs[s], centers[s], A, b, m)
        else:
            raise NotImplementedError(f"list patch corruption {t!r}")
    return neighs, centers


def dropout_global_patches(key: jax.Array, neigh: Array, level=None) -> Array:
    """dropout_global_random (corrupt_util_tensor.py:382-415): drop a random
    fraction of points inside every patch. Fixed-shape version: dropped slots
    are refilled by duplicating kept points (max-pooling patch encoders are
    invariant to duplicates, so semantics match the reference's truncation).
    """
    B, G, S, _ = neigh.shape
    k_lv, k_perm, k_fill = jax.random.split(key, 3)
    if level is None:
        level = jax.random.randint(k_lv, (), 0, 5)
    rates = jnp.array([0.25, 0.375, 0.5, 0.625, 0.75])
    keep = (S * (1.0 - rates[level])).astype(jnp.int32)
    r = jax.random.uniform(k_perm, (B, G, S))
    order = jnp.argsort(r, axis=-1)
    # first `keep` of the random order are kept; others refilled from kept set
    fill = jax.random.randint(k_fill, (B, G, S), 0, jnp.maximum(keep, 1))
    slot = jnp.arange(S)[None, None, :]
    src = jnp.where(slot < keep, slot, fill)
    idx = jnp.take_along_axis(order, src, axis=-1)
    return jnp.take_along_axis(neigh, idx[..., None], axis=2)


def add_local_patches(key: jax.Array, neigh: Array, level=None) -> Array:
    """corrupt_add_local (corrupt_util_tensor.py:462-502): jitter a random
    subset of each patch and append. Fixed-shape approximation: the noised
    copies replace a UNIFORMLY-RANDOM subset of slots so S stays constant
    (the reference grew S to S*(1+rate); at fixed S the grown patch's noise
    PROPORTION is preserved via add_n = S*rate/(1+rate), at the cost of
    dropping add_n random originals — never the kNN-nearest/center slots,
    which slot order would otherwise select)."""
    B, G, S, _ = neigh.shape
    k_lv, k_pick, k_sigma, k_noise = jax.random.split(key, 4)
    if level is None:
        # discrete severity like the reference's level=None branch
        # (corrupt_util_tensor.py:475-477 random.choice([0..4]))
        level = jax.random.randint(k_lv, (), 0, 5).astype(jnp.float32)
    add_n = jnp.asarray(
        S * (level + 1.0) * 0.1 / (1.0 + (level + 1.0) * 0.1)).astype(jnp.int32)
    sigma = jax.random.uniform(k_sigma, (), minval=0.075, maxval=0.125)
    r = jax.random.uniform(k_pick, (B, G, S))
    order = jnp.argsort(r, axis=-1)
    # random arrangement of the patch; the first add_n of it become noised
    # copies (sources ARE the randomly-picked points, reference :494-500),
    # the rest keep the remaining originals
    perm = jnp.take_along_axis(neigh, order[..., None], axis=2)
    noised = perm + sigma * jax.random.normal(k_noise, neigh.shape)
    slot = jnp.arange(S)[None, None, :, None]
    return jnp.where(slot < add_n, noised, perm)


def scan_density_patches(key: jax.Array, neigh: Array, center: Array,
                         level=None) -> Array:
    """density (corrupt_util_tensor.py:531-577): view-dependent thinning;
    dropped in-patch points are replaced by the patch center (the reference's
    gather trick with index 33 -> center slot).

    Reference quirks preserved (round-4 draw-level-oracle findings):
    - the computed ``gate = level + 1`` is DEAD in the tensor library: the
      selection is ``dist < r_list`` with no gate factor (:568), so the
      severity level does not modulate the thinning at all;
    - the reference's gather additionally reorders each patch
      (dropped-as-center slots first, then kept points); we replace
      in place — the same multiset, and every consumer (PatchEncoder
      max-pool) is permutation-invariant.
    """
    B, G, S, _ = neigh.shape
    k_lv, k_v, k_r = jax.random.split(key, 3)
    v = jax.random.normal(k_v, (3,))
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    dist = jnp.linalg.norm(neigh - v[None, None, None, :], axis=-1) / 2.0
    r = jax.random.uniform(k_r, (B, G, S))
    keep = dist < r
    return jnp.where(keep[..., None], neigh, center[:, :, None, :])


def jitter_patches(key: jax.Array, neigh: Array, center: Array, level: float
                   ) -> Tuple[Array, Array]:
    """corrupt_jitter (corrupt_util_tensor.py:116-136)."""
    k1, k2 = jax.random.split(key)
    sigma = 0.01 * (level + 1.0)
    return (neigh + sigma * jax.random.normal(k1, neigh.shape),
            center + sigma * jax.random.normal(k2, center.shape))


def corrupt_patches(key: jax.Array, neigh: Array, center: Array,
                    types: Sequence[str],
                    fix_translate_bug: bool = False) -> Tuple[Array, Array]:
    """Dispatch matching ``corrupt_util_tensor.corrupt_data`` (:706-728).

    neigh: (B, G, S, 3) in absolute coordinates (the caller adds the center
    back before corruption and re-subtracts after, as the reference models do,
    e.g. PointCAE_transformer.py:680-684). 'clean' and 'Drop-Patch' are
    no-ops (patch masking happens in the MaskTransformer).
    """
    for i, t in enumerate(types):
        k = jax.random.fold_in(key, i)
        if t in ("clean", "Drop-Patch"):
            continue
        elif t == "affine_r3":
            neigh, center = affine_r3_patches(k, neigh, center, fix_translate_bug)
        elif t in AFFINE_NAMES or t == "rotate_z":
            A, b, m = _params(k, t, neigh.shape[0], 4.0, fix_translate_bug)
            neigh, center = _apply(neigh, center, A, b, m)
        elif t == "jitter":
            neigh, center = jitter_patches(k, neigh, center, 4.0)
        elif t == "dropout_global":
            # level pinned to 4 like jitter/affine: the reference's
            # corrupt_data reaches non-affine entries with the level
            # variable leaked from the affine_r3 branch (= 4,
            # corrupt_util_tensor.py:716-726; without a preceding affine_r3
            # the reference NameErrors, i.e. those lists are dead upstream)
            neigh = dropout_global_patches(k, neigh, level=4)
        elif t == "add_local":
            neigh = add_local_patches(k, neigh, level=4.0)
        elif t == "scan":
            # density(level=4) draws uniform(0, 4) internally
            # (corrupt_util_tensor.py:541-543), identical to level=None
            neigh = scan_density_patches(k, neigh, center)
        else:
            raise NotImplementedError(f"patch corruption {t!r}")
    return neigh, center
