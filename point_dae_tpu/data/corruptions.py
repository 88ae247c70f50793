"""Per-cloud corruption & augmentation library, PRNG-keyed and jit-fused.

TPU-native re-design of ``datasets/corrupt_util.py`` (reference): every
corruption is a pure function ``(key, points, level) -> points`` (affine /
noise) or ``(key, points, mask, level) -> (points, mask)`` (density-changing),
on fixed-shape ``(N, 3)`` buffers with a validity mask standing in for ragged
point counts. The reference resamples corrupted clouds back to a fixed count
anyway (``ShapeNet55Dataset.py:76-88,112``), so ``corrupt_and_sample`` fuses
corruption + resample into one jittable, vmappable pipeline that runs on
device instead of in numpy dataloader workers (the reference's hot loop,
SURVEY.md §3.1).

Affine corruptions compose into a single (A, b) pair per cloud — a random
subset in random order collapses to one 3x3 matmul via a 5-step permutation
scan (``corrupt_data`` 'affine_r3'/'affine_r5', corrupt_util.py:1046-1093).

RNG parity note (SURVEY.md §7): bitwise parity with numpy's global RNG stream
is out of scope; each corruption matches the reference's *distribution*
(tested statistically in tests/test_corruptions.py).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

AFFINE_NAMES = ("translate", "scale_nonorm", "rotate", "reflection", "shear")
AFFINE_NAMES_V2 = ("translate", "scale_nonorm", "rotate_level1", "reflection", "shear_1p")

# geometry transforms must not run at TPU-default (bfloat16) matmul precision
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


# --------------------------------------------------------------- helpers

def _k_smallest_mask(d: Array, mask: Array, k: Array) -> Array:
    """Boolean mask selecting exactly ``min(k, sum(mask))`` entries of ``d``
    with the smallest values among the ``mask``-valid ones, ties broken by
    index order (the same selection a stable argsort + rank comparison
    makes) — without sorting.

    TPU-native replacement for the argsort + rank-scatter idiom: sorts and
    scatters are the slow ops on TPU (the argsort version of dropout_local
    measured 92 ms of the 556 ms bs-256 DGCNN recipe step). Here a 31-step
    binary search over the float32 bit pattern finds the k-th smallest
    value exactly — for non-negative floats, IEEE bit order equals value
    order — then a cumsum picks the first ``k - count_strictly_less`` of
    the ties. O(31*N) elementwise compares + reductions, fully vectorized.

    ``d`` must be non-negative (squared distances, uniform draws); invalid
    rows may hold +inf.
    """
    bits = jax.lax.bitcast_convert_type(d.astype(jnp.float32), jnp.int32)
    k = k.astype(jnp.int32)

    def bit_step(i, t):
        cand = t | (jnp.int32(1) << (30 - i))
        cnt = jnp.sum((bits < cand) & mask, dtype=jnp.int32)
        return jnp.where(cnt < k, cand, t)

    # v = max{t : count(valid bits < t) < k} == the k-th smallest valid
    # value (greedy MSB-first construction; the predicate is monotone)
    v = jax.lax.fori_loop(0, 31, bit_step, jnp.int32(0))
    strict = (bits < v) & mask
    extra = k - jnp.sum(strict, dtype=jnp.int32)
    ties = (bits == v) & mask
    take_tie = ties & (jnp.cumsum(ties.astype(jnp.int32)) <= extra)
    return strict | take_tie


def pc_normalize(pc: Array, mask: Optional[Array] = None) -> Array:
    """Center and scale to the unit sphere (corrupt_util.py:7-17). With a
    validity ``mask`` (N,) the statistics come from valid rows only — the
    reference operates on the physically-shrunk array, so masked-out rows
    must not shift the mean or inflate the max norm."""
    if mask is None:
        pc = pc - jnp.mean(pc, axis=0, keepdims=True)
        m = jnp.max(jnp.sqrt(jnp.sum(pc ** 2, axis=1)))
        return pc / jnp.maximum(m, 1e-12)
    w = mask.astype(pc.dtype)[:, None]
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pc * w, axis=0, keepdims=True) / cnt
    pc = pc - mean
    norms = jnp.sqrt(jnp.sum(pc ** 2, axis=1))
    m = jnp.max(jnp.where(mask, norms, 0.0))
    return pc / jnp.maximum(m, 1e-12)


def _rot_from_eulers(angles: Array) -> Array:
    """R = Rz @ Ry @ Rx for row-vector application x @ R (corrupt_util.py:241-263)."""
    ax, ay, az = angles[0], angles[1], angles[2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return _mm(rz, _mm(ry, rx))


def ball_from_draws(radius_u: Array, costheta: Array, phi: Array) -> Array:
    """Deterministic part of unit-ball sampling given the three uniform draw
    vectors (corrupt_util.py:42-56: radius = u^(1/3), theta = arccos(u'),
    so sin(theta) = sqrt(1 - u'^2) >= 0). Draw-level oracle entry point."""
    radius = radius_u ** (1.0 / 3.0)
    sintheta = jnp.sqrt(jnp.maximum(1.0 - costheta ** 2, 0.0))
    return jnp.concatenate(
        [radius * sintheta * jnp.cos(phi),
         radius * sintheta * jnp.sin(phi),
         radius * costheta], axis=1)


def _sample_ball(key: jax.Array, n: int) -> Array:
    """Uniform points inside the unit sphere (corrupt_util.py:42-56)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return ball_from_draws(
        jax.random.uniform(k1, (n, 1)),
        jax.random.uniform(k2, (n, 1), minval=-1.0, maxval=1.0),
        jax.random.uniform(k3, (n, 1), minval=0.0, maxval=2 * math.pi))


def _multinomial_sizes(key: jax.Array, total: Array, num_clusters: Array,
                       max_clusters: int, n_max: int = 4096) -> Array:
    """Sizes of ``num_clusters`` equal-probability multinomial bins summing to
    ``total`` (role of _gen_random_cluster_sizes, corrupt_util.py:30-39).

    Sampled as the histogram of ``total`` uniform cluster picks — exactly the
    Multinomial(total, 1/c) distribution, with no data-dependent control flow
    (the previous Binomial-chain decomposition hid rejection-sampling `while`
    loops inside ``jax.random.binomial``, tens of ms per pipeline batch).
    ``n_max`` is the static draw capacity (>= any possible ``total``).
    Returns (max_clusters,) with zeros past num_clusters.
    """
    picks = jax.random.randint(key, (n_max,), 0, jnp.maximum(num_clusters, 1))
    return histogram_sizes(picks, total, max_clusters)


def histogram_sizes(picks: Array, total: Array, max_clusters: int) -> Array:
    """Histogram of the first ``total`` cluster picks over ``max_clusters``
    bins — the deterministic part of ``_gen_random_cluster_sizes``
    (corrupt_util.py:30-39: randint(num_clusters, size=total) histogram).
    Draw-level oracle entry point."""
    n_max = picks.shape[0]
    live = jnp.arange(n_max) < total                          # (n_max,)
    bins = jnp.arange(max_clusters)                           # (C,)
    sizes = jnp.sum(live[:, None]
                    & (picks[:, None] == bins[None, :]), axis=0)
    return sizes.astype(jnp.int32)


# --------------------------------------------------------------- affine params
# Each returns (A (3,3), b (3,)) applied as x @ A + b.

def affine_translate(key, level, s: float = 0.5):
    """corrupt_tranlate (corrupt_util.py:130-140): fixed s=0.5, level unused."""
    b = jax.random.uniform(key, (3,), minval=-s, maxval=s)
    return jnp.eye(3), b


def affine_scale_nonorm(key, level, s: float = 2.0):
    """corrupt_scale_nonorm_2p (:82-92): diag(U(1/s, s)^3), level unused."""
    d = jax.random.uniform(key, (3,), minval=1.0 / s, maxval=s)
    return jnp.diag(d), jnp.zeros(3)


def affine_rotate(key, level):
    """corrupt_rotate_360 (:241-263): full +-pi Euler, level unused."""
    angles = jax.random.uniform(key, (3,), minval=-math.pi, maxval=math.pi)
    return _rot_from_eulers(angles), jnp.zeros(3)


def affine_rotate_level(key, level):
    """corrupt_rotate_360_levelK (:265-388): clip = pi*(level+1)/5."""
    clip = math.pi / 5.0 * (level + 1.0)
    angles = jax.random.uniform(key, (3,), minval=-clip, maxval=clip)
    return _rot_from_eulers(angles), jnp.zeros(3)


def affine_reflection(key, level):
    """corrupt_reflection (:390-409): random axis sign flips."""
    signs = jnp.where(jax.random.bernoulli(key, 0.5, (3,)), 1.0, -1.0)
    return jnp.diag(signs), jnp.zeros(3)


def shear_matrix(s: Array) -> Array:
    """Unit-diagonal shear from the 6 off-diagonal draws, row-major order
    (corrupt_util.py:412-428). Draw-level oracle entry point."""
    return jnp.array([[1.0, s[0], s[1]],
                      [s[2], 1.0, s[3]],
                      [s[4], s[5], 1.0]])


def affine_shear(key, level, clip: float = 0.5):
    """corrupt_shear_p5 (:412-428): unit diagonal, off-diag U(-clip, clip)."""
    s = jax.random.uniform(key, (6,), minval=-clip, maxval=clip)
    return shear_matrix(s), jnp.zeros(3)


def rotz_matrix(ang: Array) -> Array:
    """Z-rotation matrix for row-vector application x @ R
    (corrupt_util.py:537-552). Draw-level oracle entry point."""
    c, s = jnp.cos(ang), jnp.sin(ang)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def affine_rotate_z(key, level):
    """corrupt_rotate_z_360 (:537-552): z rotation, clip scaled by level."""
    clip = math.pi / 5.0 * (level + 1.0)
    ang = jax.random.uniform(key, (), minval=-clip, maxval=clip)
    return rotz_matrix(ang), jnp.zeros(3)


_AFFINE_FNS: Dict[str, Callable] = {
    "translate": affine_translate,
    "translate_tiny": partial(affine_translate, s=0.1),
    "translate_middle": partial(affine_translate, s=0.3),
    "translate_too_large": partial(affine_translate, s=0.8),
    "scale_nonorm": affine_scale_nonorm,
    "scale_nonorm_1p5": partial(affine_scale_nonorm, s=1.5),
    "scale_nonorm_4": partial(affine_scale_nonorm, s=4.0),
    "scale_nonorm_10": partial(affine_scale_nonorm, s=10.0),
    "rotate": affine_rotate,
    "rotate_level0": lambda k, l: affine_rotate_level(k, 0.0),
    "rotate_level1": lambda k, l: affine_rotate_level(k, 1.0),
    "rotate_level2": lambda k, l: affine_rotate_level(k, 2.0),
    "rotate_level3": lambda k, l: affine_rotate_level(k, 3.0),
    "rotate_level4": lambda k, l: affine_rotate_level(k, 4.0),
    "reflection": affine_reflection,
    "shear": affine_shear,
    # config alias: the reference registry binds 'shear' to
    # corrupt_shear_p5 (clip 0.5) and pretrain_PointCAE_shear_p5.yaml names
    # it 'shear_p5' (a KeyError in the reference; consciously fixed here)
    "shear_p5": affine_shear,
    "shear_p1": partial(affine_shear, clip=0.1),
    "shear_p3": partial(affine_shear, clip=0.3),
    "shear_p8": partial(affine_shear, clip=0.8),
    "shear_1p": partial(affine_shear, clip=1.0),
    "shear_2p": partial(affine_shear, clip=2.0),
    "rotate_z": affine_rotate_z,
}


def _shear_small(key, level):
    """corrupt_shear_small (:520-535): clip = 0.02*(level+1)."""
    clip = 0.02 * (level + 1.0)
    s = jax.random.uniform(key, (6,), minval=-clip, maxval=clip)
    return shear_matrix(s), jnp.zeros(3)


_AFFINE_FNS["shear_small"] = _shear_small


def compose_random_affines(key: jax.Array, max_n: int,
                           names: Sequence[str] = AFFINE_NAMES,
                           ) -> Tuple[Array, Array]:
    """(A, b) of 1..max_n distinct affines from ``names`` in random order.

    Implements the 'affine_r3' / 'affine_r5' composites
    (corrupt_util.py:1046-1093): count ~ U{1..max_n}, subset + order via a
    random permutation, each member drawn with level ~ U{0..4}. Composition of
    x -> x @ A_i + b_i in sequence collapses to a single (A, b).
    """
    k_n, k_perm, k_lv, *k_params = jax.random.split(key, 3 + len(names))
    count = jax.random.randint(k_n, (), 1, max_n + 1)
    perm = jax.random.permutation(k_perm, len(names))
    levels = jax.random.randint(k_lv, (len(names),), 0, 5).astype(jnp.float32)

    # precompute each candidate's (A, b), then scan over permutation slots
    mats, vecs = [], []
    for i, name in enumerate(names):
        a, b = _AFFINE_FNS[name](k_params[i], levels[i])
        mats.append(a)
        vecs.append(b)
    mats = jnp.stack(mats)  # (len, 3, 3)
    vecs = jnp.stack(vecs)  # (len, 3)

    def body(carry, slot):
        A, b = carry
        j = perm[slot]
        use = slot < count
        Ai = jnp.where(use, mats[j], jnp.eye(3))
        bi = jnp.where(use, vecs[j], jnp.zeros(3))
        # x@A + b, then @Ai + bi  ->  x@(A Ai) + (b Ai + bi)
        return (_mm(A, Ai), _mm(b, Ai) + bi), None

    (A, b), _ = jax.lax.scan(body, (jnp.eye(3), jnp.zeros(3)),
                             jnp.arange(len(names)))
    return A, b


# --------------------------------------------------------------- noise / density

def corrupt_jitter(key: jax.Array, pts: Array, level: Array, sigma: Optional[float] = None) -> Array:
    """corrupt_jitter (:179-191): sigma = 0.01*(level+1) unless fixed."""
    s = sigma if sigma is not None else 0.01 * (level + 1.0)
    return pts + s * jax.random.normal(key, pts.shape)


def dropout_local(key: jax.Array, pts: Array, mask: Array,
                  drop_ratio: Optional[float] = None,
                  max_clusters: int = 8) -> Array:
    """corrupt_dropout_local (:590-612): remove 1..max_clusters-1 random
    clusters totalling ratio*N points; each cluster removes the K nearest
    remaining points to a randomly chosen remaining point. Returns the updated
    validity mask (fixed shapes; ragged truncation becomes masking).

    drop_ratio None -> U(0.1, 0.5) as in the default registry entry; the
    c{1,2,3,5,8}d{1,3,5,7,9} variants pin ratio and cluster count.
    """
    n = pts.shape[0]
    k_ratio, k_nc, k_sizes, k_seeds = jax.random.split(key, 4)
    if drop_ratio is None:
        ratio = jax.random.uniform(k_ratio, (), minval=0.1, maxval=0.5)
    else:
        ratio = jnp.float32(drop_ratio)
    n_valid = jnp.sum(mask, dtype=jnp.int32)
    total = (n_valid.astype(jnp.float32) * ratio).astype(jnp.int32)
    num_clusters = jax.random.randint(k_nc, (), 1, max_clusters)
    sizes = _multinomial_sizes(k_sizes, total, num_clusters,
                               max_clusters - 1, n_max=n)
    seed_keys = jax.random.split(k_seeds, max_clusters - 1)

    def body(i, mask):
        K = sizes[i]
        # random remaining point
        r = jax.random.uniform(seed_keys[i], (n,))
        r = jnp.where(mask, r, -1.0)
        seed_idx = jnp.argmax(r)
        d = jnp.sum((pts - pts[seed_idx]) ** 2, axis=-1)
        # the K nearest remaining: exact sort-free selection (bitwise the
        # same mask the stable argsort+rank formulation produced — see the
        # oracle test in tests/test_corruptions.py)
        drop = _k_smallest_mask(d, mask, K)
        return jnp.logical_and(mask, jnp.logical_not(drop))

    return jax.lax.fori_loop(0, max_clusters - 1, body, mask)


def dropout_global(key: jax.Array, mask: Array, drop_rate: float = 0.5) -> Array:
    """dropout_global_random (:572-588): keep a uniformly random subset of
    exactly (1-rate)*N points (as a mask update)."""
    n = mask.shape[0]
    n_valid = jnp.sum(mask, dtype=jnp.int32)
    keep = (n_valid.astype(jnp.float32) * (1.0 - drop_rate)).astype(jnp.int32)
    r = jax.random.uniform(key, (n,))
    # keep the `keep` smallest draws among valid rows (sort-free exact
    # selection; same keep-set as ranking a stable argsort)
    return _k_smallest_mask(r, mask, keep)


def add_global(key: jax.Array, pts: Array, mask: Array, level: Array,
               capacity: int) -> Tuple[Array, Array]:
    """corrupt_add_global (:830-841): append int(N*(level+1)*0.1) uniform-ball
    points. Fixed-capacity version: the buffer grows to ``capacity`` rows and
    the appended tail is valid only up to the sampled count."""
    n = pts.shape[0]
    extra = capacity - n
    k_pts = key
    n_valid = jnp.sum(mask, dtype=jnp.int32)
    n_add = (n_valid.astype(jnp.float32) * (level + 1.0) * 0.1).astype(jnp.int32)
    n_add = jnp.minimum(n_add, extra)
    new_pts = _sample_ball(k_pts, extra)
    out = jnp.concatenate([pts, new_pts], axis=0)
    tail_mask = jnp.arange(extra) < n_add
    return out, jnp.concatenate([mask, tail_mask], axis=0)


def cluster_slots(sizes: Array, extra: int) -> Array:
    """Cluster id of each of ``extra`` contiguous append slots given the
    per-cluster sizes (the reference fills add_pcd[num_added:num_added+K]
    contiguously, corrupt_util.py:856-862). Draw-level oracle entry point."""
    cum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(sizes)])
    slot = jnp.arange(extra)
    return jnp.sum(slot[:, None] >= cum[None, 1:], axis=1)        # (extra,)


def sphere_pullback(p: Array) -> Array:
    """Pull points outside the unit sphere back by dividing by their squared
    norm — the reference's exact (unusual) formula, corrupt_util.py:866-867:
    every coordinate of an outside row is divided by the same row dist.
    Draw-level oracle entry point."""
    d2 = jnp.sum(p ** 2, axis=1, keepdims=True)
    return jnp.where(d2 > 1.0, p / d2, p)


def add_local(key: jax.Array, pts: Array, mask: Array, level: Array,
              capacity: int, max_clusters: int = 8) -> Tuple[Array, Array]:
    """corrupt_add_local (:844-870): gaussian blobs (sigma ~ U(0.075, 0.125)
    drawn PER CLUSTER, :858) around randomly chosen surface points, total
    int(N*(level+1)*0.1) points, split over 1..7 clusters; blobs outside the
    unit sphere are pulled back.
    """
    n = pts.shape[0]
    extra = capacity - n
    k_nc, k_sizes, k_sigma, k_anchor, k_noise = jax.random.split(key, 5)
    n_valid = jnp.sum(mask, dtype=jnp.int32)
    total = jnp.minimum(
        (n_valid.astype(jnp.float32) * (level + 1.0) * 0.1).astype(jnp.int32), extra)
    num_clusters = jax.random.randint(k_nc, (), 1, max_clusters)
    sizes = _multinomial_sizes(k_sizes, total, num_clusters,
                               max_clusters - 1, n_max=extra)
    cluster_of = cluster_slots(sizes, extra)
    # anchors: random valid surface points, one per cluster
    r = jnp.where(mask, jax.random.uniform(k_anchor, (n,)), -1.0)
    anchor_order = jnp.argsort(-r)[: max_clusters - 1]
    anchors = pts[anchor_order]                                     # (C, 3)
    ci = jnp.clip(cluster_of, 0, max_clusters - 2)
    # sigma is drawn once per cluster (ref :858), not once per call — a
    # round-4 draw-level-oracle finding: the joint distribution differs
    # (clusters have independent spreads)
    sigmas = jax.random.uniform(k_sigma, (max_clusters - 1,),
                                minval=0.075, maxval=0.125)
    noise = sigmas[ci][:, None] * jax.random.normal(k_noise, (extra, 3))
    new_pts = sphere_pullback(anchors[ci] + noise)
    out = jnp.concatenate([pts, new_pts], axis=0)
    tail_mask = jnp.arange(extra) < total
    return out, jnp.concatenate([mask, tail_mask], axis=0)


def nonuniform_density(key: jax.Array, pts: Array, mask: Array, level: Array) -> Array:
    """density (:875-894): LiDAR-like view-dependent thinning. Points far from
    a random viewpoint on the unit sphere are dropped with higher probability.
    """
    k_v, k_r = jax.random.split(key)
    gate = level / 4.0 + 0.1
    v = jax.random.normal(k_v, (3,))
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    dist = jnp.linalg.norm(pts - v[None, :], axis=1)
    dist = dist / 2.0  # (dist - (|v|-1)) / ((|v|+1) - (|v|-1)) with |v|=1
    r = jax.random.uniform(k_r, (pts.shape[0],))
    keep = dist * gate < r
    return jnp.logical_and(mask, keep)


# --------------------------------------------------------------- augmentation

def augment_cloud(key: jax.Array, pts: Array, types: Sequence[str]) -> Array:
    """augment_data (corrupt_util.py:1155-1175): norm / clean / translate /
    scale / rotate_z / rotate."""
    for i, t in enumerate(types):
        k = jax.random.fold_in(key, i)
        if t == "norm":
            pts = pc_normalize(pts)
        elif t == "clean":
            pass
        elif t == "translate":
            pts = pts + jax.random.uniform(k, (3,), minval=-0.2, maxval=0.2)
        elif t == "scale":
            pts = pts * jax.random.uniform(k, (3,), minval=2.0 / 3.0, maxval=3.0 / 2.0)
        elif t == "rotate_z":
            a, _ = affine_rotate_z(k, 4.0)  # clip = pi (aug_rotate_z, :1115-1127)
            pts = _mm(pts, a)
        elif t == "rotate":
            a, _ = affine_rotate(k, None)
            pts = _mm(pts, a)
        else:
            raise NotImplementedError(f"augmentation {t!r}")
    return pts


# --------------------------------------------------------------- pipeline

_ADDING = {"add_global", "add_local", "random_add"}


def corruption_capacity(n: int, types: Sequence[str]) -> int:
    """Buffer rows needed so adding corruptions never overflow (max +50% each)."""
    cap = n
    for t in types:
        if t in _ADDING:
            cap += n // 2
    return cap


def corrupt_cloud(key: jax.Array, pts: Array, types: Sequence[str],
                  ) -> Tuple[Array, Array]:
    """Apply a static list of corruption names to one (N, 3) cloud.

    Mirrors ``corrupt_data`` (corrupt_util.py:1046-1093): 'clean',
    'dropout_patch_pointmae' and 'dropout_global*' are no-ops here (they run
    inside the model forward in the reference; here inside the train step),
    composite 'affine_r{3,5}(_v2)' pick a random subset, everything else gets
    level ~ U{0..4}. Returns (points (capacity, 3), valid mask (capacity,)).
    """
    n = pts.shape[0]
    cap = corruption_capacity(n, types)
    # statically: affine/jitter corruptions keep every point valid -> the
    # mask stays None and downstream resampling skips its argsort packing
    _masking = ("dropout_local", "add_global", "add_local",
                "nonuniform_density", "random_add")
    if any(t.startswith(m) for t in types for m in _masking):
        mask = jnp.ones(n, dtype=bool)
    else:
        mask = None

    for i, t in enumerate(types):
        k = jax.random.fold_in(key, i)
        k_lv, k_op = jax.random.split(k)
        level = jax.random.randint(k_lv, (), 0, 5).astype(jnp.float32)
        if t in ("clean", "dropout_patch_pointmae") or t.startswith("dropout_global"):
            continue
        elif t == "affine_r5":
            A, b = compose_random_affines(k_op, 5, AFFINE_NAMES)
            pts = _mm(pts, A) + b
        elif t == "affine_r3":
            A, b = compose_random_affines(k_op, 3, AFFINE_NAMES)
            pts = _mm(pts, A) + b
        elif t == "affine_r5_v2":
            A, b = compose_random_affines(k_op, 5, AFFINE_NAMES_V2)
            pts = _mm(pts, A) + b
        elif t == "affine_r3_v2":
            A, b = compose_random_affines(k_op, 3, AFFINE_NAMES_V2)
            pts = _mm(pts, A) + b
        elif t in _AFFINE_FNS:
            A, b = _AFFINE_FNS[t](k_op, level)
            pts = _mm(pts, A) + b
        elif t == "scale":
            # corrupt_scale (:59-69): anisotropic s=2 scale + re-normalisation
            # (mask-aware: dropped/unvalidated rows must not shift the stats)
            A, _ = affine_scale_nonorm(k_op, level)
            pts = pc_normalize(_mm(pts, A), mask)
        elif t == "scale_single":
            # corrupt_scale_single (:71-80): level-indexed scale table + norm
            table = jnp.array([1.6, 1.7, 1.8, 1.9, 2.0])
            sv = table[level.astype(jnp.int32)]
            factor = jax.random.uniform(k_op, (1,), minval=1.0 / sv, maxval=sv)
            pts = pc_normalize(pts * factor, mask)
        elif t == "jitter":
            pts = corrupt_jitter(k_op, pts, level)
        elif t.startswith("jitter_p"):
            sigma = {"jitter_p01": 0.01, "jitter_p03": 0.03,
                     "jitter_p05": 0.05, "jitter_p1": 0.1}[t]
            pts = corrupt_jitter(k_op, pts, level, sigma=sigma)
        elif t == "dropout_local":
            mask = dropout_local(k_op, pts, mask)
        elif t.startswith("dropout_local_c"):
            # c{1,2,3,5,8}d{1,3,5,7,9}: cluster-count bound and drop ratio.
            # Reference quirk preserved: np.random.randint(1, c) has an
            # EXCLUSIVE high, so c clusters are never actually drawn (c5 ->
            # 1..4, c2 -> always 1, corrupt_util.py:626,698,722); c1 means
            # exactly 1 (:674). max(int(c), 2) reproduces every case.
            spec = t[len("dropout_local_c"):]
            c, d = spec.split("d")
            mask = dropout_local(k_op, pts, mask, drop_ratio=int(d) / 10.0,
                                 max_clusters=max(int(c), 2))
        elif t == "add_global":
            pts, mask = add_global(k_op, pts, mask, level, pts.shape[0] + n // 2)
        elif t == "random_add":
            # coin-flip between the two additive corruptions (the intent of
            # the reference's pretrain_PointCAE_random_add.yaml, whose
            # 'random_add' key is absent from the registry and KeyErrors
            # there; consciously fixed here)
            k_c, k_a = jax.random.split(k_op)
            cap_a = pts.shape[0] + n // 2
            pts_g, mask_g = add_global(k_a, pts, mask, level, cap_a)
            pts_l, mask_l = add_local(k_a, pts, mask, level, cap_a)
            coin = jax.random.uniform(k_c) > 0.5
            pts = jnp.where(coin, pts_g, pts_l)
            mask = jnp.where(coin, mask_g, mask_l)
        elif t == "add_local":
            pts, mask = add_local(k_op, pts, mask, level, pts.shape[0] + n // 2)
        elif t == "nonuniform_density":
            mask = nonuniform_density(k_op, pts, mask, level)
        else:
            raise NotImplementedError(f"corruption {t!r}")

    # pad to static capacity
    if pts.shape[0] < cap:
        pad = cap - pts.shape[0]
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)], axis=0)
        mask = jnp.concatenate([jnp.ones(n, bool) if mask is None else mask,
                                jnp.zeros(pad, bool)], axis=0)
    return pts, mask


def corrupt_and_sample(key: jax.Array, pts: Array, types: Sequence[str],
                       npoints: int) -> Array:
    """Corrupt one (N, 3) cloud and resample to (npoints, 3).

    Equivalent to reference dataset behaviour: corrupt the full cloud then
    ``random_sample`` to the training size (ShapeNet55Dataset.py:110-112).
    """
    from ..ops import resample_to

    k_c, k_s = jax.random.split(key)
    out, mask = corrupt_cloud(k_c, pts, tuple(types))
    return resample_to(k_s, out, mask, npoints)


def corrupt_batch(key: jax.Array, pts: Array, types: Sequence[str],
                  npoints: int) -> Array:
    """Batched corrupt_and_sample. pts: (B, N, 3) -> (B, npoints, 3)."""
    keys = jax.random.split(key, pts.shape[0])
    fn = partial(corrupt_and_sample, types=tuple(types), npoints=npoints)
    return jax.vmap(fn)(keys, pts)


def augment_batch(key: jax.Array, pts: Array, types: Sequence[str]) -> Array:
    keys = jax.random.split(key, pts.shape[0])
    return jax.vmap(partial(augment_cloud, types=tuple(types)))(keys, pts)
