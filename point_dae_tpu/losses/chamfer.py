"""Chamfer-distance family, TPU-native.

Replaces the reference CUDA extension (``extensions/chamfer_dist/chamfer.cu``
shared-memory tiled brute-force NN + ``__init__.py`` loss variants). The core
primitive is ``nn_distance(x, y) -> (dist1, idx1, dist2, idx2)``, the same
load-bearing contract as the CUDA op: every ``withnormal`` variant gathers
auxiliary attributes through the idx outputs
(``extensions/chamfer_dist/__init__.py:146-167``).

Design: pairwise distances are built from an MXU matmul and reduced with a
fused min/argmin. A Pallas kernel tiles the reduction so the (N, M) distance
matrix never round-trips to HBM on large clouds; a pure-XLA path covers CPU
tests and small shapes. The backward pass is a cheap gather-based recompute
via a custom VJP (no need to save the distance matrix).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------- primitives

def _nn_half_xla(x: Array, y: Array) -> Tuple[Array, Array]:
    """min_j ||x_i - y_j||^2 and argmin. x: (B, N, D), y: (B, M, D).
    Shares ops.geometry.pairwise_sqdist (f32 casts, HIGHEST-precision
    matmul, clamp at zero) so the numeric-sensitive construction lives in
    one place."""
    from ..ops.geometry import pairwise_sqdist

    d = pairwise_sqdist(x, y)
    idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
    dist = jnp.take_along_axis(d, idx[..., None], axis=-1)[..., 0]
    return dist, idx


def _nn_half_pallas(x: Array, y: Array) -> Tuple[Array, Array]:
    """Pallas-tiled version: grid over (B, N/TN); streams y in M-tiles held in
    VMEM, keeping the (TN, M) distance tile on-chip only."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = x.shape
    M = y.shape[1]
    TN = min(512, N)
    # pad N to a multiple of TN
    pad_n = (-N) % TN
    if pad_n:
        x = jnp.pad(x, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n
    TM = min(2048, M)
    pad_m = (-M) % TM
    if pad_m:
        # pad with +inf-distance sentinels (huge coordinates)
        y = jnp.pad(y, ((0, 0), (0, pad_m), (0, 0)), constant_values=1e6)
    Mp = M + pad_m

    def kernel(x_ref, y_ref, dist_ref, idx_ref):
        xt = x_ref[0].astype(jnp.float32)                       # (TN, D)
        xx = jnp.sum(xt * xt, axis=-1, keepdims=True)            # (TN, 1)
        best_d = jnp.full((TN,), 1e30, jnp.float32)
        best_i = jnp.zeros((TN,), jnp.int32)

        def body(j, carry):
            best_d, best_i = carry
            yt = y_ref[0, pl.ds(j * TM, TM), :].astype(jnp.float32)   # (TM, D)
            yy = jnp.sum(yt * yt, axis=-1)                            # (TM,)
            d = xx - 2.0 * jnp.dot(xt, yt.T, preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST) \
                + yy[None, :]                                         # (TN, TM)
            loc = jnp.argmin(d, axis=-1).astype(jnp.int32)
            locd = jnp.min(d, axis=-1)
            upd = locd < best_d
            best_i = jnp.where(upd, loc + j * TM, best_i)
            best_d = jnp.where(upd, locd, best_d)
            return best_d, best_i

        best_d, best_i = jax.lax.fori_loop(0, Mp // TM, body, (best_d, best_i))
        dist_ref[0, 0, :] = jnp.maximum(best_d, 0.0)
        idx_ref[0, 0, :] = best_i

    # outputs carry a singleton middle dim so the (1, TN) block satisfies the
    # Mosaic rule (last two block dims must divide (8, 128) or equal the array)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(B, Np // TN),
        in_specs=[
            pl.BlockSpec((1, TN, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Mp, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TN), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, TN), lambda b, i: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Np), jnp.int32),
        ],
    )(x, y)
    return dist[:, 0, :N], idx[:, 0, :N]


def _nn_half_small_pallas(x: Array, y: Array,
                          lane_tile: int = 2048) -> Tuple[Array, Array]:
    """Patch-chamfer layout: many tiny point sets (B large, N/M <= ~64).

    The XLA path runs B batched (N, M) matmuls with K=3 — 3 useful lanes and
    MXU tiles mostly padding. Here coordinates are transposed to (D, N, B) so
    the BATCH sits on the lane dimension: each of the M (unrolled) iterations
    does (N, BT)-wide vector ops, computing one candidate distance for every
    patch at once. ~9x at the flagship patch shape ((16384, 36) vs (.., 32)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = x.shape
    M = y.shape[1]
    BT = min(lane_tile, B)
    pad_b = (-B) % BT
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        y = jnp.pad(y, ((0, pad_b), (0, 0), (0, 0)), constant_values=1e6)
    Bp = B + pad_b
    xt = jnp.transpose(x.astype(jnp.float32), (2, 1, 0))     # (D, N, Bp)
    yt = jnp.transpose(y.astype(jnp.float32), (2, 1, 0))     # (D, M, Bp)

    def kernel(x_ref, y_ref, dist_ref, idx_ref, near_ref):
        ax = [x_ref[d] for d in range(D)]                    # D x (N, BT)
        md = jnp.full((N, BT), 1e30, jnp.float32)
        mi = jnp.zeros((N, BT), jnp.int32)
        nc = [jnp.zeros((N, BT), jnp.float32) for _ in range(D)]
        for j in range(M):                                   # static unroll
            bc = [y_ref[c, j, :][None, :] for c in range(D)]  # D x (1, BT)
            d = jnp.zeros((N, BT), jnp.float32)
            for c in range(D):
                d = d + (ax[c] - bc[c]) ** 2
            upd = d < md
            mi = jnp.where(upd, j, mi)
            # nearest coords tracked in-kernel: the backward needs
            # y_{argmin} and this saves it an HBM gather
            nc = [jnp.where(upd, bc[c], nc[c]) for c in range(D)]
            md = jnp.minimum(md, d)
        dist_ref[...] = md
        idx_ref[...] = mi
        for c in range(D):
            near_ref[c] = nc[c]

    dist, idx, near = pl.pallas_call(
        kernel,
        grid=(Bp // BT,),
        in_specs=[
            pl.BlockSpec((D, N, BT), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M, BT), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, BT), lambda b: (0, b)),
            pl.BlockSpec((N, BT), lambda b: (0, b)),
            pl.BlockSpec((D, N, BT), lambda b: (0, 0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, Bp), jnp.int32),
            jax.ShapeDtypeStruct((D, N, Bp), jnp.float32),
        ],
    )(xt, yt)
    return (jnp.maximum(dist.T[:B], 0.0), idx.T[:B].astype(jnp.int32),
            jnp.transpose(near, (2, 1, 0))[:B])


def _use_pallas(n: int, m: int) -> bool:
    on_tpu = jax.default_backend() == "tpu"
    return on_tpu and (n * m) >= 512 * 512


def _use_small_pallas(b: int, n: int, m: int, d: int) -> bool:
    on_tpu = jax.default_backend() == "tpu"
    return on_tpu and d == 3 and n <= 64 and m <= 64 and b >= 4096


def _nn_half(x: Array, y: Array) -> Tuple[Array, Array]:
    B, N, D = x.shape
    if _use_small_pallas(B, N, y.shape[1], D):
        d, i, _ = _nn_half_small_pallas(x, y)
        return d, i
    if _use_pallas(N, y.shape[1]):
        return _nn_half_pallas(x, y)
    return _nn_half_xla(x, y)


@jax.custom_vjp
def nn_distance(xyz1: Array, xyz2: Array):
    """Bidirectional nearest neighbours.

    xyz1: (B, N, D), xyz2: (B, M, D) ->
    (dist1 (B, N), dist2 (B, M), idx1 (B, N), idx2 (B, M)) with dist squared,
    the exact contract of ``chamfer.forward`` (chamfer_cuda.cpp:36-39).
    """
    d1, i1 = _nn_half(xyz1, xyz2)
    d2, i2 = _nn_half(xyz2, xyz1)
    return d1, d2, i1, i2


def _nn_distance_fwd(xyz1, xyz2):
    if _use_small_pallas(xyz1.shape[0], xyz1.shape[1], xyz2.shape[1],
                         xyz1.shape[2]):
        d1, i1, y_near = _nn_half_small_pallas(xyz1, xyz2)
        d2, i2, x_near = _nn_half_small_pallas(xyz2, xyz1)
        return (d1, d2, i1, i2), (xyz1, xyz2, i1, i2, y_near, x_near)
    d1, d2, i1, i2 = nn_distance(xyz1, xyz2)
    return (d1, d2, i1, i2), (xyz1, xyz2, i1, i2, None, None)


def _nn_distance_bwd(res, g):
    """Gather-based backward (chamfer.cu:173-229 equivalent, but as a
    recompute: d dist1_i/d x_i = 2 (x_i - y_{idx1_i}), plus the scatter term
    from dist2 through idx2.

    For small point sets (the per-patch losses, e.g. 36x32 patches at
    B*G = 16k rows) XLA's scatter is the single most expensive op of the
    whole train step (~40 ms/step in traces), so the scatter is rewritten as
    a one-hot matmul that rides the MXU; large sets keep the scatter."""
    xyz1, xyz2, i1, i2, y_near, x_near = res
    g1, g2, _, _ = g
    if y_near is None:
        y_near = jnp.take_along_axis(xyz2, i1[..., None], axis=1)  # (B, N, D)
        x_near = jnp.take_along_axis(xyz1, i2[..., None], axis=1)  # (B, M, D)
    diff1 = 2.0 * (xyz1 - y_near)                               # (B, N, D)
    diff2 = 2.0 * (xyz2 - x_near)                               # (B, M, D)
    gx_direct = g1[..., None] * diff1
    gy_direct = g2[..., None] * diff2
    B = xyz1.shape[0]
    N, M = xyz1.shape[1], xyz2.shape[1]

    if max(N, M) <= 256:
        def scatter(idx, vals, out_len):
            # (B, S) idx, (B, S, D) vals -> (B, out_len, D) via one-hot matmul
            onehot = jax.nn.one_hot(idx, out_len, dtype=vals.dtype)  # (B,S,L)
            return jnp.einsum("bsl,bsd->bld", onehot, vals)
    else:
        def scatter(idx, vals, out_len):
            return jnp.zeros((B, out_len, vals.shape[-1]), vals.dtype).at[
                jnp.arange(B)[:, None], idx].add(vals)

    gx = gx_direct + scatter(i2, -gy_direct, N)
    gy = gy_direct + scatter(i1, -gx_direct, M)
    return gx, gy


nn_distance.defvjp(_nn_distance_fwd, _nn_distance_bwd)


# ---------------------------------------------------------------- loss family

def chamfer_l2(xyz1: Array, xyz2: Array) -> Array:
    """mean(dist1) + mean(dist2) (ChamferDistanceL2, __init__.py:29-44)."""
    d1, d2, _, _ = nn_distance(xyz1, xyz2)
    return jnp.mean(d1) + jnp.mean(d2)


def chamfer_l1(xyz1: Array, xyz2: Array) -> Array:
    """(mean(sqrt d1) + mean(sqrt d2)) / 2 (ChamferDistanceL1, :397-417)."""
    d1, d2, _, _ = nn_distance(xyz1, xyz2)
    eps = 1e-12  # sqrt grad safety at exact matches
    return (jnp.mean(jnp.sqrt(d1 + eps)) + jnp.mean(jnp.sqrt(d2 + eps))) / 2.0


def chamfer_l2_split(xyz1: Array, xyz2: Array) -> Tuple[Array, Array]:
    """(mean d1, mean d2) (ChamferDistanceL2_split, :379-395)."""
    d1, d2, _, _ = nn_distance(xyz1, xyz2)
    return jnp.mean(d1), jnp.mean(d2)


def masked_chamfer_l2(xyz1: Array, xyz2: Array, weight: Array) -> Array:
    """Per-pair chamfer-L2 (over leading batch dims) weighted by ``weight``.

    xyz1/xyz2: (B, S, D) point sets, weight: (B,). Used for the masked-patch
    reconstruction losses where the reference gathers masked patches into a
    dense batch; here patches stay in place and masked-out entries get zero
    weight (static shapes, no gather).
    """
    d1, d2, _, _ = nn_distance(xyz1, xyz2)
    per = jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)          # (B,)
    denom = jnp.maximum(jnp.sum(weight), 1e-8)
    return jnp.sum(per * weight) / denom


def masked_chamfer_l2_withnormal(xyz1: Array, xyz2: Array,
                                 normal1: Array, normal2: Array,
                                 weight: Array,
                                 normal_dis=None) -> Tuple[Array, Array]:
    """Per-pair chamfer-L2 + normal distance via the xyz correspondence,
    weighted over the leading (B*G) axis (masked-patch MaskSurf losses).

    xyz/normals: (P, S, 3), weight: (P,). Mirrors ChamferDistanceL2_withnormal
    (__init__.py:123-167) with the gather-by-idx normal pairing."""
    if normal_dis is None:
        normal_dis = dis_normalized_l2
    d1, d2, i1, i2 = nn_distance(xyz1, xyz2)
    nd1 = normal_dis(normal1, jnp.take_along_axis(normal2, i1[..., None], 1))
    nd2 = normal_dis(normal2, jnp.take_along_axis(normal1, i2[..., None], 1))
    denom = jnp.maximum(jnp.sum(weight), 1e-8)
    xyz_loss = jnp.sum((jnp.mean(d1, -1) + jnp.mean(d2, -1)) * weight) / denom
    n_loss = jnp.sum((jnp.mean(nd1, -1) + jnp.mean(nd2, -1)) * weight) / denom
    return xyz_loss, n_loss


def masked_chamfer_l1(xyz1: Array, xyz2: Array, weight: Array) -> Array:
    d1, d2, _, _ = nn_distance(xyz1, xyz2)
    eps = 1e-12
    per = (jnp.mean(jnp.sqrt(d1 + eps), -1) + jnp.mean(jnp.sqrt(d2 + eps), -1)) / 2.0
    denom = jnp.maximum(jnp.sum(weight), 1e-8)
    return jnp.sum(per * weight) / denom


# ------- normal-aware variants (MaskSurf family; __init__.py:95-376)

def _normalize(v: Array) -> Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def dis_normalized_l2(n1: Array, n2: Array) -> Array:
    """Orientation-agnostic normal distance (__init__.py:95-102)."""
    n1, n2 = _normalize(n1), _normalize(n2)
    return jnp.minimum(jnp.sum((n1 - n2) ** 2, -1), jnp.sum((n1 + n2) ** 2, -1))


def dis_normalized_l1(n1: Array, n2: Array) -> Array:
    n1, n2 = _normalize(n1), _normalize(n2)
    return jnp.minimum(jnp.sum(jnp.abs(n1 - n2), -1), jnp.sum(jnp.abs(n1 + n2), -1))


def dis_normalized_l2_strict(n1: Array, n2: Array) -> Array:
    n1, n2 = _normalize(n1), _normalize(n2)
    return jnp.sum((n1 - n2) ** 2, -1)


def _gather1(attr: Array, idx: Array) -> Array:
    return jnp.take_along_axis(attr, idx[..., None], axis=1)


def chamfer_l2_withnormal(xyz1, xyz2, normal1, normal2, normal_dis=dis_normalized_l2):
    """(xyz chamfer, normal chamfer via xyz correspondence)
    (ChamferDistanceL2_withnormal, __init__.py:123-167)."""
    d1, d2, i1, i2 = nn_distance(xyz1, xyz2)
    nd1 = normal_dis(normal1, _gather1(normal2, i1))
    nd2 = normal_dis(normal2, _gather1(normal1, i2))
    return jnp.mean(d1) + jnp.mean(d2), jnp.mean(nd1) + jnp.mean(nd2)


def chamfer_l2_withnormal_l1(xyz1, xyz2, normal1, normal2):
    return chamfer_l2_withnormal(xyz1, xyz2, normal1, normal2, dis_normalized_l1)


def chamfer_l2_withnormal_strict(xyz1, xyz2, normal1, normal2):
    return chamfer_l2_withnormal(xyz1, xyz2, normal1, normal2, dis_normalized_l2_strict)


def chamfer_l2_withnormal_normalindex(xyz1, xyz2, normal1, normal2):
    """Correspondence computed in 6-D (xyz ++ unit normal) space, losses split
    (ChamferDistanceL2_withnormal_normalindex, __init__.py:272-310)."""
    n1, n2 = _normalize(normal1), _normalize(normal2)
    a = jnp.concatenate([xyz1, n1], axis=-1)
    b = jnp.concatenate([xyz2, n2], axis=-1)
    _, _, i1, i2 = nn_distance(a, b)
    xd1 = jnp.sum((xyz1 - _gather1(xyz2, i1)) ** 2, -1)
    xd2 = jnp.sum((xyz2 - _gather1(xyz1, i2)) ** 2, -1)
    nd1 = dis_normalized_l2(n1, _gather1(n2, i1))
    nd2 = dis_normalized_l2(n2, _gather1(n1, i2))
    return jnp.mean(xd1) + jnp.mean(xd2), jnp.mean(nd1) + jnp.mean(nd2)


def chamfer_l2_withnormal_strict_normalindex(surfel1, surfel2):
    """Input is (B, N, 6) xyz++normal; correspondence in 6-D, strict normal
    distance (__init__.py:237-270)."""
    _, _, i1, i2 = nn_distance(surfel1, surfel2)
    xyz1, n1 = surfel1[..., :3], surfel1[..., 3:]
    xyz2, n2 = surfel2[..., :3], surfel2[..., 3:]
    xd1 = jnp.sum((xyz1 - _gather1(xyz2, i1)) ** 2, -1)
    xd2 = jnp.sum((xyz2 - _gather1(xyz1, i2)) ** 2, -1)
    nd1 = dis_normalized_l2_strict(n1, _gather1(n2, i1))
    nd2 = dis_normalized_l2_strict(n2, _gather1(n1, i2))
    return jnp.mean(xd1) + jnp.mean(xd2), jnp.mean(nd1) + jnp.mean(nd2)


def chamfer_l2_withnormal_onlynormalindex(surfel1, surfel2):
    """Correspondence via unit normals only; returns (0, normal chamfer)
    (__init__.py:312-346)."""
    n1 = _normalize(surfel1[..., 3:])
    n2 = _normalize(surfel2[..., 3:])
    _, _, i1, i2 = nn_distance(n1, n2)
    nd1 = dis_normalized_l2(surfel1[..., 3:], _gather1(surfel2[..., 3:], i1))
    nd2 = dis_normalized_l2(surfel2[..., 3:], _gather1(surfel1[..., 3:], i2))
    return jnp.zeros(()), jnp.mean(nd1) + jnp.mean(nd2)


def chamfer_l2_coarse2fine(xyz1, xyz2, fine1, fine2):
    """Center-level chamfer + patch-level chamfer between matched patches
    (ChamferDistanceL2_corase2fine, __init__.py:53-85).

    xyz1/xyz2: (B, G, 3) patch centers, fine1/fine2: (B, G, S, 3) patches.
    """
    d1, d2, i1, i2 = nn_distance(xyz1, xyz2)
    B, G, S, _ = fine1.shape
    t1 = jnp.take_along_axis(fine2, i1[..., None, None], axis=1)  # (B, G, S, 3)
    t2 = jnp.take_along_axis(fine1, i2[..., None, None], axis=1)
    fd1 = chamfer_l2(fine1.reshape(B * G, S, 3), t1.reshape(B * G, S, 3))
    fd2 = chamfer_l2(fine2.reshape(B * G, S, 3), t2.reshape(B * G, S, 3))
    return jnp.mean(d1) + jnp.mean(d2), fd1 + fd2


LOSS_REGISTRY = {
    "cdl1": chamfer_l1,
    "cdl2": chamfer_l2,
}


def build_loss_func(loss_type: str):
    """Mirror of the model-side ``build_loss_func`` switch (cdl1/cdl2)."""
    if loss_type not in LOSS_REGISTRY:
        raise NotImplementedError(f"loss {loss_type!r} (supported: cdl1, cdl2)")
    return LOSS_REGISTRY[loss_type]
