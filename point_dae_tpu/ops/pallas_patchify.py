"""Fused FPS+kNN patchify kernel: the whole serialized geometry front-end
of a patch model runs as ONE Pallas program.

Role of the reference's ``Group`` module (PointCAE_transformer.py:54-86 =
pointnet2 FPS ``sampling_gpu.cu:73-229`` followed by the KNN_CUDA wheel),
which launches two CUDA kernels with an HBM round-trip of the gathered
centers between them. Here the FPS selection loop runs on-chip and *keeps
every center-to-all distance row it already computes* in a VMEM scratch —
that scratch IS the (G, N) kNN distance matrix, so the kNN phase is pure
idx-extraction with no distance recompute, no center gather, and no HBM
traffic between the two phases.

Why this matters on TPU: DESIGN.md §11's calibrated roofline shows the
flagship step is NOT HBM-bound — the residual cost is the *serialized*
front-end (a 64-iteration FPS scan, then per-k kNN extraction rounds, each
a separate XLA kernel with launch + layout overhead). Fusing them removes
the inter-kernel serialization entirely and halves the extraction pass
count (idx-only extraction: the consumer, patch grouping, never reads the
distances).

FPS conventions preserved (sampling_gpu.cu:88-89,104): first pick = index
0, points with |p|^2 <= 1e-3 never selected. kNN output is ascending by
distance with first-index tie-break, same as ``jax.lax.top_k`` on the
negated distances (ops/geometry.py:knn).

Numerical note: distance rows are computed with the FPS update formula
(x - px)^2 + (y - py)^2 + (z - pz)^2 rather than the matmul expansion
||q||^2 - 2 q.x + ||x||^2 used by ops.pairwise_sqdist. Both are exact to
f32 rounding; they can disagree on the *order* of two neighbours whose
distances are within ~1 ulp of each other (a tie in exact arithmetic).
The reference's own two stacks disagree the same way (KNN_CUDA expands the
square, pointops accumulates coordinate-wise). tools/tpu_smoke.py checks
any idx disagreement vs the XLA path is such a genuine near-tie.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def fused_patchify_pallas(points: jax.Array, num_group: int, group_size: int,
                          batch_tile: int = 16, interpret: bool = False,
                          ) -> Tuple[jax.Array, jax.Array]:
    """points: (B, N, 3) f32 -> (fps_idx (B, G) int32, knn_idx (B, G, S) int32).

    knn_idx rows are sorted ascending by squared distance to the patch
    center (ties: lower index first).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = points.shape
    G, S = num_group, group_size
    BT = min(batch_tile, B)
    # VMEM: D scratch (G*BT, N) f32 dominates; keep it under ~8MB
    while BT > 1 and G * BT * N * 4 > 8 * 2 ** 20:
        BT //= 2
    while B % BT != 0:
        BT //= 2

    R = G * BT  # distance-matrix rows, g-major: row r <-> (g=r//BT, b=r%BT)

    def kernel(x_ref, fps_ref, knn_ref, dmat):
        x = x_ref[0]                                        # (BT, N)
        y = x_ref[1]
        z = x_ref[2]
        selectable = x * x + y * y + z * z > 1e-3
        lanes = jax.lax.broadcasted_iota(jnp.int32, (BT, N), 1)
        slot = jax.lax.broadcasted_iota(jnp.int32, (BT, G), 1)

        # ---- phase 1: FPS; each iteration's distance row lands in `dmat`
        def fps_body(i, carry):
            # pick recomputed from min_d each iteration (reduction outputs
            # are lane-replicated, loop-carried vectors are not — see
            # ops/pallas_fps.py for the Mosaic layout rationale)
            min_d, out = carry                              # (BT, N), (BT, G)
            cand = jnp.where(selectable, min_d, -1.0)
            am = jnp.argmax(cand, axis=1).astype(jnp.int32)  # (BT,)
            am = jnp.where(i > 0, am, 0)                    # first pick = 0
            last = am[:, None]                              # (BT, 1) replicated
            out = jnp.where(slot == i, last, out)
            hit = lanes == last                             # (BT, N)
            px = jnp.sum(jnp.where(hit, x, 0.0), 1, keepdims=True)
            py = jnp.sum(jnp.where(hit, y, 0.0), 1, keepdims=True)
            pz = jnp.sum(jnp.where(hit, z, 0.0), 1, keepdims=True)
            d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
            dmat[pl.ds(i * BT, BT), :] = d                  # kNN row for center i
            min_d = jnp.minimum(min_d, d)
            return min_d, out

        _, fps_out = jax.lax.fori_loop(
            0, G, fps_body,
            (jnp.full((BT, N), 1e10, jnp.float32),
             jnp.zeros((BT, G), jnp.int32)))
        fps_ref[...] = fps_out

        # ---- phase 2: idx-only k-extraction straight from the VMEM rows
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
        colk = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)

        def ext_body(j, carry):
            d, out_i = carry
            a = jnp.argmin(d, axis=1).astype(jnp.int32)     # (R,)
            out_i = jnp.where(colk == j, a[:, None], out_i)
            d = jnp.where(cols == a[:, None], jnp.float32(1e30), d)
            return d, out_i

        _, out_i = jax.lax.fori_loop(
            0, S, ext_body,
            (dmat[...], jnp.zeros((R, S), jnp.int32)))
        knn_ref[...] = out_i.reshape(G, BT, S)

    coords = jnp.transpose(points.astype(jnp.float32), (2, 0, 1))  # (3, B, N)
    fps_idx, knn_gmajor = pl.pallas_call(
        kernel,
        grid=(B // BT,),
        in_specs=[pl.BlockSpec((3, BT, N), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((BT, G), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, BT, S), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, G), jnp.int32),
            jax.ShapeDtypeStruct((G, B, S), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, N), jnp.float32),
        ],
        # raise the default 16M scoped-vmem cap (like every other kernel
        # here): at finetune shapes (N=2048, G=128) the D scratch plus the
        # extraction state totals ~18M, which is fine on v5e but tripped
        # the default limit (r05 downstream-bench finding)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(coords)
    return fps_idx, jnp.transpose(knn_gmajor, (1, 0, 2))
