"""Pallas tiled kNN kernel.

The XLA path materializes the full (B, N, M) pairwise-distance matrix in HBM
before top_k — at DGCNN scale (5 EdgeConv graphs over N=1024 per forward,
SURVEY.md §5) that is the dominant HBM stream. This kernel keeps each
(TN, TM) distance tile in VMEM and maintains a running top-k, so the N x M
matrix never exists in memory (role of the reference's KNN_CUDA wheel and
pointops heap kNN, knnquery_cuda_kernel.cu:65-116).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def knn_pallas(query: jax.Array, database: jax.Array, k: int,
               tn: int = 256, tm: int = 512) -> Tuple[jax.Array, jax.Array]:
    """query: (B, N, C), database: (B, M, C) -> (dists (B, N, k) ascending,
    idx (B, N, k) int32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = query.shape
    M = database.shape[1]
    tn = min(tn, N)
    tm = min(tm, M)
    pad_n = (-N) % tn
    if pad_n:
        query = jnp.pad(query, ((0, 0), (0, pad_n), (0, 0)),
                        constant_values=1e6)
    Np = N + pad_n
    pad_m = (-M) % tm
    if pad_m:
        database = jnp.pad(database, ((0, 0), (0, pad_m), (0, 0)),
                           constant_values=1e6)
    Mp = M + pad_m
    n_mtiles = Mp // tm

    def kernel(q_ref, db_ref, dist_ref, idx_ref):
        q = q_ref[0].astype(jnp.float32)                       # (tn, C)
        qq = jnp.sum(q * q, axis=-1, keepdims=True)            # (tn, 1)

        def extract_k(d, ids):
            """k smallest per row by iterative masked extraction (Mosaic has
            no top_k lowering). d: (tn, m), ids: (tn, m) -> (tn, k) pairs."""
            m = d.shape[1]
            cols = jax.lax.broadcasted_iota(jnp.int32, (tn, m), 1)
            colk = jax.lax.broadcasted_iota(jnp.int32, (tn, k), 1)
            out_d = jnp.zeros((tn, k), jnp.float32)
            out_i = jnp.zeros((tn, k), jnp.int32)

            def step(j, carry):
                d, out_d, out_i = carry
                v = jnp.min(d, axis=1)                         # (tn,)
                a = jnp.argmin(d, axis=1).astype(jnp.int32)    # (tn,)
                hit = cols == a[:, None]                       # (tn, m)
                # per-row gather via one-hot reduction; per-column store via a
                # select on the output index (Mosaic has no gather/scatter)
                picked = jnp.sum(jnp.where(hit, ids, 0), axis=1)
                out_d = jnp.where(colk == j, v[:, None], out_d)
                out_i = jnp.where(colk == j, picked[:, None], out_i)
                d = jnp.where(hit, 1e30, d)
                return d, out_d, out_i

            _, out_d, out_i = jax.lax.fori_loop(0, k, step, (d, out_d, out_i))
            return out_d, out_i

        def tile_d(j):
            y = db_ref[0, pl.ds(j * tm, tm), :].astype(jnp.float32)
            yy = jnp.sum(y * y, axis=-1)
            return qq - 2.0 * jnp.dot(q, y.T,
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.HIGHEST) \
                + yy[None, :]                                  # (tn, tm)

        if n_mtiles == 1:
            # single-tile fast path: extract straight from the distance tile,
            # no per-tile/merge double extraction
            ids = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1)
            best_d, best_i = extract_k(tile_d(0), ids)
        else:
            def body(j, carry):
                best_d, best_i = carry                         # (tn, k) each
                d = tile_d(j)
                ids = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1) + j * tm
                td, ti = extract_k(d, ids)                     # tile top-k
                cat_d = jnp.concatenate([best_d, td], axis=1)
                cat_i = jnp.concatenate([best_i, ti], axis=1)
                return extract_k(cat_d, cat_i)                 # merge (tn, 2k)

            init = (jnp.full((tn, k), 1e30, jnp.float32),
                    jnp.zeros((tn, k), jnp.int32))
            best_d, best_i = jax.lax.fori_loop(0, n_mtiles, body, init)
        dist_ref[0] = best_d
        idx_ref[0] = best_i

    dist, idx = pl.pallas_call(
        kernel,
        grid=(B, Np // tn),
        in_specs=[
            pl.BlockSpec((1, tn, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, k), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, k), jnp.int32),
        ],
    )(query, database)
    return dist[:, :N], idx[:, :N]
