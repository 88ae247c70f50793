"""Approximate Earth Mover's Distance.

Role of the reference CUDA ``approxmatch`` kernel
(``extensions/emd/cuda/emd_kernel.cu:26-158``): an iterative auction-style
soft matching between two point sets, followed by the transported cost
(``matchcost``, ``emd_kernel.cu:201-244``). The algorithm runs 10 rounds
with temperatures ``level = -4^j`` for j = 7..-1 and a final ``level = 0``
round; each round rows claim capacity against remaining column capacity,
columns scale back over-committed claims, and the committed transport is
accumulated. On TPU every round is three dense (B, N, M) contractions —
ideal MXU/VPU work — so the idiomatic build is the SAME algorithm as
batched ``lax``-unrolled tensor ops rather than the CUDA per-thread
shared-memory staging. Verified against a float64 numpy port of the CUDA
round structure in ``tests/test_losses.py`` (golden oracle).

Used only by the optional EMD loss path and its smoke test in the
reference (``extensions/emd/test_emd_loss.py``), so priority is
correctness, not speed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


Array = jax.Array


def emd_approx(xyz1: Array, xyz2: Array) -> Array:
    """Approximate match matrix. xyz1: (B, N, D), xyz2: (B, M, D) -> (B, N, M).

    Faithful re-expression of the reference auction rounds
    (``emd_kernel.cu:46-156``), vectorised over the batch. The reference
    stores ``match`` as (B, M, N) with xyz1 as the "dataset" rows; this
    returns the (B, N, M) transpose so ``match[b, i, j]`` is the mass
    moved between ``xyz1[b, i]`` and ``xyz2[b, j]``. Capacity
    initialisation keeps the reference's integer-division semantics
    (``multiR = n / m`` in C++, ``emd_kernel.cu:29-35``).
    """
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    if N >= M:
        multi_row, multi_col = 1.0, float(N // M)
    else:
        multi_row, multi_col = float(M // N), 1.0
    d = jax.lax.stop_gradient(
        jnp.sum((xyz1[:, :, None, :].astype(jnp.float32)
                 - xyz2[:, None, :, :].astype(jnp.float32)) ** 2, -1))

    match = jnp.zeros((B, N, M), jnp.float32)
    remain_row = jnp.full((B, N), multi_row, jnp.float32)   # xyz1 capacity
    remain_col = jnp.full((B, M), multi_col, jnp.float32)   # xyz2 capacity

    # reference schedule: j = 7..-1 with level = -4^j, then level = 0
    levels = [-(4.0 ** j) for j in range(7, -2, -1)] + [0.0]
    for level in levels:
        e = jnp.exp(level * d)                              # (B, N, M)
        # rows claim capacity against remaining column capacity
        suml = jnp.einsum("bnm,bm->bn", e, remain_col) + 1e-9
        ratio_row = remain_row / suml                       # (B, N)
        # columns scale back over-committed claims
        sumr = jnp.einsum("bnm,bn->bm", e, ratio_row) * remain_col
        consumption = jnp.minimum(remain_col / (sumr + 1e-9), 1.0)
        ratio_col = consumption * remain_col                # (B, M)
        remain_col = jnp.maximum(0.0, remain_col - sumr)
        w = e * ratio_row[:, :, None] * ratio_col[:, None, :]
        match = match + w
        remain_row = jnp.maximum(0.0, remain_row - jnp.sum(w, 2))
    return match


def emd_cost(xyz1: Array, xyz2: Array) -> Array:
    """Transported squared-distance cost per cloud -> (B,).

    The ``matchcost`` contraction (``emd_kernel.cu:201-244``).
    Differentiable w.r.t. both clouds through the cost; the match itself
    is treated as constant, exactly like the CUDA backward
    (``matchcostgrad1/2``, ``emd_kernel.cu:287-356``)."""
    match = jax.lax.stop_gradient(emd_approx(xyz1, xyz2))
    d = jnp.sum((xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2, -1)
    return jnp.sum(match * d, axis=(1, 2))                  # (B,)


def emd_loss(xyz1: Array, xyz2: Array) -> Array:
    """Reference wrapper semantics (``extensions/emd/emd.py:31-49``):
    per-cloud cost divided by N1, then mean over the batch -> scalar."""
    return jnp.mean(emd_cost(xyz1, xyz2) / xyz1.shape[1])
