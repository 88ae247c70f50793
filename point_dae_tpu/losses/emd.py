"""Approximate Earth Mover's Distance.

Role of the reference CUDA ``approxmatch`` kernel
(``extensions/emd/cuda/emd_kernel.cu:26-158``): an iterative soft-matching
between two equal-size point sets, followed by the transported cost
(``matchcost``). The CUDA kernel runs a temperature-annealed auction over
~7 rounds; the idiomatic TPU equivalent is the same annealed soft assignment
expressed as dense (B, N, M) softmax updates (SURVEY.md §2.5 sanctions a
Sinkhorn-like loop as the equivalent). Used only by the optional EMD loss
path and its test in the reference, so priority is correctness, not speed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


Array = jax.Array


def emd_approx(xyz1: Array, xyz2: Array, iters: int = 10) -> Array:
    """Approximate match matrix. xyz1: (B, N, D), xyz2: (B, M, D) -> (B, N, M).

    Annealed row/column-rescaled soft assignment: at each round the kernel
    sharpens an exp(-d / T) affinity and renormalises against remaining
    row/column capacity, mirroring the reference's ``factor = 2^(6..0)/level``
    annealing schedule.
    """
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    d = jax.lax.stop_gradient(
        jnp.sum((xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2, -1))
    match = jnp.zeros((B, N, M), jnp.float32)
    remain_row = jnp.ones((B, N, 1), jnp.float32)
    remain_col = jnp.ones((B, 1, M), jnp.float32) * (N / M)

    def body(i, carry):
        match, remain_row, remain_col = carry
        # anneal: early rounds soft, late rounds sharp
        factor = jnp.exp2(jnp.float32(iters - 1 - i)) * 4.0 / jnp.float32(iters)
        w = jnp.exp(-d * factor) * remain_col + 1e-9
        w = w / jnp.sum(w, 2, keepdims=True) * remain_row  # rows claim capacity
        # column capacity is collective: rescale each column so the SUM over
        # rows never exceeds its remaining capacity (a per-entry min would let
        # several rows overcommit the same column in one round)
        col = jnp.sum(w, 1, keepdims=True)
        w = w * jnp.minimum(1.0, remain_col / jnp.maximum(col, 1e-9))
        row = jnp.sum(w, 2, keepdims=True)
        w = w * jnp.minimum(1.0, remain_row / jnp.maximum(row, 1e-9))
        match = match + w
        remain_row = jnp.maximum(remain_row - jnp.sum(w, 2, keepdims=True), 0.0)
        remain_col = jnp.maximum(remain_col - jnp.sum(w, 1, keepdims=True), 0.0)
        return match, remain_row, remain_col

    match, remain_row, remain_col = jax.lax.fori_loop(
        0, iters, body, (match, remain_row, remain_col))
    # final cleanup: spread leftover row mass across leftover column capacity
    # (the CUDA kernel's factor=0 last round plays the same role)
    col_share = remain_col / jnp.maximum(jnp.sum(remain_col, 2, keepdims=True), 1e-9)
    match = match + remain_row * col_share
    return match


def emd_loss(xyz1: Array, xyz2: Array, iters: int = 10) -> Array:
    """Mean transported squared distance per cloud -> scalar.

    Matches the ``matchcost`` + mean reduction of ``emd.py:5-49`` in the
    reference wrapper. Differentiable w.r.t. both clouds through the cost
    (the match itself is treated as constant, as in the CUDA backward)."""
    match = jax.lax.stop_gradient(emd_approx(xyz1, xyz2, iters))
    d = jnp.sum((xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2, -1)
    cost = jnp.sum(match * d, axis=(1, 2))                    # (B,)
    return jnp.mean(cost)
