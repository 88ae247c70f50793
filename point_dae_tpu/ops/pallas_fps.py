"""Pallas FPS kernel: the whole iterative selection runs on-chip.

The XLA fallback in geometry.py runs n_samples sequential argmax steps, each a
separate HBM-roundtrip kernel; here the point tile stays in VMEM and the loop
runs inside one kernel (role of the reference's single-block CUDA FPS,
extensions/pointnet2/_ext_src/src/sampling_gpu.cu:73-229, with the same
conventions: first pick = index 0, points with |p|^2 <= 1e-3 unselectable).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def fps_pallas_batched(points: jax.Array, n_samples: int,
                       batch_tile: int = 256) -> jax.Array:
    """points: (B, N, 3) f32 -> idx (B, n_samples) int32.

    Batched layout: coordinates live as (3, BT, N) tiles so N sits on the
    lane dimension and the whole batch tile advances per loop iteration —
    every VPU op is (BT, N)-wide instead of the (N, 3)-shaped (3 useful
    lanes) work of the per-row kernel. The selection loop is inherently
    sequential in n_samples; this vectorizes everything else.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = points.shape
    BT = min(batch_tile, B)
    # VMEM: ~6 (BT, N) f32 live arrays; keep under ~10MB
    while BT > 8 and 6 * BT * N * 4 > 10 * 2 ** 20:
        BT //= 2
    if B % BT != 0:
        BT = 8 if B % 8 == 0 else 1

    def kernel(x_ref, idx_ref):
        x = x_ref[0]                                       # (BT, N)
        y = x_ref[1]
        z = x_ref[2]
        selectable = x * x + y * y + z * z > 1e-3
        lanes = jax.lax.broadcasted_iota(jnp.int32, (BT, N), 1)
        slot = jax.lax.broadcasted_iota(jnp.int32, (BT, n_samples), 1)

        def body(i, carry):
            # the pick is recomputed from min_d at the top of each iteration
            # (instead of carried): reduction outputs are lane-replicated,
            # which Mosaic can broadcast, while a loop-carried vector is
            # normalized to a lane-offset layout it cannot re-replicate.
            min_d, out = carry                             # (BT, N), (BT, S)
            cand = jnp.where(selectable, min_d, -1.0)
            am = jnp.argmax(cand, axis=1).astype(jnp.int32)   # (BT,)
            am = jnp.where(i > 0, am, 0)                   # first pick = 0
            last = am[:, None]                             # (BT, 1) replicated
            out = jnp.where(slot == i, last, out)
            hit = lanes == last                            # (BT, N)
            px = jnp.sum(jnp.where(hit, x, 0.0), 1, keepdims=True)
            py = jnp.sum(jnp.where(hit, y, 0.0), 1, keepdims=True)
            pz = jnp.sum(jnp.where(hit, z, 0.0), 1, keepdims=True)
            d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
            min_d = jnp.minimum(min_d, d)
            return min_d, out

        _, out = jax.lax.fori_loop(
            0, n_samples, body,
            (jnp.full((BT, N), 1e10, jnp.float32),
             jnp.zeros((BT, n_samples), jnp.int32)))
        idx_ref[...] = out

    coords = jnp.transpose(points.astype(jnp.float32), (2, 0, 1))  # (3, B, N)
    idx = pl.pallas_call(
        kernel,
        grid=(B // BT,),
        in_specs=[pl.BlockSpec((3, BT, N), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BT, n_samples), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_samples), jnp.int32),
    )(coords)
    return idx


def fps_pallas(points: jax.Array, n_samples: int) -> jax.Array:
    """points: (B, N, 3) f32 -> idx (B, n_samples) int32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = points.shape

    def kernel(x_ref, idx_ref):
        x = x_ref[0].astype(jnp.float32)                  # (N, 3)
        mag = jnp.sum(x * x, axis=-1)                     # (N,)
        selectable = mag > 1e-3
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, n_samples), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]

        def body(i, carry):
            min_d, last, out = carry
            # Mosaic forbids scalar VMEM stores and value-gathers: the output
            # row accumulates via a select, the selected point via a one-hot
            # reduction over rows.
            out = jnp.where(slot == i, last, out)          # (1, n_samples)
            hit = (rows == last)[:, None]                  # (N, 1)
            p = jnp.sum(jnp.where(hit, x, 0.0), axis=0, keepdims=True)  # (1,3)
            d = jnp.sum((x - p) ** 2, axis=-1)
            min_d = jnp.minimum(min_d, d)
            cand = jnp.where(selectable, min_d, -1.0)
            return min_d, jnp.argmax(cand).astype(jnp.int32), out

        _, _, out = jax.lax.fori_loop(
            0, n_samples, body,
            (jnp.full((N,), 1e10, jnp.float32), jnp.int32(0),
             jnp.zeros((1, n_samples), jnp.int32)))
        idx_ref[0] = out

    idx = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, n_samples), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, n_samples), jnp.int32),
    )(points.astype(jnp.float32))
    return idx[:, 0, :]
