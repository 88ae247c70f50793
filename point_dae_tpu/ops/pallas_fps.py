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
