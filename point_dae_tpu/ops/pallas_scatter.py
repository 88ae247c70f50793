"""Pallas row-scatter-add: the backward of a row gather as MXU matmuls.

XLA lowers the VJP of ``take_along_axis`` (row gather) to a scatter-add —
at DGCNN scale ((B, N, k, C) edge features back into (B, N, C)) each scatter
costs ~35 ms/step on TPU, the single most expensive op class of the DGCNN
backward. Scatter-add is algebraically ``one_hot(idx)^T @ grads``; this
kernel builds the one-hot in VMEM tile by tile and rides the MXU, revisiting
the per-batch output block across grid steps (first step initializes, later
steps accumulate).

``gather_rows`` is the user-facing op: forward = plain XLA gather (fast),
backward = this kernel when beneficial.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def scatter_rows_add_pallas(idx: Array, g: Array, n_rows: int,
                            tq: int = 1024) -> Array:
    """out[b, m] = sum over q of g[b, q] where idx[b, q] == m.

    idx: (B, Q) int32, g: (B, Q, C) -> (B, n_rows, C) f32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Q, C = g.shape
    tq = min(tq, Q)
    pad_q = (-Q) % tq
    if pad_q:
        # padded slots point at row 0 with zero grad — harmless
        idx = jnp.pad(idx, ((0, 0), (0, pad_q)))
        g = jnp.pad(g, ((0, 0), (0, pad_q), (0, 0)))
    Qp = Q + pad_q
    n_chunks = Qp // tq

    def kernel(i_ref, g_ref, o_ref):
        chunk = pl.program_id(1)
        ii = i_ref[0]                                       # (tq, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, n_rows), 1)
        onehot = (ii == cols).astype(jnp.float32)           # (tq, n_rows)
        contrib = jax.lax.dot_general(
            onehot, g_ref[0].astype(jnp.float32),
            (((0,), (0,)), ((), ())),                        # contract over tq
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # (n_rows, C)

        @pl.when(chunk == 0)
        def _init():
            o_ref[0] = contrib

        @pl.when(chunk > 0)
        def _acc():
            o_ref[0] += contrib

    out = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, tq, 1), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, C), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_rows, C), lambda b, q: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_rows, C), jnp.float32),
    )(idx.astype(jnp.int32)[..., None], g)
    return out


def gather_rows_pallas(x: Array, idx: Array, tq: int = 1024) -> Array:
    """out[b, q] = x[b, idx[b, q]] as one_hot(idx) @ x on the MXU.

    x: (B, N, C), idx: (B, Q) -> (B, Q, C) f32. Same one-hot-tile layout as
    the scatter kernel, opposite contraction."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = x.shape
    Q = idx.shape[1]
    tq = min(tq, Q)
    pad_q = (-Q) % tq
    if pad_q:
        idx = jnp.pad(idx, ((0, 0), (0, pad_q)))
    Qp = Q + pad_q

    def kernel(i_ref, x_ref, o_ref):
        ii = i_ref[0]                                       # (tq, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, N), 1)
        onehot = (ii == cols).astype(jnp.float32)           # (tq, N)
        o_ref[0] = jnp.dot(onehot, x_ref[0].astype(jnp.float32),
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(B, Qp // tq),
        in_specs=[
            pl.BlockSpec((1, tq, 1), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, C), lambda b, q: (b, q, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Qp, C), jnp.float32),
    )(idx.astype(jnp.int32)[..., None], x)
    return out[:, :Q]


def gather_rows_small_c_pallas(x: Array, idx: Array, tq: int = 1024) -> Array:
    """Row gather for TINY channel counts (C <= 8), e.g. xyz coordinates.

    XLA's TPU gather moves 12-byte rows one by one (measured ~5.5 ms for
    (256, 1024, 3) -> (256, 2048, 3) inside the flagship step). Here the
    gather is out^T = x^T @ one_hot(idx)^T on the MXU with the TINY dim as
    the output *rows* (sublanes), so the 128-lane dimension carries query
    positions instead of the 3-wide channel axis — no lane waste. The
    one-hot is exact in f32 and each output element is a single selected
    product, so the result is bit-exact regardless of matmul passes.

    x: (B, N, C), idx: (B, Q) -> (B, Q, C), same dtype as x (f32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = x.shape
    Q = idx.shape[1]
    tq = min(tq, Q)
    pad_q = (-Q) % tq
    if pad_q:
        idx = jnp.pad(idx, ((0, 0), (0, pad_q)))
    Qp = Q + pad_q
    tn = min(N, 2048)                   # one-hot tile height: VMEM-bounded
    assert N % tn == 0, "N must be a multiple of the 2048 source tile"
    xt = jnp.swapaxes(x, 1, 2)                              # (B, C, N)

    def kernel(i_ref, xt_ref, o_ref):
        n_chunk = pl.program_id(2)
        ii = i_ref[0]                                       # (1, tq)
        rows = jax.lax.broadcasted_iota(jnp.int32, (tn, tq), 0) \
            + n_chunk * tn
        onehot_t = (rows == ii).astype(jnp.float32)         # (tn, tq)
        contrib = jnp.dot(xt_ref[0].astype(jnp.float32), onehot_t,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

        @pl.when(n_chunk == 0)
        def _init():
            o_ref[0] = contrib

        @pl.when(n_chunk > 0)
        def _acc():
            o_ref[0] += contrib

    out = pl.pallas_call(
        kernel,
        grid=(B, Qp // tq, N // tn),
        in_specs=[
            pl.BlockSpec((1, 1, tq), lambda b, q, n: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, tn), lambda b, q, n: (b, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, tq), lambda b, q, n: (b, 0, q)),
        out_shape=jax.ShapeDtypeStruct((B, C, Qp), jnp.float32),
    )(idx.astype(jnp.int32)[:, None, :], xt)
    return jnp.swapaxes(out[:, :, :Q], 1, 2).astype(x.dtype)


def gather_by_key_small_c_pallas(x: Array, keys: Array, draw: Array,
                                 tq: int = 1024) -> Array:
    """Keyed row gather: out[b, q] = x[b, n*] where keys[b, n*] == draw[b, q].

    Same MXU one-hot layout as ``gather_rows_small_c_pallas`` but the
    one-hot compares a caller-supplied per-row int32 key (e.g. the valid
    rank of a masked resample) instead of the row index, so a
    pack-then-gather (argsort + two gathers) collapses into one kernel.
    Every draw must match at most one key per row (rows whose key matches
    nothing produce zeros); keys of invalid rows should be set to -1.

    x: (B, N, C<=8) f32, keys: (B, N) int32, draw: (B, Q) int32 ->
    (B, Q, C) f32. Bit-exact (each output element is one selected product).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = x.shape
    Q = draw.shape[1]
    tq = min(tq, Q)
    pad_q = (-Q) % tq
    if pad_q:
        draw = jnp.pad(draw, ((0, 0), (0, pad_q)), constant_values=-2)
    Qp = Q + pad_q
    tn = min(N, 2048)
    assert N % tn == 0, "N must be a multiple of the 2048 source tile"
    xt = jnp.swapaxes(x, 1, 2)                              # (B, C, N)

    def kernel(d_ref, k_ref, xt_ref, o_ref):
        n_chunk = pl.program_id(2)
        dd = d_ref[0]                                       # (1, tq)
        kk = k_ref[0]                                       # (tn, 1)
        onehot_t = (jnp.broadcast_to(kk, (tn, tq))
                    == dd).astype(jnp.float32)              # (tn, tq)
        contrib = jnp.dot(xt_ref[0].astype(jnp.float32), onehot_t,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

        @pl.when(n_chunk == 0)
        def _init():
            o_ref[0] = contrib

        @pl.when(n_chunk > 0)
        def _acc():
            o_ref[0] += contrib

    out = pl.pallas_call(
        kernel,
        grid=(B, Qp // tq, N // tn),
        in_specs=[
            pl.BlockSpec((1, 1, tq), lambda b, q, n: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda b, q, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, tn), lambda b, q, n: (b, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, tq), lambda b, q, n: (b, 0, q)),
        out_shape=jax.ShapeDtypeStruct((B, C, Qp), jnp.float32),
    )(draw.astype(jnp.int32)[:, None, :], keys.astype(jnp.int32)[..., None],
      xt)
    return jnp.swapaxes(out[:, :, :Q], 1, 2).astype(x.dtype)


def _use_mxu_small_c_gather(B: int, Q: int, N: int, C: int,
                            dtype) -> bool:
    on_tpu = jax.default_backend() == "tpu"
    # the one-hot tile (tn<=2048, tq) streams through VMEM; wins only when
    # the gather is large enough that XLA's per-row movement dominates AND
    # the source is small: the kernel's cost is ~N*Q/128^2 MXU weight-load
    # passes, so at N=8192 XLA's per-element gather is ~2.3 ms faster
    # (tools/profile_gather.py: take_along 3.9 vs onehot 6.3 ms at
    # (256, 8192, 3)->1024; kernel wins at N<=2048, e.g. 5.2 vs 8.1 ms at
    # (256, 1024, 3)->2048)
    return (on_tpu and C <= 8 and N <= 2048 and N % min(N, 2048) == 0
            and dtype == jnp.float32 and B * Q >= 2 ** 18)


def _use_mxu_scatter(B: int, Q: int, N: int, C: int) -> bool:
    on_tpu = jax.default_backend() == "tpu"
    # worthwhile when the scatter is large and N fits a VMEM one-hot tile
    return on_tpu and N <= 2048 and C >= 32 and B * Q * C >= 2 ** 24


@partial(jax.custom_vjp, nondiff_argnums=())
def gather_rows(x: Array, idx: Array) -> Array:
    """x: (B, N, C), idx: (B, Q) int32 -> (B, Q, C) = x[b, idx[b, q]].

    Forward is a plain XLA gather; the backward scatter-add dispatches to the
    MXU one-hot kernel at DGCNN-class shapes (35 -> ~10 ms per edge layer).
    """
    # note: dispatching the FORWARD to gather_rows_pallas (wide-C layout)
    # was measured slower in-graph (DGCNN 206 vs 218 c/s) — XLA's gather fwd
    # stays for wide rows; the MXU kernel only replaces the far-slower
    # backward scatter. TINY-C rows (xyz) are the exception: XLA moves them
    # 12 bytes at a time, so the transposed one-hot kernel wins there.
    B, N, C = x.shape
    if _use_mxu_small_c_gather(B, idx.shape[1], N, C, x.dtype):
        return gather_rows_small_c_pallas(x, idx)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def _gather_rows_fwd(x, idx):
    return gather_rows(x, idx), (idx, x.shape)


def _gather_rows_bwd(res, g):
    idx, xshape = res
    B, N, C = xshape
    Q = idx.shape[1]
    if _use_mxu_scatter(B, Q, N, C):
        gx = scatter_rows_add_pallas(jax.lax.stop_gradient(idx), g, N)
    else:
        gx = jnp.zeros(xshape, g.dtype).at[
            jnp.arange(B)[:, None], idx].add(g)
    return gx.astype(g.dtype), None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)
