"""DGCNN encoder + Point-DAE heads (reference: models/dgcnn_util.py,
models/PointCAE_DGCNN.py).

TPU design notes:
- EdgeConv's kNN runs as one MXU matmul + top_k per layer (the reference's
  ``knn`` at dgcnn_util.py:7-12 is the same math on CUDA); graph features are
  built with ``take_along_axis`` gathers instead of flattened index ops.
- Channel-last layout throughout; max-pools over the neighbour axis.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import knn
from .layers import leaky_relu02

Array = jax.Array


def get_graph_feature(x: Array, k: int = 20, idx: Optional[Array] = None,
                      dtype: Optional[jnp.dtype] = None) -> Array:
    """Edge features (dgcnn_util.py:15-36). x: (B, N, C) ->
    (B, N, k, 2C) = concat(neighbor - self, self).

    The gather goes through ``gather_rows`` so its backward scatter-add runs
    as an MXU one-hot matmul at DGCNN scale (35 -> ~16 ms per edge layer)
    instead of XLA's HBM scatter.

    ``dtype`` (e.g. bf16) applies to the gathered edge tensor only — the kNN
    selection always runs on the f32 coordinates/features (geometry stays
    full-precision, DESIGN.md §5); the (B, N, k, 2C) edge tensor dominates
    the layer's HBM traffic, so halving its bytes is the big lever."""
    from ..ops.pallas_scatter import gather_rows

    if idx is None:
        _, idx = knn(x, x, k)                              # (B, N, k)
    B, N, C = x.shape
    if dtype is not None:
        x = x.astype(dtype)
    feature = gather_rows(x, idx.reshape(B, N * k)).reshape(B, N, k, C)
    center = jnp.broadcast_to(x[:, :, None, :], (B, N, k, C))
    return jnp.concatenate([feature - center, center], axis=-1)


class EdgeConv(nn.Module):
    """One EdgeConv: graph feature -> pointwise Dense+BN+LeakyReLU -> max_k.

    ``idx`` lets the caller hoist the kNN out of a remat boundary: the
    neighbour indices need no gradient, so recomputing them in the backward
    pass (2x the most expensive op of the layer) is pure waste — passed-in
    indices become ordinary saved residuals."""
    out_dim: int
    k: int = 20
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 idx: Optional[Array] = None) -> Array:
        # note: decomposing the conv into pre-gather per-point projections
        # (W [x_j - x_i; x_i] = u_j + v_i) cuts matmul FLOPs by k but
        # measured SLOWER in-graph (185 vs 195 c/s) — the step is HBM-bound
        # and the split adds an elementwise pass; the fused edge tensor stays
        h = get_graph_feature(x, self.k, idx=idx, dtype=self.dtype)
        h = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                     name="conv")(h)                        # (B, N, k, D)
        # BatchNorm statistics always f32 (explicit dtype: under the bf16
        # policy the convert fuses into the stats/normalize passes — the
        # materialized buffers stay bf16)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(h)
        h = leaky_relu02(h)
        return jnp.max(h, axis=2)                           # (B, N, out_dim)


class _EdgeDense(nn.Module):
    """Holds the same (2C, out) 'kernel' an EdgeConv Dense would
    (checkpoints interchange) and returns the split projections
    U = x @ W_top, V = x @ (W_bot - W_top) with
    W [x_j - x_i ; x_i] = U_j + V_i."""
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array):
        C = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2 * C, self.features))
        dt = self.dtype or x.dtype
        wt = kernel[:C].astype(dt)
        wc = kernel[C:].astype(dt)
        xd = x.astype(dt)
        return xd @ wt, xd @ (wc - wt)


class _AffineStats(nn.Module):
    """Name-compatible stand-in for nn.BatchNorm's variables (params
    scale/bias, batch_stats mean/var) when normalization is applied
    outside, from aggregate statistics."""
    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None, train: bool = True):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features))
        if train and batch_mean is not None:
            if not self.is_initializing():
                mom = self.momentum
                ra_mean.value = mom * ra_mean.value + (1 - mom) * batch_mean
                ra_var.value = mom * ra_var.value + (1 - mom) * batch_var
            return scale, bias, batch_mean, batch_var
        return scale, bias, ra_mean.value, ra_var.value


class FusedEdgeConv(nn.Module):
    """EdgeConv without the (B, N, k, 2C) edge tensor or (B, N, N) distance
    matrix in HBM (see ops/pallas_edgeconv.py for the math): split edge
    projection -> fused kNN+aggregate kernel -> BN stats reconstructed from
    the aggregates -> per-channel monotone max/min select -> affine+leaky.

    Same parameter/stat tree as EdgeConv (conv/kernel, bn/{scale,bias} +
    batch_stats bn/{mean,var}), so the two implementations interchange on
    any checkpoint. ``use_pallas=False`` keeps the same restructured math
    but aggregates via gather (XLA fusion decides the rest).
    """
    out_dim: int
    k: int = 20
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = True
    interpret: bool = False
    exact_grads: bool = False
    # max/min tie routing in the backward: 'first' = whole cotangent to the
    # first extremal neighbor in distance order (torch .max() semantics —
    # what the reference trains with — and ~2x less backward MXU work);
    # 'split' = equal split among ties (jnp.max semantics, the XLA
    # fallback's behavior). Parameter gradients agree whenever ties come
    # from duplicated points (ops/pallas_edgeconv.knn_aggregate docstring).
    grad_mode: str = "first"
    tn: int = 256

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 idx: Optional[Array] = None) -> Array:
        from ..ops.pallas_edgeconv import (knn_aggregate, knn_aggregate_xla,
                                           supported)

        from ..ops.pallas_edgeconv import aggregate_from_idx

        B, N, C = x.shape
        U, V = _EdgeDense(self.out_dim, dtype=self.dtype, name="conv")(x)
        Uf = U.astype(jnp.float32)
        Vf = V.astype(jnp.float32)
        xf = jax.lax.stop_gradient(x.astype(jnp.float32))
        tn_eff = min(self.tn, N)   # small clouds: one full-row tile
        use_kernel = self.interpret or (
            self.use_pallas and idx is None and supported(N, self.k, tn_eff)
            and jax.devices()[0].platform == "tpu")
        # kNN implementation for the kernel path (PDAE_EDGECONV_KNN):
        # 'kernel' = in-kernel distance tile + k-round argmin extraction;
        # 'xla' = hybrid — XLA computes the kNN (matmul + top_k, fully
        # parallel over rows) and the lean aggregate-from-idx kernel skips
        # the distance matrix and the per-round masking chain (the r05
        # stage marginals showed that chain's VPU passes, not the MXU
        # dots, dominate the step).
        import os as _os
        knn_impl = _os.environ.get("PDAE_EDGECONV_KNN", "kernel")
        if use_kernel:
            # bf16 edge projection => Uf's f32 values carry only bf16
            # mantissas => the kernel's selection dots are exact in a
            # single MXU pass (3-pass mantissa split would multiply by
            # all-zero chunks). Under bf16 the backward SCATTER also drops
            # to one pass: du flows straight into the bf16 edge-projection
            # backward, which rounds it to bf16 regardless — the same
            # rounding every Dense in the bf16 net applies to its grads.
            # ``exact_grads=True`` restores the 3-pass f32-exact scatter.
            passes = 1 if U.dtype == jnp.bfloat16 else 3
            gpasses = 3 if self.exact_grads else passes
            gmode = "split" if self.exact_grads else self.grad_mode
            # Selection-value implementation. 'dot' (default): one-hot MXU
            # matmuls. 'gather' (PDAE_EDGECONV_SEL=gather): Mosaic native
            # dynamic gather — exact f32 and MXU-free, but the current
            # Mosaic backend rejects it for N > one vreg ("Multiple source
            # vregs along gather dimension", r05 hardware finding), so it
            # stays opt-in for future toolchains / small-N shapes.
            sel = _os.environ.get("PDAE_EDGECONV_SEL", "dot")
            if knn_impl == "xla":
                kidx = jax.lax.stop_gradient(knn(xf, xf, self.k)[1])
                M, m, S1, S2 = aggregate_from_idx(
                    Uf, kidx, self.k, tn=tn_eff, interpret=self.interpret,
                    value_passes=passes, grad_passes=gpasses,
                    grad_mode=gmode, sel_impl=sel)
            else:
                M, m, S1, S2, _ = knn_aggregate(Uf, xf, self.k, tn=tn_eff,
                                                interpret=self.interpret,
                                                value_passes=passes,
                                                grad_passes=gpasses,
                                                grad_mode=gmode,
                                                sel_impl=sel)
        else:
            if idx is None:
                idx = jax.lax.stop_gradient(knn(xf, xf, self.k)[1])
            M, m, S1, S2 = knn_aggregate_xla(Uf, idx)

        if train:
            cnt = B * N * self.k
            sum_h = jnp.sum(S1, axis=(0, 1)) + self.k * jnp.sum(Vf, (0, 1))
            mean_b = sum_h / cnt
            sum_h2 = (jnp.sum(S2, axis=(0, 1))
                      + 2.0 * jnp.sum(Vf * S1, axis=(0, 1))
                      + self.k * jnp.sum(Vf * Vf, axis=(0, 1)))
            var_b = sum_h2 / cnt - mean_b * mean_b
        else:
            mean_b = var_b = None
        scale, bias, mean, var = _AffineStats(self.out_dim, name="bn")(
            mean_b, var_b, train)
        # BN+LeakyReLU is per-channel monotone: increasing for scale >= 0
        # (max survives), decreasing otherwise (min survives) — exact
        sel = Vf + jnp.where(scale >= 0, M, m)
        inv = scale * jax.lax.rsqrt(var + 1e-5)
        return leaky_relu02((sel - mean) * inv + bias)


class DGCNNEncoder(nn.Module):
    """4 EdgeConvs + 1024-d fuse + global max-pool (dgcnn_util.py:87-136).

    Returns (global_feature (B, 1024), pointwise (B, N, 1024)); the
    'nopooling' variant of the reference is the second output.

    ``remat=True`` rematerializes each EdgeConv in the backward pass — the
    (B, N, k, 2C) graph features dominate HBM at large batch; trading the
    cheap recompute roughly halves activation memory.

    ``impl`` selects the EdgeConv implementation: 'reference' (edge tensor
    + Dense, the original layout), 'fused' (split-projection + gathered
    aggregates, XLA), 'fused_pallas' (split-projection + the fused
    kNN/aggregate kernel — no edge tensor or distance matrix in HBM), or
    'auto' (fused_pallas on TPU, reference elsewhere — FusedEdgeConv
    additionally falls back to the XLA aggregates per-layer when the kernel
    does not support the shape). All impls share one parameter tree.
    """
    k: int = 20
    remat: bool = False
    dtype: Optional[jnp.dtype] = None
    impl: str = "reference"
    exact_grads: bool = False
    grad_mode: str = "first"   # see FusedEdgeConv
    tn: int = 256

    def _resolved_impl(self) -> str:
        if self.impl != "auto":
            return self.impl
        return ("fused_pallas" if jax.devices()[0].platform == "tpu"
                else "reference")

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Tuple[Array, Array]:
        impl = self._resolved_impl()
        if impl in ("fused", "fused_pallas"):
            # remat composes with the fused impls too (recompute the whole
            # block in the bwd; mostly moot for fused_pallas, whose residual
            # is just the (B, N, k) indices, but honoring the flag beats
            # silently changing the activation-memory profile)
            cls = nn.remat(FusedEdgeConv, static_argnums=(2,)) if self.remat \
                else FusedEdgeConv
            FEC = functools.partial(cls,
                                    use_pallas=impl == "fused_pallas",
                                    exact_grads=self.exact_grads,
                                    grad_mode=self.grad_mode, tn=self.tn)
            x1 = FEC(64, self.k, self.dtype, name="ec1")(x, train)
            x2 = FEC(64, self.k, self.dtype, name="ec2")(x1, train)
            x3 = FEC(128, self.k, self.dtype, name="ec3")(x2, train)
            x4 = FEC(256, self.k, self.dtype, name="ec4")(x3, train)
        elif self.remat:
            # kNN hoisted out of the remat boundary (indices carry no
            # gradient; recomputing them in the bwd doubles the step's most
            # expensive op), only the gather+conv+max is rematerialized
            EC = nn.remat(EdgeConv, static_argnums=(2,))
            nn_idx = lambda h: jax.lax.stop_gradient(knn(h, h, self.k)[1])
            x1 = EC(64, self.k, self.dtype, name="ec1")(x, train, nn_idx(x))
            x2 = EC(64, self.k, self.dtype, name="ec2")(x1, train, nn_idx(x1))
            x3 = EC(128, self.k, self.dtype, name="ec3")(x2, train, nn_idx(x2))
            x4 = EC(256, self.k, self.dtype, name="ec4")(x3, train, nn_idx(x3))
        else:
            x1 = EdgeConv(64, self.k, self.dtype, name="ec1")(x, train)
            x2 = EdgeConv(64, self.k, self.dtype, name="ec2")(x1, train)
            x3 = EdgeConv(128, self.k, self.dtype, name="ec3")(x2, train)
            x4 = EdgeConv(256, self.k, self.dtype, name="ec4")(x3, train)
        h = jnp.concatenate([x1, x2, x3, x4], axis=-1)      # (B, N, 512)
        h = nn.Dense(1024, use_bias=False, dtype=self.dtype, name="conv5")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn5")(h)
        h = leaky_relu02(h)
        return jnp.max(h, axis=1), h


class DGCNNPartSegEncoder(nn.Module):
    """Segmentation-style DGCNN (dgcnn_util.py:193-246): 3 EdgeConv stages
    (first two with double conv), 64-d each, 1024-d fuse.

    ``return_stages=True`` also yields the per-point 64-d stage features
    (x1, x2, x3) — the seg head's skips. The reference has TWO encoders of
    this name: the top-level one returns only the pooled global
    (models/dgcnn_util.py:222-246) while the segmentation-local one the
    part-seg model actually imports returns (x1, x2, x3, pooled)
    (segmentation/models/dgcnn_util.py:168-193); the flag serves both
    call shapes from one module."""
    k: int = 20

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 return_stages: bool = False):
        def stage(x, dims, name):
            h = get_graph_feature(x, self.k)
            for j, d in enumerate(dims):
                h = nn.Dense(d, use_bias=False, name=f"{name}_conv{j}")(h)
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"{name}_bn{j}")(h)
                h = leaky_relu02(h)
            return jnp.max(h, axis=2)

        x1 = stage(x, (64, 64), "s1")
        x2 = stage(x1, (64, 64), "s2")
        x3 = stage(x2, (64,), "s3")
        h = jnp.concatenate([x1, x2, x3], axis=-1)          # (B, N, 192)
        h = nn.Dense(1024, use_bias=False, name="conv6")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn6")(h)
        h = leaky_relu02(h)
        if return_stages:
            return jnp.max(h, axis=1), h, (x1, x2, x3)
        return jnp.max(h, axis=1), h
