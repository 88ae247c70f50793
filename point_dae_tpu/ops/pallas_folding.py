"""Fused Pallas folding-head kernel: both SplitMLP stages in VMEM.

The reference folding decoder (PointCAE_transformer.py:789-803,859-878)
expands every decoded token over a 6x6 grid and runs two 3-layer MLPs on
the expanded rows. On the flagship step the expanded hiddens are
(B, M, 36, trans_dim) — 361 MB bf16 each at bs 256, the single largest
HBM tensors of the whole train step (per-HLO breakdown in
evidence/ROOFLINE_r03.json ranks their fwd/bwd dot_generals top, plus the
layout copies/async slices XLA stages the saved buffers through).
``nn.remat`` does NOT fix this (measured slower,
evidence/PROFILE_FLAGSHIP_AB_r03.txt): the recompute rematerializes the
same hiddens through HBM.

This kernel runs the whole two-stage chain tile-by-tile with every hidden
resident in VMEM: per token tile the only HBM traffic is the (tt, C)
token block in and the (tt*n, 8) folded points out — the 6 matmuls ride
the MXU back-to-back. The custom VJP recomputes the forward per tile
(from the tiny inputs) and accumulates weight gradients across grid steps
in revisited output blocks, so the backward also never writes a hidden to
HBM.

Numerics: every dot is bf16 x bf16 with f32 accumulation (the MXU-native
contraction), all elementwise math (bias adds, relu) stays f32, and only
the NEXT dot's operands are rounded back to bf16 — the same
excess-precision policy XLA applies to the bf16 SplitMLP chain on this
target (--xla_allow_excess_precision). Mosaic also has no bf16 compare on
v5e, so the relu masks must be f32 anyway. tests/test_pallas_folding.py
checks the kernel lands at least as close to a float64 oracle as the XLA
path; gradients are f32 accumulations of bf16-rounded operands — at least
the fidelity the XLA dot backward delivers.

Per-point width quirks (grid is 2-wide, folded points 3-wide) are
zero-padded to 8 lanes; zero columns/rows are exact under dot + relu.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_EP = 8          # padded per-point width (grid 2 / points 3 -> 8 lanes)


def _dot(a: Array, b: Array) -> Array:
    """a (R, K) @ b (K, N) -> (R, N) f32 accumulation."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_ll(a: Array, b: Array) -> Array:
    """Contract last dims: a (R, K) x b (N, K) -> (R, N) == a @ b.T."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_rows(a: Array, b: Array) -> Array:
    """Contract rows: a (R, K) x b (R, N) -> (K, N) == a.T @ b."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _recompute_fwd(n, xb, gp1, b01, ks1, k11, b11, k21, b21,
                   ks2, ke2, b02, k12, b12):
    """Shared fwd chain up to a3: f32 activations, bf16 dot operands."""
    bf = jnp.bfloat16
    f32 = jnp.float32
    tt = xb.shape[0]
    F = ks1.shape[1]
    sp1 = _dot(xb, ks1)                                     # (tt, F) f32
    h0 = (gp1.astype(f32)[None, :, :] + sp1[:, None, :]) \
        + b01.astype(f32)[None]                             # (tt, n, F)
    a0 = jnp.maximum(h0, 0).reshape(tt * n, F)
    h1 = _dot(a0.astype(bf), k11) + b11.astype(f32)         # (R, F)
    a1 = jnp.maximum(h1, 0)
    f1 = _dot(a1.astype(bf), k21) + b21.astype(f32)         # (R, EP)
    pp2 = _dot(f1.astype(bf), ke2)                          # (R, F)
    sp2 = _dot(xb, ks2)                                     # (tt, F)
    h2 = (pp2.reshape(tt, n, F) + sp2[:, None, :]) \
        + b02.astype(f32)[None]
    a2 = jnp.maximum(h2, 0).reshape(tt * n, F)
    h3 = _dot(a2.astype(bf), k12) + b12.astype(f32)
    a3 = jnp.maximum(h3, 0)
    return a0, a1, f1, a2, a3


def _fwd_kernel(n, x_ref, gp1_ref, b01_ref, ks1_ref, k11_ref, b11_ref,
                k21_ref, b21_ref, ks2_ref, ke2_ref, b02_ref, k12_ref,
                b12_ref, k22_ref, b22_ref, out_ref):
    xb = x_ref[...]
    *_, a3 = _recompute_fwd(
        n, xb, gp1_ref[...], b01_ref[...][0], ks1_ref[...], k11_ref[...],
        b11_ref[...], k21_ref[...], b21_ref[...], ks2_ref[...],
        ke2_ref[...], b02_ref[...][0], k12_ref[...], b12_ref[...])
    out_ref[...] = _dot(a3.astype(jnp.bfloat16), k22_ref[...]) \
        + b22_ref[...].astype(jnp.float32)


def _bwd_kernel(n, x_ref, gp1_ref, b01_ref, ks1_ref, k11_ref, b11_ref,
                k21_ref, b21_ref, ks2_ref, ke2_ref, b02_ref, k12_ref,
                b12_ref, k22_ref, b22_ref, g_ref,
                dx_ref, dks1_ref, dk11_ref, dk21_ref, dgp1_ref,
                dks2_ref, dke2_ref, dk12_ref, dk22_ref, misc_ref):
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        for r in (dks1_ref, dk11_ref, dk21_ref, dgp1_ref, dks2_ref,
                  dke2_ref, dk12_ref, dk22_ref, misc_ref):
            r[...] = jnp.zeros_like(r[...])

    f32 = jnp.float32
    bf = jnp.bfloat16
    xb = x_ref[...]
    tt = xb.shape[0]
    F = ks1_ref.shape[1]
    # activations come back f32 (masks must be f32 compares: Mosaic has no
    # bf16 cmp on v5e); every grad dot casts its operands to bf16 — the
    # fidelity the XLA dot backward has (bf16 cotangents) — and
    # accumulates f32 on the MXU
    a0, a1, f1, a2, a3 = _recompute_fwd(
        n, xb, gp1_ref[...], b01_ref[...][0], ks1_ref[...], k11_ref[...],
        b11_ref[...], k21_ref[...], b21_ref[...], ks2_ref[...],
        ke2_ref[...], b02_ref[...][0], k12_ref[...], b12_ref[...])
    g = g_ref[...]                                          # (R, EP) f32
    gb = g.astype(bf)

    # stage-2 dense2: out = a3 @ k22 + b22
    dk22_ref[...] += _dot_rows(a3.astype(bf), gb)           # (F, EP)
    da3 = _dot_ll(gb, k22_ref[...])                         # (R, F) f32
    dh3 = jnp.where(a3 > 0, da3, 0.0)
    dh3b = dh3.astype(bf)
    db12 = jnp.sum(dh3, axis=0, keepdims=True)              # (1, F)
    # stage-2 dense1: h3 = a2 @ k12 + b12
    dk12_ref[...] += _dot_rows(a2.astype(bf), dh3b)
    da2 = _dot_ll(dh3b, k12_ref[...])
    dh2 = jnp.where(a2 > 0, da2, 0.0)
    dh2b = dh2.astype(bf)
    db02 = jnp.sum(dh2, axis=0, keepdims=True)
    # stage-2 dense0 (split): h2 = f1 @ ke2 + x @ ks2 + b02
    dsp2 = jnp.sum(dh2.reshape(tt, n, F), axis=1)           # (tt, F)
    dks2_ref[...] += _dot_rows(xb, dsp2.astype(bf))         # (C, F)
    dx = _dot_ll(dsp2.astype(bf), ks2_ref[...])             # (tt, C)
    dke2_ref[...] += _dot_rows(f1.astype(bf), dh2b)         # (EP, F)
    df1 = _dot_ll(dh2b, ke2_ref[...])                       # (R, EP)
    df1b = df1.astype(bf)
    db21 = jnp.sum(df1, axis=0, keepdims=True)              # (1, EP)
    # stage-1 dense2: f1 = a1 @ k21 + b21
    dk21_ref[...] += _dot_rows(a1.astype(bf), df1b)         # (F, EP)
    da1 = _dot_ll(df1b, k21_ref[...])                       # (R, F)
    dh1 = jnp.where(a1 > 0, da1, 0.0)
    dh1b = dh1.astype(bf)
    db11 = jnp.sum(dh1, axis=0, keepdims=True)
    # stage-1 dense1: h1 = a0 @ k11 + b11
    dk11_ref[...] += _dot_rows(a0.astype(bf), dh1b)
    da0 = _dot_ll(dh1b, k11_ref[...])
    dh0 = jnp.where(a0 > 0, da0, 0.0).reshape(tt, n, F)
    # stage-1 dense0 (split): h0 = gp1 + x @ ks1 + b01
    dgp1_ref[...] += jnp.sum(dh0, axis=0)                   # (n, F)
    dsp1 = jnp.sum(dh0, axis=1)                             # (tt, F)
    dks1_ref[...] += _dot_rows(xb, dsp1.astype(bf))
    dx_ref[...] = dx + _dot_ll(dsp1.astype(bf), ks1_ref[...])
    misc_ref[...] += jnp.concatenate([
        db12, db02, db11,
        jnp.concatenate([db21, jnp.zeros((1, F - _EP), f32)], axis=1),
        jnp.zeros((4, F), f32)], axis=0)                    # (8, F)


def _core_fwd(xf, gp1, b01, ks1, k11, b11, k21, b21, ks2, ke2, b02, k12,
              b12, k22, b22, tt, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Tp, C = xf.shape
    n, F = gp1.shape
    R = tt * n
    kern = functools.partial(_fwd_kernel, n)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(Tp // tt,),
        in_specs=[
            pl.BlockSpec((tt, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const((n, F)), const((1, F)), const((C, F)), const((F, F)),
            const((1, F)), const((F, _EP)), const((1, _EP)),
            const((C, F)), const((_EP, F)), const((1, F)), const((F, F)),
            const((1, F)), const((F, _EP)), const((1, _EP)),
        ],
        out_specs=pl.BlockSpec((R, _EP), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp * n, _EP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xf, gp1, b01, ks1, k11, b11, k21, b21, ks2, ke2, b02, k12, b12,
      k22, b22)
    return out


def _core_bwd_call(res, g, tt, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (xf, gp1, b01, ks1, k11, b11, k21, b21, ks2, ke2, b02, k12, b12,
     k22, b22) = res
    Tp, C = xf.shape
    n, F = gp1.shape
    R = tt * n
    kern = functools.partial(_bwd_kernel, n)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    outs = pl.pallas_call(
        kern,
        grid=(Tp // tt,),
        in_specs=[
            pl.BlockSpec((tt, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const((n, F)), const((1, F)), const((C, F)), const((F, F)),
            const((1, F)), const((F, _EP)), const((1, _EP)),
            const((C, F)), const((_EP, F)), const((1, F)), const((F, F)),
            const((1, F)), const((F, _EP)), const((1, _EP)),
            pl.BlockSpec((R, _EP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tt, C), lambda i: (i, 0)),
            const((C, F)), const((F, F)), const((F, _EP)), const((n, F)),
            const((C, F)), const((_EP, F)), const((F, F)),
            const((F, _EP)), const((8, F)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, C), f32),
            jax.ShapeDtypeStruct((C, F), f32),
            jax.ShapeDtypeStruct((F, F), f32),
            jax.ShapeDtypeStruct((F, _EP), f32),
            jax.ShapeDtypeStruct((n, F), f32),
            jax.ShapeDtypeStruct((C, F), f32),
            jax.ShapeDtypeStruct((_EP, F), f32),
            jax.ShapeDtypeStruct((F, F), f32),
            jax.ShapeDtypeStruct((F, _EP), f32),
            jax.ShapeDtypeStruct((8, F), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xf, gp1, b01, ks1, k11, b11, k21, b21, ks2, ke2, b02, k12, b12,
      k22, b22, g)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16))
def _fold_core(xf, gp1, b01, ks1, k11, b11, k21, b21, ks2, ke2, b02, k12,
               b12, k22, b22, tt, interpret):
    """(Tp, C) bf16 tokens -> (Tp*n, EP) f32 folded points (cols 3+ zero).

    All weight/bias operands are pre-cast bf16 (the XLA policy's cast sits
    outside, so its VJP restores f32 master-param gradients)."""
    return _core_fwd(xf, gp1, b01, ks1, k11, b11, k21, b21, ks2, ke2, b02,
                     k12, b12, k22, b22, tt, interpret)


def _fold_core_fwd(xf, gp1, b01, ks1, k11, b11, k21, b21, ks2, ke2, b02,
                   k12, b12, k22, b22, tt, interpret):
    res = (xf, gp1, b01, ks1, k11, b11, k21, b21, ks2, ke2, b02, k12, b12,
           k22, b22)
    return _core_fwd(*res, tt, interpret), res


def _fold_core_bwd(tt, interpret, res, g):
    (dx, dks1, dk11, dk21, dgp1, dks2, dke2, dk12, dk22,
     misc) = _core_bwd_call(res, g.astype(jnp.float32), tt, interpret)
    bf = jnp.bfloat16
    db12 = misc[0:1]
    db02 = misc[1:2]
    db11 = misc[2:3]
    db21 = misc[3:4, :_EP]
    db22 = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    db01 = jnp.sum(dgp1, axis=0, keepdims=True)
    return (dx.astype(bf), dgp1.astype(bf), db01.astype(bf),
            dks1.astype(bf), dk11.astype(bf), db11.astype(bf),
            dk21.astype(bf), db21.astype(bf), dks2.astype(bf),
            dke2.astype(bf), db02.astype(bf), dk12.astype(bf),
            db12.astype(bf), dk22.astype(bf), db22.astype(bf))


_fold_core.defvjp(_fold_core_fwd, _fold_core_bwd)


def supported(C: int, F: int, n: int) -> bool:
    """Shapes the fused kernel handles: lane-aligned channels, a grid
    small enough that a row tile's hiddens stay comfortably in VMEM."""
    return C % 128 == 0 and F % 128 == 0 and 2 <= n <= 64


def fused_folding(x: Array, grid: Array, p1, p2, tt: int = 128,
                  interpret: bool = False) -> Array:
    """Fused two-stage folding head.

    x: (B, M, C) tokens; grid: (n, 2); p1/p2: ((k0, b0), (k1, b1), (k2, b2))
    raw f32 params of each SplitMLP stage (kernel k0 is the concat layout
    (C+E, F)). Returns (B, M, n, 3) f32 — same bf16-dot/f32-elementwise
    policy as the XLA SplitMLP path under --xla_allow_excess_precision.
    """
    (k01, b01), (k11, b11), (k21, b21) = p1
    (k02, b02), (k12, b12), (k22, b22) = p2
    B, M, C = x.shape
    n = grid.shape[0]
    F = k11.shape[0]
    bf = jnp.bfloat16
    ks1, ke1 = k01[:C].astype(bf), k01[C:].astype(bf)
    ks2, ke2 = k02[:C].astype(bf), k02[C:].astype(bf)
    # pp of stage 1 is token-independent: grid @ ke1 once (same bf16 dot
    # XLA emits for the broadcast gridb @ ke contraction)
    gp1 = _dot(grid.astype(bf), ke1).astype(bf)               # (n, F)
    E2 = ke2.shape[0]
    ke2p = jnp.pad(ke2, ((0, _EP - E2), (0, 0)))
    k21p = jnp.pad(k21.astype(bf), ((0, 0), (0, _EP - k21.shape[1])))
    b21p = jnp.pad(b21.astype(bf), (0, _EP - b21.shape[0]))[None]
    k22p = jnp.pad(k22.astype(bf), ((0, 0), (0, _EP - k22.shape[1])))
    b22p = jnp.pad(b22.astype(bf), (0, _EP - b22.shape[0]))[None]
    T = B * M
    Tp = -(-T // tt) * tt
    xf = x.reshape(T, C).astype(bf)
    if Tp != T:
        xf = jnp.pad(xf, ((0, Tp - T), (0, 0)))
    out = _fold_core(xf, gp1, b01.astype(bf)[None], ks1, k11.astype(bf),
                     b11.astype(bf)[None], k21p, b21p, ks2, ke2p,
                     b02.astype(bf)[None], k12.astype(bf),
                     b12.astype(bf)[None], k22p, b22p, tt, interpret)
    return out.reshape(Tp, n, _EP)[:T, :, :3].reshape(B, M, n, 3)
