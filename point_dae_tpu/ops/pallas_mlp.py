"""Fused ViT MLP (fc1 -> exact-erf GELU -> fc2) as one Pallas program.

Role: the 16 transformer-block MLPs are ~2/3 of the flagship stacks' FLOPs
(reference math: PointCAE_transformer.py:101-116 Mlp), yet the XLA path runs
them at ~26% MFU (evidence/PROFILE_DECOMPOSE_r04.txt: 1.8 ms/block fwd+bwd
against a 0.46 ms roofline): the (R, 4C) GELU hidden round-trips HBM between
the two matmuls in both passes, and the erf/exp VPU work serializes against
the MXU. This kernel keeps the hidden in VMEM for fwd AND bwd (backward
recomputes it — the residual is just the (R, C) input), overlapping the
transcendentals with the grid's next matmul tile.

Numerics: dot operands are bf16, accumulation f32 (preferred_element_type),
GELU in f32 — strictly tighter than the unfused bf16 path it replaces
(which rounds the hidden to bf16 between every op). Weight grads accumulate
f32 across the sequential grid. tests/test_pallas_mlp.py bounds both paths
against a full-f32 oracle and asserts the kernel adds no more error than
the unfused-bf16 baseline.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_SQRT_HALF = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _dot(a: Array, b: Array) -> Array:
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_rows(a: Array, b: Array) -> Array:
    """a (R, K) x b (R, N) -> (K, N) == a.T @ b, f32 accumulation."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_ll(a: Array, b: Array) -> Array:
    """a (R, K) x b (N, K) -> (R, N) == a @ b.T (no explicit transpose)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _erf_f32(x: Array) -> Array:
    """erf via the Abramowitz-Stegun 7.1.26 rational approximation
    (max abs error 1.5e-7 — two decades below bf16 resolution, so the
    kernel parity bound vs the true-erf f32 oracle is unaffected). Mosaic
    has no erf primitive (NotImplementedError on lowering), but exp and
    divide lower fine."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(x < 0, -y, y)


def _gelu_f32(h: Array) -> Array:
    # exact erf form (jax.nn.gelu approximate=False)
    return 0.5 * h * (1.0 + _erf_f32(h * _SQRT_HALF))


def _gelu_grad_f32(h: Array) -> Array:
    cdf = 0.5 * (1.0 + _erf_f32(h * _SQRT_HALF))
    return cdf + h * _INV_SQRT_2PI * jnp.exp(-0.5 * h * h)


def _fwd_kernel(x_ref, k1_ref, b1_ref, k2_ref, b2_ref, out_ref):
    bf = jnp.bfloat16
    x = x_ref[...]                                        # (tt, C) bf16
    h = _dot(x, k1_ref[...]) + b1_ref[...].astype(jnp.float32)
    a = _gelu_f32(h)
    out_ref[...] = _dot(a.astype(bf), k2_ref[...]) \
        + b2_ref[...].astype(jnp.float32)


def _bwd_kernel(x_ref, k1_ref, b1_ref, k2_ref, b2_ref, g_ref,
                dx_ref, dk1_ref, dk2_ref, db_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        dk1_ref[...] = jnp.zeros_like(dk1_ref[...])
        dk2_ref[...] = jnp.zeros_like(dk2_ref[...])
        db_ref[...] = jnp.zeros_like(db_ref[...])

    bf = jnp.bfloat16
    x = x_ref[...]                                        # (tt, C) bf16
    h = _dot(x, k1_ref[...]) + b1_ref[...].astype(jnp.float32)
    a = _gelu_f32(h).astype(bf)                           # (tt, H)
    g = g_ref[...]                                        # (tt, C) f32
    gb = g.astype(bf)

    dk2_ref[...] += _dot_rows(a, gb)                      # (H, C)
    da = _dot_ll(gb, k2_ref[...])                         # (tt, H) f32
    dh = da * _gelu_grad_f32(h)
    dhb = dh.astype(bf)
    dk1_ref[...] += _dot_rows(x, dhb)                     # (C, H)
    dx_ref[...] = _dot_ll(dhb, k1_ref[...])               # (tt, C) f32
    H = dh.shape[1]
    db_ref[...] += jnp.concatenate(
        [jnp.sum(dh, axis=0, keepdims=True),              # db1 (1, H)
         jnp.concatenate([jnp.sum(g, axis=0, keepdims=True),
                          jnp.zeros((1, H - g.shape[1]), jnp.float32)],
                         axis=1)], axis=0)                # db2 padded (1, H)


def _specs(shapes, tiled_first):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    out = []
    for j, s in enumerate(shapes):
        if j in tiled_first:
            out.append(pl.BlockSpec(s, lambda i: (i, 0),
                                    memory_space=pltpu.VMEM))
        else:
            out.append(const(s))
    return out


def _core_fwd_call(xb, k1, b1, k2, b2, tt, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = xb.shape
    H = k1.shape[1]
    return pl.pallas_call(
        _fwd_kernel,
        grid=(R // tt,),
        in_specs=_specs([(tt, C), (C, H), (1, H), (H, C), (1, C)], {0}),
        out_specs=pl.BlockSpec((tt, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xb, k1, b1, k2, b2)


def _core_bwd_call(res, g, tt, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xb, k1, b1, k2, b2 = res
    R, C = xb.shape
    H = k1.shape[1]
    f32 = jnp.float32
    return pl.pallas_call(
        _bwd_kernel,
        grid=(R // tt,),
        in_specs=_specs([(tt, C), (C, H), (1, H), (H, C), (1, C),
                         (tt, C)], {0, 5}),
        out_specs=[
            pl.BlockSpec((tt, C), lambda i: (i, 0)),
            pl.BlockSpec((C, H), lambda i: (0, 0)),
            pl.BlockSpec((H, C), lambda i: (0, 0)),
            pl.BlockSpec((2, H), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, C), f32),
            jax.ShapeDtypeStruct((C, H), f32),
            jax.ShapeDtypeStruct((H, C), f32),
            jax.ShapeDtypeStruct((2, H), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xb, k1, b1, k2, b2, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _mlp_core(xb, k1, b1, k2, b2, tt, interpret):
    return _core_fwd_call(xb, k1, b1, k2, b2, tt, interpret)


def _mlp_core_fwd(xb, k1, b1, k2, b2, tt, interpret):
    return (_core_fwd_call(xb, k1, b1, k2, b2, tt, interpret),
            (xb, k1, b1, k2, b2))


def _mlp_core_bwd(tt, interpret, res, g):
    dx, dk1, dk2, db = _core_bwd_call(res, g.astype(jnp.float32), tt,
                                      interpret)
    C = res[0].shape[1]
    bf = jnp.bfloat16
    # cotangents must carry the primals' dtypes: xb/k1/k2 enter the core as
    # bf16 (the outer astype's grad rule restores f32 for the flax params —
    # the same bf16 rounding the unfused Dense backward applies)
    return (dx.astype(bf), dk1.astype(bf), db[0:1],
            dk2.astype(bf), db[1:2, :C])


_mlp_core.defvjp(_mlp_core_fwd, _mlp_core_bwd)


# ---------------------------------------------------------------------------
# Round-5 rung: LayerNorm2 + residual (+ per-sample stochastic-depth scale)
# folded into the same program — y = x + s * MLP(LN(x)). The LN is row-local
# (mean/var over the lane dim), so both passes stay one grid sweep; folding
# it removes the separate LN kernel, the residual-add round trip, and the
# (R, C) branch tensor from HBM in BOTH passes. The stochastic-depth scale
# rides as an optional (R, 1) per-row multiplier (drawn from the stack's
# vectorized dp_masks — layers._stack_dp_masks), applied to the branch
# before the residual add, exactly like drop_path_from_mask.
# ---------------------------------------------------------------------------


def _ln_fwd_f32(x, gm, bt, eps):
    """flax LayerNorm math (use_fast_variance): f32 in, f32 out."""
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(x * x, axis=1, keepdims=True) - mu * mu
    r = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * r
    return xhat, r, xhat * gm + bt


def _fwd_ln_kernel(eps, has_scale, x_ref, gm_ref, bt_ref, k1_ref, b1_ref,
                   k2_ref, b2_ref, *rest):
    if has_scale:
        sc_ref, o_ref = rest
    else:
        (o_ref,) = rest
    bf = jnp.bfloat16
    x = x_ref[...]                                        # (tt, C) f32
    _, _, hin = _ln_fwd_f32(x, gm_ref[...], bt_ref[...], eps)
    h = _dot(hin.astype(bf), k1_ref[...]) + b1_ref[...].astype(jnp.float32)
    a = _gelu_f32(h)
    out = _dot(a.astype(bf), k2_ref[...]) + b2_ref[...].astype(jnp.float32)
    if has_scale:
        out = out * sc_ref[...]
    o_ref[...] = x + out


def _bwd_ln_kernel(eps, has_scale, x_ref, gm_ref, bt_ref, k1_ref, b1_ref,
                   k2_ref, b2_ref, *rest):
    from jax.experimental import pallas as pl

    if has_scale:
        sc_ref, g_ref, dx_ref, dk1_ref, dk2_ref, db_ref = rest
    else:
        g_ref, dx_ref, dk1_ref, dk2_ref, db_ref = rest

    @pl.when(pl.program_id(0) == 0)
    def _():
        dk1_ref[...] = jnp.zeros_like(dk1_ref[...])
        dk2_ref[...] = jnp.zeros_like(dk2_ref[...])
        db_ref[...] = jnp.zeros_like(db_ref[...])

    bf = jnp.bfloat16
    x = x_ref[...]                                        # (tt, C) f32
    gm = gm_ref[...]
    xhat, r, hin = _ln_fwd_f32(x, gm, bt_ref[...], eps)
    hinb = hin.astype(bf)
    h = _dot(hinb, k1_ref[...]) + b1_ref[...].astype(jnp.float32)
    a = _gelu_f32(h).astype(bf)
    g = g_ref[...]                                        # (tt, C) f32
    gbr = g * sc_ref[...] if has_scale else g             # branch cotangent
    gbrb = gbr.astype(bf)

    dk2_ref[...] += _dot_rows(a, gbrb)                    # (H, C)
    da = _dot_ll(gbrb, k2_ref[...])                       # (tt, H) f32
    dh = da * _gelu_grad_f32(h)
    dhb = dh.astype(bf)
    dk1_ref[...] += _dot_rows(hinb, dhb)                  # (C, H)
    dxin = _dot_ll(dhb, k1_ref[...])                      # (tt, C) f32

    # row-local LayerNorm backward
    dgm = jnp.sum(dxin * xhat, axis=0, keepdims=True)     # (1, C)
    dbt = jnp.sum(dxin, axis=0, keepdims=True)            # (1, C)
    dxhat = dxin * gm
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx_ref[...] = g + r * (dxhat - m1 - xhat * m2)

    H = dh.shape[1]
    C = g.shape[1]

    def padc(row):
        return jnp.concatenate(
            [row, jnp.zeros((1, H - C), jnp.float32)], axis=1)

    db_ref[...] += jnp.concatenate(
        [jnp.sum(dh, axis=0, keepdims=True),              # db1 (1, H)
         padc(jnp.sum(gbr, axis=0, keepdims=True)),       # db2
         padc(dgm),                                       # dgamma
         padc(dbt)], axis=0)                              # dbeta -> (4, H)


def _ln_core_call(kern_builder, x, gm, bt, k1, b1, k2, b2, sc, g,
                  tt, eps, interpret, is_bwd):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = x.shape
    H = k1.shape[1]
    has_scale = sc is not None
    kern = functools.partial(kern_builder, eps, has_scale)
    in_shapes = [(tt, C), (1, C), (1, C), (C, H), (1, H), (H, C), (1, C)]
    tiled = {0}
    args = [x, gm, bt, k1, b1, k2, b2]
    if has_scale:
        in_shapes.append((tt, 1))
        tiled.add(len(in_shapes) - 1)
        args.append(sc)
    if is_bwd:
        in_shapes.append((tt, C))
        tiled.add(len(in_shapes) - 1)
        args.append(g)
        out_specs = [
            pl.BlockSpec((tt, C), lambda i: (i, 0)),
            pl.BlockSpec((C, H), lambda i: (0, 0)),
            pl.BlockSpec((H, C), lambda i: (0, 0)),
            pl.BlockSpec((4, H), lambda i: (0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((R, C), jnp.float32),
            jax.ShapeDtypeStruct((C, H), jnp.float32),
            jax.ShapeDtypeStruct((H, C), jnp.float32),
            jax.ShapeDtypeStruct((4, H), jnp.float32),
        ]
    else:
        out_specs = pl.BlockSpec((tt, C), lambda i: (i, 0))
        out_shape = jax.ShapeDtypeStruct((R, C), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(R // tt,),
        in_specs=_specs(in_shapes, tiled),
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _mlp_ln_core(x, gm, bt, k1, b1, k2, b2, sc, tt, eps, interpret):
    return _ln_core_call(_fwd_ln_kernel, x, gm, bt, k1, b1, k2, b2, sc,
                         None, tt, eps, interpret, is_bwd=False)


def _mlp_ln_core_fwd(x, gm, bt, k1, b1, k2, b2, sc, tt, eps, interpret):
    return (_ln_core_call(_fwd_ln_kernel, x, gm, bt, k1, b1, k2, b2, sc,
                          None, tt, eps, interpret, is_bwd=False),
            (x, gm, bt, k1, b1, k2, b2, sc))


def _mlp_ln_core_bwd(tt, eps, interpret, res, g):
    x, gm, bt, k1, b1, k2, b2, sc = res
    dx, dk1, dk2, db = _ln_core_call(
        _bwd_ln_kernel, x, gm, bt, k1, b1, k2, b2, sc,
        g.astype(jnp.float32), tt, eps, interpret, is_bwd=True)
    C = x.shape[1]
    bf = jnp.bfloat16
    # cotangent dtypes match the primals: residual stream f32, LN params
    # f32, MLP weights bf16 (the outer astype restores f32 for flax)
    return (dx, db[2:3, :C].reshape(C), db[3:4, :C].reshape(C),
            dk1.astype(bf), db[0:1], dk2.astype(bf), db[1:2, :C],
            None)


_mlp_ln_core.defvjp(_mlp_ln_core_fwd, _mlp_ln_core_bwd)


def fused_mlp_ln(x: Array, gamma: Array, beta: Array,
                 k1: Array, b1: Array, k2: Array, b2: Array,
                 row_scale: Optional[Array] = None, tt: int = 256,
                 eps: float = 1e-6, interpret: bool = False) -> Array:
    """y = x + s * (gelu_exact(LN(x; gamma, beta) @ k1 + b1) @ k2 + b2) —
    the whole pre-norm MLP sub-block (TransformerBlock's norm2 branch,
    PointCAE_transformer.py:152-158) in one program. x: (..., C) f32
    residual stream; row_scale: optional per-row stochastic-depth scale
    (flattened (R,)). Returns f32 (the new residual stream)."""
    lead = x.shape[:-1]
    C = x.shape[-1]
    H = k1.shape[1]
    x2 = x.reshape(-1, C).astype(jnp.float32)
    bf = jnp.bfloat16
    sc = None if row_scale is None \
        else row_scale.reshape(-1, 1).astype(jnp.float32)
    out = _mlp_ln_core(
        x2, gamma.reshape(1, C).astype(jnp.float32),
        beta.reshape(1, C).astype(jnp.float32),
        k1.astype(bf), b1.reshape(1, H).astype(jnp.float32),
        k2.astype(bf), b2.reshape(1, C).astype(jnp.float32),
        sc, tt, eps, interpret)
    return out.reshape(*lead, C)


def supported(R: int, C: int, H: int, tt: int = 256) -> bool:
    """Full-row tiles; lane-aligned feature dims; hidden wider than out
    (the db2 row rides padded inside the (2, H) bias-grad block)."""
    return R % tt == 0 and C % 128 == 0 and H % 128 == 0 and H >= C


def fused_mlp(x: Array, k1: Array, b1: Array, k2: Array, b2: Array,
              tt: int = 256, interpret: bool = False) -> Array:
    """y = gelu_exact(x @ k1 + b1) @ k2 + b2, hidden VMEM-resident in both
    passes. x: (..., C) any float dtype; params f32 (flax tree). Returns
    f32 (the caller's residual cast applies, layers.py TransformerBlock)."""
    lead = x.shape[:-1]
    C = x.shape[-1]
    H = k1.shape[1]
    xb = x.reshape(-1, C).astype(jnp.bfloat16)
    bf = jnp.bfloat16
    out = _mlp_core(xb, k1.astype(bf), b1.reshape(1, H).astype(jnp.float32),
                    k2.astype(bf), b2.reshape(1, C).astype(jnp.float32),
                    tt, interpret)
    return out.reshape(*lead, C)
