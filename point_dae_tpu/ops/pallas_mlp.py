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
