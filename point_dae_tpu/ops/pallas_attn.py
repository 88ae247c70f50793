"""Fused ViT self-attention at tiny sequence length as one Pallas program.

Role: the flagship stacks run attention at T=32 (packed encoder) and T=64
(decoder) with head dim 64 (reference math: PointCAE_transformer.py:113-137
``Attention``). As XLA batched matmuls these are (B*H, T, d) x (B*H, d, T)
GEMMs with M=N<=64 — every one pads to a 128x128x128 MXU pass, so the
systolic array runs at <6% occupancy and the (B, H, T, T) score tensor
round-trips HBM between four dispatized ops (QK^T, softmax, AV, transpose).

TPU-native layout: tile = ``bc`` clouds x the FULL sequence. Q/K/V blocks
of shape (bc*T, d) turn the per-cloud score blocks into ONE (R, R) MXU
matmul (R = bc*T = 256..512), with a *static block-diagonal mask* killing
the cross-cloud entries (-1e9 before softmax). The softmax and the AV
matmul fuse into the same program, and the backward recomputes the score
tile in VMEM — the (R, R) probabilities never exist in HBM in either pass.
The grid is (B/bc, H); every q/k/v block is owned by exactly one grid
point, so all gradients are row-local (no cross-grid accumulation).

Cost model: the block-diagonal trick wastes a factor ``bc`` of score-matmul
FLOPs on masked entries, but those FLOPs are ~2 orders of magnitude cheaper
than the occupancy lost to 32-row MXU passes — the whole fused encoder
attention is <1 ms of roofline at flagship shapes vs 3.5 ms measured for
the XLA path (evidence/PROFILE_DECOMPOSE_r04.txt attn1_fwd).

Numerics: dot operands bf16, f32 accumulation (preferred_element_type),
softmax in f32 with row-max subtraction — the same policy as the fused MLP
kernel (ops/pallas_mlp.py). Key-mask semantics match layers.Attention
exactly: masked tokens are excluded as KEYS only (queries at masked slots
still attend valid keys, matching the packed static-capacity design).
tests/test_pallas_attn.py bounds both paths against a full-f32 oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


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


def _masked_scores(q, k, m, T, scale):
    """(R, R) f32 scores: QK^T * scale with cross-cloud and invalid-key
    entries at -1e9. m is the (1, R) f32 key-validity row (pre-flattened
    OUTSIDE the kernel — Mosaic cannot lane-reshape (bc, T) -> (R,))."""
    R = q.shape[0]
    s = _dot_ll(q, k) * scale
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // T
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // T
    ok = rows == cols
    if m is not None:
        ok = jnp.logical_and(ok, m > 0.5)
    return jnp.where(ok, s, -1e9)


def _softmax_rows(s):
    mx = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - mx)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _fwd_kernel(T, scale, has_mask, *refs):
    # grid (batch-group i, head h); blocks are effectively 2-D (1, R, d)
    # slices of the (H, B*T, d) layout — Mosaic-friendly (no lane reshapes)
    if has_mask:
        q_ref, k_ref, v_ref, m_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        m_ref = None
    m = m_ref[0, 0:1, :] if m_ref is not None else None      # (1, R)
    q = q_ref[0]                                             # (R, d) bf16
    k = k_ref[0]
    v = v_ref[0]
    p = _softmax_rows(_masked_scores(q, k, m, T, scale))
    o_ref[0] = _dot(p.astype(jnp.bfloat16), v)


def _bwd_kernel(T, scale, has_mask, *refs):
    if has_mask:
        q_ref, k_ref, v_ref, m_ref, g_ref, dq_ref, dk_ref, dv_ref = refs
    else:
        q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref = refs
        m_ref = None
    bf = jnp.bfloat16
    m = m_ref[0, 0:1, :] if m_ref is not None else None      # (1, R)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    p = _softmax_rows(_masked_scores(q, k, m, T, scale))
    pb = p.astype(bf)
    g = g_ref[0].astype(jnp.float32)
    gb = g.astype(bf)
    dv = _dot_rows(pb, gb)                          # (R, d) f32
    dp = _dot_ll(gb, v)                             # (R, R) f32
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
    dsb = (ds * scale).astype(bf)
    dq_ref[0] = _dot(dsb, k).astype(bf)             # (R, d)
    dk_ref[0] = _dot_rows(dsb, q).astype(bf)        # (R, d)
    dv_ref[0] = dv.astype(bf)


def _specs(bc, T, d, with_mask, n_qkv=3):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = bc * T
    qkv = pl.BlockSpec((1, R, d), lambda i, h: (h, i, 0),
                       memory_space=pltpu.VMEM)
    out = [qkv] * n_qkv
    if with_mask:
        # mask rides pre-flattened as (B/bc, 8, R) — sublane-tiled so the
        # (8, R) trailing block dims satisfy Mosaic's alignment rules
        out.append(pl.BlockSpec((1, 8, R), lambda i, h: (i, 0, 0),
                                memory_space=pltpu.VMEM))
    return out


def _fwd_call(q, k, v, mask, T, scale, bc, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, BT, d = q.shape
    R = bc * T
    has_mask = mask is not None
    kern = functools.partial(_fwd_kernel, T, scale, has_mask)
    args = (q, k, v) + ((mask,) if has_mask else ())
    return pl.pallas_call(
        kern,
        grid=(BT // R, H),
        in_specs=_specs(bc, T, d, has_mask),
        out_specs=pl.BlockSpec((1, R, d), lambda i, h: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((H, BT, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _bwd_call(res, g, T, scale, bc, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, k, v, mask = res
    H, BT, d = q.shape
    R = bc * T
    has_mask = mask is not None
    kern = functools.partial(_bwd_kernel, T, scale, has_mask)
    args = (q, k, v) + ((mask,) if has_mask else ()) + (g,)
    blk = pl.BlockSpec((1, R, d), lambda i, h: (h, i, 0))
    bf = jnp.bfloat16
    return pl.pallas_call(
        kern,
        grid=(BT // R, H),
        in_specs=_specs(bc, T, d, has_mask) + [
            pl.BlockSpec((1, R, d), lambda i, h: (h, i, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=[blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct((H, BT, d), bf)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _attn_core(q, k, v, mask, T, scale, bc, interpret):
    return _fwd_call(q, k, v, mask, T, scale, bc, interpret)


def _attn_core_fwd(q, k, v, mask, T, scale, bc, interpret):
    return (_fwd_call(q, k, v, mask, T, scale, bc, interpret),
            (q, k, v, mask))


def _attn_core_bwd(T, scale, bc, interpret, res, g):
    dq, dk, dv = _bwd_call(res, g.astype(jnp.float32), T, scale, bc,
                           interpret)
    return dq, dk, dv, None


_attn_core.defvjp(_attn_core_fwd, _attn_core_bwd)


def pick_bc(B: int, T: int, target_rows: int = 512) -> int:
    """Largest clouds-per-tile with R = bc*T <= target_rows and B % bc == 0."""
    for bc in (16, 8, 4, 2, 1):
        if bc * T <= target_rows and B % bc == 0:
            return bc
    return 1


def supported(B: int, T: int, H: int, d: int, bc: int) -> bool:
    """Shapes the fused kernel handles: whole-sequence tiles, sublane-aligned
    rows, lane-sized head dim, (bc*T)^2 score tile in VMEM."""
    R = bc * T
    return (B % bc == 0 and R % 8 == 0 and R <= 1024
            and d % 8 == 0 and d <= 256 and T >= 2)


def fused_attention(q: Array, k: Array, v: Array,
                    key_mask=None, bc: int = 0,
                    interpret: bool = False) -> Array:
    """softmax(q @ k^T / sqrt(d) [+ key mask]) @ v, per cloud and head,
    computed in block-diagonal (bc*T, bc*T) VMEM tiles.

    q/k/v: (B, T, H, d). The kernel consumes the (H, B*T, d) layout; the
    transposes in/out are plain XLA ops OUTSIDE the custom-VJP core (their
    gradients are exact transposes). Operands cast to bf16 here; cotangents
    carry bf16 back — the same rounding the unfused bf16 einsum applies.
    key_mask: optional (B, T) bool, True = valid key. Returns
    (B, T, H, d) f32."""
    B, T, H, d = q.shape
    if bc <= 0:
        bc = pick_bc(B, T)
    scale = float(d) ** -0.5
    bf = jnp.bfloat16

    def to_h(a):
        return a.astype(bf).transpose(2, 0, 1, 3).reshape(H, B * T, d)

    if key_mask is None:
        m = None
    else:
        # pre-flatten per tile ((bc, T) -> row of R) and tile 8x in the
        # sublane dim; Mosaic cannot reshape across the lane dim in-kernel
        mf = key_mask.astype(jnp.float32).reshape(B // bc, 1, bc * T)
        m = jnp.broadcast_to(mf, (B // bc, 8, bc * T))
    o = _attn_core(to_h(q), to_h(k), to_h(v), m, T, scale, bc, interpret)
    return o.reshape(H, B, T, d).transpose(1, 2, 0, 3)
