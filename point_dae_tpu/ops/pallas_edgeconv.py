"""Fused EdgeConv neighbor-aggregate kernel.

EdgeConv (dgcnn_util.py:15-36 + the conv/BN/max at :87-139) is, by
linearity of the edge projection, computable WITHOUT the (B, N, k, 2C)
edge tensor or the (B, N, N) distance matrix ever reaching HBM:

    W [x_j - x_i ; x_i] = U_j + V_i,   U = X W_top, V = X (W_bot - W_top)

and everything downstream of the projection (BatchNorm batch statistics,
the post-BN/LeakyReLU max over neighbors) is reconstructible from four
per-point aggregates of U over each point's k nearest neighbors:

    M_i  = max_{j in knn(i)} U_j      m_i  = min_{j in knn(i)} U_j
    S1_i = sum U_j                    S2_i = sum U_j^2

(max/min suffice because BN+LeakyReLU is per-channel monotone — increasing
when the BN scale is >= 0, decreasing otherwise; the stats come from
sum/sumsq expansions of (U_j + V_i).)

This kernel computes the kNN selection (pairwise-distance tile on the MXU +
iterative min-extraction, same conventions as ops.knn) AND the four
aggregates in one pass: per k-round the argmin row one-hot both masks the
distance tile and gathers U as a (tn, N) @ (N, C) MXU matmul. The custom
VJP re-derives the selection one-hots from the saved (B, N, k) indices and
scatters the combined cotangent back as transposed one-hot matmuls — no
gather/scatter primitives, everything rides the MXU.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
_INF = 1e30

def _sel_dot(onehot_f32: Array, values: Array, passes: int = 3) -> Array:
    """f32-exact one-hot selection/scatter matmul on the MXU.

    A DEFAULT-precision f32 dot rounds both operands to bf16 (0.4% rel
    error observed on hardware), and Mosaic rejects per-operand dot
    precision. The one-hot operand is already bf16-exact, so split only
    the VALUE operand into three bf16 chunks covering the f32 mantissa —
    each chunk dot is then exact (single nonzero product per output
    element, bf16-representable factors), and the sum reconstructs the
    f32 value. Same 3-pass MXU cost as the HIGHEST emulation, but legal
    under Mosaic and exact where a uniform 3-pass product would also
    split the one-hot for nothing.

    ``passes=1`` skips the mantissa split: exact IF every value survives
    the MXU's bf16 operand rounding (i.e. the f32 values carry only bf16
    mantissas — true when they were produced by a bf16 matmul and
    upcast). The caller asserts that precondition; here a 1-pass dot of
    values with wider mantissas would silently round.
    """
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if passes == 1:
        return d(onehot_f32, values)
    hi = values.astype(jnp.bfloat16).astype(jnp.float32)
    r = values - hi
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r - mid
    return d(onehot_f32, hi) + d(onehot_f32, mid) + d(onehot_f32, lo)


def knn_aggregate_xla(U: Array, idx: Array) -> Tuple[Array, ...]:
    """Reference aggregation: gather U by idx then reduce. Used on CPU, for
    unsupported shapes, and as the test oracle. U: (B, N, C),
    idx: (B, N, k) -> M, m, S1, S2 each (B, N, C)."""
    g = jnp.take_along_axis(U[:, :, None, :],
                            idx[:, :, :, None], axis=1)        # (B, N, k, C)
    return (jnp.max(g, axis=2), jnp.min(g, axis=2),
            jnp.sum(g, axis=2), jnp.sum(g * g, axis=2))


def _gather_rows(u: Array, jstar: Array, tn: int) -> Array:
    """sel[i] = u[jstar[i]] via Mosaic's native dynamic gather
    (tpu.dynamic_gather, a VPU shuffle — no MXU pass, exact f32).

    The lowering requires operand/indices/output shapes to MATCH
    (take_along_axis form), so the (tn, 1) round indices are wrap-padded to
    the full (n, C) and the result row-sliced back — the padding rows cost
    VPU shuffle work only (~n x C elements), orders of magnitude below the
    (tn, n) x (n, C) one-hot MXU dot this replaces."""
    n, C = u.shape
    if tn < n:
        jfull = jnp.concatenate(
            [jstar, jnp.zeros((n - tn, 1), jnp.int32)], axis=0)
    else:
        jfull = jstar
    sel = jnp.take_along_axis(u, jnp.broadcast_to(jfull, (n, C)), axis=0)
    return sel[:tn]


def _fwd_kernel(k, tn, n, value_passes, track_rounds, use_gather, xt_ref,
                xf_ref, u_ref, M_ref, m_ref, s1_ref, s2_ref, idx_ref,
                rM_ref=None, rm_ref=None):
    from jax.experimental import pallas as pl  # noqa: F401

    q = xt_ref[0].astype(jnp.float32)                          # (tn, Cf)
    y = xf_ref[0].astype(jnp.float32)                          # (N, Cf)
    u = u_ref[0].astype(jnp.float32)                           # (N, C)
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    yy = jnp.sum(y * y, axis=-1)
    d = qq - 2.0 * jnp.dot(q, y.T, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST) + yy[None, :]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tn, n), 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (tn, k), 1)
    C = u.shape[-1]

    # PDAE_EDGECONV_ARGMIN=packed (opt-in, approximate): pack the column
    # index into the low ceil(log2 n) mantissa bits of the (positive,
    # bitcast-monotonic) f32 distances, so each round's argmin+tiebreak is
    # ONE min-reduction over int32 keys instead of the fused-argmin's
    # multi-pass index tracking. Quantizes distances at 2^-(23-log2 n)
    # relative (~1.2e-4 at n=1024): near-ties inside that band re-order
    # (still deterministic lowest-col). The selection loop's serial VPU
    # chain dominates the whole DGCNN step
    # (evidence/PROFILE_DGCNN_STAGES_r05b.txt), hence this trade.
    packed = os.environ.get("PDAE_EDGECONV_ARGMIN", "exact") == "packed"
    if packed:
        nbits = max((n - 1).bit_length(), 1)
        lowmask = (1 << nbits) - 1

    def step(r, carry):
        d, M, m, s1, s2, idx, rM, rm = carry
        if packed:
            # d here carries PACKED int32 keys (bitcast outside the loop)
            kmin = jnp.min(d, axis=1, keepdims=True)           # (tn, 1)
            jstar = jnp.bitwise_and(kmin, lowmask)
            onehot = (d == kmin)
        else:
            # first-match argmin (ties -> lowest column, like top_k);
            # native argmin = one fused index-tracking reduction
            jstar = jnp.argmin(d, axis=1, keepdims=True).astype(jnp.int32)
            onehot = (cols == jstar)
        if use_gather:
            # exact f32 row gather on the VPU — the selection value never
            # rides the MXU, so no mantissa-split passes are needed at all
            sel = _gather_rows(u, jstar, tn)                   # (tn, C)
        else:
            sel = _sel_dot(onehot.astype(jnp.float32), u,
                           value_passes)                       # (tn, C)
        if track_rounds:
            # which k-round first attains the running max/min: the whole
            # max/min cotangent routes to that round's neighbor in the
            # 'first' backward (torch max-backward semantics)
            rM = jnp.where(sel > M, r, rM)
            rm = jnp.where(sel < m, r, rm)
        M = jnp.maximum(M, sel)
        m = jnp.minimum(m, sel)
        s1 = s1 + sel
        s2 = s2 + sel * sel
        idx = jnp.where(colk == r, jstar, idx)
        taken = jnp.int32(2 ** 31 - 1) if packed else _INF
        d = jnp.where(onehot, taken, d)
        return d, M, m, s1, s2, idx, rM, rm

    if packed:
        # squared distances can round slightly negative; clamp so the
        # f32 bit pattern stays monotonic, then splice the column index
        # into the low bits (packed keys are unique per row, so the
        # onehot equality above has exactly one hit)
        d = jnp.bitwise_or(
            jnp.bitwise_and(
                jax.lax.bitcast_convert_type(jnp.maximum(d, 0.0),
                                             jnp.int32),
                jnp.int32(~lowmask)),
            cols)
    init = (d, jnp.full((tn, C), -_INF, jnp.float32),
            jnp.full((tn, C), _INF, jnp.float32),
            jnp.zeros((tn, C), jnp.float32), jnp.zeros((tn, C), jnp.float32),
            jnp.zeros((tn, k), jnp.int32),
            jnp.zeros((tn, C), jnp.int32), jnp.zeros((tn, C), jnp.int32))
    _, M, m, s1, s2, idx, rM, rm = jax.lax.fori_loop(0, k, step, init)
    M_ref[0] = M
    m_ref[0] = m
    s1_ref[0] = s1
    s2_ref[0] = s2
    idx_ref[0] = idx
    if track_rounds:
        rM_ref[0] = rM
        rm_ref[0] = rm


def _fwd_idx_kernel(k, kc, tn, n, value_passes, track_rounds, use_gather,
                    u_ref, idx_ref, M_ref, m_ref, s1_ref, s2_ref,
                    rM_ref=None, rm_ref=None):
    """Aggregate-from-idx forward: the kNN indices are given (computed by
    XLA top_k outside the kernel), so the distance matrix, the k-round
    argmin chain, and the per-round d-masking pass all disappear.

    Rounds are batched ``kc`` at a time: the kc one-hot builds are
    INDEPENDENT compare+cast passes (no serial dependency for the
    scheduler to stall on) feeding ONE (kc*tn, N) x (N, C) MXU dot —
    vs the in-kernel-selection forward's ~6 serially-dependent full-width
    VPU passes per round. idx must be distance-ordered (ops.knn
    convention) so the 'first' grad mode's rM/rm round semantics match
    torch."""
    idx = idx_ref[0]                                           # (tn, k)
    u = u_ref[0].astype(jnp.float32)                           # (N, C)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tn, n), 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (tn, k), 1)
    C = u.shape[-1]

    def idx_col(r):
        return jnp.sum(jnp.where(colk == r, idx, 0), axis=1)   # (tn,)

    def chunk(c, carry):
        M, m, s1, s2, rM, rm = carry
        base = c * kc
        if use_gather:
            sels = [_gather_rows(u, idx_col(base + j)[:, None], tn)
                    for j in range(kc)]
        else:
            oh = jnp.concatenate(
                [(cols == idx_col(base + j)[:, None]).astype(jnp.float32)
                 for j in range(kc)], axis=0)                  # (kc*tn, n)
            selc = _sel_dot(oh, u, value_passes)               # (kc*tn, C)
            sels = [selc[j * tn:(j + 1) * tn] for j in range(kc)]
        for j in range(kc):
            sel = sels[j]
            if track_rounds:
                rM = jnp.where(sel > M, base + j, rM)
                rm = jnp.where(sel < m, base + j, rm)
            M = jnp.maximum(M, sel)
            m = jnp.minimum(m, sel)
            s1 = s1 + sel
            s2 = s2 + sel * sel
        return M, m, s1, s2, rM, rm

    assert k % kc == 0, (k, kc)
    init = (jnp.full((tn, C), -_INF, jnp.float32),
            jnp.full((tn, C), _INF, jnp.float32),
            jnp.zeros((tn, C), jnp.float32), jnp.zeros((tn, C), jnp.float32),
            jnp.zeros((tn, C), jnp.int32), jnp.zeros((tn, C), jnp.int32))
    M, m, s1, s2, rM, rm = jax.lax.fori_loop(0, k // kc, chunk, init)
    M_ref[0] = M
    m_ref[0] = m
    s1_ref[0] = s1
    s2_ref[0] = s2
    if track_rounds:
        rM_ref[0] = rM
        rm_ref[0] = rm


def _pick_kc(k: int, kc: int = 0) -> int:
    """Largest chunk size <= 5 dividing k (or the caller's explicit kc)."""
    if kc > 0:
        return kc if k % kc == 0 else 1
    for c in (5, 4, 3, 2):
        if k % c == 0:
            return c
    return 1


def _aggregate_fwd_idx(U, idx, k, tn, interpret, value_passes,
                       track_rounds=False, use_gather=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = U.shape
    tn = min(tn, N)
    assert N % tn == 0, (N, tn)
    kc = _pick_kc(k, int(os.environ.get("PDAE_EDGECONV_KC", "0")))
    kern = functools.partial(_fwd_idx_kernel, k, kc, tn, N, value_passes,
                             track_rounds, use_gather)
    tile_c = pl.BlockSpec((1, tn, C), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    n_out = 6 if track_rounds else 4
    out = pl.pallas_call(
        kern,
        grid=(B, N // tn),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[tile_c] * 4 +
                  [tile_c] * (n_out - 4),
        out_shape=[jax.ShapeDtypeStruct((B, N, C), jnp.float32)] * 4 +
                  [jax.ShapeDtypeStruct((B, N, C), jnp.int32)] * (n_out - 4),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(U, idx)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def aggregate_from_idx(U: Array, idx: Array, k: int, tn: int = 256,
                       interpret: bool = False, value_passes: int = 3,
                       grad_passes: int = 3, grad_mode: str = "first",
                       sel_impl: str = "dot"):
    """Neighbor aggregates of U over GIVEN distance-ordered indices
    (B, N, k) — the hybrid EdgeConv path: XLA computes the kNN (one
    matmul + top_k, fully parallel) and this kernel reduces to
    (M, m, S1, S2) with the same custom VJP as ``knn_aggregate``. idx is
    non-differentiable. See ``knn_aggregate`` for the knob docs."""
    out = _aggregate_fwd_idx(U, idx, k, tn, interpret, value_passes,
                             track_rounds=grad_mode == "first",
                             use_gather=sel_impl == "gather")
    return out[:4]


def _aggregate_from_idx_fwd(U, idx, k, tn, interpret, value_passes,
                            grad_passes, grad_mode, sel_impl):
    out = _aggregate_fwd_idx(U, idx, k, tn, interpret, value_passes,
                             track_rounds=grad_mode == "first",
                             use_gather=sel_impl == "gather")
    if grad_mode == "first":
        M, m, s1, s2, rM, rm = out
        return out[:4], (U, idx, rM, rm)
    M, m, s1, s2 = out
    return out, (U, idx, M, m)


def _aggregate_from_idx_bwd(k, tn, interpret, value_passes, grad_passes,
                            grad_mode, sel_impl, res, g):
    gM, gm, gs1, gs2 = g
    if grad_mode == "first":
        U, idx, rM, rm = res
        du = _aggregate_bwd_first(U, idx, rM, rm, gM, gm, gs1, gs2, k, tn,
                                  interpret, grad_passes)
    else:
        U, idx, M, m = res
        du = _aggregate_bwd(U, idx, M, m, gM, gm, gs1, gs2, k, tn, interpret,
                            value_passes, grad_passes,
                            use_gather=sel_impl == "gather")
    return du.astype(U.dtype), None


aggregate_from_idx.defvjp(_aggregate_from_idx_fwd, _aggregate_from_idx_bwd)


def _bwd_kernel(k, tn, n, value_passes, grad_passes, use_gather, u_ref,
                idx_ref, M_ref, m_ref, gM_ref, gm_ref, gs1_ref, gs2_ref,
                du_ref, sel_scratch):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        du_ref[0] = jnp.zeros_like(du_ref[0])

    u = u_ref[0].astype(jnp.float32)                           # (N, C)
    idx = idx_ref[0]                                           # (tn, k)
    M = M_ref[0]
    m = m_ref[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tn, n), 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (tn, k), 1)
    C = u.shape[-1]

    def idx_col(r):
        # idx[:, r] for a traced r: Mosaic TC has no dynamic_slice on
        # values, so extract the column as a masked reduction instead.
        return jnp.sum(jnp.where(colk == r, idx, 0), axis=1)   # (tn,)

    # pass 1: recompute selected values, count max/min ties. Uses the SAME
    # value_passes as the forward so the recomputed sel is bit-identical to
    # the saved M/m (the tie tests below compare them for equality).
    def count(r, carry):
        cM, cm = carry
        onehot = (cols == idx_col(r)[:, None])
        if use_gather:
            sel = _gather_rows(u, idx_col(r)[:, None], tn)
        else:
            sel = _sel_dot(onehot.astype(jnp.float32), u, value_passes)
        sel_scratch[pl.ds(r, 1)] = sel[None]
        return cM + (sel == M).astype(jnp.float32), \
            cm + (sel == m).astype(jnp.float32)

    cM, cm = jax.lax.fori_loop(
        0, k, count, (jnp.zeros((tn, C), jnp.float32),
                      jnp.zeros((tn, C), jnp.float32)))
    wM = gM_ref[0] / jnp.maximum(cM, 1.0)
    wm = gm_ref[0] / jnp.maximum(cm, 1.0)
    gs1 = gs1_ref[0]
    gs2 = gs2_ref[0]

    # pass 2: per-round cotangent, scattered back as onehot^T matmuls.
    # grad_passes=1 rounds the cotangent operand to bf16 (the one-hot side
    # is exact either way) — see knn_aggregate's docstring for when that is
    # the right trade.
    def scatter(r, du):
        sel = sel_scratch[pl.ds(r, 1)][0]
        w = gs1 + 2.0 * sel * gs2 + (sel == M) * wM + (sel == m) * wm
        onehot = (cols == idx_col(r)[:, None]).astype(jnp.float32)
        # dim-0 contraction: no materialized (N, tn) transpose
        return du + _scatter_dot(onehot, w, grad_passes)       # (N, C)

    du_ref[0] = du_ref[0] + jax.lax.fori_loop(
        0, k, scatter, jnp.zeros((n, C), jnp.float32))


def _aggregate_fwd(U, xf, k, tn, interpret, value_passes,
                   track_rounds=False, use_gather=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = U.shape
    Cf = xf.shape[-1]
    tn = min(tn, N)
    assert N % tn == 0, (N, tn)
    kern = functools.partial(_fwd_kernel, k, tn, N, value_passes,
                             track_rounds, use_gather)
    tile_c = pl.BlockSpec((1, tn, C), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    n_out = 7 if track_rounds else 5
    out = pl.pallas_call(
        kern,
        grid=(B, N // tn),
        in_specs=[
            pl.BlockSpec((1, tn, Cf), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Cf), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[tile_c] * 4 +
                  [pl.BlockSpec((1, tn, k), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)] +
                  [tile_c] * (n_out - 5),
        out_shape=[jax.ShapeDtypeStruct((B, N, C), jnp.float32)] * 4 +
                  [jax.ShapeDtypeStruct((B, N, k), jnp.int32)] +
                  [jax.ShapeDtypeStruct((B, N, C), jnp.int32)] * (n_out - 5),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xf, xf, U)
    return out


def _scatter_dot(oh: Array, w: Array, passes: int = 3) -> Array:
    """oh (R, N) one-hot rows, w (R, C) -> (N, C) == oh^T @ w, contracted
    over dim 0 directly (no materialized transpose — Mosaic lowers the
    explicit .T as a real vector shuffle). Mantissa-split semantics as
    _sel_dot."""
    d = functools.partial(jax.lax.dot_general,
                          dimension_numbers=(((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    if passes == 1:
        return d(oh, w)
    hi = w.astype(jnp.bfloat16).astype(jnp.float32)
    r = w - hi
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r - mid
    return d(oh, hi) + d(oh, mid) + d(oh, lo)


def _bwd_kernel_first(k, kc, tn, n, grad_passes, u_ref, idx_ref, rM_ref,
                      rm_ref, gM_ref, gm_ref, gs1_ref, gs2_ref, du_ref):
    """'first'-tie backward: chunked scatter dots + 2 membership dots (vs
    the split mode's k recompute dots + k scatter dots).

    The sum/sumsq cotangents factor through the 0/1 membership matrix:
        du_j += (member^T @ gs1)_j + 2 U_j (member^T @ gs2)_j
    and the max/min cotangents route ENTIRELY to the round recorded by the
    forward (rM/rm, first tie in distance order — torch max-backward
    semantics), so no per-round value recompute is needed:
        w_r = (rM == r) gM + (rm == r) gm;   du += onehot_r^T @ w_r.
    Rounds batch ``kc`` at a time: independent one-hot builds feed ONE
    (kc*tn, N)^T x (kc*tn, C) scatter dot per chunk (round 5 — the serial
    per-round VPU chain, not the MXU, bounds this kernel)."""
    from jax.experimental import pallas as pl

    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        du_ref[0] = jnp.zeros_like(du_ref[0])

    u = u_ref[0].astype(jnp.float32)                           # (N, C)
    idx = idx_ref[0]                                           # (tn, k)
    rM = rM_ref[0]
    rm = rm_ref[0]
    gM = gM_ref[0]
    gm = gm_ref[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tn, n), 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (tn, k), 1)

    def idx_col(r):
        return jnp.sum(jnp.where(colk == r, idx, 0), axis=1)   # (tn,)

    def chunk(c, carry):
        du, member = carry
        base = c * kc
        ohs = [(cols == idx_col(base + j)[:, None]).astype(jnp.float32)
               for j in range(kc)]
        ws = [jnp.where(rM == base + j, gM, 0.0)
              + jnp.where(rm == base + j, gm, 0.0) for j in range(kc)]
        du = du + _scatter_dot(jnp.concatenate(ohs, axis=0),
                               jnp.concatenate(ws, axis=0), grad_passes)
        for oh in ohs:
            member = member + oh
        return du, member

    assert k % kc == 0, (k, kc)
    C = u.shape[-1]
    du, member = jax.lax.fori_loop(
        0, k // kc, chunk,
        (jnp.zeros((n, C), jnp.float32), jnp.zeros((tn, n), jnp.float32)))
    du = du + _scatter_dot(member, gs1_ref[0], grad_passes)
    du = du + 2.0 * u * _scatter_dot(member, gs2_ref[0], grad_passes)
    du_ref[0] = du_ref[0] + du


def _aggregate_bwd_first(U, idx, rM, rm, gM, gm, gs1, gs2, k, tn, interpret,
                         grad_passes):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = U.shape
    tn = min(tn, N)
    kc = _pick_kc(k, int(os.environ.get("PDAE_EDGECONV_KC", "0")))
    kern = functools.partial(_bwd_kernel_first, k, kc, tn, N, grad_passes)
    tile = lambda b, i: (b, i, 0)
    full = lambda b, i: (b, 0, 0)
    du = pl.pallas_call(
        kern,
        grid=(B, N // tn),
        in_specs=[
            pl.BlockSpec((1, N, C), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, k), tile, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, tn, C), tile,
                          memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, N, C), full, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(U, idx, rM, rm, gM, gm, gs1, gs2)
    return du


def _aggregate_bwd(U, idx, M, m, gM, gm, gs1, gs2, k, tn, interpret,
                   value_passes, grad_passes, use_gather=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = U.shape
    tn = min(tn, N)
    kern = functools.partial(_bwd_kernel, k, tn, N, value_passes,
                             grad_passes, use_gather)
    tile = lambda b, i: (b, i, 0)
    full = lambda b, i: (b, 0, 0)
    du = pl.pallas_call(
        kern,
        grid=(B, N // tn),
        in_specs=[
            pl.BlockSpec((1, N, C), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, k), tile, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, tn, C), tile,
                          memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, N, C), full, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, tn, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(U, idx, M, m, gM, gm, gs1, gs2)
    return du


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def knn_aggregate(U: Array, xf: Array, k: int, tn: int = 256,
                  interpret: bool = False, value_passes: int = 3,
                  grad_passes: int = 3, grad_mode: str = "split",
                  sel_impl: str = "dot"):
    """Fused kNN + neighbor aggregates of U. xf is the (non-differentiable)
    feature basis for the kNN selection; U the values being aggregated.
    Returns (M, m, S1, S2, idx).

    ``value_passes=1`` drops the mantissa split on the selection dots —
    exact ONLY when U's f32 values carry bf16 mantissas (i.e. U was upcast
    from a bf16 matmul output; FusedEdgeConv dispatches this when its
    edge-projection dtype is bfloat16).

    ``grad_passes=1`` drops the mantissa split on the backward SCATTER
    dots (the tie-count recompute already follows ``value_passes``). Unlike
    the forward case this is NOT exact — cotangents are general f32, so the
    scatter's value operand rounds to bf16 per contribution before the f32
    accumulation. It is the right default whenever the aggregate feeds a
    bf16 matmul (FusedEdgeConv: du's next hop is the bf16 edge-projection
    backward, which rounds it to bf16 anyway — a full-mantissa scatter
    spends 3x the step's dominant MXU cost preserving bits the very next op
    discards). The scatter dots are ~60% of the whole DGCNN train step's
    MXU work (DESIGN.md §10c), so this is a first-order lever.

    ``grad_mode``:
    - 'split': max/min cotangents split equally among value ties
      (jnp.max/jnp.min semantics). Backward = k value-recompute dots +
      k scatter dots.
    - 'first': the whole max/min cotangent routes to the FIRST neighbor
      (in distance order) attaining the extremum — torch max-backward
      semantics, i.e. what the reference's ``.max(dim=...)`` trains with.
      The forward additionally records the attaining round (rM/rm), and
      the backward needs only k scatter dots + 2 membership dots
      (_bwd_kernel_first) — ~2x less backward MXU work. The two modes
      produce identical PARAMETER gradients whenever ties come from
      duplicated points (the common case under resampling: equal rows
      contribute the same outer products either way).

    ``sel_impl``:
    - 'dot': selection values gathered via one-hot MXU matmuls (the
      original design; ``value_passes`` controls their rounding).
    - 'gather': selection values gathered via Mosaic's native dynamic
      gather (tpu.dynamic_gather) — EXACT f32 always, no MXU pass. This
      removes the k forward selection dots AND the split-mode backward's
      k recompute dots, the step's dominant MXU cost; ``value_passes``
      becomes irrelevant for those values. Requires a TPU Mosaic backend
      (interpret mode supports it too)."""
    out = _aggregate_fwd(U, xf, k, tn, interpret, value_passes,
                         track_rounds=grad_mode == "first",
                         use_gather=sel_impl == "gather")
    return out[:5]


def _knn_aggregate_fwd(U, xf, k, tn, interpret, value_passes, grad_passes,
                       grad_mode, sel_impl):
    out = _aggregate_fwd(U, xf, k, tn, interpret, value_passes,
                         track_rounds=grad_mode == "first",
                         use_gather=sel_impl == "gather")
    if grad_mode == "first":
        M, m, s1, s2, idx, rM, rm = out
        return out[:5], (U, idx, rM, rm)
    M, m, s1, s2, idx = out
    return out, (U, idx, M, m)


def _knn_aggregate_bwd(k, tn, interpret, value_passes, grad_passes,
                       grad_mode, sel_impl, res, g):
    gM, gm, gs1, gs2, _ = g
    if grad_mode == "first":
        U, idx, rM, rm = res
        du = _aggregate_bwd_first(U, idx, rM, rm, gM, gm, gs1, gs2, k, tn,
                                  interpret, grad_passes)
    else:
        U, idx, M, m = res
        du = _aggregate_bwd(U, idx, M, m, gM, gm, gs1, gs2, k, tn, interpret,
                            value_passes, grad_passes,
                            use_gather=sel_impl == "gather")
    # the kNN selection is non-differentiable (CUDA-knn parity): zero
    # cotangent for xf
    return du.astype(U.dtype), None


knn_aggregate.defvjp(_knn_aggregate_fwd, _knn_aggregate_bwd)


def supported(N: int, k: int, tn: int = 256) -> bool:
    """Shapes the fused kernel handles: full-row tiles + VMEM-resident U.

    ``tn`` defaults to ``knn_aggregate``'s default (ADVICE r04: the two
    contracts drifted 128 vs 256). The effective tile is ``min(tn, N)`` —
    the same clamp every pallas_call site applies — and must stay
    sublane-aligned (multiple of 8) so small clouds (N=100, 250, ...)
    don't reach Mosaic as one unaligned tile."""
    tn_eff = min(tn, N)
    return (N % tn_eff == 0 and tn_eff % 8 == 0
            and 2 <= k <= 64 and N <= 4096)
