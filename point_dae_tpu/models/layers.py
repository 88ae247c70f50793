"""Shared flax.linen building blocks for the model zoo.

Torch-to-TPU layout note: the reference uses channel-first ``Conv1d/Conv2d``
with kernel size 1 everywhere — these are pointwise MLPs. Here everything is
channel-last ``Dense`` over the trailing axis, which is the TPU-friendly
layout (lane dimension = features).
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


class _LNParams(nn.Module):
    """Param-only twin of ``nn.LayerNorm``: identical param path
    (<name>/scale ones, <name>/bias zeros) returned raw for the fused
    LN+MLP+residual kernel dispatch (ops/pallas_mlp.fused_mlp_ln)."""
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.dim,))
        b = self.param("bias", nn.initializers.zeros_init(), (self.dim,))
        return s, b


class _DenseParams(nn.Module):
    """Param-only twin of ``nn.Dense``: identical param path
    (<name>/kernel, <name>/bias), shapes, and initializers — so init draws
    and checkpoints are unchanged — returned raw for code that dispatches
    between a fused kernel and the XLA math."""
    din: int
    dout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.din, self.dout))
        b = self.param("bias", nn.initializers.zeros_init(), (self.dout,))
        return k, b


def _dense_params(mod: nn.Module, name: str, din: int, dout: int):
    del mod  # auto-parented via linen's module context
    return _DenseParams(din, dout, name=name)()


def leaky_relu02(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=0.2)


class PointwiseMLP(nn.Module):
    """Stack of Dense(+BatchNorm)(+activation) applied pointwise.

    Equivalent of the reference's Conv1d/Conv2d(kernel=1) + BatchNorm + act
    sequences. BatchNorm statistics reduce over all leading axes (batch and
    points), matching torch BatchNorm1d/2d over (B, C, N)/(B, C, N, K).
    """
    features: Sequence[int]
    act: Callable = nn.relu
    use_bn: bool = True
    bn_last: bool = True          # apply BN+act after the last layer too?
    act_last: bool = True
    use_bias: Optional[bool] = None  # default: no bias when BN follows

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        n = len(self.features)
        for i, f in enumerate(self.features):
            last = i == n - 1
            with_bn = self.use_bn and (self.bn_last or not last)
            bias = self.use_bias if self.use_bias is not None else not with_bn
            x = nn.Dense(f, use_bias=bias, name=f"dense{i}")(x)
            if with_bn:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5, name=f"bn{i}")(x)
            if self.act_last or not last:
                x = self.act(x)
        return x


class MLP(nn.Module):
    """Plain MLP (Linear + act), no norm — e.g. decoder FC heads."""
    features: Sequence[int]
    act: Callable = nn.relu
    act_last: bool = False
    dtype: Optional[jnp.dtype] = None   # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"dense{i}")(x)
            if i < n - 1 or self.act_last:
                x = self.act(x)
        return x


class SplitDense(nn.Module):
    """``nn.Dense`` over ``concat([shared, per_point], -1)`` (or the
    ``[per_point, shared]`` order with ``shared_last``) factorized by
    linearity: the shared operand has one fewer axis than ``per_point`` and
    its projection is computed once and broadcast-added over the extra axis.

    Folding/PCN decoders broadcast a global or per-token feature over every
    grid point before the first Dense — that half of the matmul is identical
    across the broadcast axis, so factorizing removes up to a
    broadcast-width multiple of the FLOPs. Parameter name/shape/init match
    ``nn.Dense`` on the concat exactly (kernel ``(C+E, F)`` lecun_normal,
    bias zeros): checkpoints are unaffected.
    """
    features: int
    shared_last: bool = False
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, shared: Array, per_point: Array) -> Array:
        C = shared.shape[-1]
        E = per_point.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (C + E, self.features))
        dt = self.dtype or jnp.result_type(shared.dtype, kernel.dtype)
        if self.shared_last:
            ke, ks = kernel[:E], kernel[E:]
        else:
            ks, ke = kernel[:C], kernel[C:]
        sp = shared.astype(dt) @ ks.astype(dt)        # (..., F)
        pp = per_point.astype(dt) @ ke.astype(dt)     # (..., n, F)
        out = pp + sp[..., None, :]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,))
            out = out + bias.astype(dt)
        return out


class SplitMLP(nn.Module):
    """``MLP`` whose first Dense consumes a broadcast-shared operand
    concatenated with per-point channels — the first layer runs as
    ``SplitDense``; the rest are plain ``Dense``. Same param tree
    (``dense{i}``) as ``MLP`` over the explicit concat."""
    features: Sequence[int]
    act: Callable = nn.relu
    shared_last: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, shared: Array, per_point: Array) -> Array:
        x = SplitDense(self.features[0], shared_last=self.shared_last,
                       dtype=self.dtype, name="dense0")(shared, per_point)
        for i, f in enumerate(self.features[1:], start=1):
            x = self.act(x)
            x = nn.Dense(f, dtype=self.dtype, name=f"dense{i}")(x)
        return x


def drop_path(key: jax.Array, x: Array, rate: float, deterministic: bool) -> Array:
    """Stochastic depth per sample (timm DropPath used by ViT blocks)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


def drop_path_from_mask(x: Array, keep_mask: Array, rate: float) -> Array:
    """drop_path with a precomputed per-sample keep mask (B,). Lets a stack
    draw ALL its stochastic-depth masks in one vectorized uniform instead of
    one scalar threefry chain per block — the flagship step carries ~4k
    unfused u32 scalar ops from per-block make_rng otherwise
    (ROUND4_NOTES.md §1)."""
    if rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = keep_mask.reshape((x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep, 0.0)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if deterministic or self.rate == 0.0:
            return x
        key = self.make_rng("droppath")
        return drop_path(key, x, self.rate, deterministic)


class Attention(nn.Module):
    """ViT multi-head self-attention (PointCAE_transformer.py:113-137).

    Supports an optional key-validity mask for the static-shape MAE design:
    masked tokens are excluded as attention *keys* (equivalent to the
    reference running the encoder only on visible tokens).
    """
    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, key_mask: Optional[Array] = None,
                 attn_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        B, N, C = x.shape
        H = self.num_heads
        head = C // H
        qkv = nn.Dense(C * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        scale = head ** -0.5
        from ..ops import pallas_attn

        drop_inert = self.attn_drop == 0.0 or deterministic
        bc = pallas_attn.pick_bc(B, N)
        # OPT-IN (PDAE_FUSED_ATTN=1): the r05 scan-marginal A/B measured
        # XLA's tiny-T attention at 0.234 ms/block fwd+bwd vs the fused
        # kernel's 0.349 (evidence/PROFILE_ATTN_AB_r05.txt) — the r04
        # decompose number that motivated the kernel was dispatch-bound.
        # The kernel stays for shapes/backends where XLA regresses.
        use_fused = (os.environ.get("PDAE_FUSED_ATTN", "0") == "1"
                     and self.dtype == jnp.bfloat16
                     and attn_mask is None and drop_inert
                     and pallas_attn.supported(B, N, H, head, bc)
                     and jax.devices()[0].platform == "tpu")
        if use_fused:
            # block-diagonal whole-sequence tiles on the MXU; the (R, R)
            # score tile never touches HBM in either pass (ops/pallas_attn)
            qkv4 = qkv.reshape(B, N, 3, H, head)
            out = pallas_attn.fused_attention(
                qkv4[:, :, 0], qkv4[:, :, 1], qkv4[:, :, 2],
                key_mask=key_mask, bc=bc)
            out = out.reshape(B, N, C)
            out = out.astype(x.dtype) if self.dtype is None \
                else out.astype(self.dtype)
            out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
            if self.proj_drop > 0 and not deterministic:
                out = nn.Dropout(self.proj_drop)(out, deterministic=False)
            return out
        # Two mathematically identical layouts (same params/outputs; only
        # the HLO differs). "bnhd" skips the (3,B,H,N,d) transpose the
        # torch-shaped path materializes: q/k/v stay in the Dense output's
        # natural (B, N, H, d) layout and the head axis rides as a batch
        # dim of the einsums. A/B knob for the TPU scheduler.
        bnhd = os.environ.get("PDAE_ATTN_LAYOUT", "bhnd") == "bnhd"
        if bnhd:
            qkv = qkv.reshape(B, N, 3, H, head)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B,N,H,d)
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                              preferred_element_type=jnp.float32) * scale
        else:
            qkv3 = qkv.reshape(B, N, 3, H, head).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv3[0], qkv3[1], qkv3[2]             # (B, H, N, head)
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                              preferred_element_type=jnp.float32) * scale
        if key_mask is not None:
            attn = attn + jnp.where(key_mask[:, None, None, :], 0.0, -1e9)
        if attn_mask is not None:
            # pairwise allowed-mask (B, N, N), e.g. Point-M2AE local radius
            attn = attn + jnp.where(attn_mask[:, None, :, :], 0.0, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        if self.attn_drop > 0 and not deterministic:
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=False)
        if bnhd:
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        else:
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = out.astype(x.dtype) if self.dtype is None else out.astype(self.dtype)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        if self.proj_drop > 0 and not deterministic:
            out = nn.Dropout(self.proj_drop)(out, deterministic=False)
        return out


class TransformerBlock(nn.Module):
    """Pre-norm ViT block (PointCAE_transformer.py:140-158)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, key_mask: Optional[Array] = None,
                 attn_mask: Optional[Array] = None,
                 deterministic: bool = True,
                 dp_masks: Optional[Array] = None) -> Array:
        # ``dp_masks`` (2, B) bool: precomputed stochastic-depth keep masks
        # (one vectorized draw for the whole stack — see drop_path_from_mask);
        # None falls back to per-block DropPath draws.
        def dp(h, i):
            if dp_masks is not None and not deterministic:
                return drop_path_from_mask(h, dp_masks[i],
                                           self.drop_path_rate)
            return DropPath(self.drop_path_rate, name=f"dp{i + 1}")(
                h, deterministic)

        # residual stream stays f32; LN outputs cast to compute dtype
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, self.qkv_bias,
                      self.attn_drop, self.drop, dtype=self.dtype,
                      name="attn")(
            h, key_mask=key_mask, attn_mask=attn_mask,
            deterministic=deterministic)
        h = h.astype(x.dtype)
        x = x + dp(h, 0)
        hidden = int(self.dim * self.mlp_ratio)
        # params declared raw (path-identical to the nn.Dense modules they
        # replace — same names/shapes/initializers) so the fused Pallas MLP
        # and the XLA fallback share one checkpoint-compatible tree
        k1, b1 = _dense_params(self, "mlp_fc1", self.dim, hidden)
        k2, b2 = _dense_params(self, "mlp_fc2", hidden, self.dim)
        from ..ops import pallas_mlp

        drop_inert = self.drop == 0.0 or deterministic
        tt = int(os.environ.get("PDAE_MLP_TT", "256"))
        use_fused = (os.environ.get("PDAE_FUSED_MLP", "auto") != "0"
                     and self.dtype == jnp.bfloat16 and drop_inert
                     and pallas_mlp.supported(
                         x.shape[0] * x.shape[1], self.dim, hidden, tt)
                     and jax.devices()[0].platform == "tpu")
        # round 5: fold LN2 + residual (+ the per-sample stochastic-depth
        # scale when it comes from the stack's vectorized dp_masks) into
        # the same kernel — the (R, C) branch tensor and the LN round-trip
        # leave HBM entirely. Requires f32 residual stream (the default)
        # and a vectorized (or inert) droppath draw.
        dp1_inert = deterministic or self.drop_path_rate == 0.0
        use_fused_ln = (use_fused
                        and os.environ.get("PDAE_FUSED_MLP_LN", "auto") != "0"
                        and x.dtype == jnp.float32
                        and (dp1_inert or dp_masks is not None))
        if use_fused_ln:
            gm, bt = _LNParams(self.dim, name="norm2")()
            row_scale = None
            if not dp1_inert:
                keep = 1.0 - self.drop_path_rate
                sc = jnp.where(dp_masks[1], 1.0 / keep, 0.0)       # (B,)
                row_scale = jnp.repeat(sc, x.shape[1])             # (B*T,)
            return pallas_mlp.fused_mlp_ln(x, gm, bt, k1, b1, k2, b2,
                                           row_scale=row_scale, tt=tt)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        if use_fused:
            # hidden stays VMEM-resident fwd+bwd (ops/pallas_mlp.py);
            # f32 output, tighter rounding than the bf16 chain below
            h = pallas_mlp.fused_mlp(h, k1, b1, k2, b2, tt=tt)
        else:
            dt = self.dtype or jnp.promote_types(h.dtype, k1.dtype)
            h = h.astype(dt) @ k1.astype(dt) + b1.astype(dt)
            h = nn.gelu(h, approximate=False)
            if self.drop > 0 and not deterministic:
                h = nn.Dropout(self.drop)(h, deterministic=False)
            h = h.astype(dt) @ k2.astype(dt) + b2.astype(dt)
        h = h.astype(x.dtype)
        if self.drop > 0 and not deterministic:
            h = nn.Dropout(self.drop)(h, deterministic=False)
        x = x + dp(h, 1)
        return x


def _stack_dp_masks(mod: nn.Module, dpr, batch: int, deterministic: bool):
    """All of a stack's stochastic-depth keep masks from ONE vectorized
    uniform draw: (depth, 2, B) bool, or None when droppath is inert.
    Replaces per-block make_rng('droppath') chains (each a ~100-op scalar
    threefry expansion in HLO — the flagship step carried ~4k such scalar
    ops, tools note in ROUND4_NOTES.md). Same distribution: independent
    Bernoulli(1 - rate_i) per block/branch/sample; the draw STREAM differs
    from the per-block path, which was never torch-matched anyway."""
    if deterministic or max(dpr) == 0.0 or not mod.has_rng("droppath"):
        return None
    u = jax.random.uniform(mod.make_rng("droppath"),
                           (len(dpr), 2, batch))
    rates = jnp.asarray(dpr, jnp.float32)[:, None, None]
    return u >= rates                      # keep with prob 1 - rate


class TransformerEncoder(nn.Module):
    """Stack with positional embedding re-added at every block
    (TransformerEncoder, PointCAE_transformer.py:161-177)."""
    embed_dim: int
    depth: int
    num_heads: int
    drop_path_rate: float = 0.0
    one_pe: bool = False  # TransformerEncoderOnePE variant (:180-197)
    dtype: Optional[jnp.dtype] = None
    # rematerialize each block in the backward pass: only the (B, T, C)
    # block inputs are saved instead of every attention/MLP intermediate —
    # trades cheap recompute FLOPs for HBM traffic (the flagship step is
    # memory-bound, DESIGN.md §11)
    remat: bool = False
    # run the residual stream itself at this dtype (bf16 halves the
    # (B, T, C) activation traffic of every block boundary in a
    # memory-bound step). The stream dtype is inherited from the entry
    # cast: blocks preserve x.dtype (TransformerBlock casts branch
    # outputs back to it), and the f32 LayerNorm that every consumer
    # applies after the stack restores f32 outputs.
    residual_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, pos: Array, key_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        if self.residual_dtype is not None:
            x = x.astype(self.residual_dtype)
            pos = pos.astype(self.residual_dtype)
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        dp_masks = _stack_dp_masks(self, dpr, x.shape[0], deterministic)
        block_cls = nn.remat(TransformerBlock, static_argnums=(4,)) \
            if self.remat else TransformerBlock
        if self.one_pe:
            x = x + pos
        for i in range(self.depth):
            if not self.one_pe:
                x = x + pos
            x = block_cls(self.embed_dim, self.num_heads,
                          drop_path_rate=dpr[i], dtype=self.dtype,
                          name=f"block{i}")(
                x, key_mask, None, deterministic,
                None if dp_masks is None else dp_masks[i])
        return x


class TransformerDecoder(nn.Module):
    """Decoder stack + final LayerNorm (TransformerDecoder,
    PointCAE_transformer.py:200-232). Pos re-added each block; the
    ``return_token_num`` slicing of the reference is replaced by the caller
    selecting tokens via masks (static shapes)."""
    embed_dim: int
    depth: int
    num_heads: int
    drop_path_rate: float = 0.0
    one_pe: bool = False
    dtype: Optional[jnp.dtype] = None
    residual_dtype: Optional[jnp.dtype] = None  # see TransformerEncoder

    @nn.compact
    def __call__(self, x: Array, pos: Array, key_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        if self.residual_dtype is not None:
            x = x.astype(self.residual_dtype)
            pos = pos.astype(self.residual_dtype)
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        dp_masks = _stack_dp_masks(self, dpr, x.shape[0], deterministic)
        if self.one_pe:
            x = x + pos
        for i in range(self.depth):
            if not self.one_pe:
                x = x + pos
            x = TransformerBlock(self.embed_dim, self.num_heads,
                                 drop_path_rate=dpr[i], dtype=self.dtype,
                                 name=f"block{i}")(
                x, key_mask=key_mask, deterministic=deterministic,
                dp_masks=None if dp_masks is None else dp_masks[i])
        x = nn.LayerNorm(name="norm")(x)
        return x


class PosEmbedMLP(nn.Module):
    """3 -> 128 -> dim GELU MLP positional embedding
    (PointCAE_transformer.py:329-333)."""
    dim: int

    @nn.compact
    def __call__(self, xyz: Array) -> Array:
        h = nn.Dense(128, name="fc1")(xyz)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, name="fc2")(h)


class PatchEncoder(nn.Module):
    """Mini-PointNet patch embedding (Encoder, PointCAE_transformer.py:20-51).

    (B, G, S, C_in) -> (B, G, encoder_channel). Max-pools are mask-aware so
    padded/dropped in-patch points are ignored when ``point_mask`` is given.
    """
    encoder_channel: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, groups: Array, point_mask: Optional[Array] = None,
                 train: bool = True) -> Array:
        B, G, S, C = groups.shape
        x = groups.reshape(B * G, S, C)
        if point_mask is not None:
            pm = point_mask.reshape(B * G, S, 1)
        else:
            pm = None

        def masked_max(feat, keepdims):
            if pm is None:
                return jnp.max(feat, axis=1, keepdims=keepdims)
            neg = jnp.where(pm, feat, -1e9)
            return jnp.max(neg, axis=1, keepdims=keepdims)

        # BN carries the compute dtype: under the bf16 policy the (BG, S, C)
        # activations — the step's top HBM writers (tools/hbm_by_component)
        # — stay bf16 across the BN boundary; flax still computes the
        # mean/var reductions in f32 internally, so the statistics (and the
        # running averages) keep full precision either way
        h = nn.Dense(128, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Dense(256, dtype=self.dtype, name="conv2")(h)
        g = masked_max(h, keepdims=True)                       # (BG, 1, 256)
        # conv3 consumes concat([global, per-point]) — the global half is
        # identical across the S in-patch points, so SplitDense factorizes
        # it by linearity: the (BG, S, 512) concat (the step's largest
        # activation, ~0.5 GB bf16 at flagship shapes) never materializes
        # and the global half's matmul runs once per PATCH instead of once
        # per point (~48% of conv3 FLOPs). Param path/shape/init identical
        # to nn.Dense on the concat (kernel (512, 512)).
        # PDAE_SPLIT_PE=0 restores the concat path for A/B.
        if os.environ.get("PDAE_SPLIT_PE", "1") != "0":
            h = SplitDense(512, dtype=self.dtype, name="conv3")(g[:, 0], h)
        else:
            h = jnp.concatenate([jnp.broadcast_to(g, h.shape), h], axis=-1)
            h = nn.Dense(512, dtype=self.dtype, name="conv3")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Dense(self.encoder_channel, dtype=self.dtype, name="conv4")(h)
        out = masked_max(h, keepdims=False)                    # (BG, C)
        return out.reshape(B, G, self.encoder_channel).astype(jnp.float32)
