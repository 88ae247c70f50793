"""PointNet++ set-abstraction / feature-propagation modules + DAE models.

Reference: pointnet2_ops ``PointnetSAModule``/``PointnetFPModule``
(extensions/pointnet2/pointnet2_modules.py:23-700) and the PointNet++ DAE
stack (models/PointCAE_pointnetv2.py, encoder spec at
models/pointnetv2_util.py:319-345: SA(512, r0.2, k32, [64,64,128]) ->
SA(128, r0.4, k64, [128,128,256]) -> SA(all, [256,512,1024])).

All grouping runs on the fixed-shape ball-query/FPS primitives from ``ops``;
the shared MLP + max-pool is a Dense stack over (B, M, K, C) with the pool on
the K axis.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..losses import build_loss_func
from ..ops import (ball_query, furthest_point_sample, gather_points,
                   group_points, three_interpolate, three_nn)
from ..utils.registry import MODELS
from .common import apply_input_dropout, folding_grid
from .layers import MLP, SplitMLP

Array = jax.Array


class SetAbstraction(nn.Module):
    """One SA level: FPS -> ball query -> group (+relative xyz) -> shared MLP
    -> max-pool (pointnet2_modules.PointnetSAModule). ``npoint=None`` means
    group-all (the final global level)."""
    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz: Array, features: Optional[Array],
                 train: bool = True) -> Tuple[Array, Array]:
        if self.npoint is None:
            # group all: one group containing every point
            grouped_xyz = xyz[:, None, :, :]                     # (B, 1, N, 3)
            grouped = grouped_xyz
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped_xyz, features[:, None, :, :]], -1) \
                    if self.use_xyz else features[:, None, :, :]
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
        else:
            idx = furthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, idx)                    # (B, M, 3)
            nidx = ball_query(self.radius, self.nsample, xyz, new_xyz)
            grouped_xyz = group_points(xyz, nidx) - new_xyz[:, :, None, :]
            if features is not None:
                grouped_feat = group_points(features, nidx)
                grouped = jnp.concatenate([grouped_xyz, grouped_feat], -1) \
                    if self.use_xyz else grouped_feat
            else:
                grouped = grouped_xyz

        h = grouped
        for i, d in enumerate(self.mlp):
            h = nn.Dense(d, use_bias=False, name=f"mlp{i}_fc")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"mlp{i}_bn")(h)
            h = nn.relu(h)
        new_feat = jnp.max(h, axis=2)                            # (B, M, C)
        return new_xyz, new_feat


class FeaturePropagation(nn.Module):
    """FP level: 3-NN inverse-distance interpolation + skip concat + MLP
    (pointnet2_modules.PointnetFPModule / interpolate_gpu.cu)."""
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz1: Array, xyz2: Array, feat1: Optional[Array],
                 feat2: Array, train: bool = True) -> Array:
        if xyz2.shape[1] == 1:
            interp = jnp.broadcast_to(feat2, (feat2.shape[0], xyz1.shape[1],
                                              feat2.shape[-1]))
        else:
            dist, idx = three_nn(xyz1, xyz2)
            interp = three_interpolate(feat2, idx, dist)
        h = jnp.concatenate([feat1, interp], -1) if feat1 is not None else interp
        for i, d in enumerate(self.mlp):
            h = nn.Dense(d, use_bias=False, name=f"mlp{i}_fc")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"mlp{i}_bn")(h)
            h = nn.relu(h)
        return h


class PointNet2Encoder(nn.Module):
    """3-level SA global encoder (pointnetv2_util.py:319-345)."""

    @nn.compact
    def __call__(self, xyz: Array, train: bool = True) -> Array:
        xyz = xyz[..., :3]
        l1_xyz, l1 = SetAbstraction(512, 0.2, 32, (64, 64, 128), name="sa1")(
            xyz, None, train)
        l2_xyz, l2 = SetAbstraction(128, 0.4, 64, (128, 128, 256), name="sa2")(
            l1_xyz, l1, train)
        _, l3 = SetAbstraction(None, None, None, (256, 512, 1024), name="sa3")(
            l2_xyz, l2, train)
        return l3[:, 0]                                          # (B, 1024)


class _PN2Base(nn.Module):
    config: dict

    @property
    def corrupt_type(self):
        return tuple(self.config.get("corrupt_type", ()))

    @property
    def loss_func(self):
        return build_loss_func(self.config.get("loss", "cdl2"))

    def _encode_corrupted(self, corrupted, train):
        corrupted = corrupted[..., :3]
        if train and self.corrupt_type:
            corrupted = apply_input_dropout(self.make_rng("corrupt"),
                                            corrupted, self.corrupt_type)
        return self.encoder(corrupted, train=train)

    def encode(self, pts, train: bool = False):
        return self.encoder(pts[..., :3], train=train)


@MODELS.register_module()
class Point_CAE_PointNetv2(_PN2Base):
    """PointNet++ DAE with PCN decoder (PointCAE_pointnetv2.py:53-173):
    FC coarse 1024 pts + grid folding to 16384 fine pts."""
    num_coarse: int = 1024
    grid_size: int = 4
    grid_scale: float = 0.05

    def setup(self):
        self.encoder = PointNet2Encoder(name="pointnetv2_encoder")
        self.folding1 = MLP((1024, 1024, self.num_coarse * 3), name="folding1")
        # first Dense over concat([grid, point, global]): global feature
        # broadcast over all fine points -> factorized (exact)
        self.folding2 = SplitMLP((512, 512, 3), shared_last=True,
                                 name="folding2")

    def __call__(self, corrupted, clean, train: bool = True):
        clean = clean[..., :3]
        feat = self._encode_corrupted(corrupted, train)
        B = feat.shape[0]
        coarse = self.folding1(feat).reshape(B, self.num_coarse, 3)
        g2 = self.grid_size ** 2
        grid = jnp.asarray(folding_grid((self.grid_size, self.grid_size),
                                        (-self.grid_scale, self.grid_scale)))
        grid_feat = jnp.tile(grid[None], (B, self.num_coarse, 1))
        point_feat = jnp.repeat(coarse, g2, axis=1)
        fine = self.folding2(feat, jnp.concatenate(
            [grid_feat, point_feat], -1)) + point_feat
        return self.loss_func(coarse, clean), self.loss_func(fine, clean)


@MODELS.register_module()
class Point_CAE_PointNetv2_FCOnly(_PN2Base):
    """FC-decoder-only PointNet++ DAE (used for SVM-validated pretrains;
    mirrors Point_CAE_DGCNN_FCOnly's structure with the PN++ encoder)."""
    num_coarse: int = 1024

    def setup(self):
        self.encoder = PointNet2Encoder(name="pointnetv2_encoder")
        self.recfc = MLP((1024, 1024, self.num_coarse * 3), name="recfc")

    def __call__(self, corrupted, clean, train: bool = True):
        feat = self._encode_corrupted(corrupted, train)
        coarse = self.recfc(feat).reshape(-1, self.num_coarse, 3)
        return self.loss_func(coarse, clean[..., :3]), jnp.zeros(())


class _PN2ClsHead(nn.Module):
    """512 -> 256 -> cls head with BN + dropout (PointCAE_pointnetv2.py:749+)."""
    cls_dim: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        # biased Dense like the reference nn.Linear (PointCAE_pointnetv2.py
        # :757-767) so converted checkpoints land bit-for-bit
        x = nn.Dense(512, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, name="dp1")(x, deterministic=not train)
        x = nn.Dense(256, name="fc2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, name="dp2")(x, deterministic=not train)
        return nn.Dense(self.cls_dim, name="cls")(x)


@MODELS.register_module()
class PointNetv2(nn.Module):
    """Classification fine-tune model (PointCAE_pointnetv2.py:749-860)."""
    config: dict

    @nn.compact
    def __call__(self, pts, train: bool = True):
        feat = PointNet2Encoder(name="pointnetv2_encoder")(pts[..., :3], train)
        return _PN2ClsHead(self.config.get("cls_dim", 40), name="cls_head")(
            feat, train)


@MODELS.register_module()
class PointNetv2_Linear(nn.Module):
    """Linear probe (PointCAE_pointnetv2.py:863-940)."""
    config: dict

    @nn.compact
    def __call__(self, pts, train: bool = True):
        feat = PointNet2Encoder(name="pointnetv2_encoder")(pts[..., :3], train)
        return nn.Dense(self.config.get("cls_dim", 40), name="cls")(feat)


@MODELS.register_module()
class PointNetv2_feat(nn.Module):
    """SVM feature extractor (PointCAE_pointnetv2.py:943-1017)."""
    config: dict

    @nn.compact
    def __call__(self, pts, train: bool = False):
        return PointNet2Encoder(name="pointnetv2_encoder")(pts[..., :3], train)


@MODELS.register_module()
class Point_CAE_PointNetv2_Proj(_PN2Base):
    """PCN decoder with a 1024->512->1024 projection head between encoder and
    decoder (PointCAE_pointnetv2.py:632-746)."""
    num_coarse: int = 1024
    grid_size: int = 4
    grid_scale: float = 0.05

    def setup(self):
        self.encoder = PointNet2Encoder(name="pointnetv2_encoder")
        self.proj = MLP((512, 1024), name="proj")
        self.folding1 = MLP((1024, 1024, self.num_coarse * 3), name="folding1")
        self.folding2 = SplitMLP((512, 512, 3), shared_last=True,
                                 name="folding2")

    def __call__(self, corrupted, clean, train: bool = True):
        from .common import folding_grid

        clean = clean[..., :3]
        feat = self.proj(self._encode_corrupted(corrupted, train))
        B = feat.shape[0]
        coarse = self.folding1(feat).reshape(B, self.num_coarse, 3)
        g2 = self.grid_size ** 2
        grid = jnp.asarray(folding_grid((self.grid_size, self.grid_size),
                                        (-self.grid_scale, self.grid_scale)))
        grid_feat = jnp.tile(grid[None], (B, self.num_coarse, 1))
        point_feat = jnp.repeat(coarse, g2, axis=1)
        fine = self.folding2(feat, jnp.concatenate(
            [grid_feat, point_feat], -1)) + point_feat
        return self.loss_func(coarse, clean), self.loss_func(fine, clean)


class _MA2EPN2Base(_PN2Base):
    """Patch-wise MA2E over the PointNet++ global encoder
    (PointCAE_pointnetv2.py:176-627): group the CLEAN cloud into 64x32
    patches; global FC head reconstructs the 64 centers; local head folds a
    6x6 grid (+/-0.3) per patch from (global feature + center pos-embed)."""
    num_coarse: int = 64
    group_size: int = 32
    grid_n: int = 6

    def setup(self):
        self.encoder = PointNet2Encoder(name="pointnetv2_encoder")
        self.pos_embed = MLP((128, 1024), act=nn.gelu, name="pos_embed")
        self.coarse_pred = MLP((1024, 1024, self.num_coarse * 3),
                               name="coarse_pred")
        # per-patch token is shared across the 6x6 grid -> first Dense of
        # each folding stage factorized (exact)
        self.folding1 = SplitMLP((512, 512, 3), name="folding1")
        self.folding2 = SplitMLP((512, 512, 3), name="folding2")

    def _heads(self, corrupted, clean, train):
        from ..ops import group_neighborhood
        from .common import folding_grid

        pts = clean[..., :3]
        neigh, center = group_neighborhood(pts, self.num_coarse,
                                           self.group_size)
        feat = self._encode_corrupted(corrupted, train)      # (B, 1024)
        B = feat.shape[0]
        coarse = self.coarse_pred(feat).reshape(B, self.num_coarse, 3)
        loss_coarse = self.loss_func(coarse, center)

        g2 = self.grid_n ** 2
        tok = feat[:, None, :] + self.pos_embed(center)      # (B, M, 1024)
        grid = jnp.asarray(folding_grid((self.grid_n, self.grid_n),
                                        (-0.3, 0.3)))        # (36, 2)
        gridb = jnp.broadcast_to(grid[None, None],
                                 (B, self.num_coarse, g2, 2))
        f1 = self.folding1(tok, gridb)
        f2 = self.folding2(tok, f1)
        rebuild = f2.reshape(B * self.num_coarse, g2, 3)
        gt = neigh.reshape(B * self.num_coarse, self.group_size, 3)
        loss_fine = self.loss_func(rebuild, gt)
        return loss_fine, loss_coarse


@MODELS.register_module()
class Point_MA2E_PointNetv2(_MA2EPN2Base):
    """Returns (loss_fine, loss_coarse) (PointCAE_pointnetv2.py:176-331)."""

    def __call__(self, corrupted, clean, train: bool = True):
        return self._heads(corrupted, clean, train)


@MODELS.register_module()
class Point_MA2E_PointNetv2_local_only(_MA2EPN2Base):
    """Only the patch folding loss (PointCAE_pointnetv2.py:332-486)."""

    def __call__(self, corrupted, clean, train: bool = True):
        loss_fine, _ = self._heads(corrupted, clean, train)
        return loss_fine, jnp.zeros(())


@MODELS.register_module()
class Point_MA2E_PointNetv2_global_only(_MA2EPN2Base):
    """Only the center reconstruction loss (PointCAE_pointnetv2.py:488-630)."""

    def __call__(self, corrupted, clean, train: bool = True):
        _, loss_coarse = self._heads(corrupted, clean, train)
        return loss_coarse, jnp.zeros(())
