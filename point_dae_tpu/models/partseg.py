"""Part segmentation model (reference: segmentation/models/pt.py:178-341).

Point-MAE transformer backbone with features fetched at blocks {3, 7, 11},
max+avg pooled globals + one-hot category embedding, 3-NN feature propagation
from patch centers back to all points (propagation_0, in=1152+3 -> [1536,
1024]), then the conv seg head 3392 -> 512 -> 256 -> parts with log-softmax.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import group_neighborhood, three_interpolate, three_nn
from ..utils.registry import MODELS
from .layers import (PatchEncoder, PosEmbedMLP, SplitDense, TransformerBlock,
                     leaky_relu02)

Array = jax.Array


class _SegBackbone(nn.Module):
    """12-block ViT returning features at fetch_idx (pt.py:160-175)."""
    trans_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    drop_path_rate: float = 0.1
    fetch_idx: Tuple[int, ...] = (3, 7, 11)

    @nn.compact
    def __call__(self, x: Array, pos: Array, deterministic: bool = True):
        feats = []
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = TransformerBlock(self.trans_dim, self.num_heads,
                                 drop_path_rate=dpr, name=f"block{i}")(
                x + pos, deterministic=deterministic)
            if i in self.fetch_idx:
                feats.append(x)
        return feats


@MODELS.register_module()
class PointTransformerPartSeg(nn.Module):
    """get_model (pt.py:178-333). Input: pts (B, N, 3), cls_label one-hot
    (B, 16). Output: per-point log-probs (B, N, parts)."""
    config: dict

    @nn.compact
    def __call__(self, pts: Array, cls_label: Array, train: bool = True):
        c = self.config
        trans_dim = c.get("trans_dim", 384)
        G = c.get("num_group", 128)
        S = c.get("group_size", 32)
        parts = c.get("cls_dim", 50)
        B, N, _ = pts.shape

        neigh, center = group_neighborhood(pts[..., :3], G, S)
        tokens = PatchEncoder(c.get("encoder_dims", 384), name="encoder")(
            neigh, train=train)
        pos = PosEmbedMLP(trans_dim, name="pos_embed")(center)
        feats = _SegBackbone(trans_dim, c.get("depth", 12),
                             c.get("num_heads", 6),
                             c.get("drop_path_rate", 0.1), name="blocks")(
            tokens, pos, deterministic=not train)
        norm = nn.LayerNorm(name="norm")
        feats = [norm(f) for f in feats]
        x = jnp.concatenate(feats, axis=-1)                  # (B, G, 1152)

        x_max = jnp.max(x, axis=1)                           # (B, 1152)
        x_avg = jnp.mean(x, axis=1)
        cls_feat = nn.Dense(64, use_bias=False, name="label_conv")(cls_label)
        cls_feat = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name="label_bn")(cls_feat)
        cls_feat = leaky_relu02(cls_feat)
        global_feat = jnp.concatenate([x_max, x_avg, cls_feat], -1)  # (B, 2368)

        # propagation_0: interpolate token features from centers to points,
        # skip-connect the raw xyz (in_channel = 1152 + 3)
        dist, idx = three_nn(pts[..., :3], center)
        interp = three_interpolate(x, idx, dist)             # (B, N, 1152)
        h = jnp.concatenate([pts[..., :3], interp], -1)
        for i, d in enumerate((trans_dim * 4, 1024)):
            h = nn.Dense(d, use_bias=False, name=f"prop_fc{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"prop_bn{i}")(h)
            h = nn.relu(h)

        # convs1 over concat([h, global_feat broadcast over N]) — the shared
        # global half (70% of the matmul) factorized out of the point axis
        h = SplitDense(512, shared_last=True, name="convs1")(global_feat, h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bns1")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.5, name="dp1")(h, deterministic=not train)
        h = nn.Dense(256, name="convs2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bns2")(h)
        h = nn.relu(h)
        h = nn.Dense(parts, name="convs3")(h)
        return jax.nn.log_softmax(h, axis=-1)


def seg_nll_loss(logp: Array, target: Array) -> Array:
    """get_loss (pt.py:335-341): NLL over per-point log-probs."""
    return -jnp.mean(jnp.take_along_axis(logp, target[..., None], axis=-1))


@MODELS.register_module()
class DGCNNPartSeg(nn.Module):
    """DGCNN part-segmentation model (segmentation/models/dgcnn_partseg.py):
    seg-style EdgeConv encoder, global max + one-hot category embedding
    broadcast to all points, conv head to part logits."""
    config: dict

    @nn.compact
    def __call__(self, pts: Array, cls_label: Array, train: bool = True):
        from .dgcnn import DGCNNPartSegEncoder

        parts = self.config.get("cls_dim", 50)
        B, N, _ = pts.shape
        gfeat, pointwise = DGCNNPartSegEncoder(name="dgcnn_encoder")(
            pts[..., :3], train=train)
        lab = nn.Dense(64, use_bias=False, name="label_conv")(cls_label)
        lab = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="label_bn")(lab)
        lab = leaky_relu02(lab)
        glob = jnp.concatenate([gfeat, lab], -1)
        # convs0 over concat([pointwise, glob broadcast over N]) — shared
        # half factorized out of the point axis (exact)
        h = SplitDense(512, shared_last=True, use_bias=False,
                       name="convs0")(glob, pointwise)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bns0")(h)
        h = leaky_relu02(h)
        h = nn.Dropout(0.5, name="dp0")(h, deterministic=not train)
        h = nn.Dense(256, use_bias=False, name="convs1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bns1")(h)
        h = leaky_relu02(h)
        h = nn.Dropout(0.5, name="dp1")(h, deterministic=not train)
        h = nn.Dense(parts, name="head")(h)
        return jax.nn.log_softmax(h, axis=-1)


@MODELS.register_module()
class PointNetNoTPartSeg(nn.Module):
    """PointNet(NoT) part segmentation
    (segmentation/models/pointnetnot_partseg.py / PointCAE_pointnet_NoT_partseg.py):
    pointwise MLP features + global max + category one-hot, conv seg head."""
    config: dict

    @nn.compact
    def __call__(self, pts: Array, cls_label: Array, train: bool = True):
        parts = self.config.get("cls_dim", 50)
        B, N, _ = pts.shape
        h = pts[..., :3]
        feats = []
        for i, d in enumerate((64, 128, 128, 512, 2048)):
            h = nn.Dense(d, name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(h)
            h = nn.relu(h)
            feats.append(h)
        gfeat = jnp.max(h, axis=1)                          # (B, 2048)
        lab = nn.Dense(64, name="label_fc")(cls_label)
        glob = jnp.concatenate([gfeat, lab], -1)
        # seg0 over concat([pointwise feats, glob broadcast]) — shared half
        # factorized out of the point axis (exact)
        h = SplitDense(256, shared_last=True, name="seg0")(
            glob, jnp.concatenate(feats[:4], -1))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="segbn0")(h)
        h = nn.relu(h)
        for i, d in ((1, 256), (2, 128)):
            h = nn.Dense(d, name=f"seg{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"segbn{i}")(h)
            h = nn.relu(h)
        h = nn.Dense(parts, name="head")(h)
        return jax.nn.log_softmax(h, axis=-1)
