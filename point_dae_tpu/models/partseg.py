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
    """DGCNN part-segmentation model (segmentation/models/dgcnn_partseg.py
    over the segmentation-local encoder that returns the stage skips,
    segmentation/models/dgcnn_util.py:168-193): per-point input =
    [global(1024) + label-conv(64) broadcast, x1, x2, x3] (1280-d), head
    conv8(256) dp conv9(256) dp conv10(128) conv11(parts), all bias-free
    convs + BN + LeakyReLU(0.2). Param names mirror the torch keys
    (conv7..conv11 / bn7..bn10)."""
    config: dict

    @nn.compact
    def __call__(self, pts: Array, cls_label: Array, train: bool = True):
        from .dgcnn import DGCNNPartSegEncoder

        parts = self.config.get("cls_dim", 50)
        B, N, _ = pts.shape
        gfeat, _, (x1, x2, x3) = DGCNNPartSegEncoder(name="dgcnn_encoder")(
            pts[..., :3], train=train, return_stages=True)
        # conv7: label one-hot -> 64 (dgcnn_partseg.py:47-49)
        lab = nn.Dense(64, use_bias=False, name="conv7")(cls_label)
        lab = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="bn7")(lab)
        lab = leaky_relu02(lab)
        glob = jnp.concatenate([gfeat, lab], -1)            # (B, 1088)
        stages = jnp.concatenate([x1, x2, x3], -1)          # (B, N, 192)
        # conv8 over concat([glob broadcast over N, x1, x2, x3]) — shared
        # half factorized out of the point axis (exact)
        h = SplitDense(256, use_bias=False, name="conv8")(glob, stages)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn8")(h)
        h = leaky_relu02(h)
        h = nn.Dropout(0.5, name="dp1")(h, deterministic=not train)
        h = nn.Dense(256, use_bias=False, name="conv9")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn9")(h)
        h = leaky_relu02(h)
        h = nn.Dropout(0.5, name="dp2")(h, deterministic=not train)
        h = nn.Dense(128, use_bias=False, name="conv10")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn10")(h)
        h = leaky_relu02(h)
        h = nn.Dense(parts, use_bias=False, name="conv11")(h)
        return jax.nn.log_softmax(h, axis=-1)


@MODELS.register_module()
class PointNetNoTPartSeg(nn.Module):
    """PointNet(NoT) part segmentation
    (segmentation/models/pointnetnot_partseg.py:10-90 +
    pointnet_not_util.py:148-209): five pointwise conv+BN stages whose
    PRE-ReLU bn outputs out1..out5 are the skips, global max over the
    pre-ReLU out5, RAW 16-d category one-hot concatenated (no label
    embedding), per-point input [expand(2064), out1..out5] = 4944-d, head
    convs1(256) convs2(256) convs3(128) convs4(parts) with biases and no
    dropout. Param names mirror the torch keys."""
    config: dict

    @nn.compact
    def __call__(self, pts: Array, cls_label: Array, train: bool = True):
        parts = self.config.get("cls_dim", 50)
        B, N, _ = pts.shape
        h = pts[..., :3]
        feats = []
        for i, d in enumerate((64, 128, 128, 512, 2048)):
            h = nn.Dense(d, name=f"conv{i + 1}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i + 1}")(h)
            feats.append(h)                 # pre-ReLU bn outputs (outN)
            h = nn.relu(h)
        gfeat = jnp.max(feats[-1], axis=1)                  # (B, 2048)
        glob = jnp.concatenate([gfeat, cls_label], -1)      # (B, 2064)
        # convs1 over concat([expand broadcast, out1..out5]) — shared half
        # factorized out of the point axis (exact)
        h = SplitDense(256, name="convs1")(
            glob, jnp.concatenate(feats, -1))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bns1")(h)
        h = nn.relu(h)
        for i, d in ((2, 256), (3, 128)):
            h = nn.Dense(d, name=f"convs{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bns{i}")(h)
            h = nn.relu(h)
        h = nn.Dense(parts, name="convs4")(h)
        return jax.nn.log_softmax(h, axis=-1)
