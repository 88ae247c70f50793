"""PointNet-backbone (with and without T-Net) DAE models + heads.

Reference: models/pointnet_util.py:18-153 (STN3d/STNkd/PointNetEncoder),
models/pointnet_not_util.py:94-213 (NoT variants),
models/PointCAE_pointnet.py:27-331 and models/PointCAE_pointnet_NoT.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..losses import build_loss_func
from ..utils.registry import MODELS
from .common import apply_input_dropout
from .layers import MLP

Array = jax.Array

_mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


class STN(nn.Module):
    """Spatial transformer predicting a k x k alignment matrix
    (STN3d/STNkd, pointnet_util.py:18-108). Output = predicted + I."""
    k: int = 3

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        def block(h, dim, name):
            h = nn.Dense(dim, name=f"{name}_fc")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"{name}_bn")(h)
            return nn.relu(h)

        h = block(x, 64, "c1")
        h = block(h, 128, "c2")
        h = block(h, 1024, "c3")
        h = jnp.max(h, axis=1)                      # (B, 1024)
        h = block(h, 512, "f1")
        h = block(h, 256, "f2")
        h = nn.Dense(self.k * self.k, name="f3")(h)
        return h.reshape(-1, self.k, self.k) + jnp.eye(self.k)


class PointNetEncoder(nn.Module):
    """PointNet global encoder (pointnet_util.py:94-153). ``use_tnet=False``
    gives the NoT variant (pointnet_not_util.py:94-213)."""
    use_tnet: bool = True
    feature_transform: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        # x: (B, N, C); only xyz goes through the input transform
        if self.use_tnet:
            trans = STN(3, name="stn")(x, train)
            xyz = _mm(x[..., :3], trans)
            x = jnp.concatenate([xyz, x[..., 3:]], -1) if x.shape[-1] > 3 else xyz

        def block(h, dim, name, act=True):
            h = nn.Dense(dim, name=f"{name}_fc")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"{name}_bn")(h)
            return nn.relu(h) if act else h

        h = block(x, 64, "c1")
        if self.use_tnet and self.feature_transform:
            ftrans = STN(64, name="fstn")(h, train)
            h = _mm(h, ftrans)
        h = block(h, 128, "c2")
        h = block(h, 1024, "c3", act=False)
        return jnp.max(h, axis=1)                   # (B, 1024)


class _PointNetDAEBase(nn.Module):
    config: dict
    use_tnet: bool = True

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
class Point_CAE_PointNet(_PointNetDAEBase):
    """PointNet DAE with FC decoder (PointCAE_pointnet.py:27-160)."""
    num_coarse: int = 1024

    def setup(self):
        self.encoder = PointNetEncoder(use_tnet=self.use_tnet, name="pointnet_encoder")
        self.recfc = MLP((1024, 1024, self.num_coarse * 3), name="recfc")

    def __call__(self, corrupted, clean, train: bool = True):
        feat = self._encode_corrupted(corrupted, train)
        coarse = self.recfc(feat).reshape(-1, self.num_coarse, 3)
        return self.loss_func(coarse, clean[..., :3]), jnp.zeros(())


@MODELS.register_module()
class Point_CAE_PointNet_NoT(Point_CAE_PointNet):
    """NoT variant (PointCAE_pointnet_NoT.py:27-160)."""
    use_tnet: bool = False


class _PointNetClsHead(nn.Module):
    """fc 512 -> 256 -> cls with BN + dropout (PointCAE_pointnet.py heads)."""
    cls_dim: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(512, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dense(256, name="fc2")(x)
        x = nn.Dropout(0.4, name="dp")(x, deterministic=not train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(x)
        x = nn.relu(x)
        return nn.Dense(self.cls_dim, name="cls")(x)


@MODELS.register_module()
class PointNet(nn.Module):
    """Classification fine-tune model (PointCAE_pointnet.py:163-260)."""
    config: dict
    use_tnet: bool = True

    @nn.compact
    def __call__(self, pts, train: bool = True):
        feat = PointNetEncoder(use_tnet=self.use_tnet,
                               name="pointnet_encoder")(pts[..., :3], train)
        return _PointNetClsHead(self.config.get("cls_dim", 40),
                                name="cls_head")(feat, train)


@MODELS.register_module()
class PointNet_NoT(PointNet):
    use_tnet: bool = False


@MODELS.register_module()
class PointNet_feat(nn.Module):
    """SVM feature extractor (PointCAE_pointnet.py:263-331)."""
    config: dict
    use_tnet: bool = True

    @nn.compact
    def __call__(self, pts, train: bool = False):
        return PointNetEncoder(use_tnet=self.use_tnet,
                               name="pointnet_encoder")(pts[..., :3], train)


@MODELS.register_module()
class PointNet_NoT_feat(PointNet_feat):
    use_tnet: bool = False


class PointNetPartSegStyleEncoder(nn.Module):
    """Part-seg-style PointNet(NoT) global encoder (pointnet_not_util.py
    PointNetEncoderNoT_partseg): deeper pointwise stack with a 2048-d global
    max (used by the partseg DAE family)."""

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        h = x[..., :3]
        for i, d in enumerate((64, 128, 128, 512, 2048)):
            h = nn.Dense(d, name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(h)
            if i < 4:
                h = nn.relu(h)
        return jnp.max(h, axis=1)                   # (B, 2048)


@MODELS.register_module()
class Point_CAE_PointNetNoT_PartSeg(nn.Module):
    """DAE pretrain over the part-seg-style encoder
    (PointCAE_pointnet_NoT_partseg.py:28-135): FC decoder to 1024 x 3."""
    config: dict
    num_coarse: int = 1024

    def setup(self):
        self.encoder = PointNetPartSegStyleEncoder(name="pointnet_encoder")
        self.recfc = MLP((1024, 1024, self.num_coarse * 3), name="recfc")

    @property
    def loss_func(self):
        return build_loss_func(self.config.get("loss", "cdl2"))

    def __call__(self, corrupted, clean, train: bool = True):
        feat = self.encoder(corrupted[..., :3], train=train)
        coarse = self.recfc(feat).reshape(-1, self.num_coarse, 3)
        return self.loss_func(coarse, clean[..., :3]), jnp.zeros(())

    def encode(self, pts, train: bool = False):
        return self.encoder(pts[..., :3], train=train)


@MODELS.register_module()
class PointNetNoT_PartSeg(nn.Module):
    """Classification head on the part-seg-style encoder
    (PointCAE_pointnet_NoT_partseg.py:138-230)."""
    config: dict

    @nn.compact
    def __call__(self, pts, train: bool = True):
        feat = PointNetPartSegStyleEncoder(name="pointnet_encoder")(
            pts[..., :3], train)
        return _PointNetClsHead(self.config.get("cls_dim", 40),
                                name="cls_head")(feat, train)


@MODELS.register_module()
class PointNetNoT_Linear_PartSeg(nn.Module):
    """Linear probe (PointCAE_pointnet_NoT_partseg.py:233-318)."""
    config: dict

    @nn.compact
    def __call__(self, pts, train: bool = True):
        feat = PointNetPartSegStyleEncoder(name="pointnet_encoder")(
            pts[..., :3], train)
        return nn.Dense(self.config.get("cls_dim", 40), name="cls")(feat)


@MODELS.register_module()
class PointNetNoT_feat_PartSeg(nn.Module):
    """SVM feature extractor (PointCAE_pointnet_NoT_partseg.py:321-407)."""
    config: dict

    @nn.compact
    def __call__(self, pts, train: bool = False):
        return PointNetPartSegStyleEncoder(name="pointnet_encoder")(
            pts[..., :3], train)


@MODELS.register_module()
class PointNetNoT_Linear(nn.Module):
    """Linear probe on the NoT encoder (PointCAE_pointnet_NoT.py:233-318)."""
    config: dict

    @nn.compact
    def __call__(self, pts, train: bool = True):
        feat = PointNetEncoder(use_tnet=False,
                               name="pointnet_encoder")(pts[..., :3], train)
        return nn.Dense(self.config.get("cls_dim", 40), name="cls")(feat)


# reference registry names (no underscore before "NoT"); the underscored
# spellings above are kept as aliases
MODELS.register_module("Point_CAE_PointNetNoT", module=Point_CAE_PointNet_NoT)
MODELS.register_module("PointNetNoT", module=PointNet_NoT)
MODELS.register_module("PointNetNoT_feat", module=PointNet_NoT_feat)
