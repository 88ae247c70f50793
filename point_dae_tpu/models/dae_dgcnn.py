"""DGCNN-backbone DAE pretraining models + downstream heads.

Registered equivalents of models/PointCAE_DGCNN.py in the reference:
Point_CAE_DGCNN (PCN coarse+fine), Point_CAE_DGCNN_FCOnly (the released
non-transformer checkpoint model, rerun.sh:37), Point_CAE_DGCNN_FoldOnly,
Point_AE_Corruption_DGCNN (reconstructs the corrupted cloud), and the
DGCNN / DGCNN_Linear / DGCNN_feat downstream heads (PointCAE_DGCNN.py:572-848).

Pretrain-model calling convention: ``(corrupted, clean, train) ->
(loss_xyz, loss_normal)``; ``method="encode"`` returns the global feature for
the SVM probe (the ``return_feat=True`` path of the reference forward).
RNG streams: 'corrupt' (input dropout), 'dropout' (head dropout).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..losses import build_loss_func
from ..utils.registry import MODELS
from .common import apply_input_dropout, folding_grid
from .dgcnn import DGCNNEncoder
from .layers import MLP, SplitMLP, leaky_relu02

Array = jax.Array


class _DGCNNDAEBase(nn.Module):
    """Shared skeleton: input dropout -> DGCNN encoder -> decode -> chamfer."""
    config: dict

    @property
    def corrupt_type(self) -> Tuple[str, ...]:
        return tuple(self.config.get("corrupt_type", ()))

    @property
    def compute_dtype(self):
        """Optional bf16 encoder compute ('dtype': 'bf16' in the model cfg):
        edge tensors + convs in bf16, kNN geometry / BN statistics / decoder
        losses in f32. Default None = full f32 (reference parity)."""
        d = self.config.get("dtype")
        return jnp.bfloat16 if str(d) in ("bf16", "bfloat16") else None

    @property
    def loss_func(self):
        return build_loss_func(self.config.get("loss", "cdl2"))

    def _encode_corrupted(self, corrupted: Array, train: bool) -> Array:
        corrupted = corrupted[..., :3]
        if train and self.corrupt_type:
            key = self.make_rng("corrupt")
            corrupted = apply_input_dropout(key, corrupted, self.corrupt_type)
        feat, _ = self.encoder(corrupted, train=train)
        return feat

    def encode(self, pts: Array, train: bool = False) -> Array:
        """Frozen-feature path for SVM probes (return_feat=True branch)."""
        feat, _ = self.encoder(pts[..., :3], train=train)
        return feat


@MODELS.register_module()
class Point_CAE_DGCNN_FCOnly(_DGCNNDAEBase):
    """FC decoder to 1024 x 3 (PointCAE_DGCNN.py:145-230). Flagship
    non-transformer model (released checkpoint, rerun.sh:37)."""
    num_coarse: int = 1024

    def setup(self):
        self.encoder = DGCNNEncoder(remat=bool(self.config.get("remat", False)),
                                    dtype=self.compute_dtype,
                                    impl=self.config.get("edgeconv_impl",
                                                         "auto"),
                                    exact_grads=bool(self.config.get(
                                        "edgeconv_exact_grads", False)),
                                    grad_mode=str(self.config.get(
                                        "edgeconv_grad_mode", "first")),
                                    tn=int(self.config.get(
                                        "edgeconv_tn", 256)),
                                    name="dgcnn_encoder")
        self.recfc = MLP((1024, 1024, self.num_coarse * 3), name="recfc")

    def reconstruct(self, corrupted: Array, train: bool = False) -> Array:
        feat = self._encode_corrupted(corrupted, train)
        return self.recfc(feat).reshape(-1, self.num_coarse, 3)

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        coarse = self.reconstruct(corrupted, train)
        loss = self.loss_func(coarse, clean[..., :3])
        return loss, jnp.zeros(())


@MODELS.register_module()
class Point_CAE_DGCNN(_DGCNNDAEBase):
    """PCN-style coarse FC + grid-folding fine decoder
    (PointCAE_DGCNN.py:26-143): coarse (B, 1024, 3); fine = folding over a
    4x4 grid around each coarse point -> (B, 16384, 3). Returns
    (loss_coarse, loss_fine)."""
    num_coarse: int = 1024
    grid_size: int = 4
    grid_scale: float = 0.05

    def setup(self):
        self.encoder = DGCNNEncoder(remat=bool(self.config.get("remat", False)),
                                    dtype=self.compute_dtype,
                                    impl=self.config.get("edgeconv_impl",
                                                         "auto"),
                                    exact_grads=bool(self.config.get(
                                        "edgeconv_exact_grads", False)),
                                    grad_mode=str(self.config.get(
                                        "edgeconv_grad_mode", "first")),
                                    tn=int(self.config.get(
                                        "edgeconv_tn", 256)),
                                    name="dgcnn_encoder")
        self.folding1 = MLP((1024, 1024, self.num_coarse * 3), name="folding1")
        # fine folding over concat([grid, point, global]): the global feature
        # is broadcast over every fine point -> first Dense factorized
        self.folding2 = SplitMLP((512, 512, 3), shared_last=True,
                                 name="folding2")

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        clean = clean[..., :3]
        feat = self._encode_corrupted(corrupted, train)     # (B, 1024)
        B = feat.shape[0]
        coarse = self.folding1(feat).reshape(B, self.num_coarse, 3)

        g2 = self.grid_size ** 2
        grid = jnp.asarray(folding_grid((self.grid_size, self.grid_size),
                                        (-self.grid_scale, self.grid_scale)))
        grid_feat = jnp.tile(grid[None], (B, self.num_coarse, 1))   # (B, F, 2)
        point_feat = jnp.repeat(coarse, g2, axis=1)                  # (B, F, 3)
        # first Dense over concat([grid, point, global]) with the global
        # feature broadcast over all F fine points — factorized (exact)
        fine = self.folding2(feat, jnp.concatenate(
            [grid_feat, point_feat], -1)) + point_feat
        return self.loss_func(coarse, clean), self.loss_func(fine, clean)


@MODELS.register_module()
class Point_CAE_DGCNN_FoldOnly(_DGCNNDAEBase):
    """Pure two-stage folding decoder over a 32x32 grid
    (PointCAE_DGCNN.py:233-332)."""

    def setup(self):
        self.encoder = DGCNNEncoder(remat=bool(self.config.get("remat", False)),
                                    dtype=self.compute_dtype,
                                    impl=self.config.get("edgeconv_impl",
                                                         "auto"),
                                    exact_grads=bool(self.config.get(
                                        "edgeconv_exact_grads", False)),
                                    grad_mode=str(self.config.get(
                                        "edgeconv_grad_mode", "first")),
                                    tn=int(self.config.get(
                                        "edgeconv_tn", 256)),
                                    name="dgcnn_encoder")
        # both stages consume concat([broadcast global feature, per-point]);
        # the shared half of each first Dense is factorized (exact)
        self.folding1 = SplitMLP((1024, 1024, 3), name="folding1")
        self.folding2 = SplitMLP((1024, 1024, 3), name="folding2")

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        clean = clean[..., :3]
        feat = self._encode_corrupted(corrupted, train)     # (B, 1024)
        B, C = feat.shape
        grid = jnp.asarray(folding_grid((32, 32), (-0.3, 0.3)))      # (1024, 2)
        f1 = self.folding1(feat, jnp.tile(grid[None], (B, 1, 1)))
        f2 = self.folding2(feat, f1)
        loss = self.loss_func(f2, clean)
        return loss, jnp.zeros(())


@MODELS.register_module()
class Point_AE_Corruption_DGCNN(_DGCNNDAEBase):
    """Ablation: reconstruct the *corrupted* cloud instead of the clean one
    (PointCAE_DGCNN.py:335-451)."""
    num_coarse: int = 1024

    def setup(self):
        self.encoder = DGCNNEncoder(remat=bool(self.config.get("remat", False)),
                                    dtype=self.compute_dtype,
                                    impl=self.config.get("edgeconv_impl",
                                                         "auto"),
                                    exact_grads=bool(self.config.get(
                                        "edgeconv_exact_grads", False)),
                                    grad_mode=str(self.config.get(
                                        "edgeconv_grad_mode", "first")),
                                    tn=int(self.config.get(
                                        "edgeconv_tn", 256)),
                                    name="dgcnn_encoder")
        self.recfc = MLP((1024, 1024, self.num_coarse * 3), name="recfc")

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        target = corrupted[..., :3]
        feat = self._encode_corrupted(corrupted, train)
        coarse = self.recfc(feat).reshape(-1, self.num_coarse, 3)
        loss = self.loss_func(coarse, target)
        return loss, jnp.zeros(())


class _ClsHead(nn.Module):
    """DGCNN classification head (PointCAE_DGCNN.py:572-664): two
    Dense+BN+LeakyReLU+Dropout stages then a linear classifier."""
    cls_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        # biased Dense like the reference nn.Linear (PointCAE_DGCNN.py
        # :581-590) so converted checkpoints land bit-for-bit
        x = nn.Dense(512, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = leaky_relu02(x)
        x = nn.Dropout(self.dropout, name="dp1")(x, deterministic=not train)
        x = nn.Dense(256, name="fc2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(x)
        x = leaky_relu02(x)
        x = nn.Dropout(self.dropout, name="dp2")(x, deterministic=not train)
        return nn.Dense(self.cls_dim, name="cls")(x)


@MODELS.register_module()
class DGCNN(nn.Module):
    """Classification fine-tune model (PointCAE_DGCNN.py:572-664)."""
    config: dict

    @nn.compact
    def __call__(self, pts: Array, train: bool = True) -> Array:
        feat, _ = DGCNNEncoder(impl=self.config.get("edgeconv_impl", "auto"),
                               exact_grads=bool(self.config.get(
                                   "edgeconv_exact_grads", False)),
                         name="dgcnn_encoder")(pts[..., :3], train=train)
        return _ClsHead(self.config.get("cls_dim", 40), name="cls_head")(feat, train)


@MODELS.register_module()
class DGCNN_Linear(nn.Module):
    """Linear probe head on the frozen-ish encoder (PointCAE_DGCNN.py:666-752)."""
    config: dict

    @nn.compact
    def __call__(self, pts: Array, train: bool = True) -> Array:
        feat, _ = DGCNNEncoder(impl=self.config.get("edgeconv_impl", "auto"),
                               exact_grads=bool(self.config.get(
                                   "edgeconv_exact_grads", False)),
                         name="dgcnn_encoder")(pts[..., :3], train=train)
        return nn.Dense(self.config.get("cls_dim", 40), name="cls")(feat)


@MODELS.register_module()
class DGCNN_feat(nn.Module):
    """SVM feature extractor (PointCAE_DGCNN.py:754-848)."""
    config: dict

    @nn.compact
    def __call__(self, pts: Array, train: bool = False) -> Array:
        feat, _ = DGCNNEncoder(impl=self.config.get("edgeconv_impl", "auto"),
                               exact_grads=bool(self.config.get(
                                   "edgeconv_exact_grads", False)),
                         name="dgcnn_encoder")(pts[..., :3], train=train)
        return feat


@MODELS.register_module()
class Point_CAE_DGCNN_proj(_DGCNNDAEBase):
    """DAE with a projection MLP (1024->512->1024) between encoder and PCN
    decoder (PointCAE_DGCNN.py:454-570)."""
    num_coarse: int = 1024
    grid_size: int = 4
    grid_scale: float = 0.05

    def setup(self):
        self.encoder = DGCNNEncoder(remat=bool(self.config.get("remat", False)),
                                    dtype=self.compute_dtype,
                                    impl=self.config.get("edgeconv_impl",
                                                         "auto"),
                                    exact_grads=bool(self.config.get(
                                        "edgeconv_exact_grads", False)),
                                    grad_mode=str(self.config.get(
                                        "edgeconv_grad_mode", "first")),
                                    tn=int(self.config.get(
                                        "edgeconv_tn", 256)),
                                    name="dgcnn_encoder")
        self.proj = MLP((512, 1024), name="proj")
        self.folding1 = MLP((1024, 1024, self.num_coarse * 3), name="folding1")
        # fine folding over concat([grid, point, global]): the global feature
        # is broadcast over every fine point -> first Dense factorized
        self.folding2 = SplitMLP((512, 512, 3), shared_last=True,
                                 name="folding2")

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
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


@MODELS.register_module()
class DGCNN_MaskFeat(nn.Module):
    """Feature extractor over the no-pooling DGCNN for MaskFeat probing
    (PointCAE_DGCNN.py:850-927): returns global max of pointwise features."""
    config: dict

    @nn.compact
    def __call__(self, pts: Array, train: bool = False) -> Array:
        feat, _ = DGCNNEncoder(impl=self.config.get("edgeconv_impl", "auto"),
                               exact_grads=bool(self.config.get(
                                   "edgeconv_exact_grads", False)),
                         name="dgcnn_encoder")(pts[..., :3], train=train)
        return feat


@MODELS.register_module()
class DGCNN_CrossPoint(nn.Module):
    """CrossPoint-style DGCNN classifier: encoder + inv head
    (PointCAE_DGCNN.py:929-998)."""
    config: dict

    @nn.compact
    def __call__(self, pts: Array, train: bool = True) -> Array:
        feat, _ = DGCNNEncoder(impl=self.config.get("edgeconv_impl", "auto"),
                               exact_grads=bool(self.config.get(
                                   "edgeconv_exact_grads", False)),
                         name="dgcnn_encoder")(pts[..., :3], train=train)
        return _ClsHead(self.config.get("cls_dim", 15), name="cls_head")(
            feat, train)


# ---- PartSeg-encoder DAE family (models/PointCAE_DGCNN_partseg.py) --------

class _DGCNNPartSegDAEBase(_DGCNNDAEBase):
    """Same skeleton over the segmentation-style DGCNN encoder
    (dgcnn_util.py dgcnn_encoder_partseg); _encode_corrupted is inherited —
    subclasses only swap the encoder in setup."""


@MODELS.register_module()
class Point_CAE_DGCNN_PartSeg(_DGCNNPartSegDAEBase):
    """PCN coarse+fine DAE over the partseg encoder
    (PointCAE_DGCNN_partseg.py:28-141)."""
    num_coarse: int = 1024
    grid_size: int = 4
    grid_scale: float = 0.05

    def setup(self):
        from .dgcnn import DGCNNPartSegEncoder

        self.encoder = DGCNNPartSegEncoder(name="dgcnn_encoder")
        self.folding1 = MLP((1024, 1024, self.num_coarse * 3), name="folding1")
        # fine folding over concat([grid, point, global]): the global feature
        # is broadcast over every fine point -> first Dense factorized
        self.folding2 = SplitMLP((512, 512, 3), shared_last=True,
                                 name="folding2")

    def _pcn_decode(self, feat: Array):
        B = feat.shape[0]
        coarse = self.folding1(feat).reshape(B, self.num_coarse, 3)
        g2 = self.grid_size ** 2
        grid = jnp.asarray(folding_grid((self.grid_size, self.grid_size),
                                        (-self.grid_scale, self.grid_scale)))
        grid_feat = jnp.tile(grid[None], (B, self.num_coarse, 1))
        point_feat = jnp.repeat(coarse, g2, axis=1)
        fine = self.folding2(feat, jnp.concatenate(
            [grid_feat, point_feat], -1)) + point_feat
        return coarse, fine

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        clean = clean[..., :3]
        feat = self._encode_corrupted(corrupted, train)
        coarse, fine = self._pcn_decode(feat)
        return self.loss_func(coarse, clean), self.loss_func(fine, clean)


@MODELS.register_module()
class Point_CAE_DGCNN_proj_PartSeg(Point_CAE_DGCNN_PartSeg):
    """Adds a 1024->512->1024 projection between encoder and decoder
    (PointCAE_DGCNN_partseg.py:145-258)."""

    def setup(self):
        super().setup()
        self.proj = MLP((512, 1024), name="proj")

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        clean = clean[..., :3]
        feat = self.proj(self._encode_corrupted(corrupted, train))
        coarse, fine = self._pcn_decode(feat)
        return self.loss_func(coarse, clean), self.loss_func(fine, clean)


@MODELS.register_module()
class DGCNN_PartSeg(nn.Module):
    """Classification head on the partseg encoder
    (PointCAE_DGCNN_partseg.py:262-353)."""
    config: dict

    @nn.compact
    def __call__(self, pts: Array, train: bool = True) -> Array:
        from .dgcnn import DGCNNPartSegEncoder

        feat, _ = DGCNNPartSegEncoder(name="dgcnn_encoder")(pts[..., :3], train)
        return _ClsHead(self.config["cls_dim"], name="cls_head")(feat, train)


@MODELS.register_module()
class DGCNN_Linear_PartSeg(nn.Module):
    """Linear probe (PointCAE_DGCNN_partseg.py:356-440)."""
    config: dict

    @nn.compact
    def __call__(self, pts: Array, train: bool = True) -> Array:
        from .dgcnn import DGCNNPartSegEncoder

        feat, _ = DGCNNPartSegEncoder(name="dgcnn_encoder")(pts[..., :3], train)
        return nn.Dense(self.config["cls_dim"], name="cls")(feat)


@MODELS.register_module()
class DGCNN_feat_PartSeg(nn.Module):
    """SVM feature extractor (PointCAE_DGCNN_partseg.py:443-520)."""
    config: dict

    @nn.compact
    def __call__(self, pts: Array, train: bool = False) -> Array:
        from .dgcnn import DGCNNPartSegEncoder

        feat, _ = DGCNNPartSegEncoder(name="dgcnn_encoder")(pts[..., :3], train)
        return feat
