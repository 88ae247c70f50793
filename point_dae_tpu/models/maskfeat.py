"""MaskFeat family: masked-feature prediction
(reference: models/MaskFeat_transformer.py:347-648, models/MaskFeat_DGCNN.py:346-658).

A student masked transformer predicts L2-normalized *feature targets* of the
masked patches instead of their geometry:

- ``MaskFeat_transformer``: targets are the token features of a frozen
  Point-MAE-style teacher encoder run without masking (stop-gradient),
  loss = || n(f_teacher) - n(f_pred) ||^2 (MaskFeat_transformer.py:475-487).
- ``MaskFeat_dgcnn``: targets are per-patch max-pooled pointwise DGCNN
  teacher features gathered through the patch indices
  (MaskFeat_DGCNN.py:459-494).

Teacher weights are part of the variables tree ('teacher' submodule);
``load_teacher`` in the engine merges a pretrained checkpoint into them and
the optimizer masks them out (path contains 'teacher').
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import furthest_point_sample, gather_points, group_points, knn
from ..utils.registry import MODELS
from .dgcnn import DGCNNEncoder
from .layers import PosEmbedMLP
from .transformer import _CAETransformerBase, MaskTransformerEncoder

Array = jax.Array


def _nrm(v: Array) -> Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _masked_feat_mse(pred: Array, target: Array, w: Array) -> Array:
    """Mean over masked tokens of ||n(t) - n(p)||^2 (both L2-normalized)."""
    per = jnp.sum((_nrm(target) - _nrm(pred)) ** 2, -1)       # (B*G,)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-8)


@MODELS.register_module()
class MaskFeat_transformer(_CAETransformerBase):
    """Student predicts frozen-teacher token features of masked patches."""

    @property
    def masked_mode(self) -> bool:
        return True

    def setup(self):
        t = self.tcfg
        mk = lambda name: MaskTransformerEncoder(
            trans_dim=t["trans_dim"], depth=t["depth"],
            num_heads=t["num_heads"], encoder_dims=t["encoder_dims"],
            drop_path_rate=t.get("drop_path_rate", 0.1),
            mask_ratio=t.get("mask_ratio", 0.6),
            rand_ratio=str(t.get("rand_ratio", "False")) == "True",
            mask_type=t.get("mask_type", "rand"), name=name)
        self.MAE_encoder = mk("MAE_encoder")
        self.teacher = mk("teacher")
        self.decoder_pos_embed = PosEmbedMLP(t["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = self._make_decoder()
        self.mask_token = self._make_mask_token()
        self.increase_dim = nn.Dense(t["trans_dim"], name="increase_dim")

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        from ..ops import group_neighborhood

        pts = clean[..., :3]
        G, S = self.config["num_group"], self.config["group_size"]
        neigh, center = group_neighborhood(pts, G, S)
        x_vis, mask = self.MAE_encoder(neigh, center, train=train)
        x_rec = self._decode(x_vis, mask, center, train)

        target, _ = self.teacher(neigh, center, noaug=True, train=False)
        target = jax.lax.stop_gradient(target)

        w, x_loc, tgt = self._pack_local(mask, x_rec, target)
        pred = self.increase_dim(x_loc)                       # (B, M, C)
        loss = _masked_feat_mse(pred.reshape(w.shape[0], -1),
                                tgt.reshape(w.shape[0], -1), w)
        return loss, jnp.zeros(())


@MODELS.register_module()
class MaskFeat_dgcnn(_CAETransformerBase):
    """Student predicts per-patch pooled DGCNN teacher features
    (MaskFeat_DGCNN.py:346-499): teacher runs on the full cloud, its
    pointwise features are grouped by the same patch indices and max-pooled.
    """

    @property
    def masked_mode(self) -> bool:
        return True

    def setup(self):
        t = self.tcfg
        self.MAE_encoder = MaskTransformerEncoder(
            trans_dim=t["trans_dim"], depth=t["depth"],
            num_heads=t["num_heads"], encoder_dims=t["encoder_dims"],
            drop_path_rate=t.get("drop_path_rate", 0.1),
            mask_ratio=t.get("mask_ratio", 0.6),
            rand_ratio=str(t.get("rand_ratio", "False")) == "True",
            mask_type=t.get("mask_type", "rand"),
            name="MAE_encoder")
        self.teacher = DGCNNEncoder(name="teacher")
        self.decoder_pos_embed = PosEmbedMLP(t["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = self._make_decoder()
        self.mask_token = self._make_mask_token()
        self.increase_dim = nn.Dense(1024, name="increase_dim")

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        G, S = self.config["num_group"], self.config["group_size"]
        fps_idx = furthest_point_sample(pts, G)
        center = gather_points(pts, fps_idx)
        _, idx = knn(center, pts, S)
        neigh = group_points(pts, idx) - center[:, :, None, :]

        x_vis, mask = self.MAE_encoder(neigh, center, train=train)
        x_rec = self._decode(x_vis, mask, center, train)

        _, pointwise = self.teacher(pts, train=False)         # (B, N, 1024)
        pointwise = jax.lax.stop_gradient(pointwise)
        patch_feat = jnp.max(group_points(pointwise, idx), axis=2)  # (B, G, 1024)

        w, x_loc, tgt = self._pack_local(mask, x_rec, patch_feat)
        pred = self.increase_dim(x_loc)                       # (B, M, 1024)
        loss = _masked_feat_mse(pred.reshape(w.shape[0], -1),
                                tgt.reshape(w.shape[0], -1), w)
        return loss, jnp.zeros(())


@MODELS.register_module()
class MaskFeat_transformer_pointmae(MaskFeat_transformer):
    """Reference registry name (MaskFeat_transformer.py:348-491): the frozen
    teacher is a Point-MAE encoder loaded from ``pointmae_config.ckpt``.
    Structurally identical to MaskFeat_transformer (same MaskTransformer
    teacher run with noaug + stop-gradient); load teacher weights via the
    engine's ``teacher_ckpt`` merge."""


@MODELS.register_module()
class MaskFeat_transformer_supervised(MaskFeat_transformer):
    """Frozen supervised-PointTransformer teacher flavour
    (MaskFeat_transformer.py:493-648); differs from the pointmae variant only
    in which checkpoint fills the teacher subtree."""
