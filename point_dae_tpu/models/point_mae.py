"""Point-MAE baseline pretraining models (reference: models/Point_MAE.py:351-577).

Point_MAE masks patches of the *clean* cloud (no affine corruption) and
reconstructs masked normalized patches; ``Point_MAE_folding`` swaps the FC
head for a folding head. Uses the same static-shape masking machinery as the
PointCAE transformer family.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import group_neighborhood
from ..utils.registry import MODELS
from .layers import PosEmbedMLP, TransformerDecoder
from .transformer import (MaskTransformerEncoder, _CAETransformerBase,
                          _masked_loss_fn, fold_head_cls)

Array = jax.Array


@MODELS.register_module()
class Point_MAE(_CAETransformerBase):
    """Masked autoencoder baseline (Point_MAE.py:351-447). Forward: group the
    clean cloud (no affine), mask, decode, FC head to S*3 per masked token."""

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
        self.decoder_pos_embed = PosEmbedMLP(t["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = TransformerDecoder(
            embed_dim=t["trans_dim"], depth=t["decoder_depth"],
            num_heads=t["decoder_num_heads"],
            drop_path_rate=t.get("drop_path_rate", 0.1), name="MAE_decoder")
        self.mask_token = self._make_mask_token()
        self.increase_dim = nn.Dense(3 * self.config["group_size"],
                                     name="increase_dim")
        self.loss_fn = _masked_loss_fn(self.config.get("loss", "cdl2"))

    @property
    def masked_mode(self) -> bool:
        return True

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        G, S = self.config["num_group"], self.config["group_size"]
        neigh, center = group_neighborhood(pts, G, S)
        x_vis, mask = self.MAE_encoder(neigh, center, train=train)
        x_rec = self._decode(x_vis, mask, center, train)
        x_loc, gt, w = self._local_recon_inputs(x_rec, neigh, mask)
        rebuild = self.increase_dim(x_loc).reshape(-1, S, 3)
        loss1 = self.loss_fn(rebuild, gt, w)
        return loss1, jnp.zeros(())

    def encode(self, pts: Array, train: bool = False) -> Array:
        G, S = self.config["num_group"], self.config["group_size"]
        neigh, center = group_neighborhood(pts[..., :3], G, S)
        x, _ = self.MAE_encoder(neigh, center, noaug=True, train=train)
        return jnp.max(x, axis=1) + jnp.mean(x, axis=1)


@MODELS.register_module()
class Point_MAE_folding(_CAETransformerBase):
    """Point_MAE with a folding reconstruction head (Point_MAE.py:449-577)."""

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
        self.decoder_pos_embed = PosEmbedMLP(t["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = TransformerDecoder(
            embed_dim=t["trans_dim"], depth=t["decoder_depth"],
            num_heads=t["decoder_num_heads"],
            drop_path_rate=t.get("drop_path_rate", 0.1), name="MAE_decoder")
        self.mask_token = self._make_mask_token()
        self.fold = fold_head_cls(t)(t["trans_dim"], name="fold")
        self.loss_fn = _masked_loss_fn(self.config.get("loss", "cdl2"))

    @property
    def masked_mode(self) -> bool:
        return True

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        G, S = self.config["num_group"], self.config["group_size"]
        neigh, center = group_neighborhood(pts, G, S)
        x_vis, mask = self.MAE_encoder(neigh, center, train=train)
        x_rec = self._decode(x_vis, mask, center, train)
        x_loc, gt, w = self._local_recon_inputs(x_rec, neigh, mask)
        rebuild = self.fold(x_loc).reshape(gt.shape[0], -1, 3)
        loss1 = self.loss_fn(rebuild, gt, w)
        return loss1, jnp.zeros(())
