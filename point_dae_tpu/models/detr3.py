"""3DETR-style backbone variants (reference: models/detr/build.py:7-28,
models/detr/transformer.py:19-159, used by the *_3detr registered models at
PointCAE_transformer.py:1790-2198).

Pre-encoder = a single votes-style set-abstraction (FPS to num_group centers,
ball query r=0.2 k=64, shared MLP [dim/2, dim/2, dim]); encoder = pre-norm
transformer WITHOUT positional embeddings (the reference runs the 3detr
encoder with no PE, PointCAE_transformer.py:458-463); the '_encodernope'
variant differs only in also omitting the decoder-side pos embed of visible
tokens.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..losses import build_loss_func
from ..utils.registry import MODELS
from .dae_pointnet2 import SetAbstraction
from .layers import MLP, PosEmbedMLP, TransformerBlock
from .transformer import (_CAETransformerBase, _masked_loss_fn,
                          sample_block_mask, sample_patch_mask,
                          static_num_masked)

Array = jax.Array


class DetrPreEncoder(nn.Module):
    """build_preencoder (models/detr/build.py:7-16): SA(num_group, 0.2, 64)."""
    num_group: int
    dim: int

    @nn.compact
    def __call__(self, pts: Array, train: bool = True):
        xyz, feat = SetAbstraction(self.num_group, 0.2, 64,
                                   (self.dim // 2, self.dim // 2, self.dim),
                                   name="sa")(pts, None, train)
        return xyz, feat


class DetrEncoder(nn.Module):
    """Pre-norm transformer encoder, no PE (models/detr/transformer.py:19-159)."""
    dim: int
    depth: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Array, key_mask=None, deterministic: bool = True):
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.num_heads, name=f"block{i}")(
                x, key_mask=key_mask, deterministic=deterministic)
        return x


class _Detr3Base(_CAETransformerBase):
    """MaskTransformer with enc_arch='3detr'
    (PointCAE_transformer.py:321-341,426-464): the pre-encoder groups the raw
    corrupted cloud; masking + (PE-free) encoder blocks follow."""

    @property
    def masked_mode(self) -> bool:
        return True

    def _encode_3detr(self, pts: Array, train: bool):
        t = self.tcfg
        center, tokens = self.pre_encoder(pts, train=train)
        B, G = tokens.shape[:2]
        rand = str(t.get("rand_ratio", "False")) == "True"
        if t.get("mask_type", "rand") == "block":
            # block masking: fixed ratio, nearest-patch ball around a seed
            # (MaskTransformer supports both mask types for the 3detr arch
            # too, PointCAE_transformer.py:441-445)
            mask = sample_block_mask(self.make_rng("mask"), center,
                                     t.get("mask_ratio", 0.6))
            min_ratio = float(t.get("mask_ratio", 0.6))
        else:
            mask = sample_patch_mask(self.make_rng("mask"), B, G,
                                     t.get("mask_ratio", 0.6), rand)
            min_ratio = 0.5 if rand else float(t.get("mask_ratio", 0.6))
        # pack the PE-free encoder blocks to the static visible capacity
        # (same design as MaskTransformerEncoder); consumers are mask-aware
        V = G - static_num_masked(min_ratio, G)
        if V >= G:
            x = self.blocks(tokens, key_mask=jnp.logical_not(mask),
                            deterministic=not train)
            return x, mask, center
        order = jnp.argsort(mask, axis=-1, stable=True)   # visible-first
        vis_idx = order[:, :V]
        pt = jnp.take_along_axis(tokens, vis_idx[:, :, None], axis=1)
        num_vis = jnp.sum(jnp.logical_not(mask), axis=-1)
        slot_valid = jnp.arange(V)[None, :] < num_vis[:, None]
        x = self.blocks(pt, key_mask=slot_valid, deterministic=not train)
        x = jnp.where(slot_valid[..., None], x, jnp.zeros((), x.dtype))
        full = jnp.zeros((B, G, x.shape[-1]), x.dtype)
        full = full.at[jnp.arange(B)[:, None], vis_idx].set(x)
        return full, mask, center


@MODELS.register_module()
class PointCAE_transformer_fc_global_fc_local_3detr(_Detr3Base):
    """FC global + FC local heads over the 3detr backbone
    (PointCAE_transformer.py:1790-1991)."""

    def setup(self):
        t = self.tcfg
        G = self.config["num_group"]
        self.pre_encoder = DetrPreEncoder(G, t["encoder_dims"],
                                          name="pre_encoder")
        self.blocks = DetrEncoder(t["trans_dim"], t["depth"], t["num_heads"],
                                  name="blocks")
        self.decoder_pos_embed = PosEmbedMLP(t["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = self._make_decoder()
        self.mask_token = self._make_mask_token()
        self.coarse_pred = MLP((1024, 1024, 3 * 64), name="coarse_pred")
        self.increase_dim = nn.Dense(3 * self.config["group_size"],
                                     name="increase_dim")
        self.loss_fn = _masked_loss_fn(self.config.get("loss", "cdl2"))
        self.global_loss_fn = build_loss_func(self.config.get("loss", "cdl2"))

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        from ..ops import knn, group_points

        pts = clean[..., :3]
        # corruption happens on the raw cloud for the 3detr path: the
        # pre-encoder regroups internally, so use the corrupted input directly
        src = corrupted[..., :3] if train else pts
        x_vis, mask, center = self._encode_3detr(src, train)
        vis = jnp.logical_not(mask)[..., None]
        cnt = jnp.maximum(jnp.sum(vis, 1), 1.0)
        gfeat = jnp.max(jnp.where(vis, x_vis, -1e9), 1) + \
            jnp.sum(jnp.where(vis, x_vis, 0.0), 1) / cnt
        coarse = self.coarse_pred(gfeat).reshape(gfeat.shape[0], -1, 3)
        loss2 = self.global_loss_fn(coarse, center)

        x_full = jnp.where(mask[..., None], self.mask_token, x_vis)
        x_rec = self.MAE_decoder(x_full, self.decoder_pos_embed(center),
                                 deterministic=not train)
        B, G, _ = x_rec.shape
        S = self.config["group_size"]
        rebuild = self.increase_dim(x_rec).reshape(B * G, S, 3)
        # GT local patches around the 3detr centers, from the clean cloud
        _, idx = knn(center, pts, S)
        gt = (group_points(pts, idx) - center[:, :, None, :]).reshape(B * G, S, 3)
        loss1 = self.loss_fn(rebuild, gt, mask.astype(jnp.float32).reshape(-1))
        return loss1, loss2

    def encode(self, pts: Array, train: bool = False) -> Array:
        center, tokens = self.pre_encoder(pts[..., :3], train=train)
        x = self.blocks(tokens, deterministic=not train)
        return jnp.max(x, axis=1) + jnp.mean(x, axis=1)


@MODELS.register_module()
class PointCAE_transformer_fc_global_fc_local_3detr_encodernope(
        PointCAE_transformer_fc_global_fc_local_3detr):
    """Registered alias: the reference class body at
    PointCAE_transformer.py:1993-2198 is byte-identical to the base class at
    :1790-1991 (only the class name differs — the 'nope' distinction lives in
    the experiment configs); the 3detr encoder is PE-free in both."""
