"""3DETR-style backbone variants (reference: models/detr/build.py:7-28,
models/detr/transformer.py:19-159, used by the *_3detr registered models at
PointCAE_transformer.py:1790-2198).

Faithful dataflow (PointCAE_transformer.py:1860-1924):
- the whole raw cloud is corrupted (DummyGroup passes it through,
  PointCAE_transformer.py:88-92), then the pre-encoder FPS+ball-groups the
  CORRUPTED cloud: SA(npoint=num_group, radius=0.2, nsample=group_size,
  mlp=[(3+)0, 64, 128, dim], normalize_xyz=True) (build.py:7-16);
- the encoder is the 3detr pre-norm stack WITHOUT positional embeddings
  (ffn_dim=128, ReLU, dropout 0.1, final LayerNorm — build.py:17-28,
  transformer.py:77-159), run on the visible tokens only;
- every reconstruction target is CLEAN-cloud geometry gathered at the
  pre-encoder's FPS indices: center_real = clean[pre_enc_inds], and the
  local GT patches are QueryAndGroup(0.2, group_size, normalize_xyz=True)
  balls around center_real (:1884-1897) — corrupted input, clean target,
  the denoising objective;
- heads: coarse_pred Linear(dim,512)-ReLU-Linear(512,512)-ReLU-
  Linear(512, 3*num_group) on max+mean of visible tokens vs center_real;
  mask tokens + decoder (GT-center pos embed) + Conv1d(dim, 3*S) local head
  vs the normalized clean patches (:1838-1845, :1902-1924).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..losses import build_loss_func
from ..ops import (ball_query, furthest_point_sample, gather_points,
                   group_points)
from ..utils.registry import MODELS
from .layers import MLP, PosEmbedMLP
from .transformer import (_CAETransformerBase, _masked_loss_fn,
                          sample_block_mask, sample_patch_mask,
                          static_num_masked)

Array = jax.Array


class DetrPreEncoder(nn.Module):
    """build_preencoder (models/detr/build.py:7-16): one votes-style SA —
    FPS to num_group centers, ball query r=0.2 k=group_size with grouped
    xyz normalized by the radius, shared MLP (3 -> 64 -> 128 -> dim)
    Conv+BN+ReLU, max over the ball. Returns (centers, tokens, fps_inds):
    the indices let the caller gather the CLEAN positions of the same
    points (pre_enc_inds, PointCAE_transformer.py:1884-1888)."""
    num_group: int
    group_size: int
    dim: int
    radius: float = 0.2

    @nn.compact
    def __call__(self, pts: Array, train: bool = True):
        inds = furthest_point_sample(pts, self.num_group)
        new_xyz = gather_points(pts, inds)                   # (B, G, 3)
        nidx = ball_query(self.radius, self.group_size, pts, new_xyz)
        grouped = (group_points(pts, nidx) - new_xyz[:, :, None, :]) \
            / self.radius                                    # normalize_xyz
        h = grouped
        for i, d in enumerate((64, 128, self.dim)):
            h = nn.Dense(d, use_bias=False, name=f"mlp{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"mlp{i}_bn")(h)
            h = nn.relu(h)
        tokens = jnp.max(h, axis=2)                          # (B, G, dim)
        return new_xyz, tokens, inds


class Detr3EncoderLayer(nn.Module):
    """3detr pre-norm encoder layer (transformer.py:77-159 forward_pre):
    LN -> MHA(q=k=v=normed, biases, attention dropout) -> +dropout;
    LN -> Linear(ffn_dim) -> ReLU -> dropout -> Linear(dim) -> +dropout.
    ffn_dim defaults to 128 (build.py:17), NOT 4*dim."""
    dim: int
    num_heads: int
    ffn_dim: int = 128
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, key_mask=None, deterministic: bool = True):
        h = nn.LayerNorm(name="norm1")(x)
        attn_mask = None
        if key_mask is not None:
            attn_mask = key_mask[:, None, None, :]
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout,
            deterministic=deterministic, name="self_attn")(
                h, h, h, mask=attn_mask)
        x = x + nn.Dropout(self.dropout, name="dropout1")(
            h, deterministic=deterministic)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.ffn_dim, name="linear1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, name="dropout")(
            h, deterministic=deterministic)
        h = nn.Dense(self.dim, name="linear2")(h)
        x = x + nn.Dropout(self.dropout, name="dropout2")(
            h, deterministic=deterministic)
        return x


class DetrEncoder(nn.Module):
    """3detr encoder: N pre-norm layers + final LayerNorm, no positional
    embeddings (build.py:17-28; the reference runs it PE-free,
    PointCAE_transformer.py:458-463)."""
    dim: int
    depth: int
    num_heads: int
    ffn_dim: int = 128
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, key_mask=None, deterministic: bool = True):
        for i in range(self.depth):
            x = Detr3EncoderLayer(self.dim, self.num_heads, self.ffn_dim,
                                  self.dropout, name=f"layer{i}")(
                x, key_mask=key_mask, deterministic=deterministic)
        return nn.LayerNorm(name="norm")(x)


class _Detr3Base(_CAETransformerBase):
    """MaskTransformer with enc_arch='3detr'
    (PointCAE_transformer.py:321-341,426-464): the pre-encoder groups the
    raw corrupted cloud; masking + the PE-free encoder follow."""

    @property
    def masked_mode(self) -> bool:
        return True

    def _encode_3detr(self, pts: Array, train: bool):
        t = self.tcfg
        center, tokens, inds = self.pre_encoder(pts, train=train)
        B, G = tokens.shape[:2]
        rand = str(t.get("rand_ratio", "False")) == "True"
        if t.get("mask_type", "rand") == "block":
            # sanctioned extension: the reference's 3detr branch raises
            # NotImplementedError for non-rand masking
            # (PointCAE_transformer.py:441-445); supported here for
            # symmetry with the PointViT arch
            mask = sample_block_mask(self.make_rng("mask"), center,
                                     t.get("mask_ratio", 0.6))
            min_ratio = float(t.get("mask_ratio", 0.6))
        else:
            mask = sample_patch_mask(self.make_rng("mask"), B, G,
                                     t.get("mask_ratio", 0.6), rand)
            min_ratio = 0.5 if rand else float(t.get("mask_ratio", 0.6))
        # pack the PE-free encoder blocks to the static visible capacity
        # (the reference gathers visible tokens too, :449-451); consumers
        # are mask-aware
        V = G - static_num_masked(min_ratio, G)
        if V >= G:
            x = self.blocks(tokens, key_mask=jnp.logical_not(mask),
                            deterministic=not train)
            return x, mask, center, inds
        order = jnp.argsort(mask, axis=-1, stable=True)   # visible-first
        vis_idx = order[:, :V]
        pt = jnp.take_along_axis(tokens, vis_idx[:, :, None], axis=1)
        num_vis = jnp.sum(jnp.logical_not(mask), axis=-1)
        slot_valid = jnp.arange(V)[None, :] < num_vis[:, None]
        x = self.blocks(pt, key_mask=slot_valid, deterministic=not train)
        x = jnp.where(slot_valid[..., None], x, jnp.zeros((), x.dtype))
        full = jnp.zeros((B, G, x.shape[-1]), x.dtype)
        full = full.at[jnp.arange(B)[:, None], vis_idx].set(x)
        return full, mask, center, inds


@MODELS.register_module()
class PointCAE_transformer_fc_global_fc_local_3detr(_Detr3Base):
    """FC global + FC local heads over the 3detr backbone
    (PointCAE_transformer.py:1790-1991)."""

    def setup(self):
        t = self.tcfg
        G = self.config["num_group"]
        S = self.config["group_size"]
        self.pre_encoder = DetrPreEncoder(G, S, t["encoder_dims"],
                                          name="pre_encoder")
        self.blocks = DetrEncoder(t["trans_dim"], t["depth"], t["num_heads"],
                                  name="blocks")
        self.decoder_pos_embed = PosEmbedMLP(t["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = self._make_decoder()
        self.mask_token = self._make_mask_token()
        # Linear(dim,512)-ReLU-Linear(512,512)-ReLU-Linear(512, 3*G)
        # (:1838-1845), unlike the PointViT heads' 1024-wide stacks
        self.coarse_pred = MLP((512, 512, 3 * G), name="coarse_pred")
        self.increase_dim = nn.Dense(3 * S, name="increase_dim")
        self.loss_fn = _masked_loss_fn(self.config.get("loss", "cdl2"))
        self.global_loss_fn = build_loss_func(self.config.get("loss", "cdl2"))

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        # corruption on the raw cloud (DummyGroup semantics): the
        # pre-encoder groups the corrupted input directly
        src = corrupted[..., :3] if train else pts
        x_vis, mask, center, inds = self._encode_3detr(src, train)
        B, G = mask.shape
        S = self.config["group_size"]

        # reconstruction targets come from the CLEAN cloud at the same FPS
        # indices (center_real, :1884-1888): corrupted in, clean out
        center_real = gather_points(pts, inds)
        nidx = ball_query(0.2, S, pts, center_real)
        gt_patches = (group_points(pts, nidx)
                      - center_real[:, :, None, :]) / 0.2   # normalize_xyz

        gfeat = self._global_feature(x_vis, mask)
        coarse = self.coarse_pred(gfeat).reshape(B, -1, 3)
        loss2 = self.global_loss_fn(coarse, center_real)

        x_full = jnp.where(mask[..., None], self.mask_token, x_vis)
        x_rec = self.MAE_decoder(x_full,
                                 self.decoder_pos_embed(center_real),
                                 deterministic=not train)
        # masked-only local reconstruction, packed to the static capacity
        w, x_m, gt_m = self._pack_local(mask, x_rec, gt_patches)
        rebuild = self.increase_dim(x_m).reshape(-1, S, 3)
        loss1 = self.loss_fn(rebuild, gt_m.reshape(-1, S, 3), w)
        return loss1, loss2

    def encode(self, pts: Array, train: bool = False) -> Array:
        _, tokens, _ = self.pre_encoder(pts[..., :3], train=train)
        x = self.blocks(tokens, deterministic=not train)
        return jnp.max(x, axis=1) + jnp.mean(x, axis=1)


@MODELS.register_module()
class PointCAE_transformer_fc_global_fc_local_3detr_encodernope(
        PointCAE_transformer_fc_global_fc_local_3detr):
    """Registered alias: the reference class body at
    PointCAE_transformer.py:1993-2198 is byte-identical to the base class at
    :1790-1991 (only the class name differs — the 'nope' distinction lives in
    the experiment configs); the 3detr encoder is PE-free in both."""
