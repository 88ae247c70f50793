"""Point-MlMAE: multi-level masked autoencoder ablation
(reference: models/Point_MlMAE.py:347-718).

The encoder exposes intermediate features (blocks 4/8/12); the decoder's
per-block outputs are supervised against the *unmasked* encoder's features at
the masked positions (stop-gradient teacher pass), in addition to the point
reconstruction from the final decoder block. ``feat_loss`` selects which
levels participate ('high3'/'high2'/'high1'/'high0' for encoder levels
12/8/4/patch-embed, Point_MlMAE.py:430-443).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..losses import masked_chamfer_l2
from ..ops import group_neighborhood
from ..utils.registry import MODELS
from .layers import PatchEncoder, PosEmbedMLP, TransformerBlock
from .transformer import (_CAETransformerBase, sample_block_mask,
                          sample_patch_mask, static_num_masked)

Array = jax.Array


class _MlEncoder(nn.Module):
    """ViT encoder returning per-level features (blocks at fetch_idx)."""
    trans_dim: int
    depth: int
    num_heads: int
    encoder_dims: int
    drop_path_rate: float
    mask_ratio: float
    rand_ratio: bool
    mask_type: str = "rand"
    fetch_idx: Tuple[int, ...] = (3, 7, 11)

    def setup(self):
        self.patch_embed = PatchEncoder(self.encoder_dims, name="encoder")
        self.pos_embed = PosEmbedMLP(self.trans_dim, name="pos_embed")
        self.inner = [TransformerBlock(
            self.trans_dim, self.num_heads,
            drop_path_rate=self.drop_path_rate * i / max(self.depth - 1, 1),
            name=f"block{i}") for i in range(self.depth)]
        self.norm = nn.LayerNorm(name="norm")

    def __call__(self, neighborhood, center, noaug: bool = False,
                 train: bool = True):
        B, G = neighborhood.shape[:2]
        if noaug:
            tokens = self.patch_embed(neighborhood, train=train)
            pos = self.pos_embed(center)
            x = tokens
            feats: List[Array] = []
            for i, block in enumerate(self.inner):
                x = block(x + pos, deterministic=not train)
                if i in self.fetch_idx:
                    feats.append(self.norm(x))
            return feats, jnp.zeros((B, G), bool), tokens

        if self.mask_type == "block":
            # block masking always uses the fixed ratio (rand_ratio is a
            # rand-mask-only knob, Point_MlMAE.py:318-321 via Point_MAE's
            # _mask_center_block)
            mask = sample_block_mask(self.make_rng("mask"), center,
                                     self.mask_ratio)
        else:
            mask = sample_patch_mask(self.make_rng("mask"), B, G,
                                     self.mask_ratio, self.rand_ratio)
        min_ratio = self.mask_ratio if self.mask_type == "block" else \
            (0.5 if self.rand_ratio else self.mask_ratio)
        V = G - static_num_masked(min_ratio, G)
        if V >= G:                      # nothing masked statically
            tokens = self.patch_embed(neighborhood, train=train)
            pos = self.pos_embed(center)
            vis = jnp.logical_not(mask)
            x = tokens
            feats = []
            for i, block in enumerate(self.inner):
                x = block(x + pos, key_mask=vis, deterministic=not train)
                if i in self.fetch_idx:
                    feats.append(self.norm(x))
            return feats, mask, tokens

        # masked path: pack to the static visible capacity (same design as
        # MaskTransformerEncoder); every returned tensor scatters back to
        # the all-G layout with zeros at masked slots — all consumers are
        # mask-aware (feats only read through where(mask, ...), student
        # tokens unused; XLA DCEs unconsumed scatters). Documented
        # approximation: PatchEncoder BatchNorm batch stats are computed
        # over the ~V visible patches instead of all G (see
        # MaskTransformerEncoder for details).
        order = jnp.argsort(mask, axis=-1, stable=True)   # visible-first
        vis_idx = order[:, :V]
        pn = jnp.take_along_axis(neighborhood, vis_idx[:, :, None, None], 1)
        pc = jnp.take_along_axis(center, vis_idx[:, :, None], 1)
        tokens = self.patch_embed(pn, train=train)        # (B, V, C)
        pos = self.pos_embed(pc)
        num_vis = jnp.sum(jnp.logical_not(mask), axis=-1)
        slot_valid = jnp.arange(V)[None, :] < num_vis[:, None]
        rows = jnp.arange(B)[:, None]

        def scatter(z):
            z = jnp.where(slot_valid[..., None], z, jnp.zeros((), z.dtype))
            return jnp.zeros((B, G, z.shape[-1]), z.dtype).at[
                rows, vis_idx].set(z)

        x = tokens
        feats = []
        for i, block in enumerate(self.inner):
            x = block(x + pos, key_mask=slot_valid, deterministic=not train)
            if i in self.fetch_idx:
                feats.append(scatter(self.norm(x)))
        return feats, mask, scatter(tokens)


class _MlDecoder(nn.Module):
    """Decoder returning every block's output (Point_MlMAE decoder)."""
    trans_dim: int
    depth: int
    num_heads: int
    drop_path_rate: float

    def setup(self):
        self.inner = [TransformerBlock(
            self.trans_dim, self.num_heads,
            drop_path_rate=self.drop_path_rate * i / max(self.depth - 1, 1),
            name=f"block{i}") for i in range(self.depth)]
        self.norm = nn.LayerNorm(name="norm")

    def __call__(self, x, pos, train: bool = True):
        outs = []
        for block in self.inner:
            x = block(x + pos, deterministic=not train)
            outs.append(self.norm(x))
        return outs


@MODELS.register_module()
class Point_MlMAE(_CAETransformerBase):
    """Multi-level MAE (Point_MlMAE.py:347-520)."""

    @property
    def masked_mode(self) -> bool:
        return True

    def setup(self):
        t = self.tcfg
        self.MAE_encoder = _MlEncoder(
            trans_dim=t["trans_dim"], depth=t["depth"],
            num_heads=t["num_heads"], encoder_dims=t["encoder_dims"],
            drop_path_rate=t.get("drop_path_rate", 0.1),
            mask_ratio=t.get("mask_ratio", 0.6),
            rand_ratio=str(t.get("rand_ratio", "False")) == "True",
            mask_type=t.get("mask_type", "rand"),
            name="MAE_encoder")
        self.decoder_pos_embed = PosEmbedMLP(t["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = _MlDecoder(
            t["trans_dim"], t["decoder_depth"], t["decoder_num_heads"],
            t.get("drop_path_rate", 0.1), name="MAE_decoder")
        self.mask_token = self._make_mask_token()
        self.increase_dim = nn.Dense(3 * self.config["group_size"],
                                     name="increase_dim")

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        G, S = self.config["num_group"], self.config["group_size"]
        neigh, center = group_neighborhood(pts, G, S)
        feats, mask, tokens = self.MAE_encoder(neigh, center, train=train)
        # teacher pass (unmasked), stop-gradient (Point_MlMAE.py:408-410)
        t_feats, _, t_tokens = self.MAE_encoder(neigh, center, noaug=True,
                                                train=False)
        t_feats = jax.lax.stop_gradient(t_feats)
        t_tokens = jax.lax.stop_gradient(t_tokens)

        x_full = jnp.where(mask[..., None], self.mask_token, feats[-1])
        pos = self.decoder_pos_embed(center)
        outs = self.MAE_decoder(x_full, pos, train=train)

        B = pts.shape[0]
        rebuild = self.increase_dim(outs[-1]).reshape(B * G, S, 3)
        gt = neigh.reshape(B * G, S, 3)
        w = mask.astype(jnp.float32).reshape(-1)
        loss1 = masked_chamfer_l2(rebuild, gt, w)

        # per-level masked feature MSE (selectable via feat_loss)
        feat_loss_cfg = tuple(self.config.get("feat_loss", ()))
        wm = mask.astype(jnp.float32)[..., None]
        denom = jnp.maximum(jnp.sum(wm), 1e-8)

        def mse(a, b):
            return jnp.sum(((a - b) ** 2) * wm) / denom

        loss_feat = jnp.zeros(())
        # teacher-level index per loss name; resolved lazily so shallow
        # (depth < 12) configs with fewer fetched levels only fail if a
        # missing level is actually requested
        targets = {"high3": (2, 0), "high2": (1, 1),
                   "high1": (0, 2), "high0": (None, 3)}
        for name, (lvl, dec_idx) in targets.items():
            if name in feat_loss_cfg and dec_idx < len(outs):
                tgt = t_tokens if lvl is None else t_feats[lvl]
                loss_feat = loss_feat + mse(tgt, outs[dec_idx])
        return loss1, loss_feat

    def encode(self, pts: Array, train: bool = False) -> Array:
        """Global feature for SVM probes: the base-class encode unpacks a
        2-tuple but _MlEncoder returns (feats, mask, tokens), so override
        with max+mean (summed) of the last fetched level — the base-class
        pooling used by every other family's probe. (The finetune head
        pools the same level but CONCATenates max and mean instead.)"""
        G, S = self.config["num_group"], self.config["group_size"]
        neigh, center = group_neighborhood(pts[..., :3], G, S)
        feats, _, _ = self.MAE_encoder(neigh, center, noaug=True, train=train)
        x = feats[-1]
        return jnp.max(x, axis=1) + jnp.mean(x, axis=1)


@MODELS.register_module()
class PointTransformerMlMAE(nn.Module):
    """Classification fine-tune on the MlMAE encoder's last level
    (Point_MlMAE.py:467-597): concat(max, mean) pooled -> cls head."""
    config: dict

    def setup(self):
        from .transformer import _FinetuneHead

        t = self.config["transformer_config"] \
            if "transformer_config" in self.config else self.config
        self.MAE_encoder = _MlEncoder(
            trans_dim=t["trans_dim"], depth=t["depth"],
            num_heads=t["num_heads"], encoder_dims=t["encoder_dims"],
            drop_path_rate=t.get("drop_path_rate", 0.1),
            mask_ratio=0.0, rand_ratio=False, name="MAE_encoder")
        self.head = _FinetuneHead((256, 256), self.config.get("cls_dim", 40),
                                  name="cls_head_finetune")

    def _feat(self, pts, train):
        from ..ops import group_neighborhood

        G, S = self.config["num_group"], self.config["group_size"]
        neigh, center = group_neighborhood(pts[..., :3], G, S)
        feats, _, _ = self.MAE_encoder(neigh, center, noaug=True, train=train)
        x = feats[-1]
        return jnp.concatenate([jnp.max(x, 1), jnp.mean(x, 1)], -1)

    def __call__(self, pts, train: bool = True):
        return self.head(self._feat(pts, train), train)

    def encode(self, pts, train: bool = False):
        return self._feat(pts, train)


@MODELS.register_module()
class PointTransformerMlMAELinearClassification(PointTransformerMlMAE):
    """Linear probe flavour (Point_MlMAE.py:599-718)."""

    def setup(self):
        t = self.config["transformer_config"] \
            if "transformer_config" in self.config else self.config
        self.MAE_encoder = _MlEncoder(
            trans_dim=t["trans_dim"], depth=t["depth"],
            num_heads=t["num_heads"], encoder_dims=t["encoder_dims"],
            drop_path_rate=t.get("drop_path_rate", 0.1),
            mask_ratio=0.0, rand_ratio=False, name="MAE_encoder")
        self.head = nn.Dense(self.config.get("cls_dim", 40), name="cls")

    def __call__(self, pts, train: bool = True):
        return self.head(self._feat(pts, train))
