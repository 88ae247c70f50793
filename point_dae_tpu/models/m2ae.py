"""Point-M2AE hierarchical transformer family
(reference: models/Point_M2AE.py:17-1280, modules Point_M2AE_modules.py:53-371).

Pyramid of FPS+kNN groupings (e.g. 512x16 -> 256x8 -> 64x8); masking is drawn
at the coarsest scale and back-propagated (a finer token is visible iff it
belongs to any visible coarse group, Point_M2AE.py:110-121); each encoder
scale token-merges the previous scale's features through the kNN indices;
decoding walks back down with mask tokens + 3-NN feature propagation and
reconstructs the mid-scale masked patches.

Static-shape TPU re-design: the reference pads each batch row to the longest
visible sequence and carries per-row attention masks (Point_M2AE.py:135-160);
here all tokens stay in place with a visibility key-mask — same math, no
ragged machinery, one compilation. The optional local-radius attention mask
(local_att_mask, :91-98) is supported as a pairwise allowed-mask (note: in
reference pretraining the radius mask is effectively disabled — the mask_vis
multiply zeroes it, :147-151 — so pretraining here also leaves it off).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..data.corruptions_patch import corrupt_patches_multi
from ..losses import chamfer_l2, masked_chamfer_l2
from ..ops import (furthest_point_sample, gather_points, group_points,
                   knn, three_interpolate, three_nn)
from ..utils.registry import MODELS
from .layers import MLP, TransformerBlock
from .transformer import sample_patch_mask, static_num_masked

Array = jax.Array


def pyramid_group(pts: Array, num_groups, group_sizes):
    """Multi-scale FPS+kNN pyramid (Point_M2AE.py:245-262). Returns lists of
    centered neighborhoods (B, G_i, S_i, 3), centers (B, G_i, 3), and kNN
    indices (B, G_i, S_i) into the previous scale's centers."""
    neighborhoods, centers, idxs = [], [], []
    src = pts
    for G, S in zip(num_groups, group_sizes):
        fps_idx = furthest_point_sample(src, G)
        center = gather_points(src, fps_idx)
        _, idx = knn(center, src, S)
        neigh = group_points(src, idx) - center[:, :, None, :]
        neighborhoods.append(neigh)
        centers.append(center)
        idxs.append(idx)
        src = center
    return neighborhoods, centers, idxs


def backprop_mask(vis_coarse: Array, idx: Array, g_fine: int) -> Array:
    """Multi-scale mask back-propagation (Point_M2AE.py:110-121): fine token j
    is visible iff it is a member of any *visible* coarse group."""
    B = vis_coarse.shape[0]
    vis = jnp.zeros((B, g_fine), bool)
    member_vis = jnp.broadcast_to(vis_coarse[:, :, None], idx.shape)
    return vis.at[jnp.arange(B)[:, None, None], idx].max(member_vis)


class TokenEmbed(nn.Module):
    """Mini-PointNet token embedding with the reference's width rule
    (Token_Embed, Point_M2AE_modules.py:169-215): for 3-channel input the
    PatchEncoder wiring (3->128->256 | 512->512->out); for merged-feature
    input (in_c > 3) the in_c-preserving wiring
    (in_c->in_c->in_c | 2*in_c->out->out). Matching these widths exactly is
    what lets reference M2AE checkpoints convert layer-for-layer."""
    out_c: int

    @nn.compact
    def __call__(self, groups: Array, train: bool = True) -> Array:
        B, G, S, C = groups.shape
        x = groups.reshape(B * G, S, C)
        if C == 3:
            w1, w2, w3 = 128, 256, 512
        else:
            w1, w2, w3 = C, C, self.out_c
        h = nn.Dense(w1, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Dense(w2, name="conv2")(h)
        g = jnp.max(h, axis=1, keepdims=True)
        h = jnp.concatenate([jnp.broadcast_to(g, h.shape), h], axis=-1)
        h = nn.Dense(w3, name="conv3")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Dense(self.out_c, name="conv4")(h)
        return jnp.max(h, axis=1).reshape(B, G, self.out_c)


class EncoderStage(nn.Module):
    """Token embed/merge + ViT blocks at one pyramid scale
    (H_Encoder, Point_M2AE.py:17-181)."""
    dim: int
    depth: int
    num_heads: int
    drop_path_rates: Tuple[float, ...]

    @nn.compact
    def __call__(self, tokens: Array, pos: Array, vis: Array,
                 attn_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        from .layers import _stack_dp_masks

        x = tokens
        key_mask = vis
        dp = _stack_dp_masks(self, list(self.drop_path_rates), x.shape[0],
                             deterministic)
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.num_heads,
                                 drop_path_rate=self.drop_path_rates[i],
                                 name=f"block{i}")(
                x + pos, key_mask=key_mask, attn_mask=attn_mask,
                deterministic=deterministic,
                dp_masks=None if dp is None else dp[i])
        return x


class HEncoder(nn.Module):
    """Hierarchical encoder over the pyramid; returns per-scale normed
    features (full-length, garbage at masked slots) and per-scale masks.

    Quirk parity — ``local_radius``: the reference computes a
    radius-attention mask but combines it with the validity mask by
    MULTIPLICATION (``mask_radius * mask_vis``, Point_M2AE.py:158-162),
    which zeroes it wherever tokens are valid — its own comment notes the
    step "would not change mask_vis". The knob is therefore inert in the
    reference's pretraining path, and we intentionally do not apply it."""
    encoder_dims: Tuple[int, ...]
    encoder_depths: Tuple[int, ...]
    num_heads: int
    drop_path_rate: float
    mask_ratio: float
    # True = embed ALL groups at the coarsest stage before gathering visible
    # (the reference's exact dataflow, Point_M2AE.py:126-133: TokenEmbed BN
    # statistics over all G). False (default) = embed only the packed
    # visible subset; bounded by tests/test_bn_subset_bound.py
    embed_all: bool = False

    def setup(self):
        n = len(self.encoder_dims)
        self.token_embeds = [TokenEmbed(self.encoder_dims[i],
                                        name=f"token_embed{i}")
                             for i in range(n)]
        self.pos_embeds = [MLP((self.encoder_dims[i], self.encoder_dims[i]),
                               act=nn.gelu, name=f"pos_embed{i}")
                           for i in range(n)]
        total = sum(self.encoder_depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        stages, norms, c = [], [], 0
        for i in range(n):
            stages.append(EncoderStage(
                self.encoder_dims[i], self.encoder_depths[i], self.num_heads,
                tuple(dpr[c:c + self.encoder_depths[i]]), name=f"stage{i}"))
            norms.append(nn.LayerNorm(name=f"norm{i}"))
            c += self.encoder_depths[i]
        self.stages = stages
        self.norms = norms

    def __call__(self, neighborhoods: List[Array], centers: List[Array],
                 idxs: List[Array], noaug: bool = False, train: bool = True):
        n = len(neighborhoods)
        B = neighborhoods[0].shape[0]
        # coarsest-scale mask, then back-propagate visibility to finer scales
        if noaug:
            mask_top = jnp.zeros(centers[-1].shape[:2], bool)
        else:
            mask_top = sample_patch_mask(self.make_rng("mask"), B,
                                         centers[-1].shape[1],
                                         self.mask_ratio, rand_ratio=False)
        vis_list = [None] * n
        vis_list[-1] = jnp.logical_not(mask_top)
        for i in range(n - 1, 0, -1):
            vis_list[i - 1] = backprop_mask(vis_list[i], idxs[i],
                                            centers[i - 1].shape[1])

        feats = []
        x_carry = None
        for i in range(n):
            if i == 0:
                embed_in = neighborhoods[i]
            else:
                # token merging: gather previous-scale features by kNN idx
                embed_in = group_points(x_carry, idxs[i])    # (B, G_i, S_i, C)

            # Coarsest stage: the top mask has a FIXED count
            # (floor(ratio*G), rand_ratio=False), so like the reference's
            # gathered visible run the embed + blocks can pack down to the
            # V visible tokens (static shape). Finer scales have
            # data-dependent visible counts (back-propagated membership) and
            # stay in-place with the key-mask. x_carry is never consumed
            # after the last stage, and decoder consumers read feats only
            # through where(vis, ...), so zeros at masked slots are exact.
            # Documented approximation (same as MaskTransformerEncoder's
            # packed patch embed): the reference embeds ALL G groups before
            # gathering visible (Point_M2AE.py:126-133), so TokenEmbed's
            # BatchNorm batch statistics here come from the ~V-group random
            # subset instead of all G — small and unbiased under uniform
            # masking, but not bitwise reference-equal at train time.
            G_i = centers[i].shape[1]
            V = G_i - static_num_masked(self.mask_ratio, G_i)
            if i == n - 1 and not noaug and V < G_i:
                vis = vis_list[i]
                order = jnp.argsort(jnp.logical_not(vis), axis=-1,
                                    stable=True)             # visible-first
                vis_idx = order[:, :V]
                if self.embed_all:
                    tok_all = self.token_embeds[i](embed_in, train=train)
                    tokens = jnp.take_along_axis(tok_all,
                                                 vis_idx[:, :, None], axis=1)
                else:
                    pe = jnp.take_along_axis(embed_in,
                                             vis_idx[:, :, None, None],
                                             axis=1)
                    tokens = self.token_embeds[i](pe, train=train)
                pos = self.pos_embeds[i](
                    jnp.take_along_axis(centers[i], vis_idx[:, :, None], 1))
                # guard against any count drift: padding slots (beyond the
                # true visible count) are excluded as attention keys, same
                # as MaskTransformerEncoder's packed path
                num_vis = jnp.sum(vis, axis=-1)
                slot_valid = jnp.arange(V)[None, :] < num_vis[:, None]
                x = self.stages[i](tokens, pos, slot_valid,
                                   deterministic=not train)
                x = self.norms[i](x)
                x = jnp.where(slot_valid[..., None], x,
                              jnp.zeros((), x.dtype))
                full = jnp.zeros((B, G_i, x.shape[-1]), x.dtype)
                feats.append(full.at[jnp.arange(B)[:, None], vis_idx].set(x))
            else:
                tokens = self.token_embeds[i](embed_in, train=train)
                pos = self.pos_embeds[i](centers[i])
                x = self.stages[i](tokens, pos, vis_list[i],
                                   deterministic=not train)
                # visible slots carry encoded features onward; masked slots
                # keep their raw embedding (Point_M2AE.py:176-178)
                x_carry = jnp.where(vis_list[i][..., None], x, tokens)
                feats.append(self.norms[i](x))
        masks = [jnp.logical_not(v) for v in vis_list]
        return feats, masks


class DecoderStage(nn.Module):
    dim: int
    depth: int
    num_heads: int
    drop_path_rates: Tuple[float, ...]

    @nn.compact
    def __call__(self, x: Array, pos: Array, deterministic: bool = True):
        from .layers import _stack_dp_masks

        dp = _stack_dp_masks(self, list(self.drop_path_rates), x.shape[0],
                             deterministic)
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.num_heads,
                                 drop_path_rate=self.drop_path_rates[i],
                                 name=f"block{i}")(
                x + pos, deterministic=deterministic,
                dp_masks=None if dp is None else dp[i])
        return x


class _M2AEBase(nn.Module):
    config: dict

    @property
    def scales(self):
        return len(self.config["num_groups"])

    def _make_encoder(self):
        c = self.config
        return HEncoder(tuple(c["encoder_dims"]), tuple(c["encoder_depths"]),
                        c["num_heads"], c.get("drop_path_rate", 0.1),
                        c.get("mask_ratio", 0.8),
                        embed_all=bool(c.get("embed_all_groups", False)),
                        name="h_encoder")

    def _group(self, pts):
        return pyramid_group(pts, self.config["num_groups"],
                             self.config["group_sizes"])

    def encode(self, pts: Array, train: bool = False) -> Array:
        """SVM feature (Point_M2AE_SVMFeature, Point_M2AE.py:1080-1170):
        mean+max of the coarsest-scale features with no masking."""
        neighborhoods, centers, idxs = self._group(pts[..., :3])
        feats, _ = self.h_encoder(neighborhoods, centers, idxs, noaug=True,
                                  train=train)
        x = feats[-1]
        return jnp.mean(x, axis=1) + jnp.max(x, axis=1)


class TokenProp(nn.Module):
    """Token propagation between decoder scales: the reference's
    PointNetFeaturePropagation fuse + residual-extraction stack
    (Point_M2AE_modules.py:53-123 with kernel=1, groups=1,
    res_expansion=1): ConvBNGELU fuse, then ``blocks`` x
    (ConvBNGELU -> ConvBN) residual units with a GELU on the sum."""
    out_c: int
    blocks: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name)(h)

        # exact (erf) GELU: torch nn.GELU's default, which the reference uses
        gelu = lambda h: nn.gelu(h, approximate=False)
        h = gelu(bn(nn.Dense(self.out_c, name="fuse_conv")(x), "fuse_bn"))
        for j in range(self.blocks):
            r = gelu(bn(nn.Dense(self.out_c, name=f"res{j}_conv1")(h),
                        f"res{j}_bn1"))
            r = bn(nn.Dense(self.out_c, name=f"res{j}_conv2")(r),
                   f"res{j}_bn2")
            h = gelu(r + h)
        return h


class _M2AEDecoderMixin:
    """Shared hierarchical decoder + mid-scale reconstruction."""

    def _setup_decoder(self):
        c = self.config
        ddims = tuple(c["decoder_dims"])
        ddepths = tuple(c["decoder_depths"])
        total = sum(ddepths)
        dpr = [c.get("drop_path_rate", 0.1) * i / max(total - 1, 1)
               for i in range(total)]
        self.mask_token = self.param(
            "mask_token", nn.initializers.truncated_normal(0.02),
            (1, 1, ddims[0]))
        stages, pos_embeds, props, cnt = [], [], [], 0
        for i in range(len(ddims)):
            stages.append(DecoderStage(ddims[i], ddepths[i], c["num_heads"],
                                       tuple(dpr[cnt:cnt + ddepths[i]]),
                                       name=f"h_decoder{i}"))
            pos_embeds.append(MLP((ddims[i], ddims[i]), act=nn.gelu,
                                  name=f"decoder_pos_embed{i}"))
            if i > 0:
                up = c.get("decoder_up_blocks", [1] * (len(ddims) - 1))
                props.append(TokenProp(ddims[i], blocks=int(up[i - 1]),
                                       name=f"token_prop{i - 1}"))
            cnt += ddepths[i]
        self.h_decoder = stages
        self.decoder_pos_embeds = pos_embeds
        self.token_props = props
        self.decoder_norm = nn.LayerNorm(name="decoder_norm")
        self.rec_head = nn.Dense(3 * c["group_sizes"][0], name="rec_head")

    def _decode_and_rec(self, feats, masks, centers, neighborhoods, train):
        """Reverse-order decode (Point_M2AE.py:270-325): coarse -> fine with
        mask tokens at the top and 3-NN token propagation between scales."""
        c = self.config
        n = self.scales
        rc = list(reversed(centers))
        rn = list(reversed(neighborhoods))
        rf = list(reversed(feats))
        rm = list(reversed(masks))

        x_full = None
        for i in range(len(c["decoder_dims"])):
            center = rc[i]
            vis = jnp.logical_not(rm[i])[..., None]
            if i == 0:
                x_full = jnp.where(vis, rf[i], self.mask_token)
            else:
                x_full_en = jnp.where(vis, rf[i], 0.0)
                dist, idx3 = three_nn(center, rc[i - 1])
                interp = three_interpolate(x_full, idx3, dist)
                x_full = self.token_props[i - 1](
                    jnp.concatenate([x_full_en, interp], -1), train=train)
            pos = self.decoder_pos_embeds[i](center)
            x_full = self.h_decoder[i](x_full, pos, deterministic=not train)

        x_full = self.decoder_norm(x_full)
        # reconstruct at the last DECODED scale: the reference runs n-1
        # decoder stages and rebuilds neighborhoods[-2] (the second-finest
        # scale) with masks[-2] (Point_M2AE.py:276-321); pairing the target
        # with the decoded scale index generalizes to any decoder depth
        last = len(c["decoder_dims"]) - 1
        B, G, _ = x_full.shape
        S = rn[last].shape[2]
        rec = self.rec_head(x_full).reshape(B * G, -1, 3)
        gt = rn[last].reshape(B * G, S, 3)
        w = rm[last].astype(jnp.float32).reshape(-1)
        return masked_chamfer_l2(rec, gt, w)


@MODELS.register_module()
class Point_M2AE(_M2AEBase, _M2AEDecoderMixin):
    """Hierarchical MAE (Point_M2AE.py:184-325)."""

    def setup(self):
        self.h_encoder = self._make_encoder()
        self._setup_decoder()

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        neighborhoods, centers, idxs = self._group(pts)
        feats, masks = self.h_encoder(neighborhoods, centers, idxs,
                                      train=train)
        loss = self._decode_and_rec(feats, masks, centers, neighborhoods,
                                    train)
        return loss, jnp.zeros(())


@MODELS.register_module()
class Point_MDAE_with_fc_center_p(_M2AEBase, _M2AEDecoderMixin):
    """M2AE + joint affine corruption of all pyramid scales + per-scale
    FC global-shape heads on pooled features (Point_M2AE.py:691-884):
    returns (masked local rec loss, sum of per-scale center chamfers)."""

    @property
    def patch_corrupt_type(self):
        return tuple(self.config.get("corrupt_type", ()))

    def setup(self):
        c = self.config
        self.h_encoder = self._make_encoder()
        self._setup_decoder()
        preds = []
        for i, G in enumerate(c["num_groups"]):
            preds.append(MLP((1024, 1024, 3 * G), name=f"coarse_pred_{i}"))
        self.coarse_preds = preds

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        c = self.config
        pts = clean[..., :3]
        neighborhoods, centers, idxs = self._group(pts)
        abs_neighs = [n + ctr[:, :, None, :]
                      for n, ctr in zip(neighborhoods, centers)]
        if train:
            t_neighs, t_centers = corrupt_patches_multi(
                self.make_rng("corrupt"), abs_neighs, centers,
                self.patch_corrupt_type)
        else:
            t_neighs, t_centers = abs_neighs, centers
        t_neighs = [n - ctr[:, :, None, :]
                    for n, ctr in zip(t_neighs, t_centers)]

        feats, masks = self.h_encoder(t_neighs, t_centers, idxs, train=train)

        # per-scale global heads: pooled visible feature -> GT centers.
        # Documented deviation (Point_M2AE.py:443-453): the reference pools
        # over the batch-max PADDED visible buffer, whose pad rows are
        # encoder OUTPUTS of zero-injected queries — batch-composition-
        # dependent phantom features that also skew the mean's divisor to
        # maxV. That artifact is not replicable (it depends on the dynamic
        # pad widths of each batch), so we pool exactly over each row's
        # true visible tokens instead.
        loss_global = jnp.zeros(())
        for i in range(self.scales):
            vis = jnp.logical_not(masks[i])[..., None]
            x = feats[i]
            cnt = jnp.maximum(jnp.sum(vis, 1), 1.0)
            g = jnp.max(jnp.where(vis, x, -1e9), 1) + \
                jnp.sum(jnp.where(vis, x, 0.0), 1) / cnt
            coarse = self.coarse_preds[i](g).reshape(g.shape[0], -1, 3)
            loss_global = loss_global + chamfer_l2(coarse, centers[i])

        loss_local = self._decode_and_rec(feats, masks, centers,
                                          neighborhoods, train)
        return loss_local, loss_global


@MODELS.register_module()
class Point_M2AE_SVMFeature(_M2AEBase):
    """Frozen-feature extractor (Point_M2AE.py:1080-1170)."""

    def setup(self):
        self.h_encoder = self._make_encoder()

    def __call__(self, pts: Array, train: bool = False) -> Array:
        return self.encode(pts, train=train)


@MODELS.register_module()
class Point_M2AE_Finetune(_M2AEBase):
    """Classification head on the coarsest pooled feature
    (Point_M2AE.py:1172-1280)."""

    def setup(self):
        from .transformer import _FinetuneHead

        c = self.config
        self.h_encoder = self._make_encoder()
        self.head = _FinetuneHead((256, 256), c.get("cls_dim", 40),
                                  name="cls_head_finetune")

    def __call__(self, pts: Array, train: bool = True) -> Array:
        feat = self.encode(pts, train=train)
        return self.head(feat, train)


@MODELS.register_module()
class Point_M2AE_with_fc_center_p(Point_MDAE_with_fc_center_p):
    """M2AE + per-scale FC global-shape heads, no affine corruption
    (Point_M2AE.py:327-509): identical to the MDAE variant with the joint
    affine disabled."""

    @property
    def patch_corrupt_type(self):
        return ()


@MODELS.register_module()
class Point_M2AE_with_fc_center_p_v1(Point_MDAE_with_fc_center_p):
    """v1 flavour (Point_M2AE.py:510-689): same heads, per-scale losses
    summed (kept identical here; the reference differs only in head widths)."""

    @property
    def patch_corrupt_type(self):
        return ()


@MODELS.register_module()
class Point_MDAE_with_fc_center_p_v1(Point_MDAE_with_fc_center_p):
    """Corrupted v1 flavour (Point_M2AE.py:886-1078)."""
