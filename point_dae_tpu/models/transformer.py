"""Transformer-backbone Point-DAE models (reference: models/PointCAE_transformer.py)
and the Point-MAE-style fine-tune heads (models/Point_MAE.py:578-1092).

Static-shape MAE design (the key TPU departure from the reference): the mask
ratio is bounded (~U(0.5, 0.8) when rand_ratio), so visible tokens are packed
into a FIXED-capacity buffer (V = G - floor(min_ratio*G)) — patch embed and
the ViT blocks run only on visible tokens, like the reference's gathered run,
but every ratio compiles once; the few padding slots are excluded as
attention keys and zeroed on the scatter back to the all-G layout. The
decoder swaps masked positions for the learned mask token and attends over
all G tokens (matching the reference decoder over [visible ++ mask]), and
local reconstruction heads pack down to the masked-token capacity
(M = floor(max_ratio*G)) with zero-weight padding — exactly equal to mask-
weighted losses under the sum(w*per)/sum(w) normalization.

RNG streams: 'corrupt' (patch affine), 'mask' (patch masking), 'droppath',
'dropout'.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..data.corruptions_patch import corrupt_patches
from ..losses import build_loss_func, masked_chamfer_l1, masked_chamfer_l2
from ..ops import group_neighborhood
from ..utils.registry import MODELS
from .common import folding_grid
from .layers import (MLP, PatchEncoder, PosEmbedMLP, SplitMLP,
                     TransformerDecoder, TransformerEncoder)

Array = jax.Array


def _masked_loss_fn(loss_type: str):
    if loss_type == "cdl1":
        return masked_chamfer_l1
    if loss_type == "cdl2":
        return masked_chamfer_l2
    raise NotImplementedError(loss_type)


def static_num_masked(ratio: float, num_group: int) -> int:
    """Static mirror of sample_patch_mask's in-graph masked-token count.

    Both floors MUST agree, in the same float32 arithmetic: a Python-float64
    ``int(ratio * G)`` disagrees for legal configs (e.g. ratio=0.53, G=100:
    f32 floor is 53, f64 floor is 52), which would silently drop a visible
    token from the packed encoder buffer or leak a masked one in. Every
    static V/M capacity derives from this single function."""
    return int(np.floor(np.float32(ratio) * np.float32(num_group)))


def sample_patch_mask(key: jax.Array, batch: int, num_group: int,
                      mask_ratio: float, rand_ratio: bool) -> Array:
    """Random patch mask (MaskTransformer._mask_center_rand,
    PointCAE_transformer.py:395-422): if ``rand_ratio``, ratio ~ U(0.5, 0.8)
    drawn once per call; exactly int(ratio*G) patches masked per sample.

    The masked count is clamped to the static [min_ratio, max_ratio]
    capacities so packed encoders/decoders (which size their buffers with
    static_num_masked) can never over/under-flow by a float-rounding ulp."""
    k_ratio, k_perm = jax.random.split(key)
    if rand_ratio:
        ratio = jax.random.uniform(k_ratio, (), minval=0.5, maxval=0.8)
        lo = static_num_masked(0.5, num_group)
        hi = static_num_masked(0.8, num_group)
    else:
        ratio = jnp.float32(mask_ratio)
        lo = hi = static_num_masked(mask_ratio, num_group)
    num_mask = jnp.clip(jnp.floor(ratio * num_group).astype(jnp.int32),
                        lo, hi)
    r = jax.random.uniform(k_perm, (batch, num_group))
    order = jnp.argsort(r, axis=-1)
    rank = jnp.zeros((batch, num_group), jnp.int32).at[
        jnp.arange(batch)[:, None], order].set(
        jnp.arange(num_group, dtype=jnp.int32)[None])
    return rank < num_mask          # True = masked


def sample_block_mask(key: jax.Array, centers: Array,
                      mask_ratio: float) -> Array:
    """Block masking (MaskTransformer._mask_center_block,
    Point_MAE.py:273-299): pick a random seed patch per cloud and mask its
    int(ratio*G) nearest patch centers (the seed included). Count is static
    (fixed ratio), so the packed visible capacity V = G - count is exact."""
    B, G, _ = centers.shape
    num_mask = static_num_masked(mask_ratio, G)
    seed_idx = jax.random.randint(key, (B, 1, 1), 0, G)
    seed = jnp.take_along_axis(centers, seed_idx, axis=1)     # (B, 1, 3)
    d = jnp.sum((centers - seed) ** 2, axis=-1)               # (B, G)
    order = jnp.argsort(d, axis=-1)
    rank = jnp.zeros((B, G), jnp.int32).at[
        jnp.arange(B)[:, None], order].set(
        jnp.arange(G, dtype=jnp.int32)[None])
    return rank < num_mask          # True = masked


class MaskTransformerEncoder(nn.Module):
    """Patch embed + random/block masking + ViT encoder (MaskTransformer,
    PointCAE_transformer.py:304-469, PointViT arch; block masking from
    Point_MAE.py:273-299)."""
    trans_dim: int
    depth: int
    num_heads: int
    encoder_dims: int
    drop_path_rate: float = 0.1
    mask_ratio: float = 0.6
    rand_ratio: bool = True
    mask_type: str = "rand"
    dtype: object = None
    remat: bool = False   # rematerialize ViT blocks (memory-bound steps)
    residual_dtype: object = None  # bf16 residual stream (layers.py)
    # True = embed ALL G patches before gathering visible (the reference's
    # exact dataflow, PointCAE_transformer.py:440: PatchEncoder BN batch
    # statistics over all G). False (default) = embed only the packed
    # visible subset — fewer FLOPs; BN statistics over ~V random patches,
    # a small unbiased approximation bounded by tests/test_bn_subset_bound.py
    embed_all: bool = False

    def setup(self):
        self.patch_embed = PatchEncoder(self.encoder_dims, dtype=self.dtype,
                                        name="encoder")
        self.pos_embed = PosEmbedMLP(self.trans_dim, name="pos_embed")
        self.blocks = TransformerEncoder(self.trans_dim, self.depth,
                                         self.num_heads,
                                         drop_path_rate=self.drop_path_rate,
                                         dtype=self.dtype, remat=self.remat,
                                         residual_dtype=self.residual_dtype,
                                         name="blocks")
        self.norm = nn.LayerNorm(name="norm")

    def __call__(self, neighborhood: Array, center: Array,
                 noaug: bool = False, train: bool = True
                 ) -> Tuple[Array, Array]:
        B, G = neighborhood.shape[:2]
        if noaug:
            tokens = self.patch_embed(neighborhood, train=train)  # (B, G, C)
            pos = self.pos_embed(center)
            x = self.blocks(tokens, pos, deterministic=not train)
            return self.norm(x), jnp.zeros((B, G), bool)

        if self.mask_type == "block":
            mask = sample_block_mask(self.make_rng("mask"), center,
                                     self.mask_ratio)
        else:
            mask = sample_patch_mask(self.make_rng("mask"), B, G,
                                     self.mask_ratio, self.rand_ratio)
        # Static visible capacity: the mask ratio is >= min_ratio, so at most
        # V = G - floor(min_ratio*G) tokens are ever visible. Like the
        # reference (which gathers visible tokens into a shorter sequence,
        # PointCAE_transformer.py:426-437), patch embedding and the ViT
        # blocks run only on visible tokens — packed to a fixed-size buffer
        # so any U(0.5, 0.8) ratio compiles once. Masked-token embeddings are
        # never consumed downstream (the decoder swaps in the mask token), so
        # skipping them is exact per-token. One documented approximation:
        # the reference embeds ALL G patches before gathering
        # (PointCAE_transformer.py:440), so PatchEncoder's BatchNorm batch
        # statistics (and the running averages used at eval/noaug) are here
        # computed over the ~V-patch random subset instead of all G — a
        # small, unbiased difference since masking is uniform.
        # block masking always uses the fixed ratio (rand_ratio is a
        # rand-mask-only knob, Point_MAE.py:329-332)
        min_ratio = self.mask_ratio if self.mask_type == "block" else \
            (0.5 if self.rand_ratio else self.mask_ratio)
        V = G - static_num_masked(min_ratio, G)
        if V >= G:                      # nothing masked statically
            tokens = self.patch_embed(neighborhood, train=train)
            pos = self.pos_embed(center)
            x = self.blocks(tokens, pos, key_mask=jnp.logical_not(mask),
                            deterministic=not train)
            return self.norm(x), mask

        order = jnp.argsort(mask, axis=-1, stable=True)   # visible-first
        vis_idx = order[:, :V]                            # (B, V)
        pc = jnp.take_along_axis(center, vis_idx[:, :, None], axis=1)
        if self.embed_all:
            tokens_all = self.patch_embed(neighborhood, train=train)
            tokens = jnp.take_along_axis(tokens_all, vis_idx[:, :, None],
                                         axis=1)          # (B, V, C)
        else:
            pn = jnp.take_along_axis(neighborhood,
                                     vis_idx[:, :, None, None], axis=1)
            tokens = self.patch_embed(pn, train=train)    # (B, V, C)
        pos = self.pos_embed(pc)
        num_vis = jnp.sum(jnp.logical_not(mask), axis=-1)  # (B,)
        slot_valid = jnp.arange(V)[None, :] < num_vis[:, None]
        x = self.blocks(tokens, pos, key_mask=slot_valid,
                        deterministic=not train)
        x = self.norm(x)
        # Scatter back to all-G layout (contract: masked slots hold no
        # information — they are zeros here; consumers are mask-aware).
        x = jnp.where(slot_valid[..., None], x, jnp.zeros((), x.dtype))
        full = jnp.zeros((B, G, x.shape[-1]), x.dtype)
        full = full.at[jnp.arange(B)[:, None], vis_idx].set(x)
        return full, mask


class NormalTransformerEncoder(nn.Module):
    """No-masking variant (NormalTransformer, PointCAE_transformer.py:473-612)."""
    trans_dim: int
    depth: int
    num_heads: int
    encoder_dims: int
    drop_path_rate: float = 0.1
    dtype: object = None
    remat: bool = False
    residual_dtype: object = None

    def setup(self):
        self.patch_embed = PatchEncoder(self.encoder_dims, dtype=self.dtype,
                                        name="encoder")
        self.pos_embed = PosEmbedMLP(self.trans_dim, name="pos_embed")
        self.blocks = TransformerEncoder(self.trans_dim, self.depth,
                                         self.num_heads,
                                         drop_path_rate=self.drop_path_rate,
                                         dtype=self.dtype, remat=self.remat,
                                         residual_dtype=self.residual_dtype,
                                         name="blocks")
        self.norm = nn.LayerNorm(name="norm")

    def __call__(self, neighborhood: Array, center: Array,
                 train: bool = True) -> Array:
        tokens = self.patch_embed(neighborhood, train=train)
        pos = self.pos_embed(center)
        x = self.blocks(tokens, pos, deterministic=not train)
        return self.norm(x)


class _CAETransformerBase(nn.Module):
    """Shared flow of the PointCAE_transformer family (forward at
    PointCAE_transformer.py:675-742): re-group the clean cloud, apply the same
    batch-tensor affine to patches+centers, mask, decode with GT-center
    positional embeddings, reconstruct normalized local patches."""
    config: dict

    @property
    def tcfg(self):
        return self.config["transformer_config"]

    @property
    def compute_dtype(self):
        """Optional bf16 compute policy ('dtype': 'bf16' in transformer_config);
        params, residual stream, losses and geometry stay f32."""
        d = self.tcfg.get("dtype", self.config.get("dtype"))
        return jnp.bfloat16 if str(d) in ("bf16", "bfloat16") else None

    @property
    def corrupt_type(self) -> Tuple[str, ...]:
        return tuple(self.config.get("corrupt_type", ()))

    @property
    def masked_mode(self) -> bool:
        return "Drop-Patch" in self.corrupt_type

    @property
    def all_patch(self) -> bool:
        return str(self.config.get("all_patch", "False")) == "True"

    @property
    def residual_dtype(self):
        """Optional bf16 residual stream ('residual_dtype': 'bf16'): the
        (B, T, C) activations crossing every ViT block boundary — the
        flagship step's largest HBM bucket (tools/hbm_by_component.py) —
        are carried at bf16; the f32 LayerNorm after each stack restores
        f32 outputs. Off by default (parity mode is full f32)."""
        d = self.tcfg.get("residual_dtype")
        return jnp.bfloat16 if str(d) in ("bf16", "bfloat16") else None

    def _make_encoder(self):
        t = self.tcfg
        if self.masked_mode:
            return MaskTransformerEncoder(
                trans_dim=t["trans_dim"], depth=t["depth"],
                num_heads=t["num_heads"], encoder_dims=t["encoder_dims"],
                drop_path_rate=t.get("drop_path_rate", 0.1),
                mask_ratio=t.get("mask_ratio", 0.6),
                rand_ratio=str(t.get("rand_ratio", "False")) == "True",
                mask_type=t.get("mask_type", "rand"),
                embed_all=bool(t.get("embed_all_patches", False)),
                remat=bool(t.get("remat", False)),
                residual_dtype=self.residual_dtype,
                dtype=self.compute_dtype, name="MAE_encoder")
        return NormalTransformerEncoder(
            trans_dim=t["trans_dim"], depth=t["depth"],
            num_heads=t["num_heads"], encoder_dims=t["encoder_dims"],
            drop_path_rate=t.get("drop_path_rate", 0.1),
            remat=bool(t.get("remat", False)),
            residual_dtype=self.residual_dtype,
            dtype=self.compute_dtype, name="MAE_encoder")

    def _make_decoder(self):
        t = self.tcfg
        return TransformerDecoder(
            embed_dim=t["trans_dim"], depth=t["decoder_depth"],
            num_heads=t["decoder_num_heads"],
            drop_path_rate=t.get("drop_path_rate", 0.1),
            residual_dtype=self.residual_dtype,
            dtype=self.compute_dtype, name="MAE_decoder")

    def _group_and_corrupt(self, pts: Array, train: bool):
        """Returns (gt_neighborhood centered, center, transformed centered
        neighborhood, transformed center)."""
        G = self.config["num_group"]
        S = self.config["group_size"]
        neigh, center = group_neighborhood(pts, G, S)       # centered
        abs_neigh = neigh + center[:, :, None, :]
        if train:
            key = self.make_rng("corrupt")
            t_neigh, t_center = corrupt_patches(key, abs_neigh, center,
                                                self.corrupt_type)
        else:
            t_neigh, t_center = abs_neigh, center
        t_neigh = t_neigh - t_center[:, :, None, :]
        return neigh, center, t_neigh, t_center

    def _encode(self, t_neigh, t_center, train):
        if self.masked_mode:
            return self.MAE_encoder(t_neigh, t_center, train=train)
        x = self.MAE_encoder(t_neigh, t_center, train=train)
        return x, jnp.zeros(x.shape[:2], bool)

    def _make_mask_token(self):
        """Learned mask token (call from setup when masked_mode)."""
        return self.param("mask_token", nn.initializers.truncated_normal(0.02),
                          (1, 1, self.tcfg["trans_dim"]))

    def _decode(self, x_vis: Array, mask: Array, center: Array, train: bool) -> Array:
        """Swap masked slots for the mask token, add GT-center decoder pos
        embedding, run the decoder over all G tokens."""
        if self.masked_mode:
            x_full = jnp.where(mask[..., None], self.mask_token, x_vis)
        else:
            x_full = x_vis
        pos_full = self.decoder_pos_embed(center)
        return self.MAE_decoder(x_full, pos_full, deterministic=not train)

    def _loss_weights(self, mask: Array) -> Array:
        """Which patches enter the reconstruction loss: masked only, or all
        (all_patch=='True'), or all in the no-mask variant."""
        if not self.masked_mode or self.all_patch:
            return jnp.ones(mask.shape, jnp.float32).reshape(-1)
        return mask.astype(jnp.float32).reshape(-1)

    def _global_feature(self, x: Array, mask: Array) -> Array:
        """max + mean over *visible* encoder tokens
        (PointCAE_transformer.py:1024, MaskSurf_v2.py:1084).

        With the static-shape design masked slots hold garbage, so both
        reductions are mask-aware."""
        vis = jnp.logical_not(mask)[..., None]
        neg = jnp.where(vis, x, -1e9)
        cnt = jnp.maximum(jnp.sum(vis, axis=1), 1.0)
        mean = jnp.sum(jnp.where(vis, x, 0.0), axis=1) / cnt
        return jnp.max(neg, axis=1) + mean

    def _local_recon_inputs(self, x_rec: Array, neigh: Array, mask: Array):
        """(decoded tokens, GT patches, loss weights) for the local
        reconstruction head.

        When only masked patches enter the loss (the reference's default —
        it folds only the masked tokens, PointCAE_transformer.py:1120-1136),
        both tensors are packed down to a fixed capacity
        M = int(max_ratio * G), so the per-token head and the patch chamfer
        run on ~80% instead of 100% of tokens while any U(0.5, 0.8) ratio
        still compiles once. Padding slots get zero loss weight; the
        sum(w*per)/sum(w) normalization makes this exactly equal to the
        all-token layout with mask weights."""
        B, G, S = neigh.shape[:3]
        pack = self._masked_pack_idx(mask)
        if pack is None:
            return x_rec, neigh.reshape(B * G, S, 3), self._loss_weights(mask)
        midx, w = pack
        x_m = jnp.take_along_axis(x_rec, midx[:, :, None], axis=1)
        gt = jnp.take_along_axis(neigh, midx[:, :, None, None], axis=1)
        return x_m, gt.reshape(-1, S, 3), w

    def _masked_pack_idx(self, mask: Array):
        """(midx (B, M), w (B*M,)) packing masked token slots first (fixed
        capacity M = int(max_ratio*G)), or None when every token enters the
        loss and packing would not shrink anything."""
        B, G = mask.shape
        t = self.tcfg
        rand = str(t.get("rand_ratio", "False")) == "True" \
            and t.get("mask_type", "rand") != "block"
        max_ratio = 0.8 if rand else float(t.get("mask_ratio", 0.6))
        M = static_num_masked(max_ratio, G)
        if (not self.masked_mode) or self.all_patch or M >= G:
            return None
        order = jnp.argsort(jnp.logical_not(mask), axis=-1, stable=True)
        midx = order[:, :M]                                   # masked-first
        w = jnp.arange(M)[None, :] < jnp.sum(mask, -1)[:, None]
        return midx, w.astype(jnp.float32).reshape(-1)

    def _pack_local(self, mask: Array, *tensors: Array):
        """Pack per-token tensors down to the masked-token capacity for the
        local losses (the reference gathers masked patches into a dense
        batch); returns (w, packed...). Falls back to the in-place layout
        with mask weights when packing would not shrink anything (all_patch,
        or no static bound below G)."""
        pack = self._masked_pack_idx(mask)
        if pack is None:
            return (mask.astype(jnp.float32).reshape(-1),) + tensors
        midx, w = pack

        def take(a):
            idx = midx.reshape(midx.shape + (1,) * (a.ndim - 2))
            return jnp.take_along_axis(a, idx, axis=1)

        return (w,) + tuple(take(a) for a in tensors)

    def encode(self, pts: Array, train: bool = False) -> Array:
        """Global feature for SVM probes: masked-max + mean over tokens with
        no masking (return_feat path, PointCAE_transformer.py:1024-1026)."""
        G = self.config["num_group"]
        S = self.config["group_size"]
        neigh, center = group_neighborhood(pts[..., :3], G, S)
        if self.masked_mode:
            x, _ = self.MAE_encoder(neigh, center, noaug=True, train=train)
        else:
            x = self.MAE_encoder(neigh, center, train=train)
        return jnp.max(x, axis=1) + jnp.mean(x, axis=1)


@MODELS.register_module()
class PointCAE_transformer(_CAETransformerBase):
    """FC local-patch reconstruction (PointCAE_transformer.py:617-742):
    per-token Dense to S*3 points, chamfer on normalized patches."""

    def setup(self):
        self.MAE_encoder = self._make_encoder()
        self.decoder_pos_embed = PosEmbedMLP(self.tcfg["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = self._make_decoder()
        if self.masked_mode:
            self.mask_token = self._make_mask_token()
        self.increase_dim = nn.Dense(3 * self.config["group_size"],
                                     name="increase_dim")
        self.loss_fn = _masked_loss_fn(self.config.get("loss", "cdl2"))

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        x_vis, mask = self._encode(t_neigh, t_center, train)
        x_rec = self._decode(x_vis, mask, center, train)
        S = self.config["group_size"]
        x_loc, gt, w = self._local_recon_inputs(x_rec, neigh, mask)
        rebuild = self.increase_dim(x_loc).reshape(-1, S, 3)
        loss1 = self.loss_fn(rebuild, gt, w)
        return loss1, jnp.zeros(())


class _DenseParams(nn.Module):
    """Param-only twin of ``nn.Dense``: declares the identical
    kernel/bias (same names, shapes, initializers, and therefore the same
    path-keyed init draws) and returns them raw, so a fused kernel and the
    XLA fallback can share one checkpoint-compatible tree."""
    din: int
    dout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.din, self.dout))
        b = self.param("bias", nn.initializers.zeros_init(), (self.dout,))
        return k, b


class _SplitMLPParams(nn.Module):
    """Param tree of a 3-layer SplitMLP (dense0..dense2), values returned
    raw. Path-identical to the SplitMLP module it replaces."""
    din0: int
    feats: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        ps, d = [], self.din0
        for i, f in enumerate(self.feats):
            ps.append(_DenseParams(d, f, name=f"dense{i}")())
            d = f
        return ps


def _split_mlp_apply(params, shared: Array, per_point: Array, dtype):
    """SplitMLP math on raw params — line-for-line the module's ops
    (layers.py:88-126: SplitDense factorized first layer, then Dense
    layers), so outputs are bitwise equal to the previous SplitMLP path
    (tests/test_pallas_folding.py asserts this)."""
    (k0, b0), (k1, b1), (k2, b2) = params
    C = shared.shape[-1]
    dt = dtype or jnp.result_type(shared.dtype, k0.dtype)
    ks, ke = k0[:C], k0[C:]
    sp = shared.astype(dt) @ ks.astype(dt)
    pp = per_point.astype(dt) @ ke.astype(dt)
    x = pp + sp[..., None, :] + b0.astype(dt)
    for k, b in ((k1, b1), (k2, b2)):
        x = nn.relu(x)
        x = x.astype(dt) @ k.astype(dt) + b.astype(dt)
    return x


class _FoldingLocalHead(nn.Module):
    """Two-stage folding over a 6x6 grid per token
    (PointCAE_transformer.py:789-803,859-878). Math identical to the
    reference's Dense-on-concat; the shared token-feature half of each
    stage's first matmul is factorized out of the grid axis (exact, see
    layers.SplitDense).

    At bf16 compute on TPU the whole two-stage chain dispatches to the
    fused Pallas kernel (ops/pallas_folding.py) that keeps the expanded
    (tile*36, trans_dim) hiddens in VMEM — they are the flagship step's
    largest HBM tensors otherwise. Same param tree either way."""
    trans_dim: int
    dtype: object = None
    use_pallas: bool = True
    interpret: bool = False

    @nn.compact
    def __call__(self, x_rec: Array) -> Array:
        B, G, C = x_rec.shape
        grid = jnp.asarray(folding_grid((6, 6), (-0.3, 0.3)))   # (36, 2)
        n = grid.shape[0]
        F = self.trans_dim
        p1 = _SplitMLPParams(C + 2, (F, F, 3), name="folding1")()
        p2 = _SplitMLPParams(C + 3, (F, F, 3), name="folding2")()

        from ..ops.pallas_folding import fused_folding, supported
        use_kernel = self.interpret or (
            self.use_pallas and self.dtype == jnp.bfloat16
            and supported(C, F, n)
            and jax.devices()[0].platform == "tpu")
        if use_kernel:
            f2 = fused_folding(x_rec, grid, p1, p2,
                               interpret=self.interpret)
        else:
            gridb = jnp.broadcast_to(grid[None, None], (B, G, n, 2))
            gridb = gridb.astype(self.dtype or x_rec.dtype)
            f1 = _split_mlp_apply(p1, x_rec, gridb, self.dtype)
            f2 = _split_mlp_apply(p2, x_rec, f1, self.dtype)
        return f2.astype(jnp.float32)                            # (B, G, 36, 3)


def fold_head_cls(tcfg):
    """_FoldingLocalHead with an optional remat knob (default OFF).

    The folding stages' (B, M, 36, trans_dim) hidden activations are the
    single largest HBM tensors of the flagship train step (361 MB bf16 each
    at bs 256 — 22x a ViT block's token activations; per-HLO roofline
    breakdown in evidence/ROOFLINE_r03.json ranks their fwd/bwd dot_generals
    top). ``transformer_config.remat_fold: True`` recomputes them in the
    backward via ``nn.remat`` — bitwise-identical params/outputs/gradients
    (verified) — but measured SLOWER end-to-end (evidence/
    PROFILE_FLAGSHIP_AB_r03.txt: 76.9 vs 74.0 ms best-of interleaved): the
    recompute rematerializes the same hiddens through HBM, so it only adds
    FLOPs. Kept as a memory-pressure escape hatch for larger configs; the
    byte cut that actually lands is the fused Pallas folding head (see
    ops/pallas_folding.py), which keeps the hiddens in VMEM.

    ``transformer_config.fold_impl``: 'auto' (default — the fused kernel
    whenever the compute dtype is bf16 on TPU) or 'xla' (force the
    unfused path; the A/B baseline in tools/profile_flagship_ab.py)."""
    import functools as _ft

    cls = _FoldingLocalHead
    if str(tcfg.get("remat_fold", "False")) == "True":
        cls = nn.remat(cls)
    if str(tcfg.get("fold_impl", "auto")) == "xla":
        return _ft.partial(cls, use_pallas=False)
    return cls


@MODELS.register_module()
class PointCAE_transformer_folding(_CAETransformerBase):
    """Folding local-patch reconstruction (PointCAE_transformer.py:747-915)."""

    def setup(self):
        self.MAE_encoder = self._make_encoder()
        self.decoder_pos_embed = PosEmbedMLP(self.tcfg["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = self._make_decoder()
        if self.masked_mode:
            self.mask_token = self._make_mask_token()
        self.fold = fold_head_cls(self.tcfg)(self.tcfg["trans_dim"], name="fold")
        self.loss_fn = _masked_loss_fn(self.config.get("loss", "cdl2"))

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        x_vis, mask = self._encode(t_neigh, t_center, train)
        x_rec = self._decode(x_vis, mask, center, train)
        x_loc, gt, w = self._local_recon_inputs(x_rec, neigh, mask)
        rebuild = self.fold(x_loc).reshape(gt.shape[0], -1, 3)
        loss1 = self.loss_fn(rebuild, gt, w)
        return loss1, jnp.zeros(())


@MODELS.register_module()
class PointCAE_transformer_fc_global_folding_local(_CAETransformerBase):
    """Flagship transformer model (released checkpoint, rerun2.sh:38; forward
    PointCAE_transformer.py:1008-1145): FC global-shape head on the pooled
    visible feature (chamfer vs patch centers) + folding local head on decoded
    tokens (chamfer vs normalized masked patches)."""

    def setup(self):
        self.MAE_encoder = self._make_encoder()
        self.decoder_pos_embed = PosEmbedMLP(self.tcfg["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = self._make_decoder()
        if self.masked_mode:
            self.mask_token = self._make_mask_token()
        self.coarse_pred = MLP((1024, 1024, 3 * 64), dtype=self.compute_dtype,
                               name="coarse_pred")
        self.fold = fold_head_cls(self.tcfg)(self.tcfg["trans_dim"],
                                      dtype=self.compute_dtype, name="fold")
        self.loss_fn = _masked_loss_fn(self.config.get("loss", "cdl2"))
        self.global_loss_fn = build_loss_func(self.config.get("loss", "cdl2"))

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        x_vis, mask = self._encode(t_neigh, t_center, train)
        gfeat = self._global_feature(x_vis, mask)
        coarse = self.coarse_pred(gfeat).astype(jnp.float32).reshape(gfeat.shape[0], -1, 3)
        loss2 = self.global_loss_fn(coarse, center)

        x_rec = self._decode(x_vis, mask, center, train)
        x_loc, gt, w = self._local_recon_inputs(x_rec, neigh, mask)
        rebuild = self.fold(x_loc).reshape(gt.shape[0], -1, 3)
        loss1 = self.loss_fn(rebuild, gt, w)
        return loss1, loss2

    def reconstruct(self, clean: Array, train: bool = False):
        """Visualization path: (coarse global cloud, local patch rebuilds)."""
        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        x_vis, mask = self._encode(t_neigh, t_center, train)
        gfeat = self._global_feature(x_vis, mask)
        coarse = self.coarse_pred(gfeat).astype(jnp.float32).reshape(gfeat.shape[0], -1, 3)
        x_rec = self._decode(x_vis, mask, center, train)
        rebuild = self.fold(x_rec) + center[:, :, None, :]
        return coarse, rebuild, mask


@MODELS.register_module()
class PointCAE_transformer_fc_global_fc_local(_CAETransformerBase):
    """FC global + FC local heads (PointCAE_transformer.py:1620-1785)."""

    def setup(self):
        self.MAE_encoder = self._make_encoder()
        self.decoder_pos_embed = PosEmbedMLP(self.tcfg["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = self._make_decoder()
        if self.masked_mode:
            self.mask_token = self._make_mask_token()
        self.coarse_pred = MLP((1024, 1024, 3 * 64), name="coarse_pred")
        self.increase_dim = nn.Dense(3 * self.config["group_size"],
                                     name="increase_dim")
        self.loss_fn = _masked_loss_fn(self.config.get("loss", "cdl2"))
        self.global_loss_fn = build_loss_func(self.config.get("loss", "cdl2"))

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        x_vis, mask = self._encode(t_neigh, t_center, train)
        vis = jnp.logical_not(mask)[..., None]
        neg = jnp.where(vis, x_vis, -1e9)
        cnt = jnp.maximum(jnp.sum(vis, axis=1), 1.0)
        gfeat = jnp.max(neg, 1) + jnp.sum(jnp.where(vis, x_vis, 0.0), 1) / cnt
        coarse = self.coarse_pred(gfeat).astype(jnp.float32).reshape(gfeat.shape[0], -1, 3)
        loss2 = self.global_loss_fn(coarse, center)

        x_rec = self._decode(x_vis, mask, center, train)
        S = self.config["group_size"]
        x_loc, gt, w = self._local_recon_inputs(x_rec, neigh, mask)
        rebuild = self.increase_dim(x_loc).reshape(-1, S, 3)
        loss1 = self.loss_fn(rebuild, gt, w)
        return loss1, loss2


@MODELS.register_module()
class PointCAE_transformer_folding_global_folding_local(_CAETransformerBase):
    """Folding global + folding local (PointCAE_transformer.py:1150-1380)."""

    def setup(self):
        self.MAE_encoder = self._make_encoder()
        self.decoder_pos_embed = PosEmbedMLP(self.tcfg["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = self._make_decoder()
        if self.masked_mode:
            self.mask_token = self._make_mask_token()
        self.global_fold = fold_head_cls(self.tcfg)(self.tcfg["trans_dim"],
                                             name="global_fold")
        self.fold = fold_head_cls(self.tcfg)(self.tcfg["trans_dim"], name="fold")
        self.loss_fn = _masked_loss_fn(self.config.get("loss", "cdl2"))
        self.global_loss_fn = build_loss_func(self.config.get("loss", "cdl2"))

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        x_vis, mask = self._encode(t_neigh, t_center, train)
        vis = jnp.logical_not(mask)[..., None]
        neg = jnp.where(vis, x_vis, -1e9)
        cnt = jnp.maximum(jnp.sum(vis, axis=1), 1.0)
        gfeat = jnp.max(neg, 1) + jnp.sum(jnp.where(vis, x_vis, 0.0), 1) / cnt
        coarse = self.global_fold(gfeat[:, None, :])[:, 0]      # (B, 36, 3)
        loss2 = self.global_loss_fn(coarse, center)

        x_rec = self._decode(x_vis, mask, center, train)
        x_loc, gt, w = self._local_recon_inputs(x_rec, neigh, mask)
        rebuild = self.fold(x_loc).reshape(gt.shape[0], -1, 3)
        loss1 = self.loss_fn(rebuild, gt, w)
        return loss1, loss2


@MODELS.register_module()
class PointCAE_transformer_patch_center_only(_CAETransformerBase):
    """Predict only the patch-center cloud from the pooled feature
    (PointCAE_transformer.py:2200-2340)."""

    def setup(self):
        self.MAE_encoder = self._make_encoder()
        self.coarse_pred = MLP((1024, 1024, 3 * 64), name="coarse_pred")
        self.global_loss_fn = build_loss_func(self.config.get("loss", "cdl2"))

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        x_vis, mask = self._encode(t_neigh, t_center, train)
        vis = jnp.logical_not(mask)[..., None]
        neg = jnp.where(vis, x_vis, -1e9)
        cnt = jnp.maximum(jnp.sum(vis, axis=1), 1.0)
        gfeat = jnp.max(neg, 1) + jnp.sum(jnp.where(vis, x_vis, 0.0), 1) / cnt
        coarse = self.coarse_pred(gfeat).astype(jnp.float32).reshape(gfeat.shape[0], -1, 3)
        loss2 = self.global_loss_fn(coarse, center)
        return loss2, jnp.zeros(())


# ----------------------------------------------------------- finetune heads

class _FinetuneHead(nn.Module):
    """Dense+BN+ReLU+Dropout x2 -> classifier (Point_MAE.py:617-627)."""
    dims: Sequence[int]
    cls_dim: int

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(0.5, name=f"dp{i}")(x, deterministic=not train)
        return nn.Dense(self.cls_dim, name="cls")(x)


@MODELS.register_module()
class PointTransformer(nn.Module):
    """Classification fine-tune with cls+pos token (Point_MAE.py:578-708):
    concat [cls token out, max over patch tokens] -> MLP head."""
    config: dict

    def setup(self):
        c = self.config
        dt = jnp.bfloat16 if str(c.get("dtype")) in ("bf16", "bfloat16") \
            else None
        self.group_divider_args = (c["num_group"], c["group_size"])
        self.patch_embed = PatchEncoder(c["encoder_dims"], dtype=dt,
                                        name="encoder")
        self.pos_embed = PosEmbedMLP(c["trans_dim"], name="pos_embed")
        self.cls_token = self.param("cls_token",
                                    nn.initializers.truncated_normal(0.02),
                                    (1, 1, c["trans_dim"]))
        self.cls_pos = self.param("cls_pos",
                                  nn.initializers.truncated_normal(0.02),
                                  (1, 1, c["trans_dim"]))
        self.blocks = TransformerEncoder(c["trans_dim"], c["depth"],
                                         c["num_heads"],
                                         drop_path_rate=c.get("drop_path_rate", 0.1),
                                         dtype=dt,
                                         name="blocks")
        self.norm = nn.LayerNorm(name="norm")
        self.head = _FinetuneHead((512, 256), c["cls_dim"],
                                  name="cls_head_finetune")

    def __call__(self, pts: Array, train: bool = True) -> Array:
        G, S = self.group_divider_args
        neigh, center = group_neighborhood(pts[..., :3], G, S)
        tokens = self.patch_embed(neigh, train=train)
        B = tokens.shape[0]
        cls_tok = jnp.broadcast_to(self.cls_token, (B, 1, tokens.shape[-1]))
        cls_pos = jnp.broadcast_to(self.cls_pos, (B, 1, tokens.shape[-1]))
        pos = jnp.concatenate([cls_pos, self.pos_embed(center)], axis=1)
        x = jnp.concatenate([cls_tok, tokens], axis=1)
        x = self.blocks(x, pos, deterministic=not train)
        x = self.norm(x)
        feat = jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], axis=-1)
        return self.head(feat, train)


@MODELS.register_module()
class PointTransformerNoClassToken(nn.Module):
    """Fine-tune head without class token (Point_MAE.py:709-845):
    max+mean pooling -> 256/256 head."""
    config: dict

    def setup(self):
        c = self.config
        self.group_divider_args = (c["num_group"], c["group_size"])
        self.patch_embed = PatchEncoder(c["encoder_dims"], name="encoder")
        self.pos_embed = PosEmbedMLP(c["trans_dim"], name="pos_embed")
        self.blocks = TransformerEncoder(c["trans_dim"], c["depth"],
                                         c["num_heads"],
                                         drop_path_rate=c.get("drop_path_rate", 0.1),
                                         name="blocks")
        self.norm = nn.LayerNorm(name="norm")
        self.head = _FinetuneHead((256, 256), c["cls_dim"],
                                  name="cls_head_finetune")

    def _backbone(self, pts: Array, train: bool) -> Array:
        G, S = self.group_divider_args
        neigh, center = group_neighborhood(pts[..., :3], G, S)
        tokens = self.patch_embed(neigh, train=train)
        x = self.blocks(tokens, self.pos_embed(center), deterministic=not train)
        x = self.norm(x)
        return jnp.max(x, axis=1) + jnp.mean(x, axis=1)

    def __call__(self, pts: Array, train: bool = True) -> Array:
        return self.head(self._backbone(pts, train), train)

    def encode(self, pts: Array, train: bool = False) -> Array:
        return self._backbone(pts, train)


@MODELS.register_module()
class PointTransformer_LinearClassification(nn.Module):
    """Linear probe on the no-cls-token backbone (Point_MAE.py:846-969)."""
    config: dict

    def setup(self):
        c = self.config
        self.group_divider_args = (c["num_group"], c["group_size"])
        self.patch_embed = PatchEncoder(c["encoder_dims"], name="encoder")
        self.pos_embed = PosEmbedMLP(c["trans_dim"], name="pos_embed")
        self.blocks = TransformerEncoder(c["trans_dim"], c["depth"],
                                         c["num_heads"],
                                         drop_path_rate=c.get("drop_path_rate", 0.1),
                                         name="blocks")
        self.norm = nn.LayerNorm(name="norm")
        self.cls = nn.Dense(c["cls_dim"], name="cls")

    def __call__(self, pts: Array, train: bool = True) -> Array:
        G, S = self.group_divider_args
        neigh, center = group_neighborhood(pts[..., :3], G, S)
        tokens = self.patch_embed(neigh, train=train)
        x = self.blocks(tokens, self.pos_embed(center), deterministic=not train)
        x = self.norm(x)
        return self.cls(jnp.max(x, axis=1) + jnp.mean(x, axis=1))


@MODELS.register_module()
class PointTransformerNoClassTokenSVMFeature(PointTransformerNoClassToken):
    """SVM feature extractor for transformer checkpoints (Point_MAE.py:970-1092,
    used by rerun2.sh:42): returns max+mean pooled features."""

    def setup(self):
        c = self.config
        self.group_divider_args = (c["num_group"], c["group_size"])
        self.patch_embed = PatchEncoder(c["encoder_dims"], name="encoder")
        self.pos_embed = PosEmbedMLP(c["trans_dim"], name="pos_embed")
        self.blocks = TransformerEncoder(c["trans_dim"], c["depth"],
                                         c["num_heads"],
                                         drop_path_rate=c.get("drop_path_rate", 0.1),
                                         name="blocks")
        self.norm = nn.LayerNorm(name="norm")

    def __call__(self, pts: Array, train: bool = False) -> Array:
        return self._backbone(pts, train)


@MODELS.register_module()
class PointCAE_transformer_fc_center(_CAETransformerBase):
    """Global max-pooled feature -> FC to the G patch centers, chamfer on
    centers only (PointCAE_transformer.py:2343-2438)."""

    def setup(self):
        self.MAE_encoder = self._make_encoder()
        self.coarse_pred = MLP((1024, 1024, 3 * self.config["num_group"]),
                               name="coarse_pred")
        self.global_loss_fn = build_loss_func(self.config.get("loss", "cdl2"))

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        x_vis, mask = self._encode(t_neigh, t_center, train)
        neg = jnp.where(jnp.logical_not(mask)[..., None], x_vis, -1e9)
        gfeat = jnp.max(neg, axis=1)
        coarse = self.coarse_pred(gfeat).astype(jnp.float32).reshape(gfeat.shape[0], -1, 3)
        loss1 = self.global_loss_fn(coarse, center)
        return loss1, jnp.zeros(())


@MODELS.register_module()
class PointCAE_transformer_fold_center(_CAETransformerBase):
    """Folding decoder to the patch-center cloud
    (PointCAE_transformer.py:2440-2578)."""

    def setup(self):
        self.MAE_encoder = self._make_encoder()
        self.global_fold = fold_head_cls(self.tcfg)(self.tcfg["trans_dim"],
                                             name="global_fold")
        self.global_loss_fn = build_loss_func(self.config.get("loss", "cdl2"))

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        x_vis, mask = self._encode(t_neigh, t_center, train)
        neg = jnp.where(jnp.logical_not(mask)[..., None], x_vis, -1e9)
        gfeat = jnp.max(neg, axis=1)
        coarse = self.global_fold(gfeat[:, None, :])[:, 0]   # (B, 36, 3)
        loss1 = self.global_loss_fn(coarse, center)
        return loss1, jnp.zeros(())


@MODELS.register_module()
class PointCAE_transformer_v6_corase2fine_transformer(_CAETransformerBase):
    """Coarse-to-fine: predict coarse centers from the pooled feature, use the
    *predicted* centers as decoder positional embeddings, reconstruct matched
    fine patches with the coarse2fine chamfer
    (PointCAE_transformer.py:2580-2709)."""

    def setup(self):
        S = self.config["group_size"]
        self.MAE_encoder = self._make_encoder()
        self.increase_dim = nn.Dense(1024, name="increase_dim")
        self.coarse_pred = MLP((1024, 1024, 3 * self.config["num_group"]),
                               name="coarse_pred")
        self.decoder_pos_embed = PosEmbedMLP(self.tcfg["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = self._make_decoder()
        if self.masked_mode:
            self.mask_token = self._make_mask_token()
        self.increase_dim_fine = nn.Dense(3 * S, name="increase_dim_fine")

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        from ..losses import chamfer_l2_coarse2fine

        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        if self.masked_mode:
            raise NotImplementedError(
                "reference raises for Drop-Patch too (:2655)")
        x_vis = self.MAE_encoder(t_neigh, t_center, train=train)
        B, G, C = x_vis.shape
        S = self.config["group_size"]
        gfeat = jnp.max(self.increase_dim(x_vis), axis=1)    # (B, 1024)
        coarse = self.coarse_pred(gfeat).reshape(B, -1, 3)
        pos = self.decoder_pos_embed(coarse)
        x_rec = self.MAE_decoder(x_vis, pos, deterministic=not train)
        rebuild = self.increase_dim_fine(x_rec).reshape(B, G, S, 3)
        gt_fine = neigh.reshape(B, G, S, 3)
        loss1, loss2 = chamfer_l2_coarse2fine(coarse, center, rebuild, gt_fine)
        return loss1, loss2


@MODELS.register_module()
class PointCAE_transformer_fc_all(_CAETransformerBase):
    """Pooled feature -> FC to the FULL clean cloud
    (PointCAE_transformer.py:2874-2976)."""

    def setup(self):
        n = int(self.config.get("npoints", 1024))
        self.MAE_encoder = self._make_encoder()
        self.coarse_pred = MLP((1024, 1024, 3 * n), name="coarse_pred")
        self.global_loss_fn = build_loss_func(self.config.get("loss", "cdl2"))

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        x_vis, mask = self._encode(t_neigh, t_center, train)
        neg = jnp.where(jnp.logical_not(mask)[..., None], x_vis, -1e9)
        gfeat = jnp.max(neg, axis=1)
        rebuild = self.coarse_pred(gfeat).reshape(gfeat.shape[0], -1, 3)
        loss1 = self.global_loss_fn(rebuild, pts)
        return loss1, jnp.zeros(())


@MODELS.register_module()
class PointCAE_transformer_fold_all(_CAETransformerBase):
    """Folding head to the full cloud (PointCAE_transformer.py:2978-3111);
    grid 32x32 -> 1024 points."""

    def setup(self):
        self.MAE_encoder = self._make_encoder()
        self.global_loss_fn = build_loss_func(self.config.get("loss", "cdl2"))

    @nn.compact
    def _fold_full(self, gfeat: Array) -> Array:
        grid = jnp.asarray(folding_grid((32, 32), (-0.3, 0.3)))
        B, C = gfeat.shape
        n = grid.shape[0]
        g = jnp.broadcast_to(grid[None], (B, n, 2))
        f1 = SplitMLP((1024, 1024, 3), name="folding1")(gfeat, g)
        return SplitMLP((1024, 1024, 3), name="folding2")(gfeat, f1)

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        x_vis, mask = self._encode(t_neigh, t_center, train)
        neg = jnp.where(jnp.logical_not(mask)[..., None], x_vis, -1e9)
        gfeat = jnp.max(neg, axis=1)
        rebuild = self._fold_full(gfeat)
        loss1 = self.global_loss_fn(rebuild, pts)
        return loss1, jnp.zeros(())


@MODELS.register_module()
class PointCAE_transformer_supervised(_CAETransformerBase):
    """Supervised-pretraining ablation (PointCAE_transformer.py:3113-3255):
    classification head on the pooled (corrupted-input) feature; trained with
    class labels (the engine threads batch['label'] through the train step
    when is_supervised) instead of a reconstruction target."""

    # tells engine/pretrain to pass labels into the train step
    is_supervised = True

    def setup(self):
        self.MAE_encoder = self._make_encoder()
        self.head = _FinetuneHead((256, 256),
                                  self.tcfg.get("cls_dim", 55),
                                  name="cls_head_finetune")

    def __call__(self, corrupted: Array, clean: Array, labels=None,
                 train: bool = True):
        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        x_vis, mask = self._encode(t_neigh, t_center, train)
        vis = jnp.logical_not(mask)[..., None]
        cnt = jnp.maximum(jnp.sum(vis, 1), 1.0)
        gfeat = jnp.max(jnp.where(vis, x_vis, -1e9), 1) + \
            jnp.sum(jnp.where(vis, x_vis, 0.0), 1) / cnt
        logits = self.head(gfeat, train)
        if labels is None:
            return logits, jnp.zeros(())
        logp = jax.nn.log_softmax(logits)
        loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], -1))
        return loss, jnp.zeros(())


@MODELS.register_module()
class PointCAE_transformer_folding_global_fc_local(_CAETransformerBase):
    """Folding global head + FC local head (PointCAE_transformer.py:1384-1618)."""

    def setup(self):
        self.MAE_encoder = self._make_encoder()
        self.decoder_pos_embed = PosEmbedMLP(self.tcfg["trans_dim"],
                                             name="decoder_pos_embed")
        self.MAE_decoder = self._make_decoder()
        if self.masked_mode:
            self.mask_token = self._make_mask_token()
        self.global_fold = fold_head_cls(self.tcfg)(self.tcfg["trans_dim"],
                                             name="global_fold")
        self.increase_dim = nn.Dense(3 * self.config["group_size"],
                                     name="increase_dim")
        self.loss_fn = _masked_loss_fn(self.config.get("loss", "cdl2"))
        self.global_loss_fn = build_loss_func(self.config.get("loss", "cdl2"))

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        x_vis, mask = self._encode(t_neigh, t_center, train)
        vis = jnp.logical_not(mask)[..., None]
        cnt = jnp.maximum(jnp.sum(vis, 1), 1.0)
        gfeat = jnp.max(jnp.where(vis, x_vis, -1e9), 1) + \
            jnp.sum(jnp.where(vis, x_vis, 0.0), 1) / cnt
        coarse = self.global_fold(gfeat[:, None, :])[:, 0]
        loss2 = self.global_loss_fn(coarse, center)

        x_rec = self._decode(x_vis, mask, center, train)
        S = self.config["group_size"]
        x_loc, gt, w = self._local_recon_inputs(x_rec, neigh, mask)
        rebuild = self.increase_dim(x_loc).reshape(-1, S, 3)
        loss1 = self.loss_fn(rebuild, gt, w)
        return loss1, loss2


@MODELS.register_module()
class PointCAE_transformer_v6_folding_corase2fine_transformer(
        PointCAE_transformer_v6_corase2fine_transformer):
    """v6 coarse2fine with a folding coarse head
    (PointCAE_transformer.py:2711-2872): the pooled trans_dim feature folds an
    8x8 grid (+/-0.3) through two trans_dim-wide stages into the 64 coarse
    centers (instead of the FC coarse_pred); decode + coarse2fine loss
    unchanged."""

    def setup(self):
        S = self.config["group_size"]
        d = self.tcfg["trans_dim"]
        self.MAE_encoder = self._make_encoder()
        self.folding1 = SplitMLP((d, d, 3), name="folding1")
        self.folding2 = SplitMLP((d, d, 3), name="folding2")
        self.decoder_pos_embed = PosEmbedMLP(d, name="decoder_pos_embed")
        self.MAE_decoder = self._make_decoder()
        if self.masked_mode:
            self.mask_token = self._make_mask_token()
        self.increase_dim_fine = nn.Dense(3 * S, name="increase_dim_fine")

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        from ..losses import chamfer_l2_coarse2fine
        from .common import folding_grid

        pts = clean[..., :3]
        neigh, center, t_neigh, t_center = self._group_and_corrupt(pts, train)
        if self.masked_mode:
            raise NotImplementedError(
                "reference raises for Drop-Patch too (:2786)")
        x_vis = self.MAE_encoder(t_neigh, t_center, train=train)
        B, G, C = x_vis.shape
        S = self.config["group_size"]
        gfeat = jnp.max(x_vis, axis=1)                        # (B, C)
        # reference hardcodes an 8x8 grid for num_group=64 (:2721); generalize
        # to sqrt(G) x sqrt(G) so the folded coarse count matches the decoder
        M = self.config["num_group"]
        side = int(round(M ** 0.5))
        assert side * side == M, "v6_folding needs a square num_group"
        grid = jnp.asarray(folding_grid((side, side), (-0.3, 0.3)))
        gridb = jnp.broadcast_to(grid[None], (B, M, 2))
        f1 = self.folding1(gfeat, gridb)
        coarse = self.folding2(gfeat, f1)                       # (B, 64, 3)

        pos = self.decoder_pos_embed(coarse)
        x_rec = self.MAE_decoder(x_vis, pos, deterministic=not train)
        rebuild = self.increase_dim_fine(x_rec).reshape(B, G, S, 3)
        gt_fine = neigh.reshape(B, G, S, 3)
        loss1, loss2 = chamfer_l2_coarse2fine(coarse, center, rebuild, gt_fine)
        return loss1, loss2


# reference registry spelling (no underscore)
MODELS.register_module("PointTransformerLinearClassification",
                       module=PointTransformer_LinearClassification)
