"""Discrete VAE point tokenizer (Point-BERT style).

Reference: models/MaskSurf_v2.py:19-243 (Decoder/DGCNN/DiscreteVAE/Encoder) —
the frozen tokenizer behind ``MaskSurf_v2_token_dis``. The reference loads a
pretrained torch checkpoint (MaskSurf_v2.py:2085-2092); here the dVAE is a
first-class trainable module (``dvae_loss``) and the token_dis model embeds it
as a frozen '*_teacher' submodule the optimizer masks out.

TPU notes: the per-patch DGCNN aggregation (k=4 graph features over the G
patch centers) is pairwise-distance + top_k on (B, G, G) — G<=128 so XLA
keeps it entirely on the MXU; Gumbel-softmax uses ``jax.random.gumbel`` and a
straight-through estimator for ``hard=True``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import group_neighborhood, knn
from ..utils.registry import MODELS
from .layers import MLP, PatchEncoder, SplitDense

Array = jax.Array


def _graph_feature(coor: Array, x: Array, k: int = 4) -> Array:
    """DGCNN edge features over patch centers (MaskSurf_v2.py:119-139).

    coor: (B, G, 3), x: (B, G, C) -> (B, G, k, 2C) = [neighbor - self, self].
    """
    _, idx = knn(coor, coor, k)                                # (B, G, k)
    neigh = jnp.take_along_axis(x[:, None, :, :],
                                idx[..., None], axis=2)        # (B, G, k, C)
    self_f = jnp.broadcast_to(x[:, :, None, :], neigh.shape)
    return jnp.concatenate([neigh - self_f, self_f], axis=-1)


class PatchDGCNN(nn.Module):
    """4-layer edge-conv stack over patch tokens (DGCNN, MaskSurf_v2.py:81-173).

    Channel plan matches the reference: input C -> 128; edge convs
    256->256, 512->512, 1024->512, 1024->1024; concat(2304) -> out.
    GroupNorm(4) + LeakyReLU(0.2) as in the torch stack.
    """
    out_channel: int

    @nn.compact
    def __call__(self, f: Array, coor: Array) -> Array:
        def gn_lrelu(h, name):
            h = nn.GroupNorm(num_groups=4, name=f"{name}_gn")(h)
            return nn.leaky_relu(h, 0.2)

        f = nn.Dense(128, name="input_trans")(f)
        feats = []
        for i, width in enumerate((256, 512, 512, 1024)):
            e = _graph_feature(coor, f)                       # (B, G, k, 2C)
            e = nn.Dense(width, use_bias=False, name=f"layer{i + 1}")(e)
            e = gn_lrelu(e, f"layer{i + 1}")
            f = jnp.max(e, axis=2)                            # (B, G, width)
            feats.append(f)
        h = jnp.concatenate(feats, axis=-1)                   # (B, G, 2304)
        h = nn.Dense(self.out_channel, use_bias=False, name="layer5")(h)
        return gn_lrelu(h, "layer5")


class FoldingPatchDecoder(nn.Module):
    """Per-patch coarse MLP + 2x2-grid folding refinement
    (Decoder, MaskSurf_v2.py:19-78). (B, G, C) -> (coarse (B, G, M, 3),
    fine (B, G, S, 3)) with S = num_fine, M = S // 4."""
    num_fine: int

    @nn.compact
    def __call__(self, feat: Array, train: bool = True) -> Tuple[Array, Array]:
        B, G, C = feat.shape
        gs = 2
        num_coarse = self.num_fine // 4
        f = feat.reshape(B * G, C)
        coarse = MLP((1024, 1024, 3 * num_coarse), name="mlp")(f)
        coarse = coarse.reshape(B * G, num_coarse, 3)

        lin = jnp.linspace(-0.05, 0.05, gs)
        seed = jnp.stack(jnp.meshgrid(lin, lin, indexing="xy"),
                         -1).reshape(gs * gs, 2)               # (4, 2)
        seed = jnp.broadcast_to(seed[None, None],
                                (B * G, num_coarse, gs * gs, 2))
        pt = jnp.broadcast_to(coarse[:, :, None, :],
                              (B * G, num_coarse, gs * gs, 3))
        # first Dense over concat([gf broadcast over num_fine, seed, pt]) —
        # the shared-feature half factorized out of the fine axis (exact)
        pp = jnp.concatenate([seed, pt], -1).reshape(B * G, self.num_fine, 5)
        h = SplitDense(512, name="final0")(f, pp)   # [gf, seed, pt] order
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="final_bn0")(h)
        h = nn.relu(h)
        h = nn.Dense(512, name="final1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="final_bn1")(h)
        h = nn.relu(h)
        fine = nn.Dense(3, name="final_out")(h) + pt.reshape(
            B * G, self.num_fine, 3)
        return (coarse.reshape(B, G, num_coarse, 3),
                fine.reshape(B, G, self.num_fine, 3))


@MODELS.register_module()
class DiscreteVAE(nn.Module):
    """dVAE point tokenizer (DiscreteVAE, MaskSurf_v2.py:175-209).

    ``tokenize`` returns per-patch logits over the ``num_tokens`` vocabulary
    (what token_dis argmaxes for its labels); ``__call__`` runs the full
    Gumbel-softmax autoencoding path and returns
    (coarse, fine, neighborhood, center, logits).
    """
    config: dict

    def setup(self):
        c = self.config
        self.num_tokens = c.get("num_tokens", 8192)
        self.encoder = PatchEncoder(c.get("encoder_dims", 256), name="encoder")
        self.dgcnn_1 = PatchDGCNN(self.num_tokens, name="dgcnn_1")
        self.codebook = self.param(
            "codebook", nn.initializers.normal(1.0),
            (self.num_tokens, c.get("tokens_dims", 256)))
        self.dgcnn_2 = PatchDGCNN(c.get("decoder_dims", 256), name="dgcnn_2")
        self.decoder = FoldingPatchDecoder(c["group_size"], name="decoder")

    def _group(self, pts: Array):
        return group_neighborhood(pts[..., :3], self.config["num_group"],
                                  self.config["group_size"])

    def tokenize(self, pts: Array, train: bool = False) -> Tuple[Array, Array, Array]:
        """(B, N, 3) -> (logits (B, G, V), neighborhood, center)."""
        neigh, center = self._group(pts)
        logits = self.encoder(neigh, train=train)
        logits = self.dgcnn_1(logits, center)
        return logits, neigh, center

    def tokenize_groups(self, neigh: Array, center: Array,
                        train: bool = False) -> Array:
        """Logits for pre-grouped patches (token_dis path, which reuses the
        outer model's grouping, MaskSurf_v2.py:2183-2192)."""
        logits = self.encoder(neigh, train=train)
        return self.dgcnn_1(logits, center)

    def decode_tokens(self, ids: Array, center: Array,
                      train: bool = False) -> Tuple[Array, Array]:
        """Decode per-patch token ids (B, G) through codebook -> dgcnn_2 ->
        folding decoder: (coarse (B, G, M, 3), fine (B, G, S, 3)), both
        patch-centered. Vis path for token-predicting students
        (MaskSurf_v2_token_dis renders its predictions through the frozen
        tokenizer's decoder, Point-BERT style)."""
        onehot = jax.nn.one_hot(ids, self.num_tokens, dtype=jnp.float32)
        sampled = jnp.einsum("bgn,nc->bgc", onehot, self.codebook)
        feat = self.dgcnn_2(sampled, center)
        return self.decoder(feat, train=train)

    def __call__(self, pts: Array, temperature: float = 1.0,
                 hard: bool = False, train: bool = True):
        logits, neigh, center = self.tokenize(pts, train=train)
        if train:
            # 'gumbel' stream when the caller provides one; the pretrain
            # engine's standard rng set falls back to 'mask'
            name = "gumbel" if self.has_rng("gumbel") else "mask"
            g = jax.random.gumbel(self.make_rng(name), logits.shape)
            y = nn.softmax((logits + g) / temperature, axis=-1)
        else:
            y = nn.softmax(logits / temperature, axis=-1)
        if hard:
            onehot = jax.nn.one_hot(jnp.argmax(y, -1), self.num_tokens,
                                    dtype=y.dtype)
            y = onehot + y - jax.lax.stop_gradient(y)          # straight-through
        sampled = jnp.einsum("bgn,nc->bgc", y, self.codebook)
        feat = self.dgcnn_2(sampled, center)
        coarse, fine = self.decoder(feat, train=train)
        return coarse, fine, neigh, center, logits


@MODELS.register_module()
class Point_dVAE(nn.Module):
    """Trainable dVAE tokenizer in the pretrain-runner contract — a
    sanctioned addition: the reference never ships dVAE training
    (MaskSurf_v2_token_dis consumes Point-BERT's released dVAE.pth via
    dvae_config.ckpt), so making the tokenizer trainable in-framework
    closes that external dependency. ``__call__(corrupted, clean)``
    autoencodes the CLEAN cloud (tokenization should reconstruct geometry,
    not corruption) and returns (chamfer reconstruction loss, KL to the
    uniform codebook prior) — run with loss_type 'xyznormal' to weight the
    KL by ``normal_weight``, or 'xyz' for reconstruction only. Gumbel
    temperature is fixed via config ``temperature`` (default 1.0; the
    Point-BERT exp-anneal to 0.0625 is not scheduled here).

    The resulting checkpoint (params under 'dvae/') feeds straight into
    MaskSurf_v2_token_dis's dvae_config.ckpt merge."""
    config: dict

    def setup(self):
        self.dvae = DiscreteVAE(dict(self.config), name="dvae")

    def __call__(self, corrupted: Array, clean: Array, train: bool = True):
        temp = float(self.config.get("temperature", 1.0))
        hard = str(self.config.get("hard", "False")) == "True"
        coarse, fine, neigh, center, logits = self.dvae(
            clean[..., :3], temperature=temp, hard=hard, train=train)
        return dvae_loss_parts(coarse, fine, neigh, logits)

    def encode(self, pts: Array, train: bool = False) -> Array:
        """SVM-probe feature: mean + max over per-patch token logits."""
        logits, _, _ = self.dvae.tokenize(pts[..., :3], train=train)
        return jnp.max(logits, axis=1) + jnp.mean(logits, axis=1)


def dvae_loss_parts(coarse: Array, fine: Array, neigh: Array, logits: Array
                    ) -> Tuple[Array, Array]:
    """(reconstruction chamfer, codebook KL) — the components of the
    Point-BERT dVAE objective, shared by ``dvae_loss`` and ``Point_dVAE``."""
    from ..losses import chamfer_l1

    B, G, S, _ = neigh.shape
    gt = neigh.reshape(B * G, S, 3)
    rec = (chamfer_l1(fine.reshape(B * G, -1, 3), gt)
           + chamfer_l1(coarse.reshape(B * G, -1, 3), gt))
    logp = jax.nn.log_softmax(logits, -1)
    mean_p = jnp.mean(jnp.exp(logp), axis=(0, 1))
    kl = jnp.sum(mean_p * (jnp.log(mean_p + 1e-10)
                           + jnp.log(logits.shape[-1])))
    return rec, kl


def dvae_loss(coarse: Array, fine: Array, neigh: Array, logits: Array,
              kl_weight: float = 0.0):
    """dVAE training loss: per-patch chamfer(fine, gt) + chamfer(coarse, gt)
    + optional KL(posterior || uniform) (Point-BERT recipe)."""
    rec, kl = dvae_loss_parts(coarse, fine, neigh, logits)
    if kl_weight > 0.0:
        return rec + kl_weight * kl
    return rec
