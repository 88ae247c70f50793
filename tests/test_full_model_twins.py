"""END-TO-END torch twins of the two RELEASED pretrain pipelines.

The strongest checkpoint-parity statement this environment allows (no real
datasets / released checkpoints mounted): a full torch re-implementation of
each released model's forward — written from the reference's dataflow —
is serialized to a real ``.pth`` (reference pretrain layout, ``module.``
DDP prefixes), imported through the full
``load_torch_checkpoint -> convert_state_dict -> merge_pretrained``
pipeline, and must produce the SAME (loss_xyz, loss_global) and the SAME
parameter gradients as our flax model from the same fixed inputs:

- ``Point_CAE_DGCNN_FCOnly`` (reference ``models/PointCAE_DGCNN.py:145-230``,
  the released non-transformer checkpoint model, rerun.sh:37): TRAIN-mode
  (BatchNorm batch statistics) full step, no device corruption.
- ``PointCAE_transformer_fc_global_folding_local`` (reference
  ``models/PointCAE_transformer.py:1008-1145``, the released transformer
  checkpoint model, rerun2.sh:38): deterministic-mask path (the mask is the
  one source of randomness in the reference forward; corruption is identity
  for corrupt_type=['Drop-Patch']). Eval-mode BN so the packed
  visible-token patch embed is exact per token (the train-mode BN-subset
  approximation is bounded separately in test_bn_subset_bound.py).

Grouping (FPS+kNN) is cross-checked against the numpy oracle of the CUDA
convention inside the transformer test, then the SAME patches feed the
torch twin (torch has no CUDA fps here).
"""
import itertools

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from point_dae_tpu.utils.checkpoint import (flatten_keys,
                                            load_torch_checkpoint,
                                            merge_pretrained)
from point_dae_tpu.utils.convert_torch import convert_state_dict

from test_convert_parity import (TorchDGCNNEncoder, TorchPatchEmbed,
                                 TorchBlock)
from test_ops import np_fps


def torch_chamfer_l2(a, b):
    """ChamferDistanceL2 (extensions/chamfer_dist/__init__.py:29-44):
    mean of squared NN distances, both directions."""
    d = torch.cdist(a, b) ** 2                      # (B, N, M)
    return d.min(2).values.mean() + d.min(1).values.mean()


def _convert_full(tmp_path, sd, family, encoder_prefix=None):
    """Serialize a full pretrain-layout .pth ({'base_model': {'module.'...}})
    and run the import pipeline, re-rooting encoder keys when the flax tree
    nests them under MAE_encoder."""
    path = str(tmp_path / "full.pth")
    torch.save({"base_model": {"module." + k: torch.as_tensor(np.asarray(v))
                               for k, v in sd.items()}}, path)
    flat = convert_state_dict(load_torch_checkpoint(path), family)
    if encoder_prefix:
        enc_tops = ("encoder/", "pos_embed/", "blocks/", "norm/")
        flat = {(encoder_prefix + "/" + k if k.startswith(enc_tops) else k): v
                for k, v in flat.items()}
    p, bs = {}, {}
    for k, v in flat.items():
        (bs if k.endswith(("/mean", "/var")) else p)[k] = v
    return p, bs


class TorchFCOnly(tnn.Module):
    """Point_CAE_DGCNN_FCOnly twin (PointCAE_DGCNN.py:145-230): full
    dgcnn encoder -> 3-Linear FC decoder to 1024x3 -> ChamferL2 vs clean."""

    def __init__(self, k=20, num_coarse=64):
        super().__init__()
        self.num_coarse = num_coarse
        self._enc = TorchDGCNNEncoder(k=k)
        self.recfc = tnn.Sequential(
            tnn.Linear(1024, 1024), tnn.ReLU(),
            tnn.Linear(1024, 1024), tnn.ReLU(),
            tnn.Linear(1024, num_coarse * 3))

    def state_dict_reference(self):
        sd = {}
        for i in range(1, 6):
            conv = getattr(self._enc, f"conv{i}")
            sd[f"dgcnn_encoder.conv{i}.0.weight"] = conv[0].weight
            for leaf, v in conv[1].state_dict().items():
                sd[f"dgcnn_encoder.bn{i}.{leaf}"] = v
        for leaf, v in self.recfc.state_dict().items():
            sd[f"recfc.{leaf}"] = v
        return {k: (v.detach().numpy() if hasattr(v, "detach")
                    else np.asarray(v)) for k, v in sd.items()}

    def grads_reference(self):
        gd = {}
        for i in range(1, 6):
            conv = getattr(self._enc, f"conv{i}")
            gd[f"dgcnn_encoder.conv{i}.0.weight"] = conv[0].weight.grad
            gd[f"dgcnn_encoder.bn{i}.weight"] = conv[1].weight.grad
            gd[f"dgcnn_encoder.bn{i}.bias"] = conv[1].bias.grad
        for name, p in self.recfc.named_parameters():
            gd[f"recfc.{name}"] = p.grad
        return {k: v.numpy() for k, v in gd.items()}

    def forward(self, corrupted, clean):             # (B, N, 3) both
        feat = self._enc(corrupted.transpose(1, 2))  # (B, 1024)
        coarse = self.recfc(feat).reshape(-1, self.num_coarse, 3)
        return torch_chamfer_l2(coarse, clean)


class TestFCOnlyFullModel:
    def test_loss_and_gradient_parity(self, tmp_path):
        from point_dae_tpu.models.dae_dgcnn import Point_CAE_DGCNN_FCOnly

        torch.manual_seed(40)
        rng = np.random.default_rng(40)
        B, N = 2, 48
        corrupted = rng.normal(size=(B, N, 3)).astype(np.float32)
        clean = rng.normal(size=(B, N, 3)).astype(np.float32)

        # reference encoder k=20 (dgcnn_util.py:15) — the model hardcodes it
        tm = TorchFCOnly(k=20, num_coarse=64).train()
        loss_t = tm(torch.as_tensor(corrupted), torch.as_tensor(clean))
        loss_t.backward()

        pf, bsf = _convert_full(tmp_path, tm.state_dict_reference(), "dgcnn")
        gp, _ = _convert_full(tmp_path, tm.grads_reference(), "dgcnn")

        cfg = {"corrupt_type": [], "loss": "cdl2"}
        fm = Point_CAE_DGCNN_FCOnly(config=cfg, num_coarse=64)

        cj = jnp.asarray(corrupted)
        xj = jnp.asarray(clean)
        v = fm.init({"params": jax.random.key(0)}, cj, xj, train=True)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)

        def loss_fn(p):
            (lx, _), _ = fm.apply({"params": p, "batch_stats": bs}, cj, xj,
                                  train=True, mutable=["batch_stats"])
            return lx

        lj, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(lj), float(loss_t), rtol=1e-4)
        got = flatten_keys(jax.device_get(grads))
        assert set(gp) <= set(got), sorted(set(gp) - set(got))
        for key in sorted(gp):
            np.testing.assert_allclose(
                got[key], gp[key], rtol=2e-3, atol=5e-4,
                err_msg=f"FCOnly gradient mismatch at {key}")


class TorchFlagship(tnn.Module):
    """PointCAE_transformer_fc_global_folding_local twin
    (PointCAE_transformer.py:920-1145 dataflow, masked branch,
    all_patch='False'): MaskTransformer encoder on visible tokens, FC
    global head (chamfer vs centers), TransformerDecoder on
    [visible, mask tokens], two-stage folding on the masked tokens
    (chamfer vs normalized masked patches)."""

    def __init__(self, dim=64, depth=2, heads=2, dec_depth=1, dec_heads=2):
        super().__init__()
        self.dim = dim

        class Enc(tnn.Module):
            def __init__(self):
                super().__init__()
                self.encoder = TorchPatchEmbed(dim)
                self.pos_embed = tnn.Sequential(
                    tnn.Linear(3, 128), tnn.GELU(), tnn.Linear(128, dim))

                class Blocks(tnn.Module):
                    def __init__(self):
                        super().__init__()
                        self.blocks = tnn.ModuleList(
                            [TorchBlock(dim, heads) for _ in range(depth)])

                    def forward(self, x, pos):
                        for b in self.blocks:
                            x = b(x + pos)
                        return x

                self.blocks = Blocks()
                self.norm = tnn.LayerNorm(dim)

        class Dec(tnn.Module):
            def __init__(self):
                super().__init__()
                self.blocks = tnn.ModuleList(
                    [TorchBlock(dim, dec_heads) for _ in range(dec_depth)])
                self.norm = tnn.LayerNorm(dim)

            def forward(self, x, pos, return_token_num):
                for b in self.blocks:
                    x = b(x + pos)
                return self.norm(x[:, -return_token_num:])

        self.MAE_encoder = Enc()
        self.MAE_decoder = Dec()
        self.mask_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.decoder_pos_embed = tnn.Sequential(
            tnn.Linear(3, 128), tnn.GELU(), tnn.Linear(128, dim))
        self.coarse_pred = tnn.Sequential(
            tnn.Linear(dim, 1024), tnn.ReLU(),
            tnn.Linear(1024, 1024), tnn.ReLU(),
            tnn.Linear(1024, 3 * 64))
        self.folding1 = tnn.Sequential(
            tnn.Conv1d(dim + 2, dim, 1), tnn.ReLU(),
            tnn.Conv1d(dim, dim, 1), tnn.ReLU(), tnn.Conv1d(dim, 3, 1))
        self.folding2 = tnn.Sequential(
            tnn.Conv1d(dim + 3, dim, 1), tnn.ReLU(),
            tnn.Conv1d(dim, dim, 1), tnn.ReLU(), tnn.Conv1d(dim, 3, 1))

    def build_grid(self, batch):                    # build_grid, :991-997
        x = np.linspace(-0.3, 0.3, 6)
        y = np.linspace(-0.3, 0.3, 6)
        pts = np.array(list(itertools.product(x, y)))
        return torch.tensor(np.repeat(pts[None], batch, 0)).float()

    def forward(self, neigh, center, mask):
        """neigh: (B, G, S, 3) centered GT patches; center: (B, G, 3);
        mask: (B, G) bool. No corruption (identity for 'Drop-Patch')."""
        B, G, S, _ = neigh.shape
        tokens = self.MAE_encoder.encoder(neigh)    # embed ALL G patches
        C = tokens.shape[-1]
        x_vis = tokens[~mask].reshape(B, -1, C)
        pos = self.MAE_encoder.pos_embed(center[~mask].reshape(B, -1, 3))
        x_vis = self.MAE_encoder.norm(self.MAE_encoder.blocks(x_vis, pos))

        gfeat = x_vis.max(1).values + x_vis.mean(1)
        coarse = self.coarse_pred(gfeat).reshape(B, -1, 3)
        loss_global = torch_chamfer_l2(coarse, center)

        pos_vis = self.decoder_pos_embed(center[~mask]).reshape(B, -1, C)
        pos_mask = self.decoder_pos_embed(center[mask]).reshape(B, -1, C)
        M = pos_mask.shape[1]
        x_full = torch.cat([x_vis, self.mask_token.expand(B, M, -1)], 1)
        pos_full = torch.cat([pos_vis, pos_mask], 1)
        x_rec = self.MAE_decoder(x_full, pos_full, M)   # (B, M, C)

        xr = x_rec.reshape(B * M, C)[..., None].repeat(1, 1, 36)
        grid = self.build_grid(B * M).transpose(1, 2)   # (BM, 2, 36)
        f1 = self.folding1(torch.cat([xr, grid], 1))
        f2 = self.folding2(torch.cat([xr, f1], 1)).transpose(1, 2)
        gt = neigh[mask].reshape(B * M, S, 3)
        loss_local = torch_chamfer_l2(f2, gt)
        return loss_local, loss_global


class TestFlagshipFullModel:
    B, N, G, S = 2, 64, 8, 6
    DIM, DEPTH, HEADS = 64, 2, 2

    def _config(self):
        return {
            "corrupt_type": ["Drop-Patch"], "loss": "cdl2",
            "all_patch": "False", "num_group": self.G,
            "group_size": self.S,
            "transformer_config": {
                "trans_dim": self.DIM, "depth": self.DEPTH,
                "num_heads": self.HEADS, "encoder_dims": self.DIM,
                "decoder_depth": 1, "decoder_num_heads": 2,
                "drop_path_rate": 0.0, "mask_ratio": 0.5,
                "rand_ratio": "False", "mask_type": "rand",
            },
        }

    def test_grouping_matches_cuda_convention_oracle(self):
        """The in-model FPS+kNN grouping reproduces the CUDA convention
        (first pick 0, skip near-origin) + exact kNN — the oracle the
        torch twin's patches are built from."""
        from point_dae_tpu import ops

        rng = np.random.default_rng(41)
        pts = rng.normal(size=(self.B, self.N, 3)).astype(np.float32)
        neigh, center = ops.group_neighborhood(jnp.asarray(pts), self.G,
                                               self.S)
        for b in range(self.B):
            fi = np_fps(pts[b], self.G)
            c_want = pts[b][fi]
            np.testing.assert_allclose(np.asarray(center[b]), c_want,
                                       rtol=1e-5, atol=1e-6)
            d = ((c_want[:, None, :] - pts[b][None, :, :]) ** 2).sum(-1)
            ni = np.argsort(d, axis=-1, kind="stable")[:, :self.S]
            n_want = pts[b][ni] - c_want[:, None, :]
            np.testing.assert_allclose(np.asarray(neigh[b]), n_want,
                                       rtol=1e-4, atol=1e-5)

    def test_loss_and_gradient_parity(self, tmp_path, monkeypatch):
        from point_dae_tpu import ops
        from point_dae_tpu.models import transformer as tr

        torch.manual_seed(42)
        rng = np.random.default_rng(42)
        pts = rng.normal(size=(self.B, self.N, 3)).astype(np.float32)

        # deterministic mask: exactly G/2 masked per row, fixed pattern
        mask_np = np.zeros((self.B, self.G), bool)
        mask_np[0, [1, 3, 4, 6]] = True
        mask_np[1, [0, 2, 5, 7]] = True
        monkeypatch.setattr(
            tr, "sample_patch_mask",
            lambda key, b, g, ratio, rand: jnp.asarray(mask_np))

        tm = TorchFlagship(dim=self.DIM, depth=self.DEPTH, heads=self.HEADS,
                           dec_depth=1, dec_heads=2).eval()
        # randomize patch-embed BN running stats so eval-mode BN is a real
        # conversion test, not the 0/1 defaults
        for bn in [tm.MAE_encoder.encoder.first_conv[1],
                   tm.MAE_encoder.encoder.second_conv[1]]:
            bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.1)
            bn.running_var.copy_(
                torch.rand_like(bn.running_var) * 0.5 + 0.75)

        neigh_j, center_j = ops.group_neighborhood(jnp.asarray(pts), self.G,
                                                   self.S)
        neigh_t = torch.as_tensor(np.asarray(neigh_j))
        center_t = torch.as_tensor(np.asarray(center_j))
        mask_t = torch.as_tensor(mask_np)

        l1_t, l2_t = tm(neigh_t, center_t, mask_t)
        (l1_t + l2_t).backward()

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        gd = {k: p.grad.numpy() for k, p in tm.named_parameters()
              if p.grad is not None}
        pf, bsf = _convert_full(tmp_path, sd, "transformer",
                                encoder_prefix="MAE_encoder")
        gp, _ = _convert_full(tmp_path, gd, "transformer",
                              encoder_prefix="MAE_encoder")

        fm = tr.PointCAE_transformer_fc_global_folding_local(
            config=self._config())
        pj = jnp.asarray(pts)
        v = fm.init({"params": jax.random.key(0), "mask": jax.random.key(1)},
                    pj, pj, train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)

        def losses(p):
            l1, l2 = fm.apply({"params": p, "batch_stats": bs}, pj, pj,
                              train=False, rngs={"mask": jax.random.key(2)})
            return l1 + l2, (l1, l2)

        (_, (l1_j, l2_j)), grads = jax.value_and_grad(
            losses, has_aux=True)(params)
        np.testing.assert_allclose(float(l1_j), float(l1_t), rtol=1e-4)
        np.testing.assert_allclose(float(l2_j), float(l2_t), rtol=1e-4)

        got = flatten_keys(jax.device_get(grads))
        assert set(gp) <= set(got), sorted(set(gp) - set(got))
        for key in sorted(gp):
            np.testing.assert_allclose(
                got[key], gp[key], rtol=2e-3, atol=5e-4,
                err_msg=f"flagship gradient mismatch at {key}")
