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
                                 TorchBlock, TorchTokenEmbed)
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


class TorchMaskSurfV2(tnn.Module):
    """MaskSurf_v2_local_global_point twin (MaskSurf_v2.py:947-1163 dataflow,
    masked branch): MaskTransformer encoder on visible tokens, coarse surfel
    head (7*G) on the pooled visible feature, TransformerDecoder on
    [visible, mask tokens], 7*S surfel head on the masked tokens.

    Only the two xyz chamfers reach the returned loss (the reference's
    surfel combination is commented out, :1145-1146, and the inverse
    weights are detached with w[3] == 1, :1140-1144):
        loss_point = l_coarse_xyz * sg(l_xyz / l_coarse_xyz) + l_xyz
    so this twin computes exactly those terms."""

    def __init__(self, dim=64, depth=2, heads=2, dec_depth=1, dec_heads=2,
                 num_group=8, group_size=6):
        super().__init__()
        self.dim = dim
        self.num_group = num_group
        self.group_size = group_size

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
            tnn.Linear(1024, 7 * num_group))
        self.increase_dim = tnn.Sequential(
            tnn.Conv1d(dim, 7 * group_size, 1))

    def forward(self, neigh, center, mask):
        """neigh: (B, G, S, 3) centered GT patches; center: (B, G, 3);
        mask: (B, G) bool."""
        B, G, S, _ = neigh.shape
        tokens = self.MAE_encoder.encoder(neigh)    # embed ALL G patches
        C = tokens.shape[-1]
        x_vis = tokens[~mask].reshape(B, -1, C)
        pos = self.MAE_encoder.pos_embed(center[~mask].reshape(B, -1, 3))
        x_vis = self.MAE_encoder.norm(self.MAE_encoder.blocks(x_vis, pos))

        gfeat = x_vis.max(1).values + x_vis.mean(1)
        coarse = self.coarse_pred(gfeat).reshape(B, -1, 7)
        loss_cx = torch_chamfer_l2(coarse[:, :, :3].contiguous(), center)

        pos_vis = self.decoder_pos_embed(center[~mask]).reshape(B, -1, C)
        pos_mask = self.decoder_pos_embed(center[mask]).reshape(B, -1, C)
        M = pos_mask.shape[1]
        x_full = torch.cat([x_vis, self.mask_token.expand(B, M, -1)], 1)
        pos_full = torch.cat([pos_vis, pos_mask], 1)
        x_rec = self.MAE_decoder(x_full, pos_full, M)   # (B, M, C)

        surfel = self.increase_dim(x_rec.transpose(1, 2)).transpose(1, 2)
        surfel = surfel.reshape(B * M, S, 7)
        gt_pts = neigh[mask].reshape(B * M, S, 3)
        loss_xyz = torch_chamfer_l2(surfel[:, :, :3].contiguous(), gt_pts)

        loss_point = loss_cx * (loss_xyz / loss_cx).detach() + loss_xyz
        return loss_point


class TestMaskSurfV2FullModel:
    B, N, G, S = 2, 64, 8, 6
    DIM, DEPTH, HEADS = 64, 2, 2

    def _config(self):
        return {
            "loss": "cdl2normal", "all_patch": "False",
            "num_group": self.G, "group_size": self.S,
            "transformer_config": {
                "trans_dim": self.DIM, "depth": self.DEPTH,
                "num_heads": self.HEADS, "encoder_dims": self.DIM,
                "decoder_depth": 1, "decoder_num_heads": 2,
                "drop_path_rate": 0.0, "mask_ratio": 0.5,
                "rand_ratio": "False", "mask_type": "rand",
            },
        }

    def test_loss_and_gradient_parity(self, tmp_path, monkeypatch):
        from point_dae_tpu import ops
        from point_dae_tpu.models import masksurf as ms
        from point_dae_tpu.models import transformer as tr

        torch.manual_seed(43)
        rng = np.random.default_rng(43)
        pts = rng.normal(size=(self.B, self.N, 3)).astype(np.float32)
        normals = rng.normal(size=(self.B, self.N, 3)).astype(np.float32)
        clean = np.concatenate([pts, normals], -1)

        mask_np = np.zeros((self.B, self.G), bool)
        mask_np[0, [1, 3, 4, 6]] = True
        mask_np[1, [0, 2, 5, 7]] = True
        monkeypatch.setattr(
            tr, "sample_patch_mask",
            lambda key, b, g, ratio, rand: jnp.asarray(mask_np))

        tm = TorchMaskSurfV2(dim=self.DIM, depth=self.DEPTH, heads=self.HEADS,
                             dec_depth=1, dec_heads=2, num_group=self.G,
                             group_size=self.S).eval()
        for bn in [tm.MAE_encoder.encoder.first_conv[1],
                   tm.MAE_encoder.encoder.second_conv[1]]:
            bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.1)
            bn.running_var.copy_(
                torch.rand_like(bn.running_var) * 0.5 + 0.75)

        # grouping from OUR front-end feeds both sides (its CUDA-convention
        # parity has its own oracle, TestFlagshipFullModel)
        fps_idx, center_j, idx = ops.fps_knn(jnp.asarray(pts), self.G, self.S)
        neigh_j = ops.group_points(jnp.asarray(pts), idx) \
            - center_j[:, :, None, :]

        l_t = tm(torch.as_tensor(np.asarray(neigh_j)),
                 torch.as_tensor(np.asarray(center_j)),
                 torch.as_tensor(mask_np))
        l_t.backward()

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        gd = {k: p.grad.numpy() for k, p in tm.named_parameters()
              if p.grad is not None}
        pf, bsf = _convert_full(tmp_path, sd, "masksurf",
                                encoder_prefix="MAE_encoder")
        gp, _ = _convert_full(tmp_path, gd, "masksurf",
                              encoder_prefix="MAE_encoder")

        fm = ms.MaskSurf_v2_local_global_point(config=self._config())
        cj = jnp.asarray(clean)
        v = fm.init({"params": jax.random.key(0), "mask": jax.random.key(1)},
                    cj[..., :3], cj, train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)

        def loss(p):
            l1, l2 = fm.apply({"params": p, "batch_stats": bs}, cj[..., :3],
                              cj, train=False, rngs={"mask": jax.random.key(2)})
            assert l2.shape == ()
            return l1

        lj, grads = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(float(lj), float(l_t), rtol=1e-4)

        got = flatten_keys(jax.device_get(grads))
        assert set(gp) <= set(got), sorted(set(gp) - set(got))
        # the normal/position channels of both heads must receive ZERO
        # gradient (reference quirk: only the xyz chamfers are returned)
        for key in sorted(gp):
            np.testing.assert_allclose(
                got[key], gp[key], rtol=2e-3, atol=5e-4,
                err_msg=f"masksurf_v2 gradient mismatch at {key}")


class TorchM2AEFcCenter(tnn.Module):
    """Point_MDAE_with_fc_center_p twin (Point_M2AE.py:691-884 dataflow +
    H_Encoder :17-181), written for the equal-visible-count case: every batch
    row has the same number of visible tokens at every scale, so the
    reference's pad-to-batch-max machinery injects no pad rows and its
    padded-buffer global pooling (:825-835) equals exact visible pooling.
    The test constructs masks guaranteeing this (it asserts the counts)."""

    def __init__(self, dims, depths, heads, num_groups, group_sizes,
                 decoder_dims, decoder_depths, up_blocks):
        super().__init__()
        self.dims = dims
        self.num_groups = num_groups
        self.group_sizes = group_sizes
        self.decoder_dims = decoder_dims

        class HEnc(tnn.Module):
            def __init__(self):
                super().__init__()
                self.token_embed = tnn.ModuleList(
                    [TorchTokenEmbed(3 if i == 0 else dims[i - 1], dims[i])
                     for i in range(len(dims))])
                self.encoder_pos_embeds = tnn.ModuleList([
                    tnn.Sequential(tnn.Linear(3, d), tnn.GELU(),
                                   tnn.Linear(d, d)) for d in dims])

                class Stage(tnn.Module):
                    def __init__(self, d, depth):
                        super().__init__()
                        self.blocks = tnn.ModuleList(
                            [TorchBlock(d, heads) for _ in range(depth)])

                    def forward(self, x, pos):
                        for b in self.blocks:
                            x = b(x + pos)
                        return x

                self.encoder_blocks = tnn.ModuleList(
                    [Stage(dims[i], depths[i]) for i in range(len(dims))])
                self.encoder_norms = tnn.ModuleList(
                    [tnn.LayerNorm(d) for d in dims])

        class TorchTokenProp(tnn.Module):
            """PointNetFeaturePropagation (Point_M2AE_modules.py:53-123,
            kernel=1, groups=1, res_expansion=1): ConvBNGELU fuse, then
            blocks x (ConvBNGELU -> ConvBN) with GELU on the residual sum,
            after 3-NN inverse-distance interpolation."""

            def __init__(self, in_c, out_c, blocks):
                super().__init__()

                class Fuse(tnn.Module):
                    def __init__(self):
                        super().__init__()
                        self.net = tnn.Sequential(
                            tnn.Conv1d(in_c, out_c, 1),
                            tnn.BatchNorm1d(out_c), tnn.GELU())

                    def forward(self, x):
                        return self.net(x)

                class Res(tnn.Module):
                    def __init__(self):
                        super().__init__()
                        self.net1 = tnn.Sequential(
                            tnn.Conv1d(out_c, out_c, 1),
                            tnn.BatchNorm1d(out_c), tnn.GELU())
                        self.net2 = tnn.Sequential(
                            tnn.Conv1d(out_c, out_c, 1),
                            tnn.BatchNorm1d(out_c))

                    def forward(self, x):
                        return torch.nn.functional.gelu(
                            self.net2(self.net1(x)) + x)

                class Ext(tnn.Module):
                    def __init__(self):
                        super().__init__()
                        self.operation = tnn.Sequential(
                            *[Res() for _ in range(blocks)])

                    def forward(self, x):
                        return self.operation(x)

                self.fuse = Fuse()
                self.extraction = Ext()

            def forward(self, xyz1, xyz2, points1, points2):
                B, N, _ = xyz1.shape
                d = torch.cdist(xyz1, xyz2) ** 2
                d, idx = d.sort(dim=-1)
                d, idx = d[:, :, :3], idx[:, :, :3]
                w = 1.0 / (d + 1e-8)
                w = w / w.sum(2, keepdim=True)
                gathered = torch.gather(
                    points2.unsqueeze(1).expand(-1, N, -1, -1), 2,
                    idx.unsqueeze(-1).expand(-1, -1, -1, points2.shape[-1]))
                interp = (gathered * w.unsqueeze(-1)).sum(2)
                x = torch.cat([points1, interp], dim=-1).permute(0, 2, 1)
                x = self.extraction(self.fuse(x))
                return x.permute(0, 2, 1)

        self.h_encoder = HEnc()
        for i, (din, g) in enumerate(
                [(dims[2], num_groups[2]), (dims[1], num_groups[1]),
                 (dims[0], num_groups[0])]):
            setattr(self, f"coarse_pred_{i}", tnn.Sequential(
                tnn.Linear(din, 1024), tnn.ReLU(),
                tnn.Linear(1024, 1024), tnn.ReLU(),
                tnn.Linear(1024, 3 * g)))
        self.mask_token = tnn.Parameter(torch.randn(1, decoder_dims[0]) * .02)

        class DStage(tnn.Module):
            def __init__(self, d, depth):
                super().__init__()
                self.blocks = tnn.ModuleList(
                    [TorchBlock(d, heads) for _ in range(depth)])

            def forward(self, x, pos):
                for b in self.blocks:
                    x = b(x + pos)
                return x

        self.h_decoder = tnn.ModuleList(
            [DStage(decoder_dims[i], decoder_depths[i])
             for i in range(len(decoder_dims))])
        self.decoder_pos_embeds = tnn.ModuleList([
            tnn.Sequential(tnn.Linear(3, d), tnn.GELU(), tnn.Linear(d, d))
            for d in decoder_dims])
        self.token_prop = tnn.ModuleList(
            [TorchTokenProp(decoder_dims[i] + decoder_dims[i - 1],
                            decoder_dims[i], up_blocks[i - 1])
             for i in range(1, len(decoder_dims))])
        self.decoder_norm = tnn.LayerNorm(decoder_dims[-1])
        self.rec_head = tnn.Conv1d(decoder_dims[-1], 3 * group_sizes[0], 1)

    def forward(self, neighborhoods, centers, idxs, masks):
        """All per-scale lists fine->coarse; masks (B, G_i) bool with EQUAL
        per-row visible counts; idxs[i] (B, G_i, S_i) into scale i-1."""
        B = centers[0].shape[0]
        he = self.h_encoder
        x_vis_list = []
        carry = None
        for i in range(len(centers)):
            if i == 0:
                git = he.token_embed[0](neighborhoods[0])
            else:
                Gp = carry.shape[1]
                flat = carry.reshape(B * Gp, -1)
                off = (torch.arange(B)[:, None, None] * Gp)
                git = he.token_embed[i](flat[(idxs[i] + off).reshape(-1)]
                                        .reshape(B, idxs[i].shape[1],
                                                 idxs[i].shape[2], -1))
            vis = ~masks[i]
            C = git.shape[-1]
            x_vis = git[vis].reshape(B, -1, C)
            cvis = centers[i][vis].reshape(B, -1, 3)
            pos = he.encoder_pos_embeds[i](cvis)
            x_vis = he.encoder_blocks[i](x_vis, pos)
            x_vis_list.append(x_vis)
            if i < len(centers) - 1:
                git = git.clone()
                git[vis] = x_vis.reshape(-1, C)
                carry = git
        x_vis_list = [he.encoder_norms[i](x) for i, x in
                      enumerate(x_vis_list)]

        centers_r = centers[::-1]
        neighborhoods_r = neighborhoods[::-1]
        x_vis_r = x_vis_list[::-1]
        masks_r = masks[::-1]

        loss2 = 0.0
        for i in range(3):
            g = x_vis_r[i].max(1).values + x_vis_r[i].mean(1)
            coarse = getattr(self, f"coarse_pred_{i}")(g).reshape(B, -1, 3)
            loss2 = loss2 + torch_chamfer_l2(coarse, centers_r[i])

        for i in range(len(self.decoder_dims)):
            center = centers_r[i]
            if i == 0:
                mask = masks_r[0]
                C = x_vis_r[0].shape[-1]
                center_0 = torch.cat([center[~mask].reshape(B, -1, 3),
                                      center[mask].reshape(B, -1, 3)], 1)
                pos_vis = self.decoder_pos_embeds[0](
                    center[~mask]).reshape(B, -1, C)
                pos_mask = self.decoder_pos_embeds[0](
                    center[mask]).reshape(B, -1, C)
                pos_full = torch.cat([pos_vis, pos_mask], 1)
                Nm = pos_mask.shape[1]
                x_full = torch.cat(
                    [x_vis_r[0], self.mask_token.expand(B, Nm, -1)], 1)
            else:
                vis = ~masks_r[i]
                C = x_vis_r[i].shape[-1]
                x_full_en = torch.zeros(B, center.shape[1], C)
                x_full_en[vis] = x_vis_r[i].reshape(-1, C)
                src_xyz = center_0 if i == 1 else centers_r[i - 1]
                x_full = self.token_prop[i - 1](center, src_xyz,
                                                x_full_en, x_full)
                pos_full = self.decoder_pos_embeds[i](center)
            x_full = self.h_decoder[i](x_full, pos_full)

        x_full = self.decoder_norm(x_full)
        C = x_full.shape[-1]
        mid_mask = masks_r[len(self.decoder_dims) - 1]
        x_rec = x_full[mid_mask].reshape(-1, C)
        L = x_rec.shape[0]
        rec = self.rec_head(x_rec.unsqueeze(-1)).reshape(L, -1, 3)
        gt = neighborhoods_r[len(self.decoder_dims) - 1][mid_mask]
        gt = gt.reshape(L, -1, 3)
        loss = torch_chamfer_l2(rec, gt)
        return loss, loss2


class TestM2AEFcCenterFullModel:
    B, N = 2, 128
    NUM_GROUPS = (32, 16, 8)
    GROUP_SIZES = (6, 4, 4)
    DIMS = (24, 48, 96)
    DEC_DIMS = (96, 48)

    def _config(self):
        return {
            "num_groups": list(self.NUM_GROUPS),
            "group_sizes": list(self.GROUP_SIZES),
            "encoder_dims": list(self.DIMS),
            "encoder_depths": [1, 1, 1], "num_heads": 2,
            "drop_path_rate": 0.0, "mask_ratio": 0.5,
            "decoder_dims": list(self.DEC_DIMS), "decoder_depths": [1, 1],
            "decoder_up_blocks": [1], "corrupt_type": [],
        }

    def _equal_count_masks(self, idxs_np):
        """Search coarsest-scale masks (fixed 4/8 masked) whose
        back-propagated visible counts match across the two batch rows at
        every scale — removing the reference's pad rows entirely."""
        import itertools as it

        def backprop(vis_coarse, idx, g_fine):
            vis = np.zeros(g_fine, bool)
            vis[idx[vis_coarse].reshape(-1)] = True
            return vis

        per_row = []           # row -> {(cnt_mid, cnt_fine): mask_top}
        for b in range(self.B):
            opts = {}
            for masked in it.combinations(range(self.NUM_GROUPS[2]), 4):
                m = np.zeros(self.NUM_GROUPS[2], bool)
                m[list(masked)] = True
                vis_mid = backprop(~m, idxs_np[2][b], self.NUM_GROUPS[1])
                vis_fine = backprop(vis_mid, idxs_np[1][b],
                                    self.NUM_GROUPS[0])
                opts.setdefault((vis_mid.sum(), vis_fine.sum()), m)
            per_row.append(opts)
        common = sorted(set(per_row[0]) & set(per_row[1]))
        assert common, "no equal-count top mask pair exists for this data"
        key = common[0]
        return np.stack([per_row[0][key], per_row[1][key]])

    def test_loss_and_gradient_parity(self, tmp_path, monkeypatch):
        from point_dae_tpu import ops
        from point_dae_tpu.models import m2ae as m2

        torch.manual_seed(44)
        rng = np.random.default_rng(44)
        pts = rng.normal(size=(self.B, self.N, 3)).astype(np.float32)

        neighborhoods, centers, idxs = m2.pyramid_group(
            jnp.asarray(pts), self.NUM_GROUPS, self.GROUP_SIZES)
        idxs_np = [np.asarray(i) for i in idxs]
        mask_top = self._equal_count_masks(idxs_np)
        monkeypatch.setattr(
            m2, "sample_patch_mask",
            lambda key, b, g, ratio, rand_ratio: jnp.asarray(mask_top))

        tm = TorchM2AEFcCenter(
            dims=self.DIMS, depths=(1, 1, 1), heads=2,
            num_groups=self.NUM_GROUPS, group_sizes=self.GROUP_SIZES,
            decoder_dims=self.DEC_DIMS, decoder_depths=(1, 1),
            up_blocks=(1,)).eval()
        # randomize every BN's running stats: eval-mode parity must prove
        # the conversion of real statistics, not fresh 0/1 defaults
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm1d):
                mod.running_mean.copy_(
                    torch.randn_like(mod.running_mean) * 0.1)
                mod.running_var.copy_(
                    torch.rand_like(mod.running_var) * 0.5 + 0.75)

        # per-scale masks fine->coarse (same derivation as HEncoder)
        vis2 = ~mask_top
        masks_np = [None, None, mask_top]
        vis = vis2
        for i in (2, 1):
            g_fine = self.NUM_GROUPS[i - 1]
            nxt = np.zeros((self.B, g_fine), bool)
            for b in range(self.B):
                nxt[b, idxs_np[i][b][vis[b]].reshape(-1)] = True
            masks_np[i - 1] = ~nxt
            vis = nxt
        counts = [(~m).sum(1) for m in masks_np]
        for c in counts:
            assert c[0] == c[1], f"visible counts differ: {counts}"

        neigh_t = [torch.as_tensor(np.asarray(n)) for n in neighborhoods]
        cent_t = [torch.as_tensor(np.asarray(c)) for c in centers]
        idx_t = [torch.as_tensor(i.astype(np.int64)) for i in idxs_np]
        mask_t = [torch.as_tensor(m) for m in masks_np]

        l1_t, l2_t = tm(neigh_t, cent_t, idx_t, mask_t)
        (l1_t + l2_t).backward()

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        gd = {k: p.grad.numpy() for k, p in tm.named_parameters()
              if p.grad is not None}
        pf, bsf = _convert_full(tmp_path, sd, "m2ae")
        gp, _ = _convert_full(tmp_path, gd, "m2ae")

        fm = m2.Point_MDAE_with_fc_center_p(config=self._config())
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
                err_msg=f"m2ae gradient mismatch at {key}")


class TorchMaskFeatPointmae(tnn.Module):
    """MaskFeat_transformer_pointmae twin (MaskFeat_transformer.py:347-491
    dataflow, all_patch='False'): student MaskTransformer on visible tokens,
    decoder over [visible, mask tokens], Conv1d(C,C,1) feature head; target
    = frozen Point-MAE teacher encoder run without masking
    (pointmae.MAE_encoder, :473-480), loss = mean over masked tokens of
    ||normalize(t) - normalize(p)||^2 (:481-484)."""

    def __init__(self, dim=64, depth=2, heads=2, dec_depth=1, dec_heads=2):
        super().__init__()
        self.dim = dim

        def make_enc():
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
                                [TorchBlock(dim, heads)
                                 for _ in range(depth)])

                        def forward(self, x, pos):
                            for b in self.blocks:
                                x = b(x + pos)
                            return x

                    self.blocks = Blocks()
                    self.norm = tnn.LayerNorm(dim)

            return Enc()

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

        class PointMAE(tnn.Module):
            def __init__(self):
                super().__init__()
                self.MAE_encoder = make_enc()

        self.MAE_encoder = make_enc()
        self.MAE_decoder = Dec()
        self.mask_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.decoder_pos_embed = tnn.Sequential(
            tnn.Linear(3, 128), tnn.GELU(), tnn.Linear(128, dim))
        self.increase_dim = tnn.Sequential(tnn.Conv1d(dim, dim, 1))
        self.pointmae = PointMAE()
        for p in self.pointmae.parameters():
            p.requires_grad = False

    def _run_teacher(self, neigh, center):
        t = self.pointmae.MAE_encoder
        tokens = t.encoder(neigh)                        # (B, G, C) noaug
        pos = t.pos_embed(center)
        return t.norm(t.blocks(tokens, pos))

    def forward(self, neigh, center, mask):
        B, G, S, _ = neigh.shape
        tokens = self.MAE_encoder.encoder(neigh)         # embed ALL patches
        C = tokens.shape[-1]
        x_vis = tokens[~mask].reshape(B, -1, C)
        pos = self.MAE_encoder.pos_embed(center[~mask].reshape(B, -1, 3))
        x_vis = self.MAE_encoder.norm(self.MAE_encoder.blocks(x_vis, pos))

        pos_vis = self.decoder_pos_embed(center[~mask]).reshape(B, -1, C)
        pos_mask = self.decoder_pos_embed(center[mask]).reshape(B, -1, C)
        M = pos_mask.shape[1]
        x_full = torch.cat([x_vis, self.mask_token.expand(B, M, -1)], 1)
        pos_full = torch.cat([pos_vis, pos_mask], 1)
        x_rec = self.MAE_decoder(x_full, pos_full, M)    # (B, M, C)

        pred = self.increase_dim(x_rec.transpose(1, 2)).transpose(1, 2)
        pred = pred.reshape(B * M, -1)

        with torch.no_grad():
            x_all = self._run_teacher(neigh, center)
        gt = x_all[mask]                                 # (B*M, C)
        gt = torch.nn.functional.normalize(gt, dim=1)
        pred = torch.nn.functional.normalize(pred, dim=1)
        return (gt - pred).pow(2).sum(1).mean()


class TestMaskFeatFullModel:
    B, N, G, S = 2, 64, 8, 6
    DIM, DEPTH, HEADS = 64, 2, 2

    def _config(self):
        return {
            "loss": "cdl2", "all_patch": "False",
            "num_group": self.G, "group_size": self.S,
            "transformer_config": {
                "trans_dim": self.DIM, "depth": self.DEPTH,
                "num_heads": self.HEADS, "encoder_dims": self.DIM,
                "decoder_depth": 1, "decoder_num_heads": 2,
                "drop_path_rate": 0.0, "mask_ratio": 0.5,
                "rand_ratio": "False", "mask_type": "rand",
            },
        }

    def test_loss_and_gradient_parity(self, tmp_path, monkeypatch):
        from point_dae_tpu import ops
        from point_dae_tpu.models import maskfeat as mf
        from point_dae_tpu.models import transformer as tr

        torch.manual_seed(44)
        rng = np.random.default_rng(44)
        pts = rng.normal(size=(self.B, self.N, 3)).astype(np.float32)

        mask_np = np.zeros((self.B, self.G), bool)
        mask_np[0, [1, 3, 4, 6]] = True
        mask_np[1, [0, 2, 5, 7]] = True
        monkeypatch.setattr(
            tr, "sample_patch_mask",
            lambda key, b, g, ratio, rand: jnp.asarray(mask_np))

        tm = TorchMaskFeatPointmae(dim=self.DIM, depth=self.DEPTH,
                                   heads=self.HEADS, dec_depth=1,
                                   dec_heads=2).eval()
        # randomized BN running stats on BOTH patch embeds (student+teacher)
        for enc in [tm.MAE_encoder, tm.pointmae.MAE_encoder]:
            for bn in [enc.encoder.first_conv[1], enc.encoder.second_conv[1]]:
                bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.1)
                bn.running_var.copy_(
                    torch.rand_like(bn.running_var) * 0.5 + 0.75)

        neigh_j, center_j = ops.group_neighborhood(jnp.asarray(pts), self.G,
                                                   self.S)
        l_t = tm(torch.as_tensor(np.asarray(neigh_j)),
                 torch.as_tensor(np.asarray(center_j)),
                 torch.as_tensor(mask_np))
        l_t.backward()

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        gd = {k: p.grad.numpy() for k, p in tm.named_parameters()
              if p.grad is not None}
        pf, bsf = _convert_full(tmp_path, sd, "maskfeat",
                                encoder_prefix="MAE_encoder")
        gp, _ = _convert_full(tmp_path, gd, "maskfeat",
                              encoder_prefix="MAE_encoder")
        # conversion must leave nothing unmatched (teacher subtree included)
        assert not [k for k in pf if "." in k], \
            [k for k in pf if "." in k]

        fm = mf.MaskFeat_transformer_pointmae(config=self._config())
        pj = jnp.asarray(pts)
        v = fm.init({"params": jax.random.key(0), "mask": jax.random.key(1)},
                    pj, pj, train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)

        def loss(p):
            l, _ = fm.apply({"params": p, "batch_stats": bs}, pj, pj,
                            train=False, rngs={"mask": jax.random.key(2)})
            return l

        l_j, grads = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(float(l_j), float(l_t), rtol=1e-4)

        got = flatten_keys(jax.device_get(grads))
        assert set(gp) <= set(got), sorted(set(gp) - set(got))
        for key in sorted(gp):
            np.testing.assert_allclose(
                got[key], gp[key], rtol=2e-3, atol=5e-4,
                err_msg=f"maskfeat gradient mismatch at {key}")
        # the frozen teacher must receive exactly zero gradient
        for key in got:
            if key.startswith("teacher/"):
                assert float(np.abs(got[key]).max()) == 0.0, key


class TorchNoPoolDGCNN(tnn.Module):
    """dgcnn_encoder_nopooling twin (dgcnn_util.py:141-188): 4 EdgeConvs +
    1024-d fuse, returns POINTWISE features (B, 1024, N). Attribute naming
    mirrors the reference exactly (bnX registered before convX) so
    state_dict keys are bnX.* / convX.0.*."""

    def __init__(self, k=20):
        super().__init__()
        self.k = k
        self.bn1 = tnn.BatchNorm2d(64)
        self.bn2 = tnn.BatchNorm2d(64)
        self.bn3 = tnn.BatchNorm2d(128)
        self.bn4 = tnn.BatchNorm2d(256)
        self.bn5 = tnn.BatchNorm1d(1024)
        self.conv1 = tnn.Sequential(tnn.Conv2d(6, 64, 1, bias=False),
                                    self.bn1, tnn.LeakyReLU(0.2))
        self.conv2 = tnn.Sequential(tnn.Conv2d(128, 64, 1, bias=False),
                                    self.bn2, tnn.LeakyReLU(0.2))
        self.conv3 = tnn.Sequential(tnn.Conv2d(128, 128, 1, bias=False),
                                    self.bn3, tnn.LeakyReLU(0.2))
        self.conv4 = tnn.Sequential(tnn.Conv2d(256, 256, 1, bias=False),
                                    self.bn4, tnn.LeakyReLU(0.2))
        self.conv5 = tnn.Sequential(tnn.Conv1d(512, 1024, 1, bias=False),
                                    self.bn5, tnn.LeakyReLU(0.2))

    def _graph_feature(self, x):                          # (B, C, N)
        B, C, N = x.shape
        xt = x.transpose(2, 1)
        d = torch.cdist(xt, xt) ** 2
        idx = d.topk(self.k, dim=-1, largest=False).indices
        nbr = torch.gather(
            xt[:, :, None, :].expand(B, N, N, C), 1,
            idx[..., None].expand(B, N, self.k, C))
        ctr = xt[:, :, None, :].expand(B, N, self.k, C)
        e = torch.cat([nbr - ctr, ctr], dim=-1)
        return e.permute(0, 3, 1, 2)                      # (B, 2C, N, k)

    def forward(self, x):                                 # (B, 3, N)
        outs = []
        h = x
        for i in range(1, 5):
            e = self._graph_feature(h)
            h = getattr(self, f"conv{i}")(e).max(dim=-1)[0]
            outs.append(h)
        return self.conv5(torch.cat(outs, dim=1))         # (B, 1024, N)


class TorchMaskFeatDGCNN(tnn.Module):
    """MaskFeat_dgcnn twin (MaskFeat_DGCNN.py:346-499, all_patch='False'):
    same student as the pointmae flavour but Conv1d(C,1024,1) head; targets
    are the frozen DGCNN teacher's pointwise features grouped through the
    SAME patch kNN indices and max-pooled over the patch (:459-475)."""

    def __init__(self, dim=64, depth=2, heads=2, dec_depth=1, dec_heads=2,
                 teacher_k=20):
        super().__init__()

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

        class Teacher(tnn.Module):
            def __init__(self):
                super().__init__()
                self.dgcnn_encoder = TorchNoPoolDGCNN(k=teacher_k)

        self.MAE_encoder = Enc()
        self.MAE_decoder = Dec()
        self.mask_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.decoder_pos_embed = tnn.Sequential(
            tnn.Linear(3, 128), tnn.GELU(), tnn.Linear(128, dim))
        self.increase_dim = tnn.Sequential(tnn.Conv1d(dim, 1024, 1))
        self.teacher_model = Teacher()
        for p in self.teacher_model.parameters():
            p.requires_grad = False

    def forward(self, neigh, center, mask, pts, idx):
        """idx: (B, G, S) the patch kNN indices (shared with the framework
        side so the teacher grouping is identical)."""
        B, G, S, _ = neigh.shape
        tokens = self.MAE_encoder.encoder(neigh)
        C = tokens.shape[-1]
        x_vis = tokens[~mask].reshape(B, -1, C)
        pos = self.MAE_encoder.pos_embed(center[~mask].reshape(B, -1, 3))
        x_vis = self.MAE_encoder.norm(self.MAE_encoder.blocks(x_vis, pos))

        pos_vis = self.decoder_pos_embed(center[~mask]).reshape(B, -1, C)
        pos_mask = self.decoder_pos_embed(center[mask]).reshape(B, -1, C)
        M = pos_mask.shape[1]
        x_full = torch.cat([x_vis, self.mask_token.expand(B, M, -1)], 1)
        pos_full = torch.cat([pos_vis, pos_mask], 1)
        x_rec = self.MAE_decoder(x_full, pos_full, M)

        pred = self.increase_dim(x_rec.transpose(1, 2)).transpose(1, 2)
        pred = pred.reshape(B * M, -1)                    # (B*M, 1024)

        with torch.no_grad():
            pw = self.teacher_model.dgcnn_encoder(
                pts.transpose(1, 2)).transpose(1, 2)      # (B, N, 1024)
        D = pw.shape[-1]
        nbr = torch.gather(pw[:, None].expand(B, G, pts.shape[1], D), 2,
                           idx[..., None].expand(B, G, S, D))
        gt = nbr[mask].max(1).values                      # (B*M, 1024)
        gt = torch.nn.functional.normalize(gt, dim=1)
        pred = torch.nn.functional.normalize(pred, dim=1)
        return (gt - pred).pow(2).sum(1).mean()


class TestMaskFeatDGCNNFullModel:
    B, N, G, S = 2, 64, 8, 6
    DIM, DEPTH, HEADS = 64, 2, 2

    def _config(self):
        return {
            "loss": "cdl2", "all_patch": "False",
            "num_group": self.G, "group_size": self.S,
            "transformer_config": {
                "trans_dim": self.DIM, "depth": self.DEPTH,
                "num_heads": self.HEADS, "encoder_dims": self.DIM,
                "decoder_depth": 1, "decoder_num_heads": 2,
                "drop_path_rate": 0.0, "mask_ratio": 0.5,
                "rand_ratio": "False", "mask_type": "rand",
            },
        }

    def test_loss_and_gradient_parity(self, tmp_path, monkeypatch):
        from point_dae_tpu import ops
        from point_dae_tpu.models import maskfeat as mf
        from point_dae_tpu.models import transformer as tr

        torch.manual_seed(45)
        rng = np.random.default_rng(45)
        pts = rng.normal(size=(self.B, self.N, 3)).astype(np.float32)

        mask_np = np.zeros((self.B, self.G), bool)
        mask_np[0, [0, 2, 5, 7]] = True
        mask_np[1, [1, 3, 4, 6]] = True
        monkeypatch.setattr(
            tr, "sample_patch_mask",
            lambda key, b, g, ratio, rand: jnp.asarray(mask_np))

        tm = TorchMaskFeatDGCNN(dim=self.DIM, depth=self.DEPTH,
                                heads=self.HEADS, dec_depth=1,
                                dec_heads=2).eval()
        for bn in [tm.MAE_encoder.encoder.first_conv[1],
                   tm.MAE_encoder.encoder.second_conv[1]]:
            bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.1)
            bn.running_var.copy_(
                torch.rand_like(bn.running_var) * 0.5 + 0.75)
        te = tm.teacher_model.dgcnn_encoder
        for bn in [te.bn1, te.bn2, te.bn3, te.bn4, te.bn5]:
            bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.1)
            bn.running_var.copy_(
                torch.rand_like(bn.running_var) * 0.5 + 0.75)

        pj = jnp.asarray(pts)
        fps_idx = ops.furthest_point_sample(pj, self.G)
        center_j = ops.gather_points(pj, fps_idx)
        _, idx_j = ops.knn(center_j, pj, self.S)
        neigh_j = ops.group_points(pj, idx_j) - center_j[:, :, None, :]

        l_t = tm(torch.as_tensor(np.asarray(neigh_j)).clone(),
                 torch.as_tensor(np.asarray(center_j)).clone(),
                 torch.as_tensor(mask_np),
                 torch.as_tensor(pts).clone(),
                 torch.as_tensor(np.asarray(idx_j)).long())
        l_t.backward()

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        gd = {k: p.grad.numpy() for k, p in tm.named_parameters()
              if p.grad is not None}
        pf, bsf = _convert_full(tmp_path, sd, "maskfeat",
                                encoder_prefix="MAE_encoder")
        gp, _ = _convert_full(tmp_path, gd, "maskfeat",
                              encoder_prefix="MAE_encoder")
        assert not [k for k in pf if "." in k], [k for k in pf if "." in k]

        fm = mf.MaskFeat_dgcnn(config=self._config())
        v = fm.init({"params": jax.random.key(0), "mask": jax.random.key(1)},
                    pj, pj, train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)

        def loss(p):
            l, _ = fm.apply({"params": p, "batch_stats": bs}, pj, pj,
                            train=False, rngs={"mask": jax.random.key(2)})
            return l

        l_j, grads = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(float(l_j), float(l_t), rtol=1e-4)

        got = flatten_keys(jax.device_get(grads))
        assert set(gp) <= set(got), sorted(set(gp) - set(got))
        for key in sorted(gp):
            np.testing.assert_allclose(
                got[key], gp[key], rtol=2e-3, atol=5e-4,
                err_msg=f"maskfeat-dgcnn gradient mismatch at {key}")
        for key in got:
            if key.startswith("teacher/"):
                assert float(np.abs(got[key]).max()) == 0.0, key
