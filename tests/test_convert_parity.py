"""Converter round-trip parity: independently written torch twins of the
reference's module layouts (mini-PointNet patch embed, ViT block, pos-embed
MLP, PointNet STN/encoder, PointNet++ SharedMLP SA, M2AE Token_Embed, cls
heads — torch naming conventions) are serialized to REAL .pth files and
driven through the full import pipeline
``load_torch_checkpoint -> convert_state_dict -> merge_pretrained`` and must
produce the same forward values as our flax modules. This validates the
exact path released .pth checkpoints take into the framework (names,
transposes, BN/LN leaf mapping, prefix strip rules).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from point_dae_tpu.models.layers import (PatchEncoder, PosEmbedMLP,
                                         TransformerBlock)
from point_dae_tpu.utils.checkpoint import (flatten_keys, load_torch_checkpoint,
                                            merge_pretrained)
from point_dae_tpu.utils.convert_torch import convert_state_dict


def _split_flat(flat, prefix=""):
    """Split converted flat keys into (params, batch_stats) dicts, optionally
    keeping only keys under ``prefix`` (which is stripped)."""
    p, bs = {}, {}
    for k, v in flat.items():
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix):]
        if k.endswith(("/mean", "/var")):
            bs[k] = v
        else:
            p[k] = v
    return p, bs


def _via_pth(tmp_path, sd, family, wrap="module."):
    """torch.save a real .pth (reference layout: {'base_model': sd} with
    'module.' DDP prefixes) and run the full import path."""
    path = str(tmp_path / "ckpt.pth")
    torch.save({"base_model": {wrap + k: torch.as_tensor(v)
                               for k, v in sd.items()}}, path)
    return convert_state_dict(load_torch_checkpoint(path), family)


class TorchPatchEmbed(tnn.Module):
    """Same wiring as the reference Encoder (PointCAE_transformer.py:20-51),
    written from its documented dataflow: two conv stacks with a global-max
    concat in between."""

    def __init__(self, out_c):
        super().__init__()
        self.first_conv = tnn.Sequential(
            tnn.Conv1d(3, 128, 1), tnn.BatchNorm1d(128), tnn.ReLU(),
            tnn.Conv1d(128, 256, 1))
        self.second_conv = tnn.Sequential(
            tnn.Conv1d(512, 512, 1), tnn.BatchNorm1d(512), tnn.ReLU(),
            tnn.Conv1d(512, out_c, 1))

    def forward(self, groups):                      # (B, G, S, 3)
        b, g, s, _ = groups.shape
        x = groups.reshape(b * g, s, 3).transpose(2, 1)
        f = self.first_conv(x)                      # (BG, 256, S)
        fg = torch.max(f, dim=2, keepdim=True)[0]
        f = torch.cat([fg.expand(-1, -1, s), f], dim=1)
        f = self.second_conv(f)
        return torch.max(f, dim=2)[0].reshape(b, g, -1)


class TorchBlock(tnn.Module):
    """Pre-norm ViT block with timm-style naming (qkv/proj/fc1/fc2)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.norm2 = tnn.LayerNorm(dim)

        class Attn(tnn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = tnn.Linear(dim, dim * 3, bias=False)
                self.proj = tnn.Linear(dim, dim)

            def forward(self, x):
                B, N, C = x.shape
                qkv = self.qkv(x).reshape(B, N, 3, heads, C // heads)
                qkv = qkv.permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                a = (q @ k.transpose(-2, -1)) * (C // heads) ** -0.5
                a = a.softmax(dim=-1)
                return self.proj((a @ v).transpose(1, 2).reshape(B, N, C))

        class Mlp(tnn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = tnn.Linear(dim, dim * 4)
                self.fc2 = tnn.Linear(dim * 4, dim)

            def forward(self, x):
                return self.fc2(torch.nn.functional.gelu(self.fc1(x)))

        self.attn = Attn()
        self.mlp = Mlp()

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


def _as_sd(module, prefix):
    return {f"{prefix}{k}": v.detach().numpy()
            for k, v in module.state_dict().items()}


class TestForwardParity:
    def test_patch_embed_parity(self):
        torch.manual_seed(0)
        tm = TorchPatchEmbed(64).eval()
        groups = torch.randn(2, 4, 8, 3)
        want = tm(groups).detach().numpy()

        flat = convert_state_dict(_as_sd(tm, "encoder."), "transformer")
        fm = PatchEncoder(64)
        v = fm.init(jax.random.key(0), jnp.asarray(groups.numpy()), train=False)
        params = merge_pretrained(v["params"], {
            k.split("/", 1)[1]: x for k, x in flat.items()
            if k.startswith("encoder/") and ("kernel" in k or
                                             "/bias" in k or "/scale" in k)})
        # BN running stats land in batch_stats
        bs = merge_pretrained(v["batch_stats"], {
            k.split("/", 1)[1]: x for k, x in flat.items()
            if k.startswith("encoder/") and ("/mean" in k or "/var" in k)})
        got = np.asarray(fm.apply({"params": params, "batch_stats": bs},
                                  jnp.asarray(groups.numpy()), train=False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_vit_block_parity(self):
        torch.manual_seed(1)
        tm = TorchBlock(32, 2).eval()
        x = torch.randn(2, 6, 32)
        want = tm(x).detach().numpy()

        sd = _as_sd(tm, "blocks.blocks.0.")
        flat = convert_state_dict(sd, "transformer")
        fm = TransformerBlock(32, 2)
        v = fm.init(jax.random.key(0), jnp.asarray(x.numpy()))
        params = merge_pretrained(v["params"], {
            k.split("/", 2)[2]: val for k, val in flat.items()
            if k.startswith("blocks/block0/")})
        got = np.asarray(fm.apply({"params": params},
                                  jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_pos_embed_parity(self):
        torch.manual_seed(2)
        tm = tnn.Sequential(tnn.Linear(3, 128), tnn.GELU(),
                            tnn.Linear(128, 32)).eval()
        x = torch.randn(5, 3)
        want = tm(x).detach().numpy()
        sd = {f"pos_embed.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        flat = convert_state_dict(sd, "transformer")
        fm = PosEmbedMLP(32)
        v = fm.init(jax.random.key(0), jnp.asarray(x.numpy()))
        params = merge_pretrained(v["params"], {
            k.split("/", 1)[1]: val for k, val in flat.items()})
        got = np.asarray(fm.apply({"params": params}, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TorchSTN(tnn.Module):
    """STN3d/STNkd twin (pointnet_util.py:18-92 dataflow: three conv+bn+relu,
    max-pool, two fc+bn+relu, fc to k*k, +identity)."""

    def __init__(self, k=3):
        super().__init__()
        self.k = k
        self.conv1 = tnn.Conv1d(k, 64, 1)
        self.conv2 = tnn.Conv1d(64, 128, 1)
        self.conv3 = tnn.Conv1d(128, 1024, 1)
        self.fc1 = tnn.Linear(1024, 512)
        self.fc2 = tnn.Linear(512, 256)
        self.fc3 = tnn.Linear(256, k * k)
        self.bn1 = tnn.BatchNorm1d(64)
        self.bn2 = tnn.BatchNorm1d(128)
        self.bn3 = tnn.BatchNorm1d(1024)
        self.bn4 = tnn.BatchNorm1d(512)
        self.bn5 = tnn.BatchNorm1d(256)

    def forward(self, x):                                # (B, C, N)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = torch.relu(self.bn3(self.conv3(h)))
        h = torch.max(h, 2)[0]
        h = torch.relu(self.bn4(self.fc1(h)))
        h = torch.relu(self.bn5(self.fc2(h)))
        h = self.fc3(h)
        return h.view(-1, self.k, self.k) + torch.eye(self.k)


class TorchPointNetEncoder(tnn.Module):
    """PointNetEncoder twin (pointnet_util.py:94-153): STN input transform,
    conv+bn stack, final max WITHOUT relu on the last conv."""

    def __init__(self):
        super().__init__()
        self.stn = TorchSTN(3)
        self.conv1 = tnn.Conv1d(3, 64, 1)
        self.conv2 = tnn.Conv1d(64, 128, 1)
        self.conv3 = tnn.Conv1d(128, 1024, 1)
        self.bn1 = tnn.BatchNorm1d(64)
        self.bn2 = tnn.BatchNorm1d(128)
        self.bn3 = tnn.BatchNorm1d(1024)

    def forward(self, x):                                # (B, 3, N)
        trans = self.stn(x)
        x = torch.bmm(x.transpose(2, 1), trans).transpose(2, 1)
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = self.bn3(self.conv3(x))
        return torch.max(x, 2)[0]


class TestPointNetFamily:
    def test_encoder_pth_roundtrip_parity(self, tmp_path):
        from point_dae_tpu.models.dae_pointnet import PointNetEncoder

        torch.manual_seed(3)
        tm = TorchPointNetEncoder().eval()
        pts = torch.randn(2, 3, 16)
        want = tm(pts).detach().numpy()

        sd = {f"pointnet_encoder.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        flat = _via_pth(tmp_path, sd, "pointnet")
        pf, bsf = _split_flat(flat, "pointnet_encoder/")

        fm = PointNetEncoder(use_tnet=True)
        x = jnp.asarray(pts.numpy().transpose(0, 2, 1))   # (B, N, 3)
        v = fm.init(jax.random.key(0), x, train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)
        got = np.asarray(fm.apply({"params": params, "batch_stats": bs},
                                  x, train=False))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_cls_head_parity(self, tmp_path):
        from point_dae_tpu.models.dae_pointnet import _PointNetClsHead

        torch.manual_seed(4)
        tm = tnn.Sequential(
            tnn.Linear(1024, 512), tnn.BatchNorm1d(512), tnn.ReLU(),
            tnn.Dropout(0.3), tnn.Linear(512, 256), tnn.BatchNorm1d(256),
            tnn.ReLU(), tnn.Linear(256, 15)).eval()
        x = torch.randn(4, 1024)
        want = tm(x).detach().numpy()
        sd = {f"cls_head_finetune.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        flat = _via_pth(tmp_path, sd, "pointnet")
        pf, bsf = _split_flat(flat, "cls_head/")
        fm = _PointNetClsHead(15)
        v = fm.init(jax.random.key(0), jnp.asarray(x.numpy()), train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)
        got = np.asarray(fm.apply({"params": params, "batch_stats": bs},
                                  jnp.asarray(x.numpy()), train=False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TorchDGCNNEncoder(tnn.Module):
    """dgcnn_encoder twin (dgcnn_util.py:87-139 dataflow: 4 EdgeConvs with
    (neighbor-self, self) edge features + 1024-d fuse, LeakyReLU 0.2,
    bias-free convs, global max)."""

    def __init__(self, k=6):
        super().__init__()
        self.k = k
        dims = [(6, 64), (128, 64), (128, 128), (256, 256)]
        for i, (cin, cout) in enumerate(dims, start=1):
            setattr(self, f"conv{i}", tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, bias=False),
                tnn.BatchNorm2d(cout), tnn.LeakyReLU(0.2)))
        self.conv5 = tnn.Sequential(tnn.Conv1d(512, 1024, 1, bias=False),
                                    tnn.BatchNorm1d(1024), tnn.LeakyReLU(0.2))

    def _graph_feature(self, x):                         # (B, C, N)
        B, C, N = x.shape
        xt = x.transpose(2, 1)                           # (B, N, C)
        d = torch.cdist(xt, xt) ** 2
        idx = d.topk(self.k, dim=-1, largest=False).indices  # (B, N, k)
        nbr = torch.gather(
            xt[:, :, None, :].expand(B, N, N, C), 1,
            idx[..., None].expand(B, N, self.k, C))
        ctr = xt[:, :, None, :].expand(B, N, self.k, C)
        e = torch.cat([nbr - ctr, ctr], dim=-1)          # (B, N, k, 2C)
        return e.permute(0, 3, 1, 2)                     # (B, 2C, N, k)

    def forward(self, x):                                # (B, 3, N)
        outs = []
        h = x
        for i in range(1, 5):
            e = self._graph_feature(h)
            h = getattr(self, f"conv{i}")(e).max(dim=-1)[0]
            outs.append(h)
        h = self.conv5(torch.cat(outs, dim=1))
        return h.max(dim=-1)[0]                          # (B, 1024)


class TestDGCNNEncoder:
    def test_encoder_pth_roundtrip_parity(self, tmp_path):
        """The released non-transformer checkpoint path: dgcnn_encoder
        weights through load -> convert -> merge -> DGCNNEncoder must
        reproduce the torch forward (global feature)."""
        from point_dae_tpu.models.dgcnn import DGCNNEncoder

        torch.manual_seed(14)
        tm = TorchDGCNNEncoder(k=6).eval()
        pts = torch.randn(2, 3, 48)
        want = tm(pts).detach().numpy()

        sd = {}
        for i in range(1, 6):
            conv = getattr(tm, f"conv{i}")
            sd[f"dgcnn_encoder.conv{i}.0.weight"] = \
                conv[0].weight.detach().numpy()
            for leaf, v in conv[1].state_dict().items():
                sd[f"dgcnn_encoder.bn{i}.{leaf}"] = np.asarray(
                    v.detach() if hasattr(v, "detach") else v)
        flat = _via_pth(tmp_path, sd, "dgcnn")
        pf, bsf = _split_flat(flat, "dgcnn_encoder/")

        fm = DGCNNEncoder(k=6)
        x = jnp.asarray(pts.numpy().transpose(0, 2, 1))
        v = fm.init({"params": jax.random.key(0)}, x, train=True)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)
        got, _ = fm.apply({"params": params, "batch_stats": bs}, x,
                          train=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-3)

    def test_fused_impl_same_converted_weights(self, tmp_path):
        """impl='fused' consumes the SAME converted checkpoint and matches
        the torch forward too (checkpoint interchange on the fused path)."""
        from point_dae_tpu.models.dgcnn import DGCNNEncoder

        torch.manual_seed(15)
        tm = TorchDGCNNEncoder(k=6).eval()
        pts = torch.randn(2, 3, 48)
        want = tm(pts).detach().numpy()
        sd = {}
        for i in range(1, 6):
            conv = getattr(tm, f"conv{i}")
            sd[f"dgcnn_encoder.conv{i}.0.weight"] = \
                conv[0].weight.detach().numpy()
            for leaf, v in conv[1].state_dict().items():
                sd[f"dgcnn_encoder.bn{i}.{leaf}"] = np.asarray(
                    v.detach() if hasattr(v, "detach") else v)
        flat = _via_pth(tmp_path, sd, "dgcnn")
        pf, bsf = _split_flat(flat, "dgcnn_encoder/")
        fm = DGCNNEncoder(k=6, impl="fused")
        x = jnp.asarray(pts.numpy().transpose(0, 2, 1))
        v = fm.init({"params": jax.random.key(0)}, x, train=True)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)
        got, _ = fm.apply({"params": params, "batch_stats": bs}, x,
                          train=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-3)


class TestDGCNNHead:
    def test_cls_head_parity(self, tmp_path):
        from point_dae_tpu.models.dae_dgcnn import _ClsHead

        torch.manual_seed(11)
        tm = tnn.Sequential(
            tnn.Linear(1024, 512), tnn.BatchNorm1d(512),
            tnn.LeakyReLU(0.2), tnn.Linear(512, 256), tnn.BatchNorm1d(256),
            tnn.LeakyReLU(0.2), tnn.Dropout(0.5),
            tnn.Linear(256, 15)).eval()
        x = torch.randn(4, 1024)
        want = tm(x).detach().numpy()
        sd = {f"cls_head_finetune.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        flat = _via_pth(tmp_path, sd, "dgcnn")
        pf, bsf = _split_flat(flat, "cls_head/")
        fm = _ClsHead(15)
        v = fm.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)},
                    jnp.asarray(x.numpy()), train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)
        got = np.asarray(fm.apply({"params": params, "batch_stats": bs},
                                  jnp.asarray(x.numpy()), train=False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TorchSharedMLPSA(tnn.Module):
    """Group-all SA twin: the pointnet2_ops wheel layout
    (sa.mlps.0.layer{i}.conv Conv2d-k1 bias-free + .bn.bn BatchNorm2d,
    pytorch_utils.py SharedMLP/_ConvBase/_BNBase nesting), applied to
    cat([xyz, features]) over all points then max-pooled."""

    def __init__(self, dims=(259, 64, 128)):
        super().__init__()
        layers = {}
        for i in range(len(dims) - 1):
            conv = tnn.Conv2d(dims[i], dims[i + 1], 1, bias=False)
            bn = tnn.BatchNorm2d(dims[i + 1])
            layers[f"layer{i}"] = (conv, bn)
            self.add_module(f"conv{i}", conv)
            self.add_module(f"bn{i}", bn)
        self._n = len(dims) - 1

    def state_dict_wheel(self, prefix="pointnetv2_encoder.sa3."):
        out = {}
        for i in range(self._n):
            conv = getattr(self, f"conv{i}")
            bn = getattr(self, f"bn{i}")
            out[f"{prefix}mlps.0.layer{i}.conv.weight"] = \
                conv.weight.detach().numpy()
            for leaf, v in bn.state_dict().items():
                out[f"{prefix}mlps.0.layer{i}.bn.bn.{leaf}"] = \
                    np.asarray(v.detach() if hasattr(v, "detach") else v)
        return out

    def forward(self, grouped):                          # (B, C, 1, N)
        h = grouped
        for i in range(self._n):
            h = torch.relu(getattr(self, f"bn{i}")(
                getattr(self, f"conv{i}")(h)))
        return torch.max(h, 3)[0][:, :, 0]               # (B, C_out)


class TestPointNet2Family:
    def test_group_all_sa_pth_roundtrip_parity(self, tmp_path):
        from point_dae_tpu.models.dae_pointnet2 import SetAbstraction

        torch.manual_seed(5)
        tm = TorchSharedMLPSA((259, 64, 128)).eval()
        B, N = 2, 12
        xyz = torch.randn(B, N, 3)
        feats = torch.randn(B, N, 256)
        grouped = torch.cat([xyz, feats], -1).transpose(2, 1)[:, :, None, :]
        want = tm(grouped).detach().numpy()

        flat = _via_pth(tmp_path, tm.state_dict_wheel(), "pointnet2")
        pf, bsf = _split_flat(flat, "pointnetv2_encoder/sa3/")

        fm = SetAbstraction(None, None, None, (64, 128))
        v = fm.init(jax.random.key(0), jnp.asarray(xyz.numpy()),
                    jnp.asarray(feats.numpy()), train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)
        _, got = fm.apply({"params": params, "batch_stats": bs},
                          jnp.asarray(xyz.numpy()), jnp.asarray(feats.numpy()),
                          train=False)
        np.testing.assert_allclose(np.asarray(got)[:, 0], want,
                                   rtol=1e-4, atol=1e-4)

    def test_cls_head_parity(self, tmp_path):
        from point_dae_tpu.models.dae_pointnet2 import _PN2ClsHead

        torch.manual_seed(6)
        tm = tnn.Sequential(
            tnn.Linear(1024, 512), tnn.BatchNorm1d(512), tnn.ReLU(),
            tnn.Dropout(0.5), tnn.Linear(512, 256), tnn.BatchNorm1d(256),
            tnn.ReLU(), tnn.Dropout(0.5), tnn.Linear(256, 15)).eval()
        x = torch.randn(4, 1024)
        want = tm(x).detach().numpy()
        sd = {f"cls_head_finetune.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        flat = _via_pth(tmp_path, sd, "pointnet2")
        pf, bsf = _split_flat(flat, "cls_head/")
        fm = _PN2ClsHead(15)
        v = fm.init(jax.random.key(0), jnp.asarray(x.numpy()), train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)
        got = np.asarray(fm.apply({"params": params, "batch_stats": bs},
                                  jnp.asarray(x.numpy()), train=False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TorchTokenEmbed(tnn.Module):
    """Token_Embed twin (Point_M2AE_modules.py:169-215): width rule depends
    on in_c; global-max concat between the two conv stacks."""

    def __init__(self, in_c, out_c):
        super().__init__()
        if in_c == 3:
            self.first_conv = tnn.Sequential(
                tnn.Conv1d(in_c, 128, 1), tnn.BatchNorm1d(128),
                tnn.ReLU(), tnn.Conv1d(128, 256, 1))
            self.second_conv = tnn.Sequential(
                tnn.Conv1d(512, 512, 1), tnn.BatchNorm1d(512),
                tnn.ReLU(), tnn.Conv1d(512, out_c, 1))
        else:
            self.first_conv = tnn.Sequential(
                tnn.Conv1d(in_c, in_c, 1), tnn.BatchNorm1d(in_c),
                tnn.ReLU(), tnn.Conv1d(in_c, in_c, 1))
            self.second_conv = tnn.Sequential(
                tnn.Conv1d(in_c * 2, out_c, 1), tnn.BatchNorm1d(out_c),
                tnn.ReLU(), tnn.Conv1d(out_c, out_c, 1))

    def forward(self, groups):                           # (B, G, S, C)
        b, g, s, c = groups.shape
        x = groups.reshape(b * g, s, c).transpose(2, 1)
        f = self.first_conv(x)
        fg = torch.max(f, dim=2, keepdim=True)[0]
        f = torch.cat([fg.expand(-1, -1, s), f], dim=1)
        f = self.second_conv(f)
        return torch.max(f, dim=2)[0].reshape(b, g, -1)


class TestM2AEFamily:
    @pytest.mark.parametrize("in_c,out_c,stage", [(3, 48, 0), (48, 96, 1)])
    def test_token_embed_pth_roundtrip_parity(self, tmp_path, in_c, out_c,
                                              stage):
        from point_dae_tpu.models.m2ae import TokenEmbed

        torch.manual_seed(7)
        tm = TorchTokenEmbed(in_c, out_c).eval()
        groups = torch.randn(2, 4, 6, in_c)
        want = tm(groups).detach().numpy()

        sd = {f"h_encoder.token_embed.{stage}.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        flat = _via_pth(tmp_path, sd, "m2ae")
        pf, bsf = _split_flat(flat, f"h_encoder/token_embed{stage}/")

        fm = TokenEmbed(out_c)
        v = fm.init(jax.random.key(0), jnp.asarray(groups.numpy()),
                    train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)
        got = np.asarray(fm.apply({"params": params, "batch_stats": bs},
                                  jnp.asarray(groups.numpy()), train=False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_token_prop_pth_roundtrip_parity(self, tmp_path):
        """TokenProp == the reference PointNetFeaturePropagation fuse +
        residual-extraction stack (Point_M2AE_modules.py:53-123) through
        the .pth path."""
        from point_dae_tpu.models.m2ae import TokenProp

        class TorchTokenProp(tnn.Module):
            """Twin with the wheel's nesting: fuse.net.{0conv,1bn,2act},
            extraction.operation.{j}.net1/.net2."""

            def __init__(self, in_c, out_c, blocks=1):
                super().__init__()
                self.fuse = tnn.Sequential()
                self.fuse.add_module("net", tnn.Sequential(
                    tnn.Conv1d(in_c, out_c, 1), tnn.BatchNorm1d(out_c),
                    tnn.GELU()))
                ops = tnn.Sequential()
                for j in range(blocks):
                    blk = tnn.Module()
                    blk.net1 = tnn.Sequential(
                        tnn.Conv1d(out_c, out_c, 1), tnn.BatchNorm1d(out_c),
                        tnn.GELU())
                    blk.net2 = tnn.Sequential(
                        tnn.Conv1d(out_c, out_c, 1), tnn.BatchNorm1d(out_c))
                    ops.add_module(str(j), blk)
                self.extraction = tnn.Module()
                self.extraction.operation = ops
                self.act = tnn.GELU()

            def forward(self, x):                       # (B, C, N)
                h = self.fuse.net(x)
                for blk in self.extraction.operation:
                    h = self.act(blk.net2(blk.net1(h)) + h)
                return h

        torch.manual_seed(12)
        tm = TorchTokenProp(24, 16, blocks=1).eval()
        x = torch.randn(2, 24, 10)
        want = tm(x).transpose(2, 1).detach().numpy()

        sd = {f"token_prop.0.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        flat = _via_pth(tmp_path, sd, "m2ae")
        pf, bsf = _split_flat(flat, "token_prop0/")
        fm = TokenProp(16, blocks=1)
        xin = jnp.asarray(x.numpy().transpose(0, 2, 1))
        v = fm.init(jax.random.key(0), xin, train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)
        got = np.asarray(fm.apply({"params": params, "batch_stats": bs},
                                  xin, train=False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_mask_token_reshape(self, tmp_path):
        flat = _via_pth(tmp_path, {"mask_token": np.zeros((1, 8),
                                                          np.float32)},
                        "m2ae")
        assert flat["mask_token"].shape == (1, 1, 8)

    def test_stage_block_and_norm_rules(self, tmp_path):
        """encoder_blocks.{i}.blocks.{j} + encoder_norms.{i} +
        encoder_pos_embeds.{i} land in our stage{i}/block{j}, norm{i},
        pos_embed{i} trees."""
        torch.manual_seed(8)
        tm = TorchBlock(32, 2).eval()
        x = torch.randn(2, 5, 32)
        want = tm(x).detach().numpy()
        sd = {f"h_encoder.encoder_blocks.1.blocks.0.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        flat = _via_pth(tmp_path, sd, "m2ae")
        fm = TransformerBlock(32, 2)
        v = fm.init(jax.random.key(0), jnp.asarray(x.numpy()))
        params = merge_pretrained(v["params"], {
            k.split("/", 3)[3]: val for k, val in flat.items()
            if k.startswith("h_encoder/stage1/block0/")})
        got = np.asarray(fm.apply({"params": params}, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestMlMAEFamily:
    def test_block_rules_land_flat(self, tmp_path):
        """mlmae family: blocks.blocks.{i} -> block{i} (no 'blocks' scope,
        our _MlEncoder keeps ViT blocks at the top level)."""
        torch.manual_seed(13)
        tm = TorchBlock(32, 2).eval()
        x = torch.randn(2, 5, 32)
        want = tm(x).detach().numpy()
        sd = {f"blocks.blocks.2.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        flat = _via_pth(tmp_path, sd, "mlmae")
        fm = TransformerBlock(32, 2)
        v = fm.init(jax.random.key(0), jnp.asarray(x.numpy()))
        params = merge_pretrained(v["params"], {
            k.split("/", 1)[1]: val for k, val in flat.items()
            if k.startswith("block2/")})
        got = np.asarray(fm.apply({"params": params}, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TorchMaskTransformerEncoder(tnn.Module):
    """Full encoder twin (MaskTransformer noaug path: patch embed +
    pos-embed MLP + ViT blocks + final norm; SVM feature = max+mean,
    PointCAE_transformer.py:1024-1026)."""

    def __init__(self, dim=64, depth=2, heads=2):
        super().__init__()
        self.encoder = TorchPatchEmbed(dim)
        self.pos_embed = tnn.Sequential(tnn.Linear(3, 128), tnn.GELU(),
                                        tnn.Linear(128, dim))

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

    def forward(self, groups, centers):
        tokens = self.encoder(groups)
        pos = self.pos_embed(centers)
        x = self.norm(self.blocks(tokens, pos))
        return x.max(1)[0] + x.mean(1)


class TestFullEncoderPth:
    def test_svm_feature_parity_through_pth(self, tmp_path):
        """The closest available proxy for 'released checkpoint loads
        bit-faithfully': a full MaskTransformer-encoder twin serialized as
        {'base_model': {'module.MAE_encoder.'-prefixed ...}} (the released
        pretrain layout) drives load -> convert -> merge ->
        MaskTransformerEncoder, and the SVM feature (max+mean of normed
        tokens) must match the torch forward."""
        from point_dae_tpu.models.transformer import MaskTransformerEncoder

        torch.manual_seed(21)
        tm = TorchMaskTransformerEncoder(dim=64, depth=2, heads=2).eval()
        B, G, S = 2, 8, 6
        groups = torch.randn(B, G, S, 3)
        centers = torch.randn(B, G, 3)
        want = tm(groups, centers).detach().numpy()

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        flat = _via_pth(tmp_path, sd, "transformer",
                        wrap="module.MAE_encoder.")
        pf, bsf = _split_flat(flat)

        fm = MaskTransformerEncoder(trans_dim=64, depth=2, num_heads=2,
                                    encoder_dims=64, drop_path_rate=0.0,
                                    rand_ratio=False)
        v = fm.init({"params": jax.random.key(0),
                     "mask": jax.random.key(1)},
                    jnp.asarray(groups.numpy()),
                    jnp.asarray(centers.numpy()), noaug=True, train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)
        x, _ = fm.apply({"params": params, "batch_stats": bs},
                        jnp.asarray(groups.numpy()),
                        jnp.asarray(centers.numpy()), noaug=True,
                        train=False)
        got = np.asarray(jnp.max(x, axis=1) + jnp.mean(x, axis=1))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestPthPipeline:
    def test_module_and_mae_encoder_prefixes_stripped(self, tmp_path):
        """Full reference ckpt layout: {'base_model': {'module.MAE_encoder.'
        prefixed keys}} must strip both prefixes on load (the
        models/Point_MAE.py:646-655 rules)."""
        torch.manual_seed(9)
        tm = TorchPatchEmbed(32).eval()
        groups = torch.randn(2, 3, 6, 3)
        want = tm(groups).detach().numpy()

        sd = {f"encoder.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        flat = _via_pth(tmp_path, sd, "transformer",
                        wrap="module.MAE_encoder.")
        pf, bsf = _split_flat(flat, "encoder/")
        fm = PatchEncoder(32)
        v = fm.init(jax.random.key(0), jnp.asarray(groups.numpy()),
                    train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)
        got = np.asarray(fm.apply({"params": params, "batch_stats": bs},
                                  jnp.asarray(groups.numpy()), train=False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestGradientParity:
    """Beyond forward parity: a TRAIN-mode backward pass through the
    converted weights must produce the same parameter gradients as torch.
    Gradients share every weight's name and shape, so they convert through
    the exact same rules — a mismatch would mean the two frameworks train
    differently from the same checkpoint even though forwards agree."""

    @pytest.mark.parametrize("impl", ["reference", "fused"])
    def test_dgcnn_encoder_training_gradients_match_torch(self, tmp_path,
                                                          impl):
        from point_dae_tpu.models.dgcnn import DGCNNEncoder

        torch.manual_seed(21)
        tm = TorchDGCNNEncoder(k=6).train()
        pts = torch.randn(2, 3, 48)
        w = torch.randn(1024)
        feat = tm(pts)                       # train-mode BN statistics
        loss_t = (feat @ w).mean()
        loss_t.backward()

        sd, gd = {}, {}
        for i in range(1, 6):
            conv = getattr(tm, f"conv{i}")
            sd[f"dgcnn_encoder.conv{i}.0.weight"] = \
                conv[0].weight.detach().numpy()
            gd[f"dgcnn_encoder.conv{i}.0.weight"] = \
                conv[0].weight.grad.numpy()
            for leaf, v in conv[1].state_dict().items():
                sd[f"dgcnn_encoder.bn{i}.{leaf}"] = np.asarray(
                    v.detach() if hasattr(v, "detach") else v)
            gd[f"dgcnn_encoder.bn{i}.weight"] = conv[1].weight.grad.numpy()
            gd[f"dgcnn_encoder.bn{i}.bias"] = conv[1].bias.grad.numpy()

        flat_w = _via_pth(tmp_path, sd, "dgcnn")
        pf, bsf = _split_flat(flat_w, "dgcnn_encoder/")
        # gradients ride the SAME conversion (same names -> same reshapes)
        flat_g = _via_pth(tmp_path, gd, "dgcnn")
        gf, _ = _split_flat(flat_g, "dgcnn_encoder/")

        fm = DGCNNEncoder(k=6, impl=impl)
        x = jnp.asarray(pts.numpy().transpose(0, 2, 1))
        v = fm.init({"params": jax.random.key(0)}, x, train=True)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)
        wj = jnp.asarray(w.numpy())

        def loss_fn(p):
            (g, _), _ = fm.apply({"params": p, "batch_stats": bs}, x,
                                 train=True, mutable=["batch_stats"])
            return jnp.mean(g @ wj)

        lj, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(lj), float(loss_t), rtol=1e-4)
        got = flatten_keys(jax.device_get(grads))
        assert set(gf) <= set(got), sorted(set(gf) - set(got))
        for k in sorted(gf):
            np.testing.assert_allclose(
                got[k], gf[k], rtol=2e-3, atol=2e-4,
                err_msg=f"gradient mismatch at {k} (impl={impl})")

    def test_transformer_encoder_training_gradients_match_torch(self,
                                                                tmp_path):
        """Same statement for the transformer stack: TRAIN-mode backward
        (BatchNorm batch statistics in the patch embed, LN/attention/MLP in
        the blocks) through converted weights reproduces torch's parameter
        gradients."""
        from point_dae_tpu.models.transformer import MaskTransformerEncoder

        torch.manual_seed(22)
        tm = TorchMaskTransformerEncoder(dim=64, depth=2, heads=2).train()
        B, G, S = 2, 8, 6
        groups = torch.randn(B, G, S, 3)
        centers = torch.randn(B, G, 3)
        w = torch.randn(64)
        loss_t = (tm(groups, centers) @ w).mean()
        loss_t.backward()

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        gd = {k: p.grad.numpy() for k, p in tm.named_parameters()
              if p.grad is not None}
        flat_w = _via_pth(tmp_path, sd, "transformer",
                          wrap="module.MAE_encoder.")
        pf, bsf = _split_flat(flat_w)
        flat_g = _via_pth(tmp_path, gd, "transformer",
                          wrap="module.MAE_encoder.")
        gf, _ = _split_flat(flat_g)

        fm = MaskTransformerEncoder(trans_dim=64, depth=2, num_heads=2,
                                    encoder_dims=64, drop_path_rate=0.0,
                                    rand_ratio=False)
        gj = jnp.asarray(groups.numpy())
        cj = jnp.asarray(centers.numpy())
        wj = jnp.asarray(w.numpy())
        v = fm.init({"params": jax.random.key(0), "mask": jax.random.key(1),
                     "droppath": jax.random.key(2)},
                    gj, cj, noaug=True, train=True)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)

        def loss_fn(p):
            (x, _), _ = fm.apply(
                {"params": p, "batch_stats": bs}, gj, cj, noaug=True,
                train=True, mutable=["batch_stats"],
                rngs={"mask": jax.random.key(3),
                      "droppath": jax.random.key(4)})
            feat = jnp.max(x, axis=1) + jnp.mean(x, axis=1)
            return jnp.mean(feat @ wj)

        lj, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(lj), float(loss_t), rtol=1e-4)
        got = flatten_keys(jax.device_get(grads))
        assert set(gf) <= set(got), sorted(set(gf) - set(got))
        for k in sorted(gf):
            # atol 5e-4: the deep f32 chain (patch-embed max-pool near-ties)
            # leaves a handful of elements at ~3e-4 absolute noise
            np.testing.assert_allclose(
                got[k], gf[k], rtol=2e-3, atol=5e-4,
                err_msg=f"gradient mismatch at {k}")


class TestOptimizerStepParity:
    def test_adamw_update_matches_torch(self):
        """One full AdamW update from identical (param, grad) pairs matches
        torch.optim.AdamW bitwise-closely — including the no-decay masking
        of 1-D/bias/token leaves (builder.py:41-66 add_weight_decay).
        Together with the gradient-parity tests this extends checkpoint
        parity to the training step itself."""
        import optax

        from point_dae_tpu.engine.train_state import build_optimizer

        torch.manual_seed(30)
        lr, wd = 1e-3, 0.05
        shapes = {
            "dense": {"kernel": (16, 8), "bias": (8,)},
            "bn": {"scale": (16,), "bias": (16,)},
            "mask_token": (1, 1, 8),
        }

        def rand_tree(tree, seed=0):
            rng = np.random.default_rng(seed)
            return jax.tree_util.tree_map(
                lambda s: jnp.asarray(
                    rng.normal(size=s).astype(np.float32)), tree,
                is_leaf=lambda x: isinstance(x, tuple))

        params = rand_tree(shapes, 1)
        grads = rand_tree(shapes, 2)

        cfg = {"optimizer": {"type": "AdamW", "part": "all",
                             "kwargs": {"lr": lr, "weight_decay": wd}},
               "scheduler": {"type": "function", "kwargs": {}}}
        tx, _ = build_optimizer(cfg, params, 1)
        st = tx.init(params)
        upd, _ = tx.update(grads, st, params)
        new = optax.apply_updates(params, upd)

        # torch: decay only on the dense kernel (2-D, not bias/1-D/token)
        flat_p = flatten_keys(jax.device_get(params))
        flat_g = flatten_keys(jax.device_get(grads))
        t_params = {k: torch.nn.Parameter(torch.as_tensor(np.array(v)))
                    for k, v in flat_p.items()}
        decay = [t_params["dense/kernel"]]
        no_decay = [v for k, v in t_params.items() if k != "dense/kernel"]
        opt = torch.optim.AdamW(
            [{"params": decay, "weight_decay": wd},
             {"params": no_decay, "weight_decay": 0.0}],
            lr=lr, betas=(0.9, 0.999), eps=1e-8)
        for k, p in t_params.items():
            p.grad = torch.as_tensor(np.array(flat_g[k]))
        opt.step()

        flat_new = flatten_keys(jax.device_get(new))
        for k in flat_p:
            np.testing.assert_allclose(
                flat_new[k], t_params[k].detach().numpy(),
                rtol=1e-5, atol=1e-7, err_msg=f"AdamW update differs at {k}")


class TorchPatchDGCNN(tnn.Module):
    """DGCNN-over-patch-tokens twin (MaskSurf_v2.py:80-173: input_trans
    Conv1d, 4 edge layers Conv2d+GroupNorm(4)+LeakyReLU(0.2) with k=4 kNN
    over centers, concat(2304) -> Conv1d+GN+LReLU)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.input_trans = tnn.Conv1d(cin, 128, 1)
        specs = [(256, 256), (512, 512), (1024, 512), (1024, 1024)]
        for i, (a, b) in enumerate(specs, start=1):
            setattr(self, f"layer{i}", tnn.Sequential(
                tnn.Conv2d(a, b, 1, bias=False), tnn.GroupNorm(4, b),
                tnn.LeakyReLU(0.2)))
        self.layer5 = tnn.Sequential(tnn.Conv1d(2304, cout, 1, bias=False),
                                     tnn.GroupNorm(4, cout),
                                     tnn.LeakyReLU(0.2))

    @staticmethod
    def _graph_feature(coor, x, k=4):                    # (B,3,N), (B,C,N)
        B, C, N = x.shape
        xt = coor.transpose(2, 1)
        idx = (torch.cdist(xt, xt) ** 2).topk(
            k, dim=-1, largest=False).indices             # (B, N, k)
        feat = torch.gather(
            x.transpose(2, 1)[:, None].expand(B, N, N, C), 2,
            idx[..., None].expand(B, N, k, C))            # (B, N, k, C)
        xq = x.transpose(2, 1)[:, :, None, :].expand(B, N, k, C)
        e = torch.cat([feat - xq, xq], dim=-1)            # (B, N, k, 2C)
        return e.permute(0, 3, 1, 2)                      # (B, 2C, N, k)

    def forward(self, f, coor):                           # (B,G,C), (B,G,3)
        coor = coor.transpose(1, 2)
        f = self.input_trans(f.transpose(1, 2))           # (B, 128, G)
        feats = []
        for i in range(1, 5):
            e = self._graph_feature(coor, f)
            f = getattr(self, f"layer{i}")(e).max(dim=-1)[0]
            feats.append(f)
        f = self.layer5(torch.cat(feats, dim=1))
        return f.transpose(2, 1)                          # (B, G, cout)


class TorchFoldingDecoder(tnn.Module):
    """Per-patch coarse MLP + 2x2 folding twin (Decoder,
    MaskSurf_v2.py:19-78)."""

    def __init__(self, C, num_fine):
        super().__init__()
        self.num_fine = num_fine
        self.grid_size = 2
        self.num_coarse = num_fine // 4
        self.mlp = tnn.Sequential(tnn.Linear(C, 1024), tnn.ReLU(),
                                  tnn.Linear(1024, 1024), tnn.ReLU(),
                                  tnn.Linear(1024, 3 * self.num_coarse))
        self.final_conv = tnn.Sequential(
            tnn.Conv1d(C + 3 + 2, 512, 1), tnn.BatchNorm1d(512), tnn.ReLU(),
            tnn.Conv1d(512, 512, 1), tnn.BatchNorm1d(512), tnn.ReLU(),
            tnn.Conv1d(512, 3, 1))
        a = torch.linspace(-0.05, 0.05, self.grid_size).view(
            1, self.grid_size).expand(self.grid_size, -1).reshape(1, -1)
        b = torch.linspace(-0.05, 0.05, self.grid_size).view(
            self.grid_size, 1).expand(-1, self.grid_size).reshape(1, -1)
        self.register_buffer("folding_seed",
                             torch.cat([a, b], 0).view(1, 2, 4))

    def forward(self, feature_global):                    # (B, G, C)
        bs, g, c = feature_global.shape
        fg = feature_global.reshape(bs * g, c)
        coarse = self.mlp(fg).reshape(bs * g, self.num_coarse, 3)
        pt = coarse.unsqueeze(2).expand(-1, -1, 4, -1)
        seed = self.folding_seed.unsqueeze(2).expand(bs * g, -1,
                                                     self.num_coarse, -1)
        seed = seed.reshape(bs * g, 2, self.num_fine)
        fgx = fg.unsqueeze(2).expand(-1, -1, self.num_fine)
        feat = torch.cat([fgx, seed,
                          pt.reshape(bs * g, self.num_fine, 3)
                          .transpose(2, 1)], dim=1)
        fine = self.final_conv(feat) + pt.reshape(
            bs * g, self.num_fine, 3).transpose(2, 1)
        return (coarse.reshape(bs, g, self.num_coarse, 3),
                fine.transpose(2, 1).reshape(bs, g, self.num_fine, 3))


class TestDVAEConversion:
    def test_patch_dgcnn_pth_roundtrip_parity(self, tmp_path):
        """The Point-BERT dVAE.pth path (dvae_config.ckpt,
        MaskSurf_v2.py:2086-2091): dgcnn_1 weights through
        load -> convert('dvae') -> merge -> PatchDGCNN reproduce torch."""
        from point_dae_tpu.models.dvae import PatchDGCNN

        torch.manual_seed(25)
        tm = TorchPatchDGCNN(cin=16, cout=32).eval()
        f = torch.randn(2, 12, 16)
        coor = torch.randn(2, 12, 3)
        want = tm(f, coor).detach().numpy()

        sd = {f"dgcnn_1.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        flat = _via_pth(tmp_path, sd, "dvae")
        pf, _ = _split_flat(flat, "dgcnn_1/")
        fm = PatchDGCNN(32)
        v = fm.init(jax.random.key(0), jnp.asarray(f.numpy()),
                    jnp.asarray(coor.numpy()))
        params = merge_pretrained(v["params"], pf)
        got = np.asarray(fm.apply({"params": params},
                                  jnp.asarray(f.numpy()),
                                  jnp.asarray(coor.numpy())))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_folding_decoder_pth_roundtrip_parity(self, tmp_path):
        from point_dae_tpu.models.dvae import FoldingPatchDecoder

        torch.manual_seed(26)
        tm = TorchFoldingDecoder(C=24, num_fine=8).eval()
        feat = torch.randn(2, 5, 24)
        wc, wf = tm(feat)

        sd = {f"decoder.{k}": v.detach().numpy()
              for k, v in tm.state_dict().items()}
        flat = _via_pth(tmp_path, sd, "dvae")
        pf, bsf = _split_flat(flat, "decoder/")
        fm = FoldingPatchDecoder(8)
        v = fm.init(jax.random.key(0), jnp.asarray(feat.numpy()),
                    train=False)
        params = merge_pretrained(v["params"], pf)
        bs = merge_pretrained(v["batch_stats"], bsf)
        gc, gf = fm.apply({"params": params, "batch_stats": bs},
                          jnp.asarray(feat.numpy()), train=False)
        np.testing.assert_allclose(np.asarray(gc), wc.detach().numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gf), wf.detach().numpy(),
                                   rtol=1e-3, atol=1e-4)


class TorchDetr3Layer(tnn.Module):
    """3detr pre-norm encoder layer twin (detr/transformer.py:77-159
    forward_pre): LN -> MultiheadAttention(q=k=v=normed) -> residual;
    LN -> Linear(ffn) -> ReLU -> Linear(dim) -> residual. Eval mode
    disables all dropouts."""

    def __init__(self, dim, heads, ffn=128):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.self_attn = tnn.MultiheadAttention(dim, heads, dropout=0.1,
                                                batch_first=True)
        self.linear1 = tnn.Linear(dim, ffn)
        self.linear2 = tnn.Linear(ffn, dim)

    def forward(self, x):
        h = self.norm1(x)
        h, _ = self.self_attn(h, h, h)
        x = x + h
        h = self.norm2(x)
        x = x + self.linear2(torch.relu(self.linear1(h)))
        return x


class TestDetr3EncoderParity:
    def test_layer_matches_torch_multihead_attention(self):
        """Detr3EncoderLayer reproduces the reference 3detr pre-norm layer
        (biased in/out attention projections, ffn 128, ReLU) given the same
        weights — the semantic core of the 3detr backbone rewrite."""
        from point_dae_tpu.models.detr3 import Detr3EncoderLayer

        torch.manual_seed(31)
        dim, heads, ffn = 32, 4, 128
        hd = dim // heads
        tm = TorchDetr3Layer(dim, heads, ffn).eval()
        x = torch.randn(2, 10, dim)
        want = tm(x).detach().numpy()

        fm = Detr3EncoderLayer(dim, heads, ffn)
        v = fm.init(jax.random.key(0), jnp.asarray(x.numpy()))

        ipw = tm.self_attn.in_proj_weight.detach().numpy()    # (3*dim, dim)
        ipb = tm.self_attn.in_proj_bias.detach().numpy()
        opw = tm.self_attn.out_proj.weight.detach().numpy()   # (dim, dim)
        opb = tm.self_attn.out_proj.bias.detach().numpy()

        def qkv(i):
            w = ipw[i * dim:(i + 1) * dim]                    # (dim, dim)
            b = ipb[i * dim:(i + 1) * dim]
            return {"kernel": w.T.reshape(dim, heads, hd),
                    "bias": b.reshape(heads, hd)}

        params = {
            "norm1": {"scale": tm.norm1.weight.detach().numpy(),
                      "bias": tm.norm1.bias.detach().numpy()},
            "norm2": {"scale": tm.norm2.weight.detach().numpy(),
                      "bias": tm.norm2.bias.detach().numpy()},
            "self_attn": {
                "query": qkv(0), "key": qkv(1), "value": qkv(2),
                "out": {"kernel": opw.T.reshape(heads, hd, dim),
                        "bias": opb}},
            "linear1": {"kernel": tm.linear1.weight.detach().numpy().T,
                        "bias": tm.linear1.bias.detach().numpy()},
            "linear2": {"kernel": tm.linear2.weight.detach().numpy().T,
                        "bias": tm.linear2.bias.detach().numpy()},
        }
        params = jax.tree_util.tree_map(jnp.asarray, params)
        # same tree structure as init
        assert set(params) == set(v["params"])
        got = np.asarray(fm.apply({"params": params}, jnp.asarray(x.numpy()),
                                  deterministic=True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
