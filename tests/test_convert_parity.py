"""Converter round-trip parity: an independently written torch twin of the
reference's module layout (mini-PointNet patch embed + pre-norm ViT block +
pos-embed MLP, torch naming conventions) is converted through
``convert_torch.convert_state_dict`` and must produce the same forward values
as our flax modules. This validates the exact path released .pth checkpoints
take into the framework (names, transposes, BN/LN leaf mapping).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from point_dae_tpu.models.layers import (PatchEncoder, PosEmbedMLP,
                                         TransformerBlock)
from point_dae_tpu.utils.checkpoint import flatten_keys, merge_pretrained
from point_dae_tpu.utils.convert_torch import convert_state_dict


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
