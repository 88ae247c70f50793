"""Fused ViT-MLP kernel (ops/pallas_mlp.py): interpret-mode parity of
forward and custom-VJP gradients against the unfused bf16 chain and a
full-f32 oracle, plus the TransformerBlock dispatch contract (param tree
and fallback math unchanged)."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from point_dae_tpu.ops.pallas_mlp import fused_mlp, supported


def _setup(R=512, C=128, H=256, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(R, C)).astype(np.float32)
    k1 = (rng.normal(size=(C, H)) * 0.05).astype(np.float32)
    b1 = (rng.normal(size=(H,)) * 0.02).astype(np.float32)
    k2 = (rng.normal(size=(H, C)) * 0.05).astype(np.float32)
    b2 = (rng.normal(size=(C,)) * 0.02).astype(np.float32)
    return map(jnp.asarray, (x, k1, b1, k2, b2))


def _unfused(x, k1, b1, k2, b2, dt):
    h = x.astype(dt) @ k1.astype(dt) + b1.astype(dt)
    h = nn.gelu(h, approximate=False)
    return (h.astype(dt) @ k2.astype(dt) + b2.astype(dt)).astype(jnp.float32)


class TestFusedMLP:
    def test_supported_gate(self):
        assert supported(16384, 384, 1536)
        assert not supported(16383, 384, 1536)     # ragged rows
        assert not supported(512, 100, 1536)       # lane-misaligned C
        assert not supported(512, 384, 128)        # hidden narrower than out

    def test_forward_no_worse_than_unfused_bf16(self):
        x, k1, b1, k2, b2 = _setup()
        oracle = _unfused(x, k1, b1, k2, b2, jnp.float32)
        unf = _unfused(x, k1, b1, k2, b2, jnp.bfloat16)
        fused = fused_mlp(x, k1, b1, k2, b2, tt=256, interpret=True)
        scale = jnp.maximum(jnp.abs(oracle), 1e-3)
        err_f = float(jnp.max(jnp.abs(fused - oracle) / scale))
        err_u = float(jnp.max(jnp.abs(unf - oracle) / scale))
        assert err_f <= 2 * err_u + 1e-6, (err_f, err_u)

    def test_gradients_no_worse_than_unfused_bf16(self):
        x, k1, b1, k2, b2 = _setup()
        cot = jnp.asarray(
            np.random.default_rng(1).normal(size=(512, 128)).astype(
                np.float32))

        def loss(fn, *args):
            return jnp.vdot(fn(*args).astype(jnp.float32), cot)

        go = jax.grad(lambda *a: loss(
            lambda *b: _unfused(*b, jnp.float32), *a),
            argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)
        gu = jax.grad(lambda *a: loss(
            lambda *b: _unfused(*b, jnp.bfloat16), *a),
            argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)
        gf = jax.grad(lambda *a: loss(
            lambda *b: fused_mlp(*b, tt=256, interpret=True), *a),
            argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)
        for name, o, u, f in zip(("dx", "dk1", "db1", "dk2", "db2"),
                                 go, gu, gf):
            scale = float(jnp.max(jnp.abs(o))) + 1e-6
            eu = float(jnp.max(jnp.abs(u - o))) / scale
            ef = float(jnp.max(jnp.abs(f - o))) / scale
            assert ef <= 2 * eu + 1e-6, (name, ef, eu)

    def test_leading_dims_and_dtype(self):
        x, k1, b1, k2, b2 = _setup()
        y = fused_mlp(x.reshape(4, 128, 128), k1, b1, k2, b2, tt=256,
                      interpret=True)
        assert y.shape == (4, 128, 128) and y.dtype == jnp.float32
        np.testing.assert_array_equal(
            np.asarray(y.reshape(512, 128)),
            np.asarray(fused_mlp(x, k1, b1, k2, b2, tt=256,
                                 interpret=True)))


class TestFusedMLPLN:
    """fused_mlp_ln: the whole pre-norm MLP sub-block (LN2 -> MLP ->
    droppath scale -> residual) in one program."""

    def _ln_setup(self, R=512, C=128, H=256, seed=0):
        x, k1, b1, k2, b2 = _setup(R, C, H, seed)
        rng = np.random.default_rng(seed + 10)
        gm = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
        bt = jnp.asarray(0.05 * rng.normal(size=(C,)).astype(np.float32))
        return x, gm, bt, k1, b1, k2, b2

    @staticmethod
    def _ref(x, gm, bt, k1, b1, k2, b2, sc, dt):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean(x * x, -1, keepdims=True) - mu * mu
        h = ((x - mu) * jax.lax.rsqrt(var + 1e-6)) * gm + bt
        out = _unfused(h, k1, b1, k2, b2, dt)
        if sc is not None:
            out = out * sc[:, None]
        return x + out

    def test_forward_no_worse_than_unfused_bf16(self):
        from point_dae_tpu.ops.pallas_mlp import fused_mlp_ln

        x, gm, bt, k1, b1, k2, b2 = self._ln_setup()
        sc = jnp.asarray((np.random.default_rng(2).uniform(size=(512,))
                          < 0.9) / 0.9, jnp.float32)
        for s in (None, sc):
            oracle = self._ref(x, gm, bt, k1, b1, k2, b2, s, jnp.float32)
            unf = self._ref(x, gm, bt, k1, b1, k2, b2, s, jnp.bfloat16)
            fused = fused_mlp_ln(x, gm, bt, k1, b1, k2, b2, row_scale=s,
                                 tt=256, interpret=True)
            scale = jnp.maximum(jnp.abs(oracle), 1e-3)
            err_f = float(jnp.max(jnp.abs(fused - oracle) / scale))
            err_u = float(jnp.max(jnp.abs(unf - oracle) / scale))
            assert err_f <= 2 * err_u + 1e-6, (s is None, err_f, err_u)

    def test_gradients_no_worse_than_unfused_bf16(self):
        from point_dae_tpu.ops.pallas_mlp import fused_mlp_ln

        x, gm, bt, k1, b1, k2, b2 = self._ln_setup()
        sc = jnp.asarray((np.random.default_rng(3).uniform(size=(512,))
                          < 0.9) / 0.9, jnp.float32)
        cot = jnp.asarray(np.random.default_rng(1).normal(
            size=(512, 128)).astype(np.float32))

        def loss(fn, *args):
            return jnp.vdot(fn(*args).astype(jnp.float32), cot)

        names = ("dx", "dgamma", "dbeta", "dk1", "db1", "dk2", "db2")
        go = jax.grad(lambda *a: loss(
            lambda *b: self._ref(*b, sc, jnp.float32), *a),
            argnums=tuple(range(7)))(x, gm, bt, k1, b1, k2, b2)
        gu = jax.grad(lambda *a: loss(
            lambda *b: self._ref(*b, sc, jnp.bfloat16), *a),
            argnums=tuple(range(7)))(x, gm, bt, k1, b1, k2, b2)
        gf = jax.grad(lambda *a: loss(
            lambda *b: fused_mlp_ln(*b, row_scale=sc, tt=256,
                                    interpret=True), *a),
            argnums=tuple(range(7)))(x, gm, bt, k1, b1, k2, b2)
        for name, o, u, f in zip(names, go, gu, gf):
            scale = float(jnp.max(jnp.abs(o))) + 1e-6
            eu = float(jnp.max(jnp.abs(u - o))) / scale
            ef = float(jnp.max(jnp.abs(f - o))) / scale
            assert ef <= 2 * eu + 1e-4, (name, ef, eu)

    def test_dropped_rows_keep_residual_only(self):
        from point_dae_tpu.ops.pallas_mlp import fused_mlp_ln

        x, gm, bt, k1, b1, k2, b2 = self._ln_setup(R=256)
        sc = jnp.zeros((256,), jnp.float32)   # every row dropped
        out = fused_mlp_ln(x, gm, bt, k1, b1, k2, b2, row_scale=sc,
                           tt=256, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=0, atol=1e-6)


class TestBlockDispatch:
    def test_param_tree_unchanged(self):
        from point_dae_tpu.models.layers import TransformerBlock

        blk = TransformerBlock(64, 2, dtype=jnp.bfloat16)
        x = jnp.zeros((2, 8, 64))
        p = blk.init(jax.random.key(0), x)["params"]
        assert p["mlp_fc1"]["kernel"].shape == (64, 256)
        assert p["mlp_fc1"]["bias"].shape == (256,)
        assert p["mlp_fc2"]["kernel"].shape == (256, 64)
        assert p["mlp_fc2"]["bias"].shape == (64,)

    def test_fallback_matches_dense_chain_bitwise(self):
        """On CPU the block takes the XLA path; its MLP must equal the
        nn.Dense chain it replaced, bit for bit, on the same params."""
        from point_dae_tpu.models.layers import TransformerBlock

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 8, 64)).astype(np.float32))
        blk = TransformerBlock(64, 2, dtype=jnp.bfloat16)
        v = blk.init(jax.random.key(0), x)
        out = blk.apply(v, x)

        p = v["params"]

        def ln(name, h):
            m = jnp.mean(h, -1, keepdims=True)
            var = jnp.var(h, -1, keepdims=True)
            nh = (h - m) * jax.lax.rsqrt(var + 1e-6)
            nh = nh * p[name]["scale"] + p[name]["bias"]
            return nh.astype(jnp.bfloat16)

        # attention branch via the module itself (unchanged code path)
        from point_dae_tpu.models.layers import Attention

        att = Attention(64, 2, qkv_bias=False, dtype=jnp.bfloat16)
        h = att.apply({"params": p["attn"]}, ln("norm1", x))
        x1 = x + h.astype(x.dtype)
        dt = jnp.bfloat16
        hh = ln("norm2", x1)
        hh = hh.astype(dt) @ p["mlp_fc1"]["kernel"].astype(dt) \
            + p["mlp_fc1"]["bias"].astype(dt)
        hh = nn.gelu(hh, approximate=False)
        hh = hh.astype(dt) @ p["mlp_fc2"]["kernel"].astype(dt) \
            + p["mlp_fc2"]["bias"].astype(dt)
        want = x1 + hh.astype(x.dtype)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
