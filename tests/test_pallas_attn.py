"""Fused tiny-T attention kernel (ops/pallas_attn.py): interpret-mode
parity of forward and custom-VJP gradients against the unfused einsum
path and a full-f32 oracle, with and without the key-validity mask, plus
the Attention-module dispatch contract (param tree and fallback math
unchanged)."""
import numpy as np
import jax
import jax.numpy as jnp

from point_dae_tpu.ops.pallas_attn import (fused_attention, pick_bc,
                                           supported)


def _setup(B=16, T=32, H=2, d=64, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, T, H, d)).astype(np.float32)
    k = rng.normal(size=(B, T, H, d)).astype(np.float32)
    v = rng.normal(size=(B, T, H, d)).astype(np.float32)
    return map(jnp.asarray, (q, k, v))


def _oracle(q, k, v, key_mask, dt):
    d = q.shape[-1]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q.astype(dt), k.astype(dt),
                      preferred_element_type=jnp.float32) * (d ** -0.5)
    if key_mask is not None:
        attn = attn + jnp.where(key_mask[:, None, None, :], 0.0, -1e9)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn.astype(dt), v.astype(dt),
                      preferred_element_type=jnp.float32)


def _mask(B=16, T=32, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.uniform(size=(B, T)) < 0.7
    m[:, 0] = True                       # at least one valid key per cloud
    return jnp.asarray(m)


class TestFusedAttention:
    def test_gates(self):
        assert pick_bc(256, 32) == 16
        assert pick_bc(256, 64) == 8
        assert supported(256, 32, 6, 64, 16)
        assert not supported(255, 32, 6, 64, 16)    # ragged batch
        assert not supported(256, 32, 6, 62, 16)    # misaligned head dim
        assert not supported(256, 80, 6, 64, 16)    # R > 1024

    def test_forward_no_worse_than_unfused_bf16(self):
        q, k, v = _setup()
        for mask in (None, _mask()):
            oracle_b = _oracle(q, k, v, mask, jnp.float32)
            unf_b = _oracle(q, k, v, mask, jnp.bfloat16)
            fused = fused_attention(q, k, v, key_mask=mask, interpret=True)
            scale = jnp.maximum(jnp.abs(oracle_b), 1e-3)
            err_f = float(jnp.max(jnp.abs(fused - oracle_b) / scale))
            err_u = float(jnp.max(jnp.abs(unf_b - oracle_b) / scale))
            assert err_f <= 2 * err_u + 1e-6, (mask is None, err_f, err_u)

    def test_rows_with_masked_keys_are_finite(self):
        q, k, v = _setup(B=8, T=16)
        m = jnp.zeros((8, 16), bool).at[:, :2].set(True)
        out = fused_attention(q, k, v, key_mask=m, interpret=True)
        assert bool(jnp.isfinite(out).all())

    def test_gradients_no_worse_than_unfused_bf16(self):
        q, k, v = _setup(B=8)
        cot = jnp.asarray(np.random.default_rng(1).normal(
            size=(8, 32, 2, 64)).astype(np.float32))
        mask = _mask(B=8)

        def loss(fn, *args):
            return jnp.vdot(fn(*args).astype(jnp.float32), cot)

        go = jax.grad(lambda *a: loss(
            lambda *b: _oracle(*b, mask, jnp.float32), *a),
            argnums=(0, 1, 2))(q, k, v)
        gu = jax.grad(lambda *a: loss(
            lambda *b: _oracle(*b, mask, jnp.bfloat16), *a),
            argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(lambda *a: loss(
            lambda *b: fused_attention(*b, key_mask=mask, interpret=True),
            *a), argnums=(0, 1, 2))(q, k, v)
        for name, o, u, f in zip(("dq", "dk", "dv"), go, gu, gf):
            scale = float(jnp.max(jnp.abs(o))) + 1e-6
            eu = float(jnp.max(jnp.abs(u - o))) / scale
            ef = float(jnp.max(jnp.abs(f - o))) / scale
            # the kernel's bwd rounds operands to bf16 like the unfused
            # chain; allow the same 2x band as the MLP kernel contract
            assert ef <= 2 * eu + 1e-4, (name, ef, eu)

    def test_masked_keys_get_zero_gradient(self):
        q, k, v = _setup(B=4, T=16)
        m = jnp.asarray(np.random.default_rng(5).uniform(size=(4, 16)) < 0.6)
        m = m.at[:, 0].set(True)

        def loss(k_, v_):
            return jnp.sum(fused_attention(q, k_, v_, key_mask=m,
                                           interpret=True))

        dk, dv = jax.grad(loss, argnums=(0, 1))(k, v)
        bad = ~np.asarray(m)
        assert np.abs(np.asarray(dk)[bad]).max() == 0.0
        assert np.abs(np.asarray(dv)[bad]).max() == 0.0

    def test_bc_tiles_are_equivalent(self):
        q, k, v = _setup(B=8, T=32)
        a = fused_attention(q, k, v, bc=1, interpret=True)
        b = fused_attention(q, k, v, bc=4, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-2)


class TestAttentionDispatch:
    def test_param_tree_unchanged(self):
        from point_dae_tpu.models.layers import Attention

        att = Attention(64, 2, dtype=jnp.bfloat16)
        x = jnp.zeros((4, 8, 64))
        p = att.init(jax.random.key(0), x)["params"]
        assert set(p) == {"qkv", "proj"}
        assert p["qkv"]["kernel"].shape == (64, 192)
        assert p["proj"]["kernel"].shape == (64, 64)
