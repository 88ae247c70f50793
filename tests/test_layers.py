"""Shared-layer unit tests: masked patch encoder, attention key masking,
drop path, bf16 policy."""
import numpy as np
import jax
import jax.numpy as jnp

from point_dae_tpu.models.layers import (Attention, PatchEncoder,
                                         TransformerBlock, drop_path)


class TestPatchEncoderMask:
    def test_masked_points_ignored(self):
        enc = PatchEncoder(16)
        rng = np.random.default_rng(0)
        groups = jnp.asarray(rng.normal(size=(1, 2, 8, 3)).astype(np.float32))
        mask = jnp.ones((1, 2, 8), bool).at[0, 0, 4:].set(False)
        v = enc.init(jax.random.key(0), groups, point_mask=mask, train=False)
        out1 = enc.apply(v, groups, point_mask=mask, train=False)
        # perturb ONLY the masked in-patch points
        g2 = np.asarray(groups).copy()
        g2[0, 0, 4:] += 50.0
        out2 = enc.apply(v, jnp.asarray(g2), point_mask=mask, train=False)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-5)


class TestAttentionMasks:
    def test_key_mask_blocks_contribution(self):
        attn = Attention(8, num_heads=2)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 8)).astype(np.float32))
        v = attn.init(jax.random.key(0), x)
        key_mask = jnp.asarray([[True, True, False, False]])
        out1 = attn.apply(v, x, key_mask=key_mask)
        x2 = np.asarray(x).copy()
        x2[0, 2:] += 100.0   # masked keys change -> visible outputs stable
        out2 = attn.apply(v, jnp.asarray(x2), key_mask=key_mask)
        np.testing.assert_allclose(np.asarray(out1)[0, :2],
                                   np.asarray(out2)[0, :2], atol=1e-4)

    def test_pairwise_attn_mask(self):
        attn = Attention(8, num_heads=2)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 3, 8)).astype(np.float32))
        v = attn.init(jax.random.key(0), x)
        # token 0 may only attend to itself
        am = jnp.asarray([[[True, False, False],
                           [True, True, True],
                           [True, True, True]]])
        out = attn.apply(v, x, attn_mask=am)
        x2 = np.asarray(x).copy()
        x2[0, 1:] += 100.0
        out2 = attn.apply(v, jnp.asarray(x2), attn_mask=am)
        np.testing.assert_allclose(np.asarray(out)[0, 0],
                                   np.asarray(out2)[0, 0], atol=1e-4)


class TestDropPath:
    def test_deterministic_is_identity(self):
        x = jnp.ones((4, 3))
        out = drop_path(jax.random.key(0), x, 0.5, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_scaling_preserves_expectation(self):
        x = jnp.ones((4000, 1))
        out = np.asarray(drop_path(jax.random.key(0), x, 0.5,
                                   deterministic=False))
        # survivors scaled by 1/keep; mean stays ~1
        assert abs(out.mean() - 1.0) < 0.1
        assert set(np.unique(out.round(4))) <= {0.0, 2.0}


class TestBf16Policy:
    def test_block_outputs_f32_residual(self):
        blk = TransformerBlock(16, 2, dtype=jnp.bfloat16)
        x = jnp.ones((1, 4, 16), jnp.float32)
        v = blk.init(jax.random.key(0), x)
        out = blk.apply(v, x)
        assert out.dtype == jnp.float32          # residual stream stays f32
        # params stay f32
        assert all(p.dtype == jnp.float32
                   for p in jax.tree_util.tree_leaves(v["params"]))


class TestSplitDense:
    """SplitDense/SplitMLP must equal the Dense/MLP over the explicit concat
    — same params (names, shapes, init), same math (linearity)."""

    def test_equals_concat_dense_shared_first(self):
        from point_dae_tpu.models.layers import SplitDense

        rng = np.random.default_rng(0)
        shared = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
        pp = jnp.asarray(rng.normal(size=(2, 5, 7, 3)).astype(np.float32))
        m = SplitDense(8)
        v = m.init(jax.random.key(0), shared, pp)
        assert v["params"]["kernel"].shape == (19, 8)
        got = m.apply(v, shared, pp)
        cat = jnp.concatenate(
            [jnp.broadcast_to(shared[:, :, None, :], (2, 5, 7, 16)), pp], -1)
        want = cat @ v["params"]["kernel"] + v["params"]["bias"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_equals_concat_dense_shared_last_nobias(self):
        from point_dae_tpu.models.layers import SplitDense

        rng = np.random.default_rng(1)
        shared = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
        pp = jnp.asarray(rng.normal(size=(4, 9, 5)).astype(np.float32))
        m = SplitDense(8, shared_last=True, use_bias=False)
        v = m.init(jax.random.key(0), shared, pp)
        assert "bias" not in v["params"]
        got = m.apply(v, shared, pp)
        cat = jnp.concatenate(
            [pp, jnp.broadcast_to(shared[:, None, :], (4, 9, 16))], -1)
        want = cat @ v["params"]["kernel"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_split_mlp_param_tree_matches_mlp(self):
        from point_dae_tpu.models.layers import MLP, SplitMLP

        rng = np.random.default_rng(2)
        shared = jnp.asarray(rng.normal(size=(2, 6)).astype(np.float32))
        pp = jnp.asarray(rng.normal(size=(2, 4, 2)).astype(np.float32))
        sm = SplitMLP((8, 8, 3))
        vs = sm.init(jax.random.key(0), shared, pp)
        cat = jnp.concatenate(
            [jnp.broadcast_to(shared[:, None, :], (2, 4, 6)), pp], -1)
        ml = MLP((8, 8, 3))
        vm = ml.init(jax.random.key(0), cat)
        ts = jax.tree_util.tree_map(lambda a: a.shape, vs["params"])
        tm = jax.tree_util.tree_map(lambda a: a.shape, vm["params"])
        assert ts == tm
        # same params -> same output
        got = sm.apply(vm, shared, pp)
        want = ml.apply(vm, cat)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


class TestRematEncoder:
    def test_remat_matches_plain_fwd_and_grad(self):
        """remat=True must be a pure memory/FLOP trade: identical outputs
        AND gradients to the plain encoder (same param tree)."""
        from point_dae_tpu.models.layers import TransformerEncoder

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
        pos = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
        km = jnp.ones((2, 5), bool).at[1, 3:].set(False)

        plain = TransformerEncoder(16, depth=2, num_heads=2)
        rem = TransformerEncoder(16, depth=2, num_heads=2, remat=True)
        v = plain.init(jax.random.key(0), x, pos, km)

        def loss(mod, variables):
            def f(vs):
                out = mod.apply(vs, x, pos, km, deterministic=True)
                return jnp.sum(out ** 2)
            return jax.value_and_grad(f)(variables)

        l1, g1 = jax.jit(lambda vs: loss(plain, vs))(v)
        l2, g2 = jax.jit(lambda vs: loss(rem, vs))(v)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        # remat recomputes the forward inside the backward under different
        # fusion decisions, so gradients agree to f32 epsilon, not bitwise
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            g1, g2)


class TestResidualDtype:
    def test_bf16_residual_close_to_f32_and_final_norm_restores(self):
        """residual_dtype=bf16: same param tree, bf16 stream through the
        blocks, close to the f32 stack; the decoder's final f32 LayerNorm
        restores f32 outputs."""
        from point_dae_tpu.models.layers import (TransformerDecoder,
                                                 TransformerEncoder)

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
        pos = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))

        enc = TransformerEncoder(16, depth=2, num_heads=2)
        enc_h = TransformerEncoder(16, depth=2, num_heads=2,
                                   residual_dtype=jnp.bfloat16)
        v = enc.init(jax.random.key(1), x, pos)
        a = enc.apply(v, x, pos, deterministic=True)
        b = enc_h.apply(v, x, pos, deterministic=True)
        assert b.dtype == jnp.bfloat16            # stream carried at bf16
        np.testing.assert_allclose(np.asarray(b, np.float32), np.asarray(a),
                                   rtol=0.05, atol=0.05)

        dec = TransformerDecoder(16, depth=1, num_heads=2,
                                 residual_dtype=jnp.bfloat16)
        vd = dec.init(jax.random.key(2), x, pos)
        out = dec.apply(vd, x, pos, deterministic=True)
        assert out.dtype == jnp.float32           # final f32 LN restores

    def test_model_knob_reaches_both_stacks(self):
        """transformer_config.residual_dtype='bf16' threads into the
        encoder and decoder; loss close to the f32-residual model on the
        same params."""
        from point_dae_tpu.models import transformer as tr

        cfg = {"corrupt_type": ["Drop-Patch"], "loss": "cdl2",
               "all_patch": "False", "num_group": 8, "group_size": 6,
               "transformer_config": {
                   "trans_dim": 32, "depth": 1, "num_heads": 2,
                   "encoder_dims": 32, "decoder_depth": 1,
                   "decoder_num_heads": 2, "drop_path_rate": 0.0,
                   "mask_ratio": 0.5, "rand_ratio": "False",
                   "mask_type": "rand"}}
        import copy
        cfg_h = copy.deepcopy(cfg)
        cfg_h["transformer_config"]["residual_dtype"] = "bf16"
        rng = np.random.default_rng(2)
        pts = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
        m = tr.PointCAE_transformer_fc_global_folding_local(config=cfg)
        mh = tr.PointCAE_transformer_fc_global_folding_local(config=cfg_h)
        rngs = {"params": jax.random.key(3), "mask": jax.random.key(4)}
        v = m.init(rngs, pts, pts, train=False)
        la = m.apply(v, pts, pts, train=False, rngs={"mask": jax.random.key(5)})
        lb = mh.apply(v, pts, pts, train=False, rngs={"mask": jax.random.key(5)})
        np.testing.assert_allclose(float(lb[0]), float(la[0]), rtol=0.03)
        np.testing.assert_allclose(float(lb[1]), float(la[1]), rtol=0.03)


class TestAttentionLayouts:
    def test_bnhd_layout_bit_exact(self, monkeypatch):
        """PDAE_ATTN_LAYOUT=bnhd (no-transpose q/k/v path) must match the
        default torch-shaped layout bit-for-bit in forward AND gradients —
        it is the same math, only the HLO differs."""
        import os

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(4, 32, 48)).astype(np.float32))
        km = jnp.asarray(rng.random((4, 32)) > 0.3)
        attn = Attention(48, num_heads=6, dtype=jnp.bfloat16)
        p = attn.init(jax.random.key(0), x)

        def loss(p, x):
            return jnp.sum(attn.apply(p, x, key_mask=km).astype(jnp.float32))

        monkeypatch.setenv("PDAE_ATTN_LAYOUT", "bhnd")
        y1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
        monkeypatch.setenv("PDAE_ATTN_LAYOUT", "bnhd")
        y2, g2 = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
        assert float(y1) == float(y2)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
