"""Smoke + semantics tests for the sibling/ablation model families:
MaskSurf, Point-M2AE, MaskFeat, MlMAE, and the long-tail transformer variants.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_dae_tpu.models import build_model_from_cfg
from point_dae_tpu.utils.config import ConfigDict

TF = {"rand_ratio": "False", "mask_ratio": 0.6, "mask_type": "rand",
      "trans_dim": 32, "encoder_dims": 32, "depth": 2, "drop_path_rate": 0.1,
      "num_heads": 2, "decoder_depth": 2, "decoder_num_heads": 2,
      "cls_dim": 15}

RNGS = {"params": jax.random.key(0), "corrupt": jax.random.key(1),
        "mask": jax.random.key(2), "droppath": jax.random.key(3),
        "dropout": jax.random.key(4)}
APPLY_RNGS = {k: jax.random.key(9) for k in
              ("corrupt", "mask", "droppath", "dropout")}


def run_pretrain_model(cfg, N=128, C=6, seed=0, **apply_kwargs):
    model = build_model_from_cfg(ConfigDict(cfg))
    rng = np.random.default_rng(seed)
    corrupted = jnp.asarray(rng.normal(size=(2, N, 3)).astype(np.float32))
    clean = jnp.asarray(rng.normal(size=(2, N, C)).astype(np.float32))

    @jax.jit
    def go():
        v = model.init(RNGS, corrupted, clean, train=True, **apply_kwargs)
        out, _ = model.apply(v, corrupted, clean, train=True, rngs=APPLY_RNGS,
                             mutable=["batch_stats"], **apply_kwargs)
        return out

    return go()


class TestMaskSurf:
    def test_masksurf_losses(self):
        out = run_pretrain_model({"NAME": "MaskSurf",
                                  "corrupt_type": ["Drop-Patch"],
                                  "group_size": 8, "num_group": 16,
                                  "loss": "cdl2normal",
                                  "transformer_config": TF})
        assert np.isfinite(float(out[0])) and np.isfinite(float(out[1]))
        assert float(out[1]) > 0.0  # normal loss is live

    def test_estimated_position_adds_loss(self):
        base = run_pretrain_model({"NAME": "MaskSurf",
                                   "corrupt_type": ["Drop-Patch"],
                                   "group_size": 8, "num_group": 16,
                                   "loss": "cdl2normal",
                                   "transformer_config": TF})
        pos = run_pretrain_model({"NAME": "MaskSurf_estimated_position",
                                  "corrupt_type": ["Drop-Patch"],
                                  "group_size": 8, "num_group": 16,
                                  "loss": "cdl2normal", "position_weight": 1.0,
                                  "transformer_config": TF})
        assert float(pos[1]) > 0.0

    def test_v2_adaptive_weighting(self):
        out = run_pretrain_model({"NAME": "MaskSurf_v2_local_global_point",
                                  "corrupt_type": ["Drop-Patch"],
                                  "group_size": 8, "num_group": 16,
                                  "loss": "cdl2normal",
                                  "transformer_config": TF})
        assert np.isfinite(float(out[0])) and np.isfinite(float(out[1]))


M2CFG = {"NAME": "Point_M2AE", "corrupt_type": ["Drop-Patch"],
         "mask_ratio": 0.8, "group_sizes": [8, 4, 4],
         "num_groups": [64, 32, 8], "encoder_depths": [1, 1, 1],
         "encoder_dims": [16, 32, 64], "local_radius": [0.32, 0.64, 1.28],
         "decoder_depths": [1, 1], "decoder_dims": [64, 32],
         "decoder_up_blocks": [1, 1], "drop_path_rate": 0.1, "num_heads": 2}


class TestM2AE:
    def test_pretrain(self):
        out = run_pretrain_model(M2CFG, N=256)
        assert np.isfinite(float(out[0]))

    def test_mdae_global_heads(self):
        cfg = dict(M2CFG, NAME="Point_MDAE_with_fc_center_p",
                   corrupt_type=["affine_r3", "Drop-Patch"])
        out = run_pretrain_model(cfg, N=256)
        assert np.isfinite(float(out[0])) and float(out[1]) > 0.0

    def test_mask_backprop(self):
        from point_dae_tpu.models.m2ae import backprop_mask

        # coarse groups 0,1 over 6 fine tokens; group 0 visible
        idx = jnp.asarray([[[0, 1, 2], [3, 4, 5]]])
        vis = jnp.asarray([[True, False]])
        out = np.asarray(backprop_mask(vis, idx, 6))[0]
        np.testing.assert_array_equal(out, [1, 1, 1, 0, 0, 0])

    def test_svm_feature(self):
        model = build_model_from_cfg(ConfigDict(
            dict(M2CFG, NAME="Point_M2AE_SVMFeature")))
        pts = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 256, 3)).astype(np.float32))

        @jax.jit
        def go():
            v = model.init(RNGS, pts, train=False)
            return model.apply(v, pts, train=False)

        assert go().shape == (2, 64)


class TestMaskFeat:
    def test_transformer_teacher(self):
        out = run_pretrain_model({"NAME": "MaskFeat_transformer",
                                  "corrupt_type": ["Drop-Patch"],
                                  "all_patch": "False",
                                  "group_size": 8, "num_group": 16,
                                  "loss": "cdl2",
                                  "transformer_config": TF})
        assert np.isfinite(float(out[0]))

    def test_dgcnn_teacher(self):
        out = run_pretrain_model({"NAME": "MaskFeat_dgcnn",
                                  "corrupt_type": ["Drop-Patch"],
                                  "all_patch": "False",
                                  "group_size": 8, "num_group": 16,
                                  "loss": "cdl2",
                                  "transformer_config": TF}, N=64)
        assert np.isfinite(float(out[0]))


class TestMlMAE:
    def test_feat_losses(self):
        cfg = {"NAME": "Point_MlMAE", "corrupt_type": ["Drop-Patch"],
               "group_size": 8, "num_group": 16, "loss": "cdl2",
               "feat_loss": ["high3", "high0"],
               "transformer_config": dict(TF, depth=12, decoder_depth=4)}
        out = run_pretrain_model(cfg)
        assert np.isfinite(float(out[0])) and float(out[1]) > 0.0


class TestTransformerLongTail:
    @pytest.mark.parametrize("name", [
        "PointCAE_transformer_fc_center",
        "PointCAE_transformer_fold_center",
        "PointCAE_transformer_fc_all",
        "PointCAE_transformer_fold_all",
        "PointCAE_transformer_patch_center_only",
        "PointCAE_transformer_fc_global_fc_local",
        "PointCAE_transformer_folding_global_folding_local",
        "PointCAE_transformer_folding_global_fc_local",
    ])
    def test_variant(self, name):
        out = run_pretrain_model({"NAME": name,
                                  "corrupt_type": ["affine_r3", "Drop-Patch"],
                                  "all_patch": "False", "group_size": 8,
                                  "num_group": 16, "npoints": 128,
                                  "loss": "cdl2",
                                  "transformer_config": TF})
        assert np.isfinite(float(out[0]))

    def test_v6_coarse2fine(self):
        out = run_pretrain_model(
            {"NAME": "PointCAE_transformer_v6_corase2fine_transformer",
             "corrupt_type": ["affine_r3"], "all_patch": "False",
             "group_size": 8, "num_group": 16, "loss": "cdl2",
             "transformer_config": TF})
        assert np.isfinite(float(out[0])) and np.isfinite(float(out[1]))

    def test_supervised(self):
        labels = jnp.asarray([3, 7])
        out = run_pretrain_model(
            {"NAME": "PointCAE_transformer_supervised",
             "corrupt_type": ["affine_r3", "Drop-Patch"],
             "all_patch": "False", "group_size": 8, "num_group": 16,
             "loss": "cdl2", "transformer_config": TF}, labels=labels)
        assert np.isfinite(float(out[0]))


class TestMaskSurfTokenDisAndCurve:
    def test_token_dis_ce(self):
        """CE against frozen-dVAE labels: near ln(V) at init, finite grads,
        and no gradient reaches the dvae_teacher subtree."""
        cfg = ConfigDict({"NAME": "MaskSurf_v2_token_dis",
                          "group_size": 8, "num_group": 16,
                          "all_patch": "False", "loss": "cdl2",
                          "dvae_config": {"num_tokens": 64,
                                          "encoder_dims": 32,
                                          "tokens_dims": 32,
                                          "decoder_dims": 32},
                          "transformer_config": dict(TF)})
        model = build_model_from_cfg(cfg)
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        v = model.init(RNGS, pts, pts, train=True)

        def loss_fn(params):
            (l1, _), _ = model.apply({**v, "params": params}, pts, pts,
                                     train=True, rngs=APPLY_RNGS,
                                     mutable=["batch_stats"])
            return l1

        l = loss_fn(v["params"])
        assert 0.5 * np.log(64) < float(l) < 3.0 * np.log(64)
        g = jax.grad(loss_fn)(v["params"])
        leaves = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: float(jnp.abs(x).sum()),
                                   g["dvae_teacher"]))
        assert all(x == 0.0 for x in leaves)  # stop-gradient holds
        head = float(jnp.abs(g["increase_dim"]["kernel"]).sum())
        assert np.isfinite(head) and head > 0.0

    def test_token_dis_all_patch(self):
        out = run_pretrain_model({"NAME": "MaskSurf_v2_token_dis",
                                  "group_size": 8, "num_group": 16,
                                  "all_patch": "True", "loss": "cdl2",
                                  "dvae_config": {"num_tokens": 64,
                                                  "encoder_dims": 32,
                                                  "tokens_dims": 32,
                                                  "decoder_dims": 32},
                                  "transformer_config": dict(TF)}, C=3)
        assert np.isfinite(float(out[0]))

    @pytest.mark.parametrize("name", [
        "MaskSurf_v2_local_point_normal_position_curve",
        "MaskSurf_v2_local_point_curve"])
    def test_curve_variants(self, name):
        """7-channel surfel input; the scaled surfel terms equal the xyz term
        in value (reference's sg(x/term) weighting)."""
        out = run_pretrain_model({"NAME": name, "group_size": 8,
                                  "num_group": 16, "loss": "cdl2normal",
                                  "transformer_config": dict(TF)}, C=7)
        lx, ls = float(out[0]), float(out[1])
        assert np.isfinite(lx) and np.isfinite(ls) and lx > 0
        if name.endswith("point_curve"):
            np.testing.assert_allclose(ls, lx, rtol=1e-5)
        else:
            np.testing.assert_allclose(ls, 0.33 * 3 * lx, rtol=1e-5)


class TestDiscreteVAE:
    def test_roundtrip_and_loss(self):
        from point_dae_tpu.models.dvae import DiscreteVAE, dvae_loss

        dv = DiscreteVAE({"num_group": 16, "group_size": 8, "num_tokens": 64,
                          "encoder_dims": 32, "tokens_dims": 32,
                          "decoder_dims": 32})
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        rngs = dict(RNGS, gumbel=jax.random.key(7))
        v = dv.init(rngs, pts, train=True)
        (coarse, fine, neigh, center, logits), _ = dv.apply(
            v, pts, temperature=0.5, hard=True, train=True,
            rngs={**APPLY_RNGS, "gumbel": jax.random.key(8)},
            mutable=["batch_stats"])
        assert coarse.shape == (2, 16, 2, 3)
        assert fine.shape == (2, 16, 8, 3)
        assert logits.shape == (2, 16, 64)
        l = dvae_loss(coarse, fine, neigh, logits, kl_weight=0.1)
        assert np.isfinite(float(l)) and float(l) > 0

    def test_hard_straight_through(self):
        """hard=True output uses one-hot codes in the forward pass."""
        from point_dae_tpu.models.dvae import DiscreteVAE

        dv = DiscreteVAE({"num_group": 8, "group_size": 8, "num_tokens": 16,
                          "encoder_dims": 16, "tokens_dims": 16,
                          "decoder_dims": 16})
        rng = np.random.default_rng(1)
        pts = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
        rngs = dict(RNGS, gumbel=jax.random.key(7))
        v = dv.init(rngs, pts, train=False)
        # eval path (no gumbel rng needed), hard one-hot
        out1, _ = dv.apply(v, pts, hard=True, train=False,
                           mutable=["batch_stats"])
        out2, _ = dv.apply(v, pts, hard=True, train=False,
                           mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out2[1]))


class TestM2AEFcCenterVariants:
    def test_m2ae_variant_skips_affine(self):
        """Same seeds: the M2AE (non-corrupted) variant differs from the MDAE
        (affine-corrupted) one, and both run."""
        cfg = {"group_size": 8, "num_group": 16,
               "num_groups": [32, 16], "group_sizes": [8, 8],
               "encoder_dims": [32, 64], "encoder_depths": [1, 1],
               "decoder_dims": [64, 32], "decoder_depths": [1, 1],
               "num_heads": 2, "mask_ratio": 0.8, "loss": "cdl2",
               "corrupt_type": ["affine_r3"]}
        outs = {}
        for name in ("Point_M2AE_with_fc_center_p",
                     "Point_MDAE_with_fc_center_p",
                     "Point_M2AE_with_fc_center_p_v1",
                     "Point_MDAE_with_fc_center_p_v1"):
            outs[name] = run_pretrain_model({**cfg, "NAME": name}, C=3)
        a = float(outs["Point_M2AE_with_fc_center_p"][0])
        b = float(outs["Point_MDAE_with_fc_center_p"][0])
        assert np.isfinite(a) and np.isfinite(b) and a != b
        # v1 aliases share the respective corruption behavior
        assert float(outs["Point_M2AE_with_fc_center_p_v1"][0]) == a
        assert float(outs["Point_MDAE_with_fc_center_p_v1"][0]) == b


class TestPartSegEncoderFamily:
    def test_dae_and_heads(self):
        out = run_pretrain_model({"NAME": "Point_CAE_PointNetNoT_PartSeg",
                                  "loss": "cdl2"}, C=3)
        assert np.isfinite(float(out[0]))

        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        from point_dae_tpu.utils.registry import MODELS
        for name, dim in (("PointNetNoT_PartSeg", 15),
                          ("PointNetNoT_Linear_PartSeg", 15)):
            m = MODELS.get(name)(ConfigDict({"cls_dim": dim}))
            v = m.init(RNGS, pts, train=True)
            out, _ = m.apply(v, pts, train=True, rngs=APPLY_RNGS,
                             mutable=["batch_stats"])
            assert out.shape == (2, dim)
        m = MODELS.get("PointNetNoT_feat_PartSeg")(ConfigDict({}))
        v = m.init(RNGS, pts, train=False)
        feat = m.apply(v, pts, train=False)
        assert feat.shape == (2, 2048)


class TestRegistryParity:
    def test_reference_names_registered(self):
        """Every actually-registered reference model name resolves here
        (MaskSurf_v2/_onlynormal are commented out in the reference source,
        MaskSurf_v2.py:538,742, so they are intentionally absent)."""
        from point_dae_tpu.utils.registry import MODELS

        names = [
            # spelling parity for the NoT / linear-classification families
            "Point_CAE_PointNetNoT", "PointNetNoT", "PointNetNoT_feat",
            "PointNetNoT_Linear", "PointTransformerLinearClassification",
            # partseg-encoder DGCNN family
            "Point_CAE_DGCNN_PartSeg", "Point_CAE_DGCNN_proj_PartSeg",
            "DGCNN_PartSeg", "DGCNN_Linear_PartSeg", "DGCNN_feat_PartSeg",
            # PointNet++ MA2E + Proj
            "Point_MA2E_PointNetv2", "Point_MA2E_PointNetv2_local_only",
            "Point_MA2E_PointNetv2_global_only", "Point_CAE_PointNetv2_Proj",
            # MaskFeat reference names, MlMAE heads, v6 folding
            "MaskFeat_transformer_pointmae", "MaskFeat_transformer_supervised",
            "PointTransformerMlMAE", "PointTransformerMlMAELinearClassification",
            "PointCAE_transformer_v6_folding_corase2fine_transformer",
        ]
        for n in names:
            assert MODELS.get(n) is not None, n


class TestMA2EPointNetv2:
    def test_heads_and_ablations(self):
        """full = (fine, coarse); local_only/global_only zero the other term
        and reproduce the corresponding full-head value (same seeds)."""
        cfg = {"corrupt_type": [], "loss": "cdl2"}
        full = run_pretrain_model({**cfg, "NAME": "Point_MA2E_PointNetv2"},
                                  N=256, C=3)
        loc = run_pretrain_model(
            {**cfg, "NAME": "Point_MA2E_PointNetv2_local_only"}, N=256, C=3)
        glob = run_pretrain_model(
            {**cfg, "NAME": "Point_MA2E_PointNetv2_global_only"}, N=256, C=3)
        np.testing.assert_allclose(float(loc[0]), float(full[0]), rtol=1e-5)
        np.testing.assert_allclose(float(glob[0]), float(full[1]), rtol=1e-5)
        assert float(loc[1]) == 0.0 and float(glob[1]) == 0.0


class TestDGCNNPartSegDAE:
    def test_pcn_and_proj(self):
        out = run_pretrain_model({"NAME": "Point_CAE_DGCNN_PartSeg",
                                  "corrupt_type": [], "loss": "cdl2"},
                                 N=256, C=3)
        assert np.isfinite(float(out[0])) and np.isfinite(float(out[1]))
        out = run_pretrain_model({"NAME": "Point_CAE_DGCNN_proj_PartSeg",
                                  "corrupt_type": [], "loss": "cdl2"},
                                 N=256, C=3)
        assert np.isfinite(float(out[0]))


class TestV6Folding:
    def test_folding_coarse_head(self):
        out = run_pretrain_model(
            {"NAME": "PointCAE_transformer_v6_folding_corase2fine_transformer",
             "corrupt_type": ["affine_r3"], "group_size": 8, "num_group": 16,
             "loss": "cdl2", "transformer_config": dict(TF)}, C=3)
        assert np.isfinite(float(out[0])) and np.isfinite(float(out[1]))


class TestM2AEThreeScale:
    def test_reference_pyramid_shape(self):
        """The reference 3-scale pyramid (512x16 -> 256x8 -> 64x8) with an
        n-1-stage decoder reconstructs the second-finest scale
        (Point_M2AE.py:276-321); crashed before the decoded-scale/target
        pairing fix."""
        out = run_pretrain_model({
            "NAME": "Point_M2AE",
            "num_groups": [64, 32, 16], "group_sizes": [8, 8, 8],
            "encoder_dims": [32, 64, 96], "encoder_depths": [1, 1, 1],
            "decoder_dims": [96, 64], "decoder_depths": [1, 1],
            "num_heads": 2, "mask_ratio": 0.8, "loss": "cdl2"},
            N=256, C=3)
        assert np.isfinite(float(out[0]))


class TestDetr3:
    def test_fc_global_fc_local_3detr(self):
        cfg = {"NAME": "PointCAE_transformer_fc_global_fc_local_3detr",
               "corrupt_type": ["affine_r3", "Drop-Patch"],
               "all_patch": "False", "group_size": 8, "num_group": 16,
               "loss": "cdl2", "transformer_config": dict(TF)}
        out = run_pretrain_model(cfg)
        assert np.isfinite(float(out[0])) and np.isfinite(float(out[1]))

    def test_encodernope_alias(self):
        cfg = {"NAME":
               "PointCAE_transformer_fc_global_fc_local_3detr_encodernope",
               "corrupt_type": ["affine_r3", "Drop-Patch"],
               "all_patch": "False", "group_size": 8, "num_group": 16,
               "loss": "cdl2", "transformer_config": dict(TF)}
        out = run_pretrain_model(cfg)
        assert np.isfinite(float(out[0]))

    def test_encode_feature_path(self):
        cfg = {"NAME": "PointCAE_transformer_fc_global_fc_local_3detr",
               "corrupt_type": ["affine_r3", "Drop-Patch"],
               "all_patch": "False", "group_size": 8, "num_group": 16,
               "loss": "cdl2", "transformer_config": dict(TF)}
        model = build_model_from_cfg(ConfigDict(cfg))
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        v = model.init(RNGS, pts, pts, train=True)
        feat = jax.jit(lambda v, p: model.apply(
            v, p, train=False, method="encode"))(v, pts)
        assert feat.shape == (2, TF["trans_dim"])


class TestMlMAEPackingInvariance:
    def test_visible_feats_independent_of_masked(self):
        """MlMAE's packed student encoder: visible-slot features must not
        depend on masked patches' contents (they are never embedded)."""
        from point_dae_tpu.models.mlmae import _MlEncoder

        enc = _MlEncoder(trans_dim=32, depth=4, num_heads=2, encoder_dims=32,
                         drop_path_rate=0.0, mask_ratio=0.5, rand_ratio=False,
                         fetch_idx=(1, 3))
        rng = np.random.default_rng(0)
        neigh = jnp.asarray(rng.normal(size=(1, 8, 4, 3)).astype(np.float32))
        center = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))
        rngs = {"params": jax.random.key(0), "mask": jax.random.key(1)}

        @jax.jit
        def run(neigh):
            v = enc.init(rngs, neigh, center, train=False)
            return enc.apply(v, neigh, center, train=False,
                             rngs={"mask": jax.random.key(7)})

        feats1, mask, _ = run(neigh)
        m = np.asarray(mask)[0]
        neigh2 = np.asarray(neigh).copy()
        neigh2[0, m] += 100.0
        feats2, mask2, _ = run(jnp.asarray(neigh2))
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask2))
        for f1, f2 in zip(feats1, feats2):
            np.testing.assert_allclose(np.asarray(f1)[0, ~m],
                                       np.asarray(f2)[0, ~m], atol=2e-4)


class TestMaskSurfReconstruct:
    """Surfel visualization path (main_vis_surfels.py role): reconstruct()
    yields finite vis/rebuild clouds with masked-slot zeroing, for EVERY
    registered surfel variant (the v2 local_point_*/curve/token_dis classes
    used to inherit a base reconstruct whose head widths didn't fit).
    Init goes through method='reconstruct' like engine/visualization.py
    (token_dis's dVAE-decoder params only exist on that path)."""

    def _run(self, name, check_normals=True):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from point_dae_tpu.models import build_model_from_cfg
        from point_dae_tpu.utils.config import ConfigDict

        cfg = ConfigDict({
            "NAME": name, "corrupt_type": ["Drop-Patch"],
            "all_patch": "False", "group_size": 8, "num_group": 16,
            "loss": "cdl2normal", "position_weight": 1.0,
            "dvae_config": {"num_tokens": 32, "encoder_dims": 16,
                            "tokens_dims": 16, "decoder_dims": 16},
            "transformer_config": {
                "rand_ratio": "False", "mask_ratio": 0.5, "mask_type": "rand",
                "trans_dim": 32, "encoder_dims": 32, "depth": 1,
                "drop_path_rate": 0.0, "cls_dim": 8, "num_heads": 2,
                "decoder_depth": 1, "decoder_num_heads": 2}})
        model = build_model_from_cfg(cfg)
        rng = np.random.default_rng(0)
        clean = jnp.asarray(rng.normal(size=(2, 128, 6)).astype(np.float32))
        rngs = {"params": jax.random.key(0), "corrupt": jax.random.key(1),
                "mask": jax.random.key(2), "droppath": jax.random.key(3)}
        v = model.init(rngs, clean, train=False, method="reconstruct")
        out = model.apply(
            {"params": v["params"], **({"batch_stats": v["batch_stats"]}
                                       if "batch_stats" in v else {})},
            clean, train=False, method="reconstruct",
            rngs={"corrupt": jax.random.key(4), "mask": jax.random.key(5)})
        head, rebuild, third, mask = out
        assert rebuild.shape == (2, 16 * 8, 3)
        if check_normals:
            assert third.shape == (2, 16 * 8, 3)
        for a in (head, rebuild, third):
            assert np.isfinite(np.asarray(a).astype(np.float32)).all()
        # visible slots zeroed in the masked-rebuild cloud
        m = np.asarray(mask)
        r = np.asarray(rebuild).reshape(2, 16, 8, 3)
        assert np.all(r[~m] == 0.0)
        # ...and masked slots are actually populated (a broken head would
        # leave all-zero output)
        assert np.abs(r[m]).sum() > 0

    def test_v1(self):
        self._run("MaskSurf")

    def test_v1_estimated_position(self):
        self._run("MaskSurf_estimated_position")

    def test_v2_local_global_point(self):
        self._run("MaskSurf_v2_local_global_point")

    def test_v2_local_point_only(self):
        self._run("MaskSurf_v2_local_point_only")

    def test_v2_local_point_normal_position(self):
        self._run("MaskSurf_v2_local_point_normal_position")

    def test_v2_curve(self):
        self._run("MaskSurf_v2_local_point_normal_position_curve")

    def test_v2_token_dis(self):
        # third output = predicted token ids (B, G), not normals
        self._run("MaskSurf_v2_token_dis", check_normals=False)
