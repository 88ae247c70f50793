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
