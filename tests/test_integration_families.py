"""Runner-level pretrain integration per model family.

test_integration.py drives run_pretrain with the DGCNN DAE; this file
drives the SAME runner (epoch loop, loss_type schedule, SVM validation,
Orbax checkpointing) with one representative of each other pretrain
family — transformer flagship, MaskSurf, Point-M2AE, MlMAE, MaskFeat —
so "every family trains" is proven at the runner level, not just at
model.apply (tools/runner_pretrain.py covers every family the same way
through its single loop).
"""
import os
import types

import pytest

from point_dae_tpu.engine.pretrain import run_pretrain
from point_dae_tpu.utils.config import ConfigDict

TF = {"rand_ratio": "False", "mask_ratio": 0.6, "mask_type": "rand",
      "trans_dim": 32, "encoder_dims": 32, "depth": 2, "drop_path_rate": 0.1,
      "num_heads": 2, "decoder_depth": 2, "decoder_num_heads": 2}

FAMILY_MODELS = {
    "transformer_flagship": {
        "NAME": "PointCAE_transformer_fc_global_folding_local",
        "corrupt_type": ["affine_r3", "Drop-Patch"], "all_patch": "False",
        "group_size": 8, "num_group": 16, "loss": "cdl2",
        "transformer_config": TF},
    "masksurf": {
        "NAME": "MaskSurf", "corrupt_type": ["Drop-Patch"],
        "group_size": 8, "num_group": 16, "loss": "cdl2normal",
        "transformer_config": TF},
    "m2ae": {
        "NAME": "Point_M2AE", "corrupt_type": ["Drop-Patch"],
        "mask_ratio": 0.8, "group_sizes": [8, 4, 4],
        "num_groups": [16, 8, 4], "encoder_depths": [1, 1, 1],
        "encoder_dims": [16, 32, 64], "local_radius": [0.32, 0.64, 1.28],
        "decoder_depths": [1, 1], "decoder_dims": [64, 32],
        "decoder_up_blocks": [1, 1], "drop_path_rate": 0.1, "num_heads": 2},
    "mlmae": {
        "NAME": "Point_MlMAE", "corrupt_type": ["Drop-Patch"],
        "group_size": 8, "num_group": 16, "loss": "cdl2",
        "feat_loss": ["high3"],
        # depth 12: the _MlEncoder fetches levels at blocks (3, 7, 11)
        "transformer_config": dict(TF, depth=12, decoder_depth=2)},
    "maskfeat": {
        "NAME": "MaskFeat_transformer", "corrupt_type": ["Drop-Patch"],
        "all_patch": "False", "group_size": 8, "num_group": 16,
        "loss": "cdl2", "transformer_config": TF},
    # supervised-pretraining ablation: CE on batch labels threaded through
    # the train step (is_supervised), PointCAE_transformer.py:3113-3255
    "supervised": {
        "NAME": "PointCAE_transformer_supervised",
        "corrupt_type": ["Drop-Patch"], "all_patch": "False",
        "group_size": 8, "num_group": 16, "loss": "cdl2",
        "transformer_config": dict(TF, cls_dim=3)},
    # trainable dVAE tokenizer (sanctioned addition: the reference consumes
    # Point-BERT's released dVAE.pth, never trains one)
    "dvae": {
        "NAME": "Point_dVAE", "corrupt_type": ["clean"],
        "group_size": 8, "num_group": 16, "num_tokens": 32,
        "encoder_dims": 16, "tokens_dims": 16, "decoder_dims": 16},
}


def _cfg(model_cfg):
    return ConfigDict({
        "optimizer": {"type": "AdamW", "part": "all",
                      "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 1}},
        "dataset": {
            "train": {"_base_": {"NAME": "Synthetic", "size": 16,
                                 "N_POINTS": 256, "num_classes": 3},
                      "others": {"subset": "train", "npoints": 128,
                                 "aug_type": ["norm"]}},
            "val": {"_base_": {"NAME": "Synthetic", "size": 8,
                               "N_POINTS": 256, "num_classes": 3, "seed": 1},
                    "others": {"subset": "test", "npoints": 128,
                               "aug_type": ["clean"]}},
            "extra_train": {"_base_": {"NAME": "Synthetic", "size": 8,
                                       "N_POINTS": 256, "num_classes": 3,
                                       "seed": 2},
                            "others": {"subset": "train", "npoints": 128,
                                       "aug_type": ["clean"]}},
        },
        "model": dict(model_cfg),
        "normal_weight": 1.0, "npoints": 128, "total_bs": 8,
        "max_epoch": 1, "loss_type": "xyz"})


@pytest.mark.parametrize("family", sorted(FAMILY_MODELS))
def test_run_pretrain_family(tmp_path, family):
    args = types.SimpleNamespace(
        experiment_path=str(tmp_path), tfboard_path=None, seed=0,
        resume=False, val_freq=1, start_ckpts=None)
    out = run_pretrain(_cfg(FAMILY_MODELS[family]), args,
                       logger_name=f"fam-{family}")
    assert 0.0 <= out["best_acc"] <= 1.0
    assert os.path.exists(os.path.join(tmp_path, "ckpt-last"))


def test_token_dis_consumes_trained_dvae_ckpt(tmp_path):
    """The in-framework tokenizer flow end-to-end: a Point_dVAE checkpoint
    feeds MaskSurf_v2_token_dis via dvae_config.ckpt, landing in the frozen
    dvae_teacher subtree exactly (the strict-load role of
    MaskSurf_v2.py:2086-2091) — and staying frozen through training."""
    import os

    import jax
    import numpy as np

    # 1) train the tokenizer for one epoch and keep its params
    args1 = types.SimpleNamespace(
        experiment_path=str(tmp_path / "dvae"), tfboard_path=None, seed=0,
        resume=False, val_freq=1, start_ckpts=None)
    os.makedirs(args1.experiment_path, exist_ok=True)
    out1 = run_pretrain(_cfg(FAMILY_MODELS["dvae"]), args1,
                        logger_name="dvae-train")
    trained = jax.device_get(out1["state"].params)["dvae"]

    # 2) token_dis pointing dvae_config.ckpt at the saved checkpoint
    dvae_cfg = {k: v for k, v in FAMILY_MODELS["dvae"].items()
                if k not in ("NAME", "corrupt_type")}
    model_cfg = {
        "NAME": "MaskSurf_v2_token_dis", "corrupt_type": ["Drop-Patch"],
        "all_patch": "False", "group_size": 8, "num_group": 16,
        "loss": "cdl2",
        "dvae_config": dict(dvae_cfg, NAME="DiscreteVAE",
                            ckpt=os.path.join(args1.experiment_path,
                                              "ckpt-last")),
        "transformer_config": TF}
    args2 = types.SimpleNamespace(
        experiment_path=str(tmp_path / "tokendis"), tfboard_path=None,
        seed=0, resume=False, val_freq=1, start_ckpts=None)
    os.makedirs(args2.experiment_path, exist_ok=True)
    out2 = run_pretrain(_cfg(model_cfg), args2, logger_name="tokendis")
    teacher = jax.device_get(out2["state"].params)["dvae_teacher"]

    # tokenizer weights arrived AND survived training unchanged (frozen)
    flat_t = {"/".join(map(str, p)): v for p, v in
              jax.tree_util.tree_leaves_with_path(trained)}
    flat_s = {"/".join(map(str, p)): v for p, v in
              jax.tree_util.tree_leaves_with_path(teacher)}
    # the trainer only materializes the encode/tokenize params it used;
    # compare the intersection and require the codebook is in it
    common = set(flat_t) & set(flat_s)
    assert any("codebook" in k for k in common)
    for k in sorted(common):
        np.testing.assert_array_equal(flat_t[k], flat_s[k])
