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
