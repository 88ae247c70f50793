"""Runner-level finetune integration per classification-head family.

Drives run_finetune (FPS resample, smooth-CE, per-epoch validation,
checkpointing — runner_finetune.run_net:83-270 role) with one head per
backbone family on synthetic data, complementing the transformer-head CLI
smoke in cfgs/finetune_synthetic_transformer.yaml.
"""
import os
import types

import pytest

from point_dae_tpu.engine.finetune import run_finetune
from point_dae_tpu.utils.config import ConfigDict

TINY_TF = {"trans_dim": 32, "depth": 2, "drop_path_rate": 0.0,
           "num_heads": 2, "group_size": 8, "num_group": 16,
           "encoder_dims": 32, "cls_dim": 15}

HEAD_MODELS = {
    "dgcnn": {"NAME": "DGCNN", "cls_dim": 15},
    "pointnet": {"NAME": "PointNet", "cls_dim": 15},
    "pointnet_not": {"NAME": "PointNet_NoT", "cls_dim": 15},
    "pointnetv2": {"NAME": "PointNetv2", "cls_dim": 15},
    "m2ae_finetune": {
        "NAME": "Point_M2AE_Finetune", "cls_dim": 15,
        "group_sizes": [8, 4, 4], "num_groups": [16, 8, 4],
        "encoder_depths": [1, 1, 1], "encoder_dims": [16, 32, 64],
        "local_radius": [0.32, 0.64, 1.28], "mask_ratio": 0.0,
        "drop_path_rate": 0.0, "num_heads": 2},
    "mlmae_head": {
        "NAME": "PointTransformerMlMAE", "cls_dim": 15,
        "group_size": 8, "num_group": 16,
        "transformer_config": dict(TINY_TF, depth=12)},
}


def _cfg(model_cfg):
    base = {"NAME": "Synthetic", "N_POINTS": 512, "num_classes": 15,
            "with_normal": False}
    return ConfigDict({
        "optimizer": {"type": "AdamW", "part": "all",
                      "kwargs": {"lr": 0.0005, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR",
                      "kwargs": {"epochs": 1, "initial_epochs": 0}},
        "dataset": {
            "train": {"_base_": dict(base),
                      "others": {"subset": "train", "npoints": 128,
                                 "size": 16}},
            "val": {"_base_": dict(base),
                    "others": {"subset": "test", "npoints": 128,
                               "size": 8, "seed": 1}}},
        "model": dict(model_cfg),
        "npoints": 128, "total_bs": 8, "max_epoch": 1,
        "grad_norm_clip": 10, "smooth": "True"})


@pytest.mark.parametrize("family", sorted(HEAD_MODELS))
def test_run_finetune_family(tmp_path, family):
    args = types.SimpleNamespace(
        seed=0, experiment_path=str(tmp_path), val_freq=1, resume=False,
        start_ckpts=None, ckpts=None, tfboard_path=None, vote=False,
        way=-1, shot=-1, fold=-1)
    out = run_finetune(_cfg(HEAD_MODELS[family]), args,
                       logger_name=f"ft-{family}")
    assert 0.0 <= out["best_acc"] <= 100.0
    assert os.path.exists(os.path.join(tmp_path, "ckpt-last"))
