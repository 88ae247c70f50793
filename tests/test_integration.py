"""Integration: the full pretrain loop (run_pretrain) end to end on synthetic
data — epoch loop, on-device corruption pipeline, SVM validation, Orbax
ckpt-best/ckpt-last, resume."""
import os
import types

import numpy as np
import pytest

from point_dae_tpu.engine.pretrain import run_pretrain
from point_dae_tpu.utils.config import ConfigDict


def _cfg(tmp):
    return ConfigDict({
        "optimizer": {"type": "AdamW", "part": "all",
                      "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 2}},
        "dataset": {
            "train": {"_base_": {"NAME": "Synthetic", "size": 16,
                                 "N_POINTS": 256, "num_classes": 3},
                      "others": {"subset": "train", "npoints": 64,
                                 "aug_type": ["norm"],
                                 "corrupt_type": ["affine_r3",
                                                  "dropout_local"]}},
            "val": {"_base_": {"NAME": "Synthetic", "size": 8,
                               "N_POINTS": 256, "num_classes": 3, "seed": 1},
                    "others": {"subset": "test", "npoints": 64,
                               "aug_type": ["clean"]}},
            "extra_train": {"_base_": {"NAME": "Synthetic", "size": 8,
                                       "N_POINTS": 256, "num_classes": 3,
                                       "seed": 2},
                            "others": {"subset": "train", "npoints": 64,
                                       "aug_type": ["clean"]}},
        },
        "model": {"NAME": "Point_CAE_DGCNN_FCOnly", "corrupt_type": [],
                  "loss": "cdl2"},
        "normal_weight": 1.0, "npoints": 64, "total_bs": 8,
        "max_epoch": 2, "loss_type": "xyznormal_gradual"})


def test_run_pretrain_end_to_end(tmp_path):
    args = types.SimpleNamespace(
        experiment_path=str(tmp_path), tfboard_path=None, seed=0,
        resume=False, val_freq=1, start_ckpts=None)
    out = run_pretrain(_cfg(tmp_path), args, logger_name="test")
    assert 0.0 <= out["best_acc"] <= 1.0
    assert os.path.exists(os.path.join(tmp_path, "ckpt-last"))
    # scalars jsonl written? (tfboard_path None -> no writer; fine)

    # resume restarts past the last epoch without error
    args2 = types.SimpleNamespace(
        experiment_path=str(tmp_path), tfboard_path=None, seed=0,
        resume=True, val_freq=1, start_ckpts=None)
    cfg2 = _cfg(tmp_path)
    cfg2["max_epoch"] = 3
    out2 = run_pretrain(cfg2, args2, logger_name="test")
    assert out2["best_acc"] >= 0.0


def test_run_pretrain_seed_determinism(tmp_path):
    """Same seed => bit-identical trained parameters (the --deterministic
    contract: every random draw is PRNG-key-threaded, no wall-clock or
    pool-ordering nondeterminism in the train path)."""
    import jax

    outs = []
    for d in ("a", "b"):
        p = tmp_path / d
        p.mkdir()
        args = types.SimpleNamespace(
            experiment_path=str(p), tfboard_path=None, seed=123,
            resume=False, val_freq=10, start_ckpts=None)
        cfg = _cfg(p)
        cfg["max_epoch"] = 1
        outs.append(run_pretrain(cfg, args, logger_name=f"det-{d}"))
    pa = jax.device_get(outs[0]["state"].params)
    pb = jax.device_get(outs[1]["state"].params)
    flat_a = jax.tree_util.tree_leaves(pa)
    flat_b = jax.tree_util.tree_leaves(pb)
    assert len(flat_a) == len(flat_b)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
