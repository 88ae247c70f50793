"""End-to-end run_partseg smoke on a synthetic ShapeNetPart tree.

Covers the full loop (segmentation/main.py:181-323 role): dataset build,
jitted train step with on-device metric accumulation, category-restricted
eval argmax, mIoU computation, checkpointing.
"""
import json
import os
import types

import numpy as np
import pytest


def _fake_shapenetpart(root: str, n_shapes: int = 6, n_pts: int = 96):
    """Two-category tree (Airplane parts 0-3, Chair parts 12-15) in the
    reference's txt layout (x y z nx ny nz seg per row)."""
    cats = {"Airplane": "02691156", "Chair": "03001627"}
    parts = {"Airplane": [0, 1, 2, 3], "Chair": [12, 13, 14, 15]}
    with open(os.path.join(root, "synsetoffset2category.txt"), "w") as f:
        for name, syn in cats.items():
            f.write(f"{name}\t{syn}\n")
    os.makedirs(os.path.join(root, "train_test_split"), exist_ok=True)
    rng = np.random.RandomState(0)
    splits = {"train": [], "val": [], "test": []}
    i = 0
    for name, syn in cats.items():
        d = os.path.join(root, syn)
        os.makedirs(d, exist_ok=True)
        for j in range(n_shapes):
            sid = f"{name.lower()}{j:03d}"
            pts = rng.randn(n_pts, 3).astype(np.float32)
            nrm = rng.randn(n_pts, 3).astype(np.float32)
            seg = rng.choice(parts[name], n_pts)
            np.savetxt(os.path.join(d, sid + ".txt"),
                       np.concatenate([pts, nrm, seg[:, None]], axis=1),
                       fmt="%.4f")
            sp = ["train", "val", "test"][i % 3]
            splits[sp].append(f"shape_data/{syn}/{sid}")
            i += 1
    for sp, ids in splits.items():
        with open(os.path.join(root, "train_test_split",
                               f"shuffled_{sp}_file_list.json"), "w") as f:
            json.dump(ids, f)


def test_run_partseg_end_to_end(tmp_path):
    from point_dae_tpu.engine.partseg import run_partseg

    root = str(tmp_path / "shapenetpart")
    os.makedirs(root)
    _fake_shapenetpart(root)
    npoints = 64
    dbase = {"NAME": "ShapeNetPart", "DATA_PATH": root}
    config = {
        "optimizer": {"type": "AdamW", "part": "all",
                      "kwargs": {"lr": 1e-3, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR",
                      "kwargs": {"epochs": 1, "initial_epochs": 0}},
        "dataset": {
            "train": {"_base_": dbase,
                      "others": {"subset": "trainval", "npoints": npoints}},
            "test": {"_base_": dbase,
                     "others": {"subset": "test", "npoints": npoints}},
        },
        "model": {"NAME": "PointTransformerPartSeg", "trans_dim": 24,
                  "depth": 4, "drop_path_rate": 0.0, "cls_dim": 50,
                  "num_heads": 2, "group_size": 8, "num_group": 8,
                  "encoder_dims": 24},
        "npoints": npoints,
        "total_bs": 8,      # divisible by the 8-device test mesh
        "max_epoch": 0,
        "grad_norm_clip": 10,
    }
    args = types.SimpleNamespace(seed=0, ckpts=None,
                                 experiment_path=str(tmp_path / "exp"))
    os.makedirs(args.experiment_path, exist_ok=True)
    # the dataset must assign CANONICAL 16-category indices even though
    # only two categories exist in this tree (Airplane=0, Chair=5 in
    # sorted(SEG_CLASSES)) — otherwise category_restricted_argmax
    # restricts Chair shapes to the wrong category's parts
    from point_dae_tpu.data.datasets import ShapeNetPart
    ds = ShapeNetPart({"DATA_PATH": root, "subset": "test",
                       "npoints": npoints})
    from point_dae_tpu.engine.partseg import SEG_CLASSES
    canon = sorted(SEG_CLASSES)
    assert ds.classes == {"Airplane": canon.index("Airplane"),
                          "Chair": canon.index("Chair")}

    out = run_partseg(config, args, logger_name="partseg-e2e")
    assert 0.0 <= out["best_instance_miou"] <= 1.0
    assert 0.0 <= out["best_class_miou"] <= 1.0
    # mIoU on 4-part random labels must be nonzero for BOTH categories:
    # each prediction is restricted to its own category's parts, so every
    # part-IoU union is hit (a zero Chair IoU would mean the restriction
    # used the wrong category)
    assert out["best_instance_miou"] > 0.0
    assert out["best_class_miou"] > 0.0
    assert os.path.isdir(args.experiment_path)

    # --test on the saved best_model (the cli routes partseg --test here;
    # reference has no test mode at all): reproduces the training-time eval
    from point_dae_tpu.engine.partseg import test_partseg

    args2 = types.SimpleNamespace(
        seed=0, ckpts=os.path.join(args.experiment_path, "best_model"),
        experiment_path=args.experiment_path)
    m = test_partseg(config, args2, logger_name="partseg-e2e-test")
    # the dataset random-subsamples points per access (reference parity),
    # so the re-eval is close to, not bitwise-equal to, the training eval
    assert m["instance_miou"] > 0.0
    assert abs(m["instance_miou"] - out["best_instance_miou"]) < 0.05
