#!/usr/bin/env python
"""Generate the pretrain/finetune recipe corpus.

The reference ships ~300 yamls that are one template crossed with ablation
axes (corruption type x training length x input pose x backbone; see
cfgs/ in YBZh/Point-DAE). This emits the same matrix from the corruption
registry instead of checking in 300 hand-edited files:

    python tools/gen_cfgs.py --out cfgs/generated

Axes:
- corruption: every registry name in data/corruptions.py (the §2.3 table) +
  the composite affines + the dropout_local c/d grid + 'clean'
- duration: 1x (300 ep) / 2x / 4x / 10x ('_NxLonger')
- input pose: default ('norm' aug) / '_random' (random-rotate aug) / '_svd'
  (SVD-canonicalized dataset variant, tools/svd_pose_generate.py)
- backbone: DGCNN FCOnly (non-transformer flagship) and the transformer
  flagship (PointCAE_transformer_fc_global_folding_local)
"""
from __future__ import annotations

import argparse
import os

PRETRAIN_TMPL = """optimizer: {{type: AdamW, part: all, kwargs: {{lr: 0.001, weight_decay: 0.05}}}}
scheduler: {{type: CosLR, kwargs: {{epochs: {epochs}, initial_epochs: 10}}}}

dataset:
  train: {{_base_: cfgs/dataset_configs/ShapeNet-55_withnormal.yaml,
          others: {{subset: 'train', npoints: 1024, aug_type: [{aug}], corrupt_type: [{corrupt}]}}}}
  val: {{_base_: cfgs/dataset_configs/ModelNet40Official.yaml,
        others: {{subset: 'test', npoints: 1024, aug_type: ['clean']}}}}
  extra_train: {{_base_: cfgs/dataset_configs/ModelNet40Official.yaml,
                others: {{subset: 'train', npoints: 1024, aug_type: ['clean']}}}}

model:
{model}

normal_weight: {normal_weight}
npoints: 1024
total_bs: 128
step_per_update: 1
max_epoch: {epochs}
loss_type: '{loss_type}'
"""

DGCNN_MODEL = """  NAME: Point_CAE_DGCNN_FCOnly
  corrupt_type: []
  num_group: 64
  loss: cdl2"""

TRANSFORMER_MODEL = """  NAME: PointCAE_transformer_fc_global_folding_local
  corrupt_type: []
  all_patch: 'False'
  group_size: 32
  num_group: 64
  loss: cdl2
  transformer_config:
    rand_ratio: 'True'
    mask_ratio: 0.6
    mask_type: 'rand'
    trans_dim: 384
    encoder_dims: 384
    depth: 12
    drop_path_rate: 0.1
    num_heads: 6
    decoder_depth: 4
    decoder_num_heads: 6"""

FINETUNE_TMPL = """optimizer: {{type: AdamW, part: {part}, kwargs: {{lr: {lr}, weight_decay: 0.05}}}}
scheduler: {{type: CosLR, kwargs: {{epochs: 300, initial_epochs: 10}}}}

dataset:
  train: {{_base_: cfgs/dataset_configs/{dset}.yaml,
          others: {{subset: 'train', npoints: {npoints}, aug_type: [{aug}]}}}}
  val: {{_base_: cfgs/dataset_configs/{dset}.yaml,
        others: {{subset: 'test', npoints: {npoints}, aug_type: ['clean']}}}}
  test: {{_base_: cfgs/dataset_configs/{dset}.yaml,
         others: {{subset: 'test', npoints: {npoints}, aug_type: ['clean']}}}}

model:
  NAME: {model}
  cls_dim: {cls_dim}
  group_size: 32
  num_group: {num_group}
  trans_dim: 384
  encoder_dims: 384
  depth: 12
  drop_path_rate: 0.1
  num_heads: 6

npoints: {npoints}
total_bs: 32
step_per_update: 1
max_epoch: 300
grad_norm_clip: 10
smooth: {smooth}
"""


def corruption_axis():
    """Every per-sample corruption registry name (corrupt_util.py:984-1038
    equivalents) plus the composites and recipe pairs."""
    singles = [
        "clean", "scale", "scale_single", "scale_nonorm", "scale_nonorm_1p5",
        "scale_nonorm_4", "scale_nonorm_10", "translate", "translate_tiny",
        "translate_middle", "translate_too_large", "jitter", "jitter_p01",
        "jitter_p03", "jitter_p05", "jitter_p1", "rotate", "rotate_level0",
        "rotate_level1", "rotate_level2", "rotate_level3", "rotate_level4",
        "reflection", "shear", "shear_p1", "shear_p3", "shear_p8",
        "shear_1p", "shear_2p", "rotate_z", "dropout_local", "add_global",
        "add_local", "nonuniform_density", "dropout_patch_pointmae",
        "dropout_global", "affine_r3", "affine_r5", "affine_r3_v2",
        "affine_r5_v2",
    ]
    singles += [f"dropout_local_c{c}d{d}" for c in (1, 2, 3, 5, 8)
                for d in (1, 3, 5, 7, 9)]
    pairs = [
        ("affine_r3", "dropout_local"), ("affine_r3", "dropout_patch_pointmae"),
        ("affine_r3", "jitter"), ("affine_r3_v2", "dropout_local_c5d3"),
        ("affine_r5", "dropout_local"),
    ]
    return singles, pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="cfgs/generated")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    singles, pairs = corruption_axis()
    jobs = [(n, [n]) for n in singles] + \
           [("_".join(p), list(p)) for p in pairs]

    n = 0
    for name, corrupt in jobs:
        cstr = ", ".join(f"'{c}'" for c in corrupt)
        for dur, epochs in (("", 300), ("_2xlonger", 600),
                            ("_4xlonger", 1200), ("_10xlonger", 3000)):
            # duration axis only for the headline recipes
            if dur and name not in ("affine_r3", "affine_r3_dropout_local",
                                    "affine_r3_v2_dropout_local_c5d3"):
                continue
            for pose, aug in (("", "'norm'"), ("_random", "'norm', 'rotate'"),
                              ("_svd", "'norm'")):
                if pose and dur not in ("", "_4xlonger"):
                    continue
                fn = f"pretrain_PointCAE_{name}{dur}{pose}.yaml"
                body = PRETRAIN_TMPL.format(
                    epochs=epochs, aug=aug, corrupt=cstr, model=DGCNN_MODEL,
                    normal_weight=1.0, loss_type="xyznormal_gradual")
                open(os.path.join(args.out, fn), "w").write(body)
                n += 1
        # transformer flagship: masked-patch recipe (Drop-Patch in-model)
        fn = f"pretrain_PointCAE_transformer_{name}_maskpatch.yaml"
        tcor = corrupt + ["Drop-Patch"] if "dropout" not in name else corrupt
        tstr = ", ".join(f"'{c}'" for c in tcor)
        body = PRETRAIN_TMPL.format(
            epochs=300, aug="'norm'", corrupt=cstr,
            model=TRANSFORMER_MODEL.replace("corrupt_type: []",
                                            f"corrupt_type: [{tstr}]"),
            normal_weight=0.005, loss_type="xyznormal")
        open(os.path.join(args.out, fn), "w").write(body)
        n += 1

    # finetune matrix: dataset x head x probe mode
    ft = [
        ("modelnet", "ModelNet40", 40, 1024),
        ("modelnet_8k", "ModelNet40", 40, 8192),
        ("scan_hardest", "ScanObjectNN_hardest", 15, 2048),
        ("scan_objbg", "ScanObjectNN_objectbg", 15, 2048),
    ]
    heads = [
        ("transferring_features", "PointTransformer", "all", 0.0005, "True"),
        ("linear_classification", "PointTransformer_LinearClassification",
         "only_new", 0.01, "False"),
        ("non_linear_classification", "PointTransformer", "only_new", 0.001,
         "False"),
        ("transferring_features_DGCNN", "DGCNN", "all", 0.0005, "True"),
    ]
    for dtag, dset, cls, npts in ft:
        for htag, model, part, lr, smooth in heads:
            fn = f"finetune_{dtag}_{htag}.yaml"
            # train-time scale/translate aug is applied by the finetune
            # runner itself (engine/finetune.py), not the dataset pipeline
            body = FINETUNE_TMPL.format(
                part=part, lr=lr, dset=dset, npoints=npts, aug="'clean'",
                model=model, cls_dim=cls,
                num_group=128 if npts >= 2048 else 64, smooth=smooth)
            open(os.path.join(args.out, fn), "w").write(body)
            n += 1

    # few-shot matrix
    for dtag, dset in (("modelnet", "ModelNet40FewShot"),):
        fn = f"fewshot_{dtag}_transferring_features.yaml"
        body = FINETUNE_TMPL.format(
            part="all", lr=0.0005, dset=dset, npoints=1024,
            aug="'clean'", model="PointTransformer", cls_dim=10,
            num_group=64, smooth="True")
        open(os.path.join(args.out, fn), "w").write(body)
        n += 1

    print(f"wrote {n} configs to {args.out}")


if __name__ == "__main__":
    main()
