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
import sys

# repo root on sys.path regardless of cwd (PATCH_SUPPORTED import)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRETRAIN_TMPL = """optimizer: {{type: AdamW, part: all, kwargs: {{lr: 0.001, weight_decay: 0.05}}}}
scheduler: {{type: CosLR, kwargs: {{epochs: {epochs}, initial_epochs: 10}}}}

dataset:
  train: {{_base_: cfgs/dataset_configs/{base}.yaml,
          others: {{subset: 'train', npoints: {npoints}, aug_type: [{aug}], corrupt_type: [{corrupt}]}}}}
  val: {{_base_: cfgs/dataset_configs/ModelNet40Official.yaml,
        others: {{subset: 'test', npoints: 1024, aug_type: ['clean']}}}}
  extra_train: {{_base_: cfgs/dataset_configs/ModelNet40Official.yaml,
                others: {{subset: 'train', npoints: 1024, aug_type: ['clean']}}}}

model:
{model}

normal_weight: {normal_weight}
npoints: {npoints}
total_bs: 128
step_per_update: 1
max_epoch: {epochs}
loss_type: '{loss_type}'
"""

# input-pose axis switches the dataset variant like the reference
# (pretrain_*_svd/_random point their _base_ at the svd/random-pose
# dataset configs, e.g. pretrain_PointCAE_affine_r3_svd.yaml)
POSES = {"": "ShapeNet-55_withnormal",
         "_random": "ShapeNet-55_random_pose",
         "_svd": "ShapeNet-55_svd_pose"}

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
        ("affine_r3", "jitter"), ("affine_r5_v2", "dropout_local_c5d3"),
        ("affine_r3_v2", "dropout_local_c5d3"),
        ("affine_r5", "dropout_local"),
    ]
    return singles, pairs


M2AE_MODEL = """  NAME: Point_M2AE
  corrupt_type: []
  mask_ratio: 0.8
  group_sizes: [16, 8, 8]
  num_groups: [512, 256, 64]
  encoder_depths: [5, 5, 5]
  encoder_dims: [96, 192, 384]
  local_radius: [0.32, 0.64, 1.28]
  decoder_depths: [1, 1]
  decoder_dims: [384, 192]
  decoder_up_blocks: [1, 1]
  drop_path_rate: 0.1
  num_heads: 6"""


# pyramid spec the M2AE downstream heads need beyond the flat-ViT keys
# (model-scoped: injected inside the model block, 2-space indent)
M2AE_FT_EXTRA = """  group_sizes: [16, 8, 8]
  num_groups: [512, 256, 64]
  encoder_depths: [5, 5, 5]
  encoder_dims: [96, 192, 384]
  local_radius: [0.32, 0.64, 1.28]
  mask_ratio: 0.0
"""


def _tmodel(corrupt, extra=""):
    m = TRANSFORMER_MODEL.replace(
        "corrupt_type: []",
        "corrupt_type: [" + ", ".join(f"'{c}'" for c in corrupt) + "]")
    return m + extra


def reference_name_closure(emit):
    """Emit the reference cfgs/ pretrain names not covered by the axis
    matrix, each with the reference's semantics (corruption list, weight,
    duration, pose base, model family). Two classes of upstream-dead
    configs are handled explicitly: the 26 MaskSurf_v2 ablations name a
    model the reference never registers (MaskSurf_v2.py:537 commented
    out) — here 'MaskSurf_v2' aliases the headline v2 variant so they
    run; pretrain_*_occow keeps the reference's 'xyznormal_occostep'
    loss_type, which raises NotImplementedError in BOTH codebases
    (runner_pretrain.py:185)."""
    n = 0

    # --- DGCNN combos / aliases / weight variants
    dgcnn_extra = [
        ("affine_r3_dropout_patch", ["affine_r3", "dropout_patch_pointmae"],
         list(POSES)),
        ("dropout_patch", ["dropout_patch_pointmae"], list(POSES)),
        ("rotate_scale_nonorm", ["rotate", "scale_nonorm"], [""]),
        ("scale_nonorm_rotate", ["scale_nonorm", "rotate"], [""]),
        ("random_add", ["random_add"], [""]),
        ("random_add_affine_r3", ["random_add", "affine_r3"], [""]),
        ("shear_p5", ["shear_p5"], [""]),
        ("shear_small", ["shear_small"], [""]),
    ] + [(f"dropout_global_p{p}", [f"dropout_global_p{p}"], [""])
         for p in (1, 3, 5, 7, 9)]
    for name, corrupt, poses in dgcnn_extra:
        cstr = ", ".join(f"'{c}'" for c in corrupt)
        for pose in poses:
            emit(f"pretrain_PointCAE_{name}{pose}.yaml", epochs=300,
                 corrupt=cstr, model=DGCNN_MODEL, base=POSES[pose],
                 normal_weight=1.0, loss_type="xyznormal_gradual")
            n += 1
    for name, corrupt in (("affine_r3", ["affine_r3"]),
                          ("affine_r3_dropout_local",
                           ["affine_r3", "dropout_local"]),
                          ("dropout_local", ["dropout_local"])):
        cstr = ", ".join(f"'{c}'" for c in corrupt)
        emit(f"pretrain_PointCAE_{name}_occow.yaml", epochs=300,
             corrupt=cstr, model=DGCNN_MODEL, normal_weight=1.0,
             loss_type="xyznormal_occostep")
        n += 1

    # --- transformer per-corruption (patch-level, in-model) x pose
    tmap = {
        "clean": ["clean"], "affine_r3": ["affine_r3"],
        "translate": ["translate"], "scale_nonorm": ["scale_nonorm"],
        "rotate": ["rotate"], "rotate_z": ["rotate_z"],
        "reflection": ["reflection"], "shear": ["shear"],
        "jitter": ["jitter"], "add_local": ["add_local"],
        "scan": ["scan"], "drop_global": ["dropout_global"],
        "dropout_patch": ["Drop-Patch"],
    }
    for tag, corrupt in tmap.items():
        for pose, base in POSES.items():
            emit(f"pretrain_PointCAE_transformer_{tag}{pose}.yaml",
                 epochs=300, corrupt="'clean'", model=_tmodel(corrupt),
                 base=base, normal_weight=0.005, loss_type="xyznormal")
            n += 1
    for tag, w in (("p001", 0.01), ("p01", 0.1), ("p1", 1.0)):
        emit(f"pretrain_PointCAE_transformer_affine_r3_{tag}.yaml",
             epochs=300, corrupt="'clean'", model=_tmodel(["affine_r3"]),
             normal_weight=w, loss_type="xyznormal")
        n += 1

    # --- masked-patch (Drop-Patch) weight / duration / pose / arch sweep
    stem = "pretrain_PointCAE_transformer_dropout_patch_affine_r3_maskpatch"
    tdp = _tmodel(["affine_r3", "Drop-Patch"])
    weights = {"p000001": 1e-6, "p00001": 1e-5, "p00005": 5e-5,
               "p0001": 1e-4, "p0003": 3e-4, "p0005": 5e-4, "p001": 0.01,
               "p003": 0.03, "p005": 0.05, "p01": 0.1, "p03": 0.3}
    emit(f"{stem}.yaml", epochs=300, corrupt="'clean'", model=tdp,
         normal_weight=5e-4, loss_type="xyznormal")
    n += 1
    for tag, w in weights.items():
        emit(f"{stem}_{tag}.yaml", epochs=300, corrupt="'clean'",
             model=tdp, normal_weight=w, loss_type="xyznormal")
        n += 1
    for suffix, epochs in (("_p0005_double", 600), ("_p0005_half", 150),
                           ("_p0005_longer4x", 1200),
                           ("_p0005_longer10x", 3000),
                           ("_p001_double", 600)):
        emit(f"{stem}{suffix}.yaml", epochs=epochs, corrupt="'clean'",
             model=tdp, normal_weight=5e-4 if "p0005" in suffix else 0.01,
             loss_type="xyznormal")
        n += 1
    for suffix, base in (("_p0005_random", POSES["_random"]),
                         ("_p0005_svd", POSES["_svd"]),
                         ("_p0005_longer4x_svd", POSES["_svd"]),
                         ("_p001_double_svd", POSES["_svd"])):
        epochs = 1200 if "longer4x" in suffix else \
            (600 if "double" in suffix else 300)
        emit(f"{stem}{suffix}.yaml", epochs=epochs, corrupt="'clean'",
             model=tdp, base=base, normal_weight=5e-4,
             loss_type="xyznormal")
        n += 1
    emit(f"{stem}_p0005_whole_4xlonger.yaml", epochs=1200, whole=True,
         corrupt="'clean'", model=tdp, normal_weight=5e-4,
         loss_type="xyznormal")
    n += 1
    # supervised heads on top of the masked recipe (--model_name selects
    # PointCAE_transformer_supervised at run time, like rerun2.sh does)
    sup = _tmodel(["affine_r3", "Drop-Patch"],
                  "\n  cls_dim: 55\n  smoothloss: 'True'")
    for suffix, base in (("_p0005_supervised", POSES[""]),
                         ("_p0005_random_supervised", POSES["_random"]),
                         ("_p0005_svd_supervised", POSES["_svd"])):
        emit(f"{stem}{suffix}.yaml", epochs=300, corrupt="'clean'",
             model=sup, base=base, normal_weight=5e-4,
             loss_type="xyznormal")
        n += 1
    # 3detr-encoder variants: the reference selects the registered
    # *_3detr model classes (enc_arch rides along in transformer_config)
    detr = tdp.replace(
        "NAME: PointCAE_transformer_fc_global_folding_local",
        "NAME: PointCAE_transformer_fc_global_fc_local_3detr").replace(
        "transformer_config:",
        "transformer_config:\n    enc_arch: '3detr'")
    for fn in (f"{stem}_p0005_3detr.yaml",
               "pretrain_PointCAE_transformer_dropout_patch_affine_r3_middle_maskpatch_p0005_3detr.yaml",
               "pretrain_PointCAE_transformer_dropout_patch_affine_r3_middle_maskpatch_p0005_3detr_onlylocal.yaml",
               "pretrain_PointCAE_transformer_dropout_patch_affine_r3_tiny_maskpatch_p0005_3detr.yaml",
               "pretrain_PointCAE_transformer_dropout_patch_affine_r3_tiny_maskpatch_p0005_3detr_onlylocal.yaml",
               "pretrain_PointCAE_transformer_dropout_patch_maskpatch_pointmae_3detr.yaml",
               "pretrain_PointCAE_transformer_dropout_patch_scale_maskpatch_p0005_3detr_onlylocal.yaml"):
        emit(fn, epochs=300, corrupt="'clean'", model=detr,
             normal_weight=5e-4, loss_type="xyznormal")
        n += 1
    # Drop-Patch-only maskpatch variants
    dp_only = _tmodel(["Drop-Patch"])
    for suffix, base in (("", POSES[""]), ("_random", POSES["_random"]),
                         ("_svd", POSES["_svd"])):
        emit("pretrain_PointCAE_transformer_dropout_patch_maskpatch_p0005"
             f"{suffix}.yaml", epochs=300, corrupt="'clean'",
             model=dp_only, base=base, normal_weight=5e-4,
             loss_type="xyznormal")
        n += 1
    emit(f"{stem.replace('_maskpatch', '_allpatch')}.yaml", epochs=300,
         corrupt="'clean'",
         model=tdp.replace("all_patch: 'False'", "all_patch: 'True'"),
         normal_weight=5e-4, loss_type="xyznormal")
    emit(f"{stem.replace('_affine_r3_maskpatch', '_affine_r3')}.yaml",
         epochs=300, corrupt="'clean'", model=tdp, normal_weight=5e-4,
         loss_type="xyznormal")
    n += 2

    # --- Point-M2AE family (Point_M2AE, 2048-pt pyramid)
    m2ae_base = M2AE_MODEL.replace("corrupt_type: []",
                                   "corrupt_type: ['Drop-Patch']")
    m2ae_aff = M2AE_MODEL.replace(
        "corrupt_type: []", "corrupt_type: ['affine_r3', 'Drop-Patch']")
    for fn, model, w, epochs in (
            ("pretrain_PointM2AE_transformer_dropout_patch.yaml",
             m2ae_base, 0.005, 300),
            ("pretrain_PointM2AE_transformer_dropout_patch_p001.yaml",
             m2ae_base, 0.01, 300),
            ("pretrain_PointM2AE_transformer_dropout_patch_double.yaml",
             m2ae_base, 0.005, 600),
            ("pretrain_PointM2AE_transformer_dropout_patch_affine_r3.yaml",
             m2ae_aff, 0.005, 300),
            ("pretrain_PointM2AE_transformer_dropout_patch_affine_r3_p001.yaml",
             m2ae_aff, 0.01, 300),
            ("pretrain_PointM2AE_transformer_dropout_patch_affine_r3_double.yaml",
             m2ae_aff, 0.005, 600)):
        emit(fn, epochs=epochs, corrupt="'clean'", model=model,
             normal_weight=w, loss_type="xyznormal", npoints=2048)
        n += 1

    # --- supervised transformer pretrains (class-labeled ShapeNet;
    # --model_name PointCAE_transformer_supervised at run time)
    sup_model = _tmodel(["clean"], "\n  cls_dim: 55\n  smoothloss: 'True'")
    sup_aff = _tmodel(["affine_r3"],
                      "\n  cls_dim: 55\n  smoothloss: 'True'")
    for pose, base in POSES.items():
        cls_base = ("ShapeNet-55_withnormal_class" if not pose
                    else ("ShapeNet-55_random_pose_class"
                          if pose == "_random"
                          else "ShapeNet-55_svd_pose_class"))
        emit(f"pretrain_supervised{pose}.yaml", epochs=300,
             corrupt="'clean'", model=sup_model, base=cls_base,
             aug="'norm', 'translate', 'scale'", normal_weight=0.005,
             loss_type="xyznormal")
        emit(f"pretrain_supervised{pose}_affine_droplocal.yaml",
             epochs=300, corrupt="'affine_r3', 'dropout_local'",
             model=sup_aff, base=cls_base, normal_weight=0.005,
             loss_type="xyznormal")
        n += 2

    # --- MaskSurf_v2 ablations (dead configs upstream: the reference
    # never registers 'MaskSurf_v2'; here it aliases the headline v2
    # variant, so these run — weight knobs map onto normal_weight)
    v2 = (
        "  NAME: MaskSurf_v2\n  corrupt_type: ['clean']\n"
        "  all_patch: 'False'\n  group_size: 32\n  num_group: 64\n"
        "  loss: cdl2normal\n  position_weight: 1.0\n"
        "  transformer_config:\n    rand_ratio: 'False'\n"
        "    mask_ratio: 0.6\n    mask_type: 'rand'\n    trans_dim: 384\n"
        "    encoder_dims: 384\n    depth: 12\n    drop_path_rate: 0.1\n"
        "    num_heads: 6\n    decoder_depth: 4\n"
        "    decoder_num_heads: 6")
    v2_names = {
        "": (1.0, "xyznormal"), "_all_patch": (1.0, "xyznormal"),
        "_warm": (1.0, "xyznormal_warm"),
        "_w01": (0.1, "xyznormal"), "_w02": (0.2, "xyznormal"),
        "_w1": (1.0, "xyznormal"),
        "_gradual_w001": (0.01, "xyznormal_gradual"),
        "_gradual_w01": (0.1, "xyznormal_gradual"),
        "_gradual_w1": (1.0, "xyznormal_gradual"),
        "_gradual_w10": (10.0, "xyznormal_gradual"),
        "_gradual_w001_wvs1": (0.01, "xyznormal_gradual"),
        "_gradual_w001_wvs10": (0.01, "xyznormal_gradual"),
        "_gradual_w001_wvs100": (0.01, "xyznormal_gradual"),
        "_w0001_wvs100": (0.001, "xyznormal"),
        "_w0001_wvs1000": (0.001, "xyznormal"),
        "_w0005_wvs10": (0.005, "xyznormal"),
        "_w0005_wvs30": (0.005, "xyznormal"),
        "_w0005_wvs100": (0.005, "xyznormal"),
        "_w001_wvs10": (0.01, "xyznormal"),
        "_w001_wvs100": (0.01, "xyznormal"),
    }
    for suffix, (w, lt) in v2_names.items():
        model = v2.replace("all_patch: 'False'", "all_patch: 'True'") \
            if suffix == "_all_patch" else v2
        emit(f"pretrain_MaskSurf_v2{suffix}.yaml", epochs=300,
             corrupt="'clean'", model=model, normal_weight=w, loss_type=lt)
        n += 1
    # teacher-feature MaskSurf variants (token_dis / feature-target heads)
    for fn, name in (
            ("pretrain_MaskSurf_dvae_token.yaml", "MaskSurf_v2_token_dis"),
            ("pretrain_MaskSurf_pointmae_feature.yaml",
             "MaskSurf_v2_token_dis"),
            ("pretrain_MaskSurf_dgcnn_crosspoint.yaml",
             "MaskFeat_dgcnn"),
            ("pretrain_MaskSurf_dgcnn_supervised.yaml", "MaskFeat_dgcnn"),
            ("pretrain_MaskSurf_supervised_transformer_feature.yaml",
             "MaskFeat_transformer"),
            ("pretrain_MaskSurf_supervised_transformer_feature_scale_translate.yaml",
             "MaskFeat_transformer")):
        emit(fn, epochs=300, corrupt="'clean'",
             model=v2.replace("NAME: MaskSurf_v2", f"NAME: {name}"),
             normal_weight=0.005, loss_type="xyznormal")
        n += 1

    # --- MaskSurf on Objaverse (scale experiments)
    masksurf_model = (
        "  NAME: MaskSurf\n  corrupt_type: ['Drop-Patch']\n"
        "  all_patch: 'False'\n  group_size: 32\n"
        "  num_group: 64\n  loss: cdl2normal\n"
        "  transformer_config:\n    rand_ratio: 'False'\n"
        "    mask_ratio: 0.6\n    mask_type: 'rand'\n"
        "    trans_dim: 384\n    encoder_dims: 384\n"
        "    depth: 12\n    drop_path_rate: 0.1\n"
        "    num_heads: 6\n    decoder_depth: 4\n"
        "    decoder_num_heads: 6")
    for fn, npts, epochs in (
            ("pretrain_PointMAE_objaverse.yaml", 8192, 300),
            ("pretrain_PointMAE_objaverse_2048.yaml", 2048, 300),
            ("pretrain_PointMAE_objaverse_larger.yaml", 8192, 600)):
        emit(fn, epochs=epochs, corrupt="'clean'", base="Objaverse_8192",
             npoints=npts, model=masksurf_model, normal_weight=1.0,
             loss_type="xyznormal")
        n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="cfgs/generated")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    singles, pairs = corruption_axis()
    jobs = [(n, [n]) for n in singles] + \
           [("_".join(p), list(p)) for p in pairs]

    def emit(fn, whole=False, **kw):
        kw.setdefault("npoints", 1024)
        kw.setdefault("base", "ShapeNet-55_withnormal")
        kw.setdefault("aug", "'norm'")
        body = PRETRAIN_TMPL.format(**kw)
        if whole:   # train+test concatenation (ShapeNet55Dataset.py:48-52)
            body = body.replace("corrupt_type: [" + kw["corrupt"] + "]}}",
                                "corrupt_type: [" + kw["corrupt"]
                                + "], whole: True}}", 1)
        open(os.path.join(args.out, fn), "w").write(body)

    n = 0
    for name, corrupt in jobs:
        cstr = ", ".join(f"'{c}'" for c in corrupt)
        for dur, epochs in (("", 300), ("_2xlonger", 600),
                            ("_4xlonger", 1200), ("_10xlonger", 3000)):
            # duration axis only for the headline recipes
            if dur and name not in ("affine_r3", "affine_r3_dropout_local",
                                    "affine_r5_v2_dropout_local_c5d3",
                                    "affine_r3_v2_dropout_local_c5d3",
                                    "dropout_local", "scale_nonorm"):
                continue
            if dur and name in ("dropout_local", "scale_nonorm") \
                    and dur != "_4xlonger":
                continue
            for pose, base in POSES.items():
                if pose and dur not in ("", "_2xlonger", "_4xlonger",
                                        "_10xlonger"):
                    continue
                if pose and dur and name not in (
                        "affine_r3", "affine_r3_dropout_local"):
                    continue
                fn = f"pretrain_PointCAE_{name}{dur}{pose}.yaml"
                emit(fn, epochs=epochs, corrupt=cstr, model=DGCNN_MODEL,
                     base=base, normal_weight=1.0,
                     loss_type="xyznormal_gradual")
                n += 1
        # transformer flagship: masked-patch recipe. Corruption runs
        # IN-MODEL at patch level (dataset stays 'clean', like the
        # hand-written transformer recipes and the reference's
        # pretrain_PointCAE_transformer_* configs), so only emit for names
        # corrupt_patches actually dispatches — anything else would
        # NotImplementedError at the first train-step trace. The set is
        # imported from the dispatcher itself so new patch corruptions get
        # their maskpatch recipe automatically.
        from point_dae_tpu.data.corruptions_patch import PATCH_SUPPORTED
        if all(c in PATCH_SUPPORTED for c in corrupt):
            fn = f"pretrain_PointCAE_transformer_{name}_maskpatch.yaml"
            tcor = corrupt + ["Drop-Patch"] if "dropout" not in name \
                else corrupt
            tstr = ", ".join(f"'{c}'" for c in tcor)
            emit(fn, epochs=300, corrupt="'clean'",
                 model=TRANSFORMER_MODEL.replace("corrupt_type: []",
                                                 f"corrupt_type: [{tstr}]"),
                 normal_weight=0.005, loss_type="xyznormal")
            n += 1

    n += reference_name_closure(emit)

    # finetune matrix: dataset x head x probe mode
    ft = [
        ("modelnet", "ModelNet40", 40, 1024),
        ("modelnet_8k", "ModelNet40", 40, 8192),
        ("scan_hardest", "ScanObjectNN_hardest", 15, 2048),
        ("scan_objbg", "ScanObjectNN_objectbg", 15, 2048),
        ("scan_objonly", "ScanObjectNN_objectonly", 15, 2048),
    ]
    heads = [
        ("transferring_features", "PointTransformer", "all", 0.0005, "True"),
        ("linear_classification", "PointTransformer_LinearClassification",
         "only_new", 0.01, "False"),
        ("non_linear_classification", "PointTransformer", "only_new", 0.001,
         "False"),
        ("transferring_features_DGCNN", "DGCNN", "all", 0.0005, "True"),
    ]

    def ft_emit(fn, dset, cls, npts, model, part="all", lr=0.0005,
                smooth="True", extra=""):
        body = FINETUNE_TMPL.format(
            part=part, lr=lr, dset=dset, npoints=npts, aug="'clean'",
            model=model, cls_dim=cls,
            num_group=128 if npts >= 2048 else 64, smooth=smooth)
        if extra.startswith("  "):       # model-scoped keys (indented)
            # drop template model keys the extra overrides — duplicate
            # YAML keys only "work" via PyYAML's last-wins accident and
            # are rejected by strict loaders
            over = {ln.split(":", 1)[0].strip() for ln in extra.splitlines()
                    if ln.strip() and not ln.startswith("    ")}
            out_lines, in_model = [], False
            for ln in body.splitlines():
                if ln.startswith("model:"):
                    in_model = True
                elif ln and not ln.startswith(" "):
                    in_model = False
                if (in_model and ln.startswith("  ")
                        and not ln.startswith("    ")  # top-level keys only
                        and ln.split(":", 1)[0].strip() in over):
                    continue
                out_lines.append(ln)
            body = "\n".join(out_lines) + "\n"
            body = body.replace("\nnpoints:", "\n" + extra + "\nnpoints:", 1)
        elif extra:                      # config-level keys
            body += extra
        open(os.path.join(args.out, fn), "w").write(body)

    for dtag, dset, cls, npts in ft:
        for htag, model, part, lr, smooth in heads:
            # train-time scale/translate aug is applied by the finetune
            # runner itself (engine/finetune.py), not the dataset pipeline
            ft_emit(f"finetune_{dtag}_{htag}.yaml", dset, cls, npts, model,
                    part, lr, smooth)
            n += 1
        # 1k-point variants (+_smooth spelling the reference uses)
        ft_emit(f"finetune_{dtag}_transferring_features_1k.yaml", dset,
                cls, 1024, "PointTransformer", smooth="False")
        ft_emit(f"finetune_{dtag}_transferring_features_1k_smooth.yaml",
                dset, cls, 1024, "PointTransformer", smooth="True")
        n += 2

    # reference one-off variants (diff_lr probes, rotate augs, larger lr,
    # PointNetv2 backbone, M2AE heads, objbg rotation protocols)
    extras = [
        ("finetune_scan_objbg_transferring_features_diff_lr.yaml",
         "ScanObjectNN_objectbg", 15, 2048, "PointTransformer", "diff_lr",
         0.0005, "True", ""),
        ("finetune_scan_objbg_transferring_features_1k_diff_lr.yaml",
         "ScanObjectNN_objectbg", 15, 1024, "PointTransformer", "diff_lr",
         0.0005, "False", ""),
        ("finetune_scan_objbg_transferring_features_1k_smooth_diff_lr.yaml",
         "ScanObjectNN_objectbg", 15, 1024, "PointTransformer", "diff_lr",
         0.0005, "True", ""),
        ("finetune_scan_objbg_transferring_features_1k_smooth_rotate.yaml",
         "ScanObjectNN_objectbg", 15, 1024, "PointTransformer", "all",
         0.0005, "True", "train_aug: rotate\n"),
        ("finetune_scan_hardest_transferring_features_1k_smooth_rotate.yaml",
         "ScanObjectNN_hardest", 15, 1024, "PointTransformer", "all",
         0.0005, "True", "train_aug: rotate\n"),
        ("finetune_scan_hardest_transferring_features_DGCNN_norotate.yaml",
         "ScanObjectNN_hardest", 15, 2048, "DGCNN", "all", 0.0005, "True",
         "train_aug: none\n"),
        ("finetune_scan_hardest_transferring_features_larger.yaml",
         "ScanObjectNN_hardest", 15, 2048, "PointTransformer", "all",
         0.001, "True", ""),
        ("finetune_modelnet_transferring_features_1k_smooth_largelr.yaml",
         "ModelNet40", 40, 1024, "DGCNN", "all", 0.002, "True", ""),
        ("finetune_modelnet_transferring_features_PointNetv2.yaml",
         "ModelNet40", 40, 1024, "PointNetv2", "all", 0.0005, "True", ""),
        ("finetune_scan_objbg_transferring_features_PointNetv2.yaml",
         "ScanObjectNN_objectbg", 15, 1024, "PointNetv2", "all", 0.0005,
         "True", ""),
        ("finetune_modelnet_non_linear_classification_officialmodelnet.yaml",
         "ModelNet40Official", 40, 1024, "PointTransformer", "only_new",
         0.001, "False", ""),
        ("finetune_modelnet_svm_classification_official.yaml",
         "ModelNet40Official", 40, 1024, "DGCNN_feat", "only_new", 0.0005,
         "False", ""),
    ]
    # M2AE heads (tf = finetune head, svm = frozen feature probe)
    for dtag, dset, cls in (("modelnet", "ModelNet40", 40),
                            ("scan_hardest", "ScanObjectNN_hardest", 15),
                            ("scan_objbg", "ScanObjectNN_objectbg", 15)):
        extras.append((f"finetune_{dtag}_tf_pointm2ae.yaml", dset, cls,
                       2048, "Point_M2AE_Finetune", "all", 0.0005, "True",
                       M2AE_FT_EXTRA))
        extras.append((f"finetune_{dtag}_svm_pointm2ae.yaml", dset, cls,
                       2048, "Point_M2AE_SVMFeature", "only_new", 0.0005,
                       "False", M2AE_FT_EXTRA))
    # objbg rotation protocols (1k smooth)
    for mode in ("z2z", "z2so3", "so32so3"):
        t1, t2 = mode.split("2")
        extras.append((f"finetune_scan_objbg_rotation_{mode}_1k_smooth.yaml",
                       "ScanObjectNN_objectbg", 15, 1024, "PointTransformer",
                       "all", 0.0005, "True",
                       f"rotation: {{train: {t1}, test: {t2}}}\n"))
    # ShapeNet-55 class finetunes (task-affinity protocols)
    extras += [
        ("finetune_shapenet.yaml", "ShapeNet-55_withnormal_class", 55, 1024,
         "PointTransformer", "all", 0.0005, "True", ""),
        ("finetune_shapenet_fixfeat.yaml", "ShapeNet-55_withnormal_class",
         55, 1024, "PointTransformer", "only_new", 0.001, "False", ""),
        ("finetune_shapenet_fixfeat_linearfc.yaml",
         "ShapeNet-55_withnormal_class", 55, 1024,
         "PointTransformerLinearClassification", "only_new", 0.01, "False",
         ""),
        ("finetune_shapenet_task_affinity_svm_classification.yaml",
         "ShapeNet-55_task_affinity", 55, 1024, "DGCNN_feat", "only_new",
         0.0005, "False", ""),
        # scratch baseline (the reference's scratch.yaml names an
        # unregistered Point_MAE_Normal; runs select the model with
        # --model_name / --scratch_model, so a registered default is used)
        ("scratch.yaml", "ModelNet40", 40, 1024, "PointTransformer", "all",
         0.0005, "True", ""),
    ]
    for fn, dset, cls, npts, model, part, lr, smooth, extra in extras:
        ft_emit(fn, dset, cls, npts, model, part, lr, smooth, extra)
        n += 1

    # few-shot matrix (ModelNet + ScanObjectNN objbg/hardest pkl variants)
    fs = [
        ("fewshot_modelnet_transferring_features.yaml",
         "ModelNet40FewShot", "False"),
        ("fewshot_modelnet_transferring_features_smooth.yaml",
         "ModelNet40FewShot", "True"),
        ("fewshot_scanobjectnn_transferring_features.yaml",
         "ScanObjectNN_hardest_FewShot", "False"),
        ("fewshot_scanobjectnn_transferring_features_smooth.yaml",
         "ScanObjectNN_hardest_FewShot", "True"),
        ("fewshot_scanobjectnn_objbg_transferring_features.yaml",
         "ScanObjectNN_objbg_FewShot", "False"),
        ("fewshot_scanobjectnn_objbg_transferring_features_smooth.yaml",
         "ScanObjectNN_objbg_FewShot", "True"),
        ("fewshot_scanobjectnn_objbg_transferring_features_v2.yaml",
         "ScanObjectNN_objbg_FewShot_v2", "False"),
        ("fewshot_scanobjectnn_objbg_transferring_features_smooth_v2.yaml",
         "ScanObjectNN_objbg_FewShot_v2", "True"),
    ]
    for fn, dset, smooth in fs:
        ft_emit(fn, dset, 10, 1024, "PointTransformer", smooth=smooth)
        n += 1

    print(f"wrote {n} configs to {args.out}")


if __name__ == "__main__":
    main()
