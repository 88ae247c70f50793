#!/usr/bin/env python
"""Part-segmentation visualization: colored-OBJ dumps of predictions vs GT.

TPU-native equivalent of the reference's standalone partseg visualizer
(segmentation/main_visual.py:1-308): load one or more finetuned part-seg
checkpoints, predict on a fixed list of test instances, and write each
shape as a MeshLab-readable ``v x y z r g b`` OBJ — one file per
(shape, checkpoint) plus one ground-truth file — so different pretrain
recipes (e.g. Point-MAE vs MaskSurf) can be compared side by side.

Differences from the reference, on purpose:
- any number of checkpoints via repeated ``--ckpts tag=path`` (the
  reference hardcodes exactly two model paths at main_visual.py:150-168);
- vertex colors are written as floats in [0, 1] (the reference formats
  its float palette with ``%d`` at main_visual.py:282-292, truncating
  every channel to 0/1 — the palette below survives that truncation, so
  the rendered hues match);
- prediction runs as one jitted batch over all selected shapes instead
  of a batch-size-1 loop.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reference part-color palette (segmentation/main_visual.py:41-50); rows
# 4-9 repeat the same pink in the reference too — kept verbatim so dumps
# are visually comparable
CMAP = np.array([
    [1.0, 0.0, 0.0],
    [0.03125, 1.0, 0.0],
    [0.0, 0.0625, 1.0],
    [1.0, 0.0, 0.09375],
    [1.0, 0.0, 0.09375],
    [1.0, 0.0, 0.09375],
    [1.0, 0.0, 0.09375],
    [1.0, 0.0, 0.09375],
    [1.0, 0.0, 0.09375],
    [1.0, 0.0, 0.09375],
])

# reference default instance selection (segmentation/main_visual.py:245)
DEFAULT_INDICES = [100, 300, 500, 800, 1000, 1300, 1500, 1800, 2000, 2500, 2800]


def write_colored_obj(path: str, pts: np.ndarray, colors: np.ndarray) -> None:
    """``v x y z r g b`` per point (main_visual.py:282-292 format)."""
    with open(path, "w") as f:
        for p, c in zip(pts, colors):
            f.write(f"v {p[0]:f} {p[1]:f} {p[2]:f} "
                    f"{c[0]:.4f} {c[1]:.4f} {c[2]:.4f}\n")


def visualize_partseg(config, ckpts, out_dir, indices=None,
                      logger_name="PointDAE"):
    """Dump colored part predictions for ``indices`` of the test split.

    ckpts: {tag: checkpoint_path}. Writes ``{cat}{idx}{tag}.obj`` per
    checkpoint and ``{cat}{idx}gt.obj`` once per shape, mirroring the
    reference's naming (main_visual.py:279-281).
    """
    import jax
    import jax.numpy as jnp

    from point_dae_tpu.data.datasets import build_dataset_from_cfg
    from point_dae_tpu.engine.partseg import SEG_CLASSES
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.utils.checkpoint import load_params
    from point_dae_tpu.utils.logger import print_log

    os.makedirs(out_dir, exist_ok=True)
    dcfg = config["dataset"]["test"]
    test_set = build_dataset_from_cfg(dcfg["_base_"], dcfg["others"])
    cat_names = sorted(SEG_CLASSES)
    model = build_model_from_cfg(config["model"])

    indices = [i for i in (indices or DEFAULT_INDICES) if i < len(test_set)]
    if not indices:
        print_log(f"[partseg-vis] no selected index < len(test)="
                  f"{len(test_set)}", logger=logger_name)
        return []
    samples = [test_set[i] for i in indices]
    pts = np.stack([np.asarray(s["points"][..., :3], np.float32)
                    for s in samples])
    labels = np.asarray([int(s["label"]) for s in samples])
    segs = np.stack([np.asarray(s["seg"], np.int32) for s in samples])
    onehot = np.eye(16, dtype=np.float32)[labels]

    @jax.jit
    def eval_step(variables, pts, onehot):
        return model.apply(variables, pts, onehot, train=False)

    written = []
    names = [cat_names[l] for l in labels]
    for tag, path in ckpts.items():
        restored = load_params(path, path)
        variables = {"params": restored["params"],
                     "batch_stats": restored.get("batch_stats", {})}
        logp = np.asarray(eval_step(variables, jnp.asarray(pts),
                                    jnp.asarray(onehot)))
        for b, (idx, name) in enumerate(zip(indices, names)):
            parts = SEG_CLASSES[name]
            # within-category argmax indexes the palette from 0
            # (main_visual.py:269-272)
            in_cat = np.argmax(logp[b][:, parts], axis=-1)
            out = os.path.join(out_dir, f"{name}{idx}{tag}.obj")
            write_colored_obj(out, pts[b], CMAP[in_cat])
            written.append(out)
        print_log(f"[partseg-vis] {tag}: {len(indices)} shapes -> {out_dir}",
                  logger=logger_name)
    for b, (idx, name) in enumerate(zip(indices, names)):
        first = SEG_CLASSES[name][0]
        gt_in_cat = np.clip(segs[b] - first, 0, len(CMAP) - 1)
        out = os.path.join(out_dir, f"{name}{idx}gt.obj")
        write_colored_obj(out, pts[b], CMAP[gt_in_cat])
        written.append(out)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Colored-OBJ part segmentation dumps "
                    "(segmentation/main_visual.py role)")
    p.add_argument("--config", required=True,
                   help="part-seg finetune config (ShapeNetPart dataset)")
    p.add_argument("--ckpts", nargs="+", required=True,
                   help="tag=checkpoint_path pairs (e.g. mae=exp/best_model)")
    p.add_argument("--out", default="vis/partseg")
    p.add_argument("--indices", type=int, nargs="*", default=None,
                   help="test-set indices (default: reference's selection)")
    args = p.parse_args(argv)

    from point_dae_tpu.utils.config import cfg_from_yaml_file
    config = cfg_from_yaml_file(args.config)
    ckpts = {}
    for spec in args.ckpts:
        tag, _, path = spec.partition("=")
        if not path:
            tag, path = os.path.basename(spec.rstrip("/")), spec
        ckpts[tag] = path
    files = visualize_partseg(config, ckpts, args.out, args.indices)
    print(f"wrote {len(files)} obj files under {args.out}")


if __name__ == "__main__":
    main()
