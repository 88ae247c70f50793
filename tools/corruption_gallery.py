#!/usr/bin/env python
"""Corruption gallery generator (role of Corruption_visualization.py:95-359):
take one cloud, SVD-canonicalize its pose for a good viewing angle
(global_transform, Corruption_visualization.py:58-78), apply every
corruption family at a chosen level with the keyed corruption library,
resample to 1024 points, and write one PLY per corruption (the reference's
pyntcloud output format, written directly — ascii PLY needs no
dependency) plus an optional PNG contact sheet via the native
ball renderer.

Usage:
  python tools/corruption_gallery.py --cloud path/to.npy --out vis/
  python tools/corruption_gallery.py --out vis/          # synthetic cloud
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference applies these at fixed levels (Corruption_visualization.py:
# 124-359): each corruption once, plus the composed 'affinity' example
GALLERY = ("nocorruption", "scale_nonorm", "translate", "jitter", "rotate",
           "reflection", "shear", "rotate_z", "dropout_global",
           "dropout_local", "add_global", "add_local", "dropout_patch",
           "affine_r3")


def write_ply(path: str, pts: np.ndarray) -> None:
    """Minimal ascii PLY (the pyntcloud .to_file output the reference
    produces, Corruption_visualization.py:119-122)."""
    from point_dae_tpu.utils.pcviews import write_ply as _write_ply

    _write_ply(path, pts)


def synthetic_cloud(n: int = 8192, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    r = np.array([1.0, 0.55, 0.3])
    return (u * r * (0.7 + 0.3 * rng.random((n, 1)))).astype(np.float32)


def corrupt_one(name: str, pts: np.ndarray, seed: int,
                npoints: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from point_dae_tpu.data.corruptions import corrupt_and_sample
    from point_dae_tpu.models.common import (dropout_global,
                                             dropout_patch_pointmae)
    from point_dae_tpu.ops import resample_to

    key = jax.random.key(seed)
    x = jnp.asarray(pts)
    # the in-forward corruptions (GPU-side in the reference,
    # corrupt_util.py:572-588, 900-924) are applied directly for display
    if name == "dropout_patch":
        out = dropout_patch_pointmae(key, x[None])[0]
        return np.asarray(resample_to(jax.random.fold_in(key, 1), out,
                                      jnp.ones(out.shape[0], bool), npoints))
    if name == "dropout_global":
        out = dropout_global(key, x[None])[0]
        return np.asarray(resample_to(jax.random.fold_in(key, 1), out,
                                      jnp.ones(out.shape[0], bool), npoints))
    types = [] if name == "nocorruption" else [name]
    return np.asarray(corrupt_and_sample(key, x, types, npoints))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cloud", default=None,
                   help=".npy cloud (N, 3+); synthetic shape if omitted")
    p.add_argument("--out", default="vis_corruptions")
    p.add_argument("--npoints", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--png", action="store_true",
                   help="also write a rendered contact sheet")
    args = p.parse_args()

    from point_dae_tpu.data.corruptions import pc_normalize
    from tools.svd_pose_generate import global_transform

    if args.cloud:
        pts = np.load(args.cloud)[:, :3].astype(np.float32)
        stem = os.path.splitext(os.path.basename(args.cloud))[0]
    else:
        pts = synthetic_cloud()
        stem = "synthetic"
    import jax.numpy as jnp

    pts = np.asarray(pc_normalize(jnp.asarray(pts)))
    pts = global_transform(pts)          # good viewing pose (SVD canonical)

    os.makedirs(args.out, exist_ok=True)
    rendered = []
    for name in GALLERY:
        out_pts = corrupt_one(name, pts, args.seed, args.npoints)
        ply = os.path.join(args.out, f"{name}-{stem}.ply")
        write_ply(ply, out_pts)
        print(f"wrote {ply} ({len(out_pts)} pts)")
        rendered.append((name, out_pts))

    if args.png:
        from point_dae_tpu.data.native_io import render_balls

        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        cols = 5
        rows = (len(rendered) + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
        for ax in np.ravel(axes):
            ax.axis("off")
        for ax, (name, out_pts) in zip(np.ravel(axes), rendered):
            ax.imshow(render_balls(out_pts, h=256, w=256, radius=3.0))
            ax.set_title(name, fontsize=9)
        sheet = os.path.join(args.out, f"gallery-{stem}.png")
        fig.tight_layout()
        fig.savefig(sheet, dpi=140)
        print(f"wrote {sheet}")


if __name__ == "__main__":
    main()
