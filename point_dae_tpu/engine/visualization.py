"""Reconstruction visualization runner (reference: tools/runner.py:14-113 and
Corruption_visualization.py): renders (corrupted / coarse / reconstructed /
ground-truth) clouds per sample to PNG via the native ball rasterizer and
dumps raw arrays as npz for offline tooling.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.native_io import render_balls
from ..utils.logger import print_log


def _save_png(path: str, img: np.ndarray) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, np.clip(img, 0, 1))
    except Exception:
        np.save(path + ".npy", img)


def _rotate_for_view(pts: np.ndarray) -> np.ndarray:
    """Fixed isometric-ish view."""
    a, b = np.radians(30), np.radians(-45)
    rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
    return pts @ (ry @ rx)


def render_cloud(pts: np.ndarray, color=(0.4, 0.7, 1.0), size: int = 480
                 ) -> np.ndarray:
    pts = np.asarray(pts, np.float32)
    pts = pts - pts.mean(0)
    pts = pts / max(np.linalg.norm(pts, axis=1).max(), 1e-6)
    pts = _rotate_for_view(pts)
    colors = np.tile(np.asarray(color, np.float32)[None], (pts.shape[0], 1))
    return render_balls(pts, colors, h=size, w=size, radius=4.0)


def test_vis_reconstruction(config, args, logger_name="PointDAE",
                            max_samples: int = 16):
    """Run the flagship model's ``reconstruct`` path over the test set and
    save per-sample renders + arrays to <experiment>/vis (tools/runner.py
    renders per ShapeNet taxonomy; we key files by taxonomy/model ids)."""
    from ..data.datasets import build_dataset_from_cfg
    from ..data.loader import DataLoader
    from ..models import build_model_from_cfg
    from ..utils.checkpoint import (flatten_keys, load_params,
                                    merge_pretrained)

    import itertools

    dcfg = config["dataset"]
    split = dcfg.get("test", dcfg.get("val", dcfg["train"]))
    dataset = build_dataset_from_cfg(split["_base_"], split["others"])
    model = build_model_from_cfg(config["model"])
    npoints = int(config.get("npoints", 1024))
    rngs = {"params": jax.random.key(0), "corrupt": jax.random.key(1),
            "mask": jax.random.key(2), "droppath": jax.random.key(3)}
    out_dir = os.path.join(args.experiment_path, "vis")
    os.makedirs(out_dir, exist_ok=True)
    loader = DataLoader(dataset, 4, shuffle=False, drop_last=True)
    it = iter(loader)
    try:
        first = next(it)
    except StopIteration:
        # split smaller than the batch size: nothing to render (the old
        # plain for-loop degraded the same way instead of crashing)
        print_log(f"[Vis] split has no full batch - saved 0 samples to "
                  f"{out_dir}", logger=logger_name)
        return out_dir
    # init through the reconstruct method itself with the dataset's real
    # channel count: surfel/curve models consume normals past channel 3,
    # and token_dis's dVAE-decoder params exist only on this path
    dummy = jnp.zeros((2, npoints, first["points"].shape[-1]))
    variables = dict(jax.jit(functools.partial(
        model.init, train=False, method="reconstruct"))(rngs, dummy))
    if getattr(args, "ckpts", None):
        pre = load_params(args.ckpts, args.ckpts)
        variables["params"] = merge_pretrained(
            variables["params"], flatten_keys(pre["params"]),
            logger=logger_name)
        # BN running stats too: reconstruct runs train=False and would
        # otherwise normalize with init stats (mean 0 / var 1)
        if pre.get("batch_stats"):
            variables["batch_stats"] = merge_pretrained(
                variables.get("batch_stats", {}),
                flatten_keys(pre["batch_stats"]), logger=logger_name)

    recon = jax.jit(functools.partial(
        model.apply, train=False, method="reconstruct"),
        static_argnames=())
    done = 0
    for batch in itertools.chain([first], it):
        pts_all = jnp.asarray(batch["points"][:, :npoints], jnp.float32)
        pts = pts_all[..., :3]
        out = recon(variables, pts_all, rngs={"corrupt": jax.random.key(9),
                                              "mask": jax.random.key(10)})
        if isinstance(out, (tuple, list)):
            coarse, rebuild = out[0], out[1]
        else:
            # single-output reconstruct (e.g. Point_CAE_DGCNN_FCOnly's FC
            # cloud): indexing the ARRAY would silently render batch
            # samples 0/1 as coarse/rebuild
            coarse = rebuild = out
        coarse = np.asarray(coarse)
        rebuild = np.asarray(rebuild).reshape(pts.shape[0], -1, 3)
        for b in range(pts.shape[0]):
            tid = batch.get("taxonomy_id", ["x"] * 8)[b]
            mid = batch.get("model_id", [str(done)] * 8)[b]
            stem = os.path.join(out_dir, f"{tid}_{mid}")
            _save_png(stem + "_gt.png", render_cloud(np.asarray(pts[b])))
            _save_png(stem + "_coarse.png",
                      render_cloud(coarse[b], color=(1.0, 0.6, 0.3)))
            _save_png(stem + "_rebuild.png",
                      render_cloud(rebuild[b], color=(0.5, 1.0, 0.5)))
            np.savez(stem + ".npz", gt=np.asarray(pts[b]), coarse=coarse[b],
                     rebuild=rebuild[b])
            done += 1
            if done >= max_samples:
                print_log(f"[Vis] saved {done} samples to {out_dir}",
                          logger=logger_name)
                return out_dir
    print_log(f"[Vis] saved {done} samples to {out_dir}", logger=logger_name)
    return out_dir


def visualize_corruptions(out_dir: str, types=("affine_r3", "dropout_local",
                                               "add_global", "add_local",
                                               "jitter", "nonuniform_density"),
                          npoints: int = 1024, seed: int = 0):
    """Corruption_visualization.py equivalent: render each corruption applied
    to a sample cloud, using the keyed library."""
    from ..data import corruptions as C
    from ..data.datasets import Synthetic

    os.makedirs(out_dir, exist_ok=True)
    ds = Synthetic({"size": 1, "N_POINTS": 2048, "with_normal": False})
    pts = jnp.asarray(ds[0]["points"][:, :3])
    _save_png(os.path.join(out_dir, "clean.png"), render_cloud(np.asarray(pts)))
    for i, t in enumerate(types):
        out = C.corrupt_and_sample(jax.random.key(seed + i), pts, (t,), npoints)
        _save_png(os.path.join(out_dir, f"{t}.png"),
                  render_cloud(np.asarray(out), color=(1.0, 0.5, 0.4)))
    return out_dir
