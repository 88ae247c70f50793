"""Input-gradient saliency maps (reference: tools/runner_finetune.py:751-833,
``--vis_saliency``): d logits[label] / d points, saved as (points, grads)
arrays per sample for offline rendering.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logger import print_log


def make_saliency_fn(model, variables):
    """Jitted per-batch saliency: gradient of the true-class logit w.r.t. the
    input points (runner_finetune.py:789-812)."""

    def logit(pts, label):
        logits = model.apply(variables, pts[None], train=False)[0]
        return logits[label]

    grad_fn = jax.grad(logit)

    @jax.jit
    def saliency(pts_batch, labels):
        return jax.vmap(grad_fn)(pts_batch, labels)

    return saliency


def vis_saliency_map(config, args, logger_name="PointDAE",
                     max_batches: int = 8):
    """--vis_saliency mode: dump (points, grads, label) npz files."""
    from ..data.datasets import build_dataset_from_cfg
    from ..data.loader import DataLoader
    from ..models import build_model_from_cfg
    from ..utils.checkpoint import (flatten_keys, load_params,
                                    merge_pretrained)

    dcfg = config["dataset"]
    test_set = build_dataset_from_cfg(dcfg["test"]["_base_"],
                                      dcfg["test"]["others"])
    model = build_model_from_cfg(config["model"])
    npoints = int(config.get("npoints", 1024))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = dict(jax.jit(functools.partial(model.init, train=True))(
        rngs, jnp.zeros((2, npoints, 3))))
    if getattr(args, "ckpts", None):
        pre = load_params(args.ckpts, args.ckpts)
        variables["params"] = merge_pretrained(
            variables["params"], flatten_keys(pre["params"]),
            logger=logger_name)
        # BN running stats too: the eval forward (train=False) normalizes
        # with them — init stats (mean 0 / var 1) would corrupt the logits
        # the saliency gradient differentiates
        if pre.get("batch_stats"):
            variables["batch_stats"] = merge_pretrained(
                variables.get("batch_stats", {}),
                flatten_keys(pre["batch_stats"]), logger=logger_name)
    saliency = make_saliency_fn(model, variables)
    out_dir = os.path.join(args.experiment_path, "saliency")
    os.makedirs(out_dir, exist_ok=True)
    loader = DataLoader(test_set, 8, shuffle=False, drop_last=True)
    for i, batch in enumerate(loader):
        if i >= max_batches:
            break
        pts = jnp.asarray(batch["points"][:, :npoints, :3], jnp.float32)
        labels = jnp.asarray(batch["label"])
        grads = jax.device_get(saliency(pts, labels))
        np.savez(os.path.join(out_dir, f"saliency_{i:03d}.npz"),
                 points=np.asarray(pts), grads=grads,
                 labels=np.asarray(labels))
    print_log(f"[Saliency] saved to {out_dir}", logger=logger_name)
    return out_dir
