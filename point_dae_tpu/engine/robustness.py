"""Corruption-robustness evaluation harness
(reference: tools/runner_finetune.py:637-683 + the external ``modelnetc_utils``
``eval_corrupt_wrapper``: per-corruption/per-level OA, mCE / RmCE / mOA).

The reference loads pre-generated ModelNet-C h5 files; this harness can do
that when the data is mounted, and can alternatively *generate* the
corruptions on device with our keyed corruption library (same families:
scale, jitter, rotate, dropout_global, dropout_local, add_global, add_local),
which removes the offline data dependency.

mCE/RmCE follow the ModelNet-C protocol: error rates normalised by the DGCNN
reference error rates per corruption/level (run.sh:70-114 embeds a sample
eval log with the same metric names).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data import corruptions as C
from ..utils.logger import print_log

CORRUPTIONS = ("scale", "jitter", "rotate", "dropout_global",
               "dropout_local", "add_global", "add_local")

# DGCNN reference error rates on ModelNet-C (from the ModelNet-C paper /
# embedded eval log run.sh:70-114): clean ER and per-corruption mean ER.
DGCNN_REF_ER = {
    "clean": 0.074,
    "scale": 0.120, "jitter": 0.333, "rotate": 0.146,
    "dropout_global": 0.166, "dropout_local": 0.191,
    "add_global": 0.351, "add_local": 0.184,
}


def _corrupt_level(key, pts, name, level: int):
    """Single-cloud corruption at a fixed severity level, fixed output size."""
    n = pts.shape[0]
    if name == "scale":
        table = jnp.array([1.6, 1.7, 1.8, 1.9, 2.0])
        s = table[level]
        factor = jax.random.uniform(key, (3,), minval=1.0 / s, maxval=s)
        return C.pc_normalize(pts * factor)
    if name == "jitter":
        return C.corrupt_jitter(key, pts, jnp.float32(level))
    if name == "rotate":
        a, _ = C.affine_rotate_level(key, float(level))
        return jnp.matmul(pts, a, precision=jax.lax.Precision.HIGHEST)
    if name == "dropout_global":
        k1, k2 = jax.random.split(key)
        rate = [0.25, 0.375, 0.5, 0.625, 0.75][level]
        mask = C.dropout_global(k1, jnp.ones(n, bool), rate)
        from ..ops import resample_to

        return resample_to(k2, pts, mask, n)
    if name == "dropout_local":
        k1, k2 = jax.random.split(key)
        mask = C.dropout_local(k1, pts, jnp.ones(n, bool),
                               drop_ratio=0.1 * (level + 1))
        from ..ops import resample_to

        return resample_to(k2, pts, mask, n)
    if name == "add_global":
        k1, k2 = jax.random.split(key)
        out, mask = C.add_global(k1, pts, jnp.ones(n, bool),
                                 jnp.float32(level), n + n // 2)
        from ..ops import resample_to

        return resample_to(k2, out, mask, n)
    if name == "add_local":
        k1, k2 = jax.random.split(key)
        out, mask = C.add_local(k1, pts, jnp.ones(n, bool),
                                jnp.float32(level), n + n // 2)
        from ..ops import resample_to

        return resample_to(k2, out, mask, n)
    raise NotImplementedError(name)


def corrupt_batch_level(key, pts, name: str, level: int):
    keys = jax.random.split(key, pts.shape[0])
    return jax.vmap(lambda k, p: _corrupt_level(k, p, name, level))(keys, pts)


def eval_corrupt_wrapper(eval_fn: Callable[[np.ndarray], np.ndarray],
                         dataset, batch_size: int,
                         corruptions: Sequence[str] = CORRUPTIONS,
                         levels: int = 5, seed: int = 0,
                         logger=None) -> Dict[str, float]:
    """Evaluate a classifier under every corruption x severity.

    ``eval_fn(points (B, N, 3)) -> logits``. Returns OA per cell + clean OA +
    mOA / mCE / RmCE vs the DGCNN reference table.
    """
    from ..data.loader import DataLoader

    def accuracy(corrupt: Optional[tuple]):
        loader = DataLoader(dataset, batch_size, shuffle=False, drop_last=False)
        correct = total = 0
        key = jax.random.key(seed)
        for batch in loader:
            pts = np.asarray(batch["points"][..., :3], np.float32)
            labels = np.asarray(batch["label"])
            n = pts.shape[0]
            if n < batch_size:
                pts = np.concatenate([pts, np.zeros(
                    (batch_size - n,) + pts.shape[1:], np.float32)])
            x = jnp.asarray(pts)
            if corrupt is not None:
                key, sub = jax.random.split(key)
                x = corrupt_batch_level(sub, x, corrupt[0], corrupt[1])
            logits = np.asarray(eval_fn(x))[:n]
            correct += int((np.argmax(logits, -1) == labels).sum())
            total += n
        return correct / max(total, 1)

    results: Dict[str, float] = {}
    oa_clean = accuracy(None)
    results["clean_OA"] = oa_clean
    print_log(f"[Corruption] clean OA = {oa_clean:.4f}", logger=logger)

    ce_list, rce_list, oa_list = [], [], []
    for name in corruptions:
        oas = []
        for lv in range(levels):
            oa = accuracy((name, lv))
            results[f"{name}_{lv}_OA"] = oa
            oas.append(oa)
            print_log(f"[Corruption] {name} level {lv}: OA = {oa:.4f}",
                      logger=logger)
        mean_oa = float(np.mean(oas))
        oa_list.append(mean_oa)
        er = 1.0 - mean_oa
        ref = DGCNN_REF_ER.get(name, 0.2)
        ce = er / ref
        rce = (er - (1.0 - oa_clean)) / max(ref - DGCNN_REF_ER["clean"], 1e-6)
        ce_list.append(ce)
        rce_list.append(rce)
        results[f"{name}_OA"] = mean_oa
        results[f"{name}_CE"] = ce
    results["mOA"] = float(np.mean(oa_list))
    results["mCE"] = float(np.mean(ce_list))
    results["RmCE"] = float(np.mean(rce_list))
    print_log(f"[Corruption] mOA = {results['mOA']:.4f} "
              f"mCE = {results['mCE']:.4f} RmCE = {results['RmCE']:.4f}",
              logger=logger)
    return results


def test_net_corruption(config, args, logger_name="PointDAE"):
    """--test_corruption mode (runner_finetune.py:660-683)."""
    import functools

    from ..data.datasets import build_dataset_from_cfg
    from ..models import build_model_from_cfg
    from ..parallel import get_mesh, replicate, shard_batch
    from ..utils.checkpoint import (flatten_keys, load_params,
                                    merge_pretrained)
    from .finetune import make_eval_step
    from .train_state import TrainState
    import optax

    mesh = get_mesh()
    dcfg = config["dataset"]
    test_set = build_dataset_from_cfg(dcfg["test"]["_base_"],
                                      dcfg["test"]["others"])
    total_bs = int(config.get("total_bs", 32))
    model = build_model_from_cfg(config["model"])
    npoints = int(config.get("npoints", 1024))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = jax.jit(functools.partial(model.init, train=True))(
        rngs, jnp.zeros((2, npoints, 3)))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if getattr(args, "ckpts", None):
        pre = load_params(args.ckpts, args.ckpts)
        params = merge_pretrained(params, flatten_keys(pre["params"]),
                                  logger=logger_name)
        if pre.get("batch_stats"):
            batch_stats = merge_pretrained(batch_stats,
                                           flatten_keys(pre["batch_stats"]),
                                           logger=logger_name)
    state = replicate(mesh, TrainState.create(model.apply, params,
                                              batch_stats, optax.identity()))
    eval_step = make_eval_step(model, config, mesh)

    def eval_fn(pts):
        return jax.device_get(eval_step(state, shard_batch(mesh, pts)))

    return eval_corrupt_wrapper(eval_fn, test_set, total_bs,
                                logger=logger_name)
