"""Corruption-robustness evaluation harness
(reference: tools/runner_finetune.py:637-683 + the external ``modelnetc_utils``
``eval_corrupt_wrapper``: per-corruption/per-level OA, mCE / RmCE / mOA).

Two data paths, benchmark-faithful first:

1. **Pre-generated ModelNet-C h5 files** (the published-benchmark path): a
   directory holding ``clean.h5`` and ``{corruption}_{level}.h5`` for the 7
   corruption families x 5 levels, each with ``data``/``label`` datasets —
   the exact files ``modelnetc_utils.ModelNetC`` reads. Numbers computed on
   these files are directly comparable to the reference's published table
   (run.sh:70-114).
2. **On-device generation** (explicit no-data fallback, TPU-native
   addition): corruptions generated with our keyed corruption library; NOT
   number-comparable to the benchmark (the severity calibration differs)
   and logged as such.

mCE/RmCE follow the ModelNet-C protocol: ``CE_c = sum_l ER_{c,l} / sum_l
ER^DGCNN_{c,l}`` and ``RmCE_c = sum_l (ER_{c,l} - ER_clean) / sum_l
(ER^DGCNN_{c,l} - ER^DGCNN_clean)`` — equal, term re-arranged, to the
mean-ER ratios used below, so storing the DGCNN table as per-corruption
mean ER is exact, not an approximation.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data import corruptions as C
from ..utils.logger import print_log

CORRUPTIONS = ("scale", "jitter", "rotate", "dropout_global",
               "dropout_local", "add_global", "add_local")

# Official DGCNN baseline mean error rates on ModelNet-C (the mCE=1.0
# anchor of the benchmark). Derived exactly from the reference's embedded
# eval log (run.sh:70-114): each CE there is meanER/refER, so
# refER = meanER/CE; cross-checked against the RCE lines (clean ER 0.074
# = OA 0.926, the published DGCNN clean score).
DGCNN_REF_ER = {
    "clean": 0.074,
    "scale": 0.094, "jitter": 0.316, "rotate": 0.215,
    "dropout_global": 0.248, "dropout_local": 0.207,
    "add_global": 0.295, "add_local": 0.275,
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


def load_modelnet_c_split(data_root: str, split: str):
    """Read one ModelNet-C h5 file (``modelnetc_utils.ModelNetC`` layout:
    ``{data_root}/{split}.h5`` with ``data`` (N, P, 3) float32 — P varies
    per corruption family/level — and ``label`` (N,) or (N, 1))."""
    import h5py

    with h5py.File(os.path.join(data_root, f"{split}.h5"), "r") as f:
        data = np.asarray(f["data"][:], np.float32)
        label = np.asarray(f["label"][:]).reshape(-1).astype(np.int64)
    return data, label


def has_modelnet_c(data_root: Optional[str]) -> bool:
    return bool(data_root) and os.path.isfile(
        os.path.join(data_root, "clean.h5"))


def missing_modelnet_c_files(data_root: str,
                             corruptions: Sequence[str] = CORRUPTIONS,
                             levels: int = 5) -> list:
    """Names of requested cells whose h5 file is absent. Checked up front
    so a partially-populated data_root fails fast instead of crashing
    after the expensive early cells."""
    splits = ["clean"] + [f"{c}_{lv}" for c in corruptions
                          for lv in range(levels)]
    return [s for s in splits
            if not os.path.isfile(os.path.join(data_root, f"{s}.h5"))]


def _batched_accuracy(eval_fn, pts, labels: np.ndarray,
                      batch_size: int) -> float:
    """Chunked padded eval shared by the h5 and on-device paths. ``pts``
    may be numpy (h5 path: eval_fn's shard_batch uploads each chunk once)
    or a device array (fallback path: the corrupted split stays on device
    and shard_batch is a device-side reshard, no host round trip)."""
    xp = jnp if isinstance(pts, jax.Array) else np
    correct = 0
    for s in range(0, len(pts), batch_size):
        chunk = pts[s:s + batch_size]
        n = chunk.shape[0]
        if n < batch_size:
            chunk = xp.pad(chunk, ((0, batch_size - n),)
                           + ((0, 0),) * (chunk.ndim - 1))
        logits = np.asarray(eval_fn(chunk))[:n]
        correct += int((np.argmax(logits, -1) == labels[s:s + n]).sum())
    return correct / max(len(pts), 1)


def eval_corrupt_wrapper(eval_fn: Callable[[np.ndarray], np.ndarray],
                         dataset, batch_size: int,
                         corruptions: Sequence[str] = CORRUPTIONS,
                         levels: int = 5, seed: int = 0,
                         data_root: Optional[str] = None,
                         logger=None) -> Dict[str, float]:
    """Evaluate a classifier under every corruption x severity.

    ``eval_fn(points (B, N, 3)) -> logits``. When ``data_root`` holds the
    pre-generated ModelNet-C h5 files, cells are evaluated on those exact
    files (number-comparable to the published benchmark, and ``dataset``
    may be None); otherwise corruptions are generated on device from
    ``dataset`` (explicit fallback, NOT benchmark-comparable). Returns OA
    per cell + clean OA + mOA / mCE / RmCE vs the official DGCNN table.
    Log lines mirror ``modelnetc_utils.eval_corrupt_wrapper``'s dict format
    (the embedded sample at run.sh:70-114).
    """
    use_files = has_modelnet_c(data_root)
    if use_files:
        missing = missing_modelnet_c_files(data_root, corruptions, levels)
        if missing:
            # fail fast: crashing after the expensive early cells would
            # lose every result; a silent fallback would report numbers
            # that look benchmark-comparable but are not
            raise FileNotFoundError(
                f"ModelNet-C root {data_root} is incomplete - missing "
                f"{len(missing)} file(s): "
                + ", ".join(f"{s}.h5" for s in missing))
        print_log(f"[Corruption] evaluating pre-generated ModelNet-C files "
                  f"at {data_root}", logger=logger)
    else:
        print_log("[Corruption] no ModelNet-C files found - generating "
                  "corruptions on device (NOT comparable to the published "
                  "benchmark numbers)", logger=logger)
        from ..data.loader import DataLoader

        # materialize the eval set once instead of re-reading it for
        # every one of the 1 + len(corruptions)*levels cells
        all_pts, all_labels = [], []
        for batch in DataLoader(dataset, batch_size, shuffle=False,
                                drop_last=False):
            all_pts.append(np.asarray(batch["points"][..., :3], np.float32))
            all_labels.append(np.asarray(batch["label"]))
        ds_pts = np.concatenate(all_pts) if all_pts else \
            np.zeros((0, 1, 3), np.float32)
        ds_labels = np.concatenate(all_labels) if all_labels else \
            np.zeros((0,), np.int64)

    def accuracy(corrupt: Optional[tuple]):
        if use_files:
            split = "clean" if corrupt is None else \
                f"{corrupt[0]}_{corrupt[1]}"
            pts, labels = load_modelnet_c_split(data_root, split)
            return _batched_accuracy(eval_fn, pts[..., :3], labels,
                                     batch_size)
        # corrupt the whole materialized split at once (one vmapped
        # op-chain over all N clouds) instead of re-dispatching the chain
        # per batch — through a remote device tunnel that is dozens of
        # dispatches per CELL instead of per batch. Deliberately eager,
        # NOT jax.jit: jitting this argsort/scatter-bearing program
        # poisons subsequent mesh-jitted calls in this jax version (the
        # second call of a later in_shardings jit resolves its typed-key
        # arg to the batch sharding and crashes; reproduced + bisected,
        # see tests/test_eval_harnesses.py regression pairing).
        pts_cell = ds_pts
        if corrupt is not None and len(ds_pts):
            # result stays on device: _batched_accuracy slices/pads device
            # arrays directly and eval_fn's shard_batch is then a
            # device-side reshard instead of a download + re-upload
            pts_cell = corrupt_batch_level(
                jax.random.key(seed), jnp.asarray(ds_pts),
                corrupt[0], corrupt[1])
        return _batched_accuracy(eval_fn, pts_cell, ds_labels, batch_size)

    oa_clean = accuracy(None)
    print_log(f"{{'OA': {round(oa_clean, 3)}, 'corruption': 'clean', "
              f"'level': 'Overall'}}", logger=logger)

    per_level: Dict[str, list] = {}
    for name in corruptions:
        per_level[name] = []
        for lv in range(levels):
            oa = accuracy((name, lv))
            per_level[name].append(oa)
            print_log(f"{{'acc': {oa}, 'corruption': '{name}', "
                      f"'level': {lv}}}", logger=logger)

    results = corruption_metrics(per_level, oa_clean)
    for name in corruptions:
        print_log(f"{{'CE': {round(results[f'{name}_CE'], 3)}, "
                  f"'OA': {round(results[f'{name}_OA'], 3)}, "
                  f"'RCE': {round(results[f'{name}_RCE'], 3)}, "
                  f"'corruption': '{name}', 'level': 'Overall'}}",
                  logger=logger)
    print_log(f"{{'RmCE': {round(results['RmCE'], 3)}, "
              f"'mCE': {round(results['mCE'], 3)}, "
              f"'mOA': {round(results['mOA'], 3)}}}", logger=logger)
    return results


def corruption_metrics(per_level_oa: Dict[str, Sequence[float]],
                       clean_oa: float) -> Dict[str, float]:
    """ModelNet-C aggregation: ``CE_c = sum_l ER_{c,l} / sum_l refER_{c,l}``
    (== meanER/ref-meanER), ``RCE_c = sum_l(ER_{c,l} - ER_clean) /
    sum_l(refER_{c,l} - refER_clean)``; mCE/RmCE/mOA are means over
    corruptions. Golden-tested against the reference's embedded eval log
    (run.sh:70-114)."""
    # modelnetc_utils rounds every OA to 3 decimals BEFORE the CE/RCE
    # ratios (verified: with that rule each CE/RCE/mCE/RmCE line of the
    # run.sh log reproduces exactly; without it, e.g. scale CE is 0.959
    # instead of the published 0.957) — mirror it for number parity.
    results: Dict[str, float] = {"clean_OA": clean_oa}
    clean_er = 1.0 - round(clean_oa, 3)
    ce_list, rce_list, oa_list = [], [], []
    for name, oas in per_level_oa.items():
        for lv, oa in enumerate(oas):
            results[f"{name}_{lv}_OA"] = float(oa)
        mean_oa = round(float(np.mean(oas)), 3)
        er = 1.0 - mean_oa
        ref = DGCNN_REF_ER.get(name, 0.2)
        ce = er / ref
        rce = (er - clean_er) / max(ref - DGCNN_REF_ER["clean"], 1e-6)
        oa_list.append(mean_oa)
        ce_list.append(ce)
        rce_list.append(rce)
        results[f"{name}_OA"] = mean_oa
        results[f"{name}_CE"] = ce
        results[f"{name}_RCE"] = rce
    results["mOA"] = float(np.mean(oa_list))
    results["mCE"] = float(np.mean(ce_list))
    results["RmCE"] = float(np.mean(rce_list))
    return results


def test_net_corruption(config, args, logger_name="PointDAE"):
    """--test_corruption mode (runner_finetune.py:660-683)."""
    import functools

    from ..data.datasets import build_dataset_from_cfg
    from ..models import build_model_from_cfg
    from ..parallel import get_mesh, replicate, shard_batch
    from ..utils.checkpoint import (flatten_keys, load_params,
                                    merge_pretrained)
    from .finetune import make_eval_step, make_eval_step_raw
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
    # benchmark-faithful when the pre-generated files are mounted; the
    # reference's modelnetc_utils reads ./data/modelnet_c by convention
    data_root = (getattr(args, "modelnet_c_root", None)
                 or config.get("modelnet_c_root")
                 or "data/modelnet_c")
    # h5 path: feed the files' clouds raw like the reference's
    # test_corrupt (runner_finetune.py:641-651); fallback path: FPS to
    # npoints like every other finetune eval of this dataset
    if has_modelnet_c(data_root):
        eval_step = make_eval_step_raw(model, mesh)
    else:
        eval_step = make_eval_step(model, config, mesh)

    def eval_fn(pts):
        return jax.device_get(eval_step(state, shard_batch(mesh, pts)))
    return eval_corrupt_wrapper(eval_fn, test_set, total_bs,
                                data_root=data_root, logger=logger_name)
