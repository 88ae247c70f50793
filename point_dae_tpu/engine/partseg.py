"""Part segmentation trainer (reference: segmentation/main.py:69-329).

ShapeNetPart training with numpy-style scale/shift aug (provider.py:214-228,
done on device here), NLL loss over per-point log-probs, and the
category-restricted mIoU protocol (segmentation/main.py:231-323): at eval,
each shape's argmax is restricted to its category's part labels; reports
per-class and instance-average mIoU using the same 'Best inctance avg mIOU'
log-line format the reference's aggregator scrapes.
"""
from __future__ import annotations

import functools
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.partseg import seg_nll_loss
from ..parallel import (data_sharding, get_mesh, pad_to_batch, replicate,
                        replicated_sharding, shard_batch)
from ..utils.logger import print_log
from ..utils.meters import AverageMeter
from .train_state import TrainState, build_optimizer

SEG_CLASSES = {
    "Earphone": [16, 17, 18], "Motorbike": [30, 31, 32, 33, 34, 35],
    "Rocket": [41, 42, 43], "Car": [8, 9, 10, 11], "Laptop": [28, 29],
    "Cap": [6, 7], "Skateboard": [44, 45, 46], "Mug": [36, 37],
    "Guitar": [19, 20, 21], "Bag": [4, 5], "Lamp": [24, 25, 26, 27],
    "Table": [47, 48, 49], "Airplane": [0, 1, 2, 3], "Pistol": [38, 39, 40],
    "Chair": [12, 13, 14, 15], "Knife": [22, 23]}


def scale_shift(key, pts, scale_lo=0.8, scale_hi=1.25, shift=0.1):
    """random_scale_point_cloud + shift_point_cloud (provider.py:214-228)."""
    k1, k2 = jax.random.split(key)
    B = pts.shape[0]
    s = jax.random.uniform(k1, (B, 1, 1), minval=scale_lo, maxval=scale_hi)
    t = jax.random.uniform(k2, (B, 1, 3), minval=-shift, maxval=shift)
    return pts * s + t


def make_seg_train_step(model, config, mesh=None):
    def step(state: TrainState, pts, cls_onehot, seg, key):
        k_aug, k_drop, k_dp = jax.random.split(key, 3)
        pts = scale_shift(k_aug, pts)

        def lossf(params):
            logp, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                pts, cls_onehot, train=True,
                rngs={"dropout": k_drop, "droppath": k_dp},
                mutable=["batch_stats"])
            loss = seg_nll_loss(logp, seg)
            acc = jnp.mean(jnp.argmax(logp, -1) == seg)
            return loss, (acc, mut["batch_stats"])

        (loss, (acc, new_bs)), grads = jax.value_and_grad(
            lossf, has_aux=True)(state.params)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return state, {"loss": loss, "acc": acc}

    if mesh is None:
        return jax.jit(step, donate_argnums=0)
    bsh = data_sharding(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(step, donate_argnums=0,
                   in_shardings=(None, bsh, bsh, bsh, NamedSharding(mesh, P())))


def make_seg_eval_step(model, mesh=None):
    def step(state: TrainState, pts, cls_onehot):
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            pts, cls_onehot, train=False)

    if mesh is None:
        return jax.jit(step)
    bsh = data_sharding(mesh)
    # replicated output: log-probs are device_get on every host
    return jax.jit(step, in_shardings=(None, bsh, bsh),
                   out_shardings=replicated_sharding(mesh))


def category_restricted_argmax(logp: np.ndarray, cat_names) -> np.ndarray:
    """Per-shape argmax restricted to the shape's category parts
    (segmentation/main.py:246-262)."""
    out = np.zeros(logp.shape[:2], np.int32)
    for b, name in enumerate(cat_names):
        parts = SEG_CLASSES[name]
        out[b] = np.asarray(parts)[np.argmax(logp[b][:, parts], axis=-1)]
    return out


def compute_miou(preds, targets, cat_names) -> Dict[str, float]:
    """Per-part IoU -> per-shape mean -> class/instance mIoU
    (segmentation/main.py:264-295)."""
    shape_ious = {c: [] for c in SEG_CLASSES}
    for pred, gt, name in zip(preds, targets, cat_names):
        parts = SEG_CLASSES[name]
        ious = []
        for p in parts:
            pi = pred == p
            gi = gt == p
            union = np.logical_or(pi, gi).sum()
            ious.append(1.0 if union == 0
                        else np.logical_and(pi, gi).sum() / union)
        shape_ious[name].append(float(np.mean(ious)))
    all_ious = [v for vals in shape_ious.values() for v in vals]
    cls_ious = {c: float(np.mean(v)) for c, v in shape_ious.items() if v}
    return {
        "instance_miou": float(np.mean(all_ious)) if all_ious else 0.0,
        "class_miou": float(np.mean(list(cls_ious.values()))) if cls_ious else 0.0,
        "per_class": cls_ious,
    }


def evaluate_partseg(eval_step, state, test_set, total_bs, mesh, cat_names
                     ) -> Dict[str, float]:
    """Category-restricted mIoU eval over the test split
    (segmentation/main.py:231-295), shared by training and --test."""
    from ..data.loader import DataLoader

    preds, gts, names = [], [], []
    ev = DataLoader(test_set, total_bs, shuffle=False, drop_last=False)
    for batch in ev:
        pts = pad_to_batch(
            np.asarray(batch["points"][..., :3], np.float32), total_bs)
        n = len(batch["label"])
        labels = np.asarray(batch["label"])
        onehot = np.eye(16, dtype=np.float32)[
            np.concatenate([labels, np.zeros(total_bs - n, np.int64)])]
        # numpy straight to shard_batch (one upload per shard)
        logp = jax.device_get(eval_step(
            state, shard_batch(mesh, pts),
            shard_batch(mesh, onehot)))[:n]
        bnames = [cat_names[int(l)] for l in labels]
        preds.append(category_restricted_argmax(logp, bnames))
        gts.append(np.asarray(batch["seg"]))
        names.extend(bnames)
    return compute_miou(np.concatenate(preds), np.concatenate(gts), names)


def test_partseg(config, args, logger_name="PointDAE"):
    """--test on a ShapeNetPart config: load a trained checkpoint, run the
    category-restricted mIoU eval once, print the reference log lines.
    (The reference's segmentation/main.py has no test mode — evaluating a
    saved best_model required rerunning training — so this is a sanctioned
    addition reachable from the same CLI surface.)"""
    import optax

    from ..data.datasets import build_dataset_from_cfg
    from ..models import build_model_from_cfg
    from ..utils.checkpoint import (flatten_keys, load_params,
                                    merge_pretrained)

    mesh = get_mesh()
    dcfg = config["dataset"]
    split = dcfg.get("test", dcfg["train"])
    test_set = build_dataset_from_cfg(split["_base_"], split["others"])
    cat_names = sorted(SEG_CLASSES)
    total_bs = int(config.get("total_bs", 16))
    model = build_model_from_cfg(config["model"])
    npoints = int(config.get("npoints", 2048))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = jax.jit(functools.partial(model.init, train=True))(
        rngs, jnp.zeros((2, npoints, 3)), jnp.zeros((2, 16)))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if not getattr(args, "ckpts", None):
        raise ValueError("--test on a partseg config requires --ckpts")
    pre = load_params(args.ckpts, args.ckpts)
    params = merge_pretrained(params, flatten_keys(pre["params"]),
                              logger=logger_name)
    if pre.get("batch_stats"):
        batch_stats = merge_pretrained(batch_stats,
                                       flatten_keys(pre["batch_stats"]),
                                       logger=logger_name)
    state = replicate(mesh, TrainState.create(model.apply, params,
                                              batch_stats, optax.identity()))
    eval_step = make_seg_eval_step(model, mesh)
    m = evaluate_partseg(eval_step, state, test_set, total_bs, mesh,
                         cat_names)
    print_log(f"[TEST] test inctance avg mIOU = {m['instance_miou']:.5f} "
              f"class avg mIOU = {m['class_miou']:.5f}", logger=logger_name)
    return m


def run_partseg(config, args, logger_name="PointDAE"):
    """Full ShapeNetPart loop (segmentation/main.py:181-323)."""
    from ..data.datasets import build_dataset_from_cfg
    from ..data.loader import DataLoader
    from ..models import build_model_from_cfg
    from ..utils.checkpoint import (flatten_keys, load_params,
                                    merge_pretrained, save_checkpoint)

    mesh = get_mesh()
    dcfg = config["dataset"]
    train_set = build_dataset_from_cfg(dcfg["train"]["_base_"],
                                       dcfg["train"]["others"])
    test_set = build_dataset_from_cfg(dcfg["test"]["_base_"],
                                      dcfg["test"]["others"])
    cat_names = sorted(SEG_CLASSES)
    total_bs = int(config.get("total_bs", 16))
    # per-host loader striding like finetune/pretrain (DistributedSampler
    # role): no host loads the global train batch on a multi-host mesh
    from ..parallel import loader_shard_kwargs
    local_bs = total_bs // jax.process_count()
    loader = DataLoader(train_set, local_bs, shuffle=True,
                        seed=getattr(args, "seed", 0),
                        **loader_shard_kwargs())
    model = build_model_from_cfg(config["model"])
    npoints = int(config.get("npoints", 2048))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = jax.jit(functools.partial(model.init, train=True))(
        rngs, jnp.zeros((2, npoints, 3)), jnp.zeros((2, 16)))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if getattr(args, "ckpts", None):
        pre = load_params(args.ckpts, args.ckpts)
        params = merge_pretrained(params, flatten_keys(pre["params"]),
                                  logger=logger_name)
        # BN running stats ride along (the reference loads the full state
        # dict incl. buffers); epoch-0 eval would otherwise normalize with
        # init stats (mean 0 / var 1)
        if pre.get("batch_stats"):
            batch_stats = merge_pretrained(
                batch_stats, flatten_keys(pre["batch_stats"]),
                logger=logger_name)
    tx, _ = build_optimizer(config, params, max(len(loader), 1),
                            config.get("grad_norm_clip"))
    state = replicate(mesh, TrainState.create(model.apply, params,
                                              batch_stats, tx))
    train_step = make_seg_train_step(model, config, mesh)
    eval_step = make_seg_eval_step(model, mesh)
    key = jax.random.key(getattr(args, "seed", 0))
    best_inst = best_cls = 0.0

    for epoch in range(int(config.get("max_epoch", 300)) + 1):
        loader.set_epoch(epoch)
        meters = AverageMeter(["loss", "acc"])
        t0 = time.time()
        step_metrics = []
        for batch in loader:
            key, sub = jax.random.split(key)
            # stay in numpy until shard_batch: a jnp.asarray here would
            # upload unsharded, then shard_batch would round-trip it
            pts = shard_batch(mesh, np.asarray(batch["points"][..., :3],
                                               np.float32), local=True)
            onehot = np.eye(16, dtype=np.float32)[np.asarray(batch["label"])]
            seg = shard_batch(mesh, np.asarray(batch["seg"]), local=True)
            state, metrics = train_step(state, pts,
                                        shard_batch(mesh, onehot, local=True),
                                        seg, sub)
            # on-device accumulation; a per-step float() would serialize
            # dispatch (one device_get per epoch instead)
            step_metrics.append(metrics)
        for m in jax.device_get(step_metrics):
            meters.update([float(m["loss"]), float(m["acc"])])
        # train loss/acc logged like the reference (segmentation/main.py
        # logs "Train accuracy" and the loss meter per epoch)
        print_log(f"Epoch {epoch} train loss = {meters.avg(0):.5f} "
                  f"train acc = {meters.avg(1):.5f}", logger=logger_name)
        m = evaluate_partseg(eval_step, state, test_set, total_bs, mesh,
                             cat_names)
        improved = m["instance_miou"] > best_inst
        best_inst = max(best_inst, m["instance_miou"])
        best_cls = max(best_cls, m["class_miou"])
        print_log(
            f"Epoch {epoch} test inctance avg mIOU = {m['instance_miou']:.5f} "
            f"class avg mIOU = {m['class_miou']:.5f} "
            f"time = {time.time() - t0:.1f}s", logger=logger_name)
        print_log(f"Best inctance avg mIOU is: {best_inst:.5f}",
                  logger=logger_name)
        print_log(f"Best class avg mIOU is: {best_cls:.5f}", logger=logger_name)
        # best_model holds the best-mIoU WEIGHTS (segmentation/main.py saves
        # only on improvement); an unconditional save would overwrite the
        # best epoch with whatever came last
        if improved:
            save_checkpoint(args.experiment_path, "best_model", state, epoch,
                            best_inst)
    return {"best_instance_miou": best_inst, "best_class_miou": best_cls}
