"""SO(3) rotation-robustness protocol (reference:
tools/runner_finetune.py:322-564, ``--so3_rotation``): train/test under
z-axis or full SO(3) rotations (z2z / z2so3 / so32so3 protocols, configs
``finetune_modelnet_rotation_*``). Reuses the finetune machinery with
rotation augmentation injected on device.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from ..data import corruptions as C
from ..parallel import get_mesh, pad_to_batch, replicate, shard_batch
from ..utils.logger import print_log
from .finetune import fps_resample, cross_entropy
from .train_state import TrainState, build_optimizer


def rotate_batch(key: jax.Array, pts: Array, mode: str):
    if mode == "z":
        fn = lambda k, p: jnp.matmul(
            p, C.affine_rotate_z(k, 4.0)[0],
            precision=jax.lax.Precision.HIGHEST)
    elif mode == "so3":
        fn = lambda k, p: jnp.matmul(
            p, C.affine_rotate(k, None)[0],
            precision=jax.lax.Precision.HIGHEST)
    else:
        return pts
    keys = jax.random.split(key, pts.shape[0])
    return jax.vmap(fn)(keys, pts)


Array = jax.Array


def make_rotation_eval_step(model, config, test_mode: str, mesh=None):
    from ..ops import furthest_point_sample, gather_points
    from ..parallel import data_sharding

    npoints = int(config.get("npoints", 1024))

    def step(state: TrainState, pts: Array, key: jax.Array):
        pts = rotate_batch(key, pts, test_mode)
        pts = gather_points(pts, furthest_point_sample(pts, npoints))
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            pts, train=False)

    if mesh is None:
        return jax.jit(step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import replicated_sharding

    # replicated output: logits are device_get on every host
    return jax.jit(step, in_shardings=(None, data_sharding(mesh),
                                       NamedSharding(mesh, P())),
                   out_shardings=replicated_sharding(mesh))


def run_net_rotation(config, args, logger_name="PointDAE"):
    """z2z / z2so3 / so32so3 protocol: the config's ``rotation`` dict sets
    {train: 'z'|'so3'|'none', test: 'z'|'so3'|'none'}."""
    from ..data.datasets import build_dataset_from_cfg
    from ..data.loader import DataLoader
    from ..models import build_model_from_cfg
    from ..utils.checkpoint import (flatten_keys, load_params,
                                    merge_pretrained, save_checkpoint)

    # protocol selection: --mode z2z|z2so3|so32so3 (the reference flag)
    # wins; else the config's rotation dict; else z2so3
    mode_arg = getattr(args, "mode", None)
    if mode_arg in ("z2z", "z2so3", "so32so3"):
        train_mode, test_mode = mode_arg.split("2")
    else:
        rot = config.get("rotation", {"train": "z", "test": "so3"})
        train_mode, test_mode = rot.get("train", "z"), rot.get("test", "so3")
    mesh = get_mesh()
    dcfg = config["dataset"]
    train_set = build_dataset_from_cfg(dcfg["train"]["_base_"],
                                       dcfg["train"]["others"])
    val_set = build_dataset_from_cfg(dcfg["val"]["_base_"],
                                     dcfg["val"]["others"])
    total_bs = int(config.get("total_bs", 32))
    # per-host loader striding (DistributedSampler role), like finetune
    from ..parallel import loader_shard_kwargs
    local_bs = total_bs // jax.process_count()
    loader = DataLoader(train_set, local_bs, shuffle=True,
                        seed=getattr(args, "seed", 0),
                        **loader_shard_kwargs())
    npoints = int(config.get("npoints", 1024))

    model = build_model_from_cfg(config["model"])
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
            batch_stats = merge_pretrained(
                batch_stats, flatten_keys(pre["batch_stats"]),
                logger=logger_name)
    tx, _ = build_optimizer(config, params, max(len(loader), 1),
                            config.get("grad_norm_clip"))
    state = replicate(mesh, TrainState.create(model.apply, params,
                                              batch_stats, tx))

    # train step with rotation augmentation folded in
    from ..parallel import data_sharding
    from jax.sharding import NamedSharding, PartitionSpec as P

    def step(state, pts, labels, key):
        k_rot, k_fps, k_drop = jax.random.split(key, 3)
        pts = rotate_batch(k_rot, pts, train_mode)
        pts = fps_resample(k_fps, pts, npoints)

        def lossf(p):
            logits, mut = state.apply_fn(
                {"params": p, "batch_stats": state.batch_stats},
                pts, train=True,
                rngs={"dropout": k_drop, "droppath": k_drop},
                mutable=["batch_stats"])
            loss = cross_entropy(logits, labels)
            return loss, (jnp.mean(jnp.argmax(logits, -1) == labels),
                          mut["batch_stats"])

        (loss, (acc, bs)), grads = jax.value_and_grad(
            lossf, has_aux=True)(state.params)
        return (state.apply_gradients(grads).replace(batch_stats=bs),
                {"loss": loss, "acc": acc})

    train_step = jax.jit(step, donate_argnums=0,
                         in_shardings=(None, data_sharding(mesh),
                                       data_sharding(mesh),
                                       NamedSharding(mesh, P())))
    eval_step = make_rotation_eval_step(model, config, test_mode, mesh)
    key = jax.random.key(getattr(args, "seed", 0))
    best = 0.0
    for epoch in range(int(config.get("max_epoch", 300)) + 1):
        loader.set_epoch(epoch)
        step_metrics = []
        for batch in loader:
            key, sub = jax.random.split(key)
            pts = shard_batch(mesh, np.asarray(batch["points"][..., :3],
                                               np.float32), local=True)
            labels = shard_batch(mesh, np.asarray(batch["label"]),
                                 local=True)
            state, metrics = train_step(state, pts, labels, sub)
            # on-device accumulation, one host pull per epoch
            step_metrics.append(metrics)
        if step_metrics:
            got = jax.device_get(step_metrics)
            print_log(
                f"[Training] EPOCH: {epoch} "
                f"loss = {float(np.mean([m['loss'] for m in got])):.5f} "
                f"acc = {float(np.mean([m['acc'] for m in got])):.5f}",
                logger=logger_name)
        # rotated eval
        correct = total = 0
        ev = DataLoader(val_set, total_bs, shuffle=False, drop_last=False)
        for batch in ev:
            pts = np.asarray(batch["points"][..., :3], np.float32)
            labels = np.asarray(batch["label"])
            n = pts.shape[0]
            key, sub = jax.random.split(key)
            logits = jax.device_get(eval_step(
                state, shard_batch(mesh, pad_to_batch(pts, total_bs)),
                sub))[:n]
            correct += int((np.argmax(logits, -1) == labels).sum())
            total += n
        acc = 100.0 * correct / max(total, 1)
        best = max(best, acc)
        print_log(f"[Validation] EPOCH: {epoch}  acc = {acc:.4f} "
                  f"({train_mode}2{test_mode}) best = {best:.4f}",
                  logger=logger_name)
        save_checkpoint(args.experiment_path, "ckpt-last", state, epoch, best)
    return {"best_acc": best}
