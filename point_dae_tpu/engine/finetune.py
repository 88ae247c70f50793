"""Classification fine-tune / test / voting loops
(reference: tools/runner_finetune.py:83-899).

Per-batch on-device FPS oversample->subsample (runner_finetune.py:161-177):
FPS to ``point_all`` (1200/2400/4800/8192 for npoints 1024/2048/4096/8192),
then a random choice of ``npoints`` of them, fused into the jitted step.
Smooth cross-entropy (eps=0.3) mirrors the reference's smooth loss option;
voting eval averages logits over 10 FPS subsample + scale/translate draws
(validate_vote :568-632).

Consciously fixed reference quirk (SURVEY.md §7): the reference's
``validate_vote`` lacks an npoints==2048 branch (runner_finetune.py:579-586);
here every npoints goes through the same POINT_ALL table.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import furthest_point_sample, gather_points
from ..parallel import (data_sharding, get_mesh, pad_to_batch, replicate,
                        replicated_sharding, shard_batch)
from ..utils.logger import ScalarWriter, print_log
from ..utils.meters import AverageMeter
from .train_state import TrainState, build_optimizer

Array = jax.Array

POINT_ALL = {1024: 1200, 2048: 2400, 4096: 4800, 8192: 8192}


def fps_resample(key: jax.Array, pts: Array, npoints: int) -> Array:
    """train-time resample (runner_finetune.py:161-177): FPS to point_all then
    random-subset npoints. If the cloud is smaller than point_all, FPS
    directly to npoints."""
    n = pts.shape[1]
    point_all = POINT_ALL.get(npoints, npoints)
    point_all = min(point_all, n)
    idx = furthest_point_sample(pts[..., :3], point_all)
    sampled = gather_points(pts, idx)
    if point_all > npoints:
        B = pts.shape[0]
        keys = jax.random.split(key, B)
        sel = jax.vmap(lambda k: jax.random.choice(
            k, point_all, (npoints,), replace=False))(keys)
        sampled = gather_points(sampled, sel)
    return sampled


def scale_translate(key: jax.Array, pts: Array,
                    lo: float = 2. / 3., hi: float = 3. / 2.,
                    trans: float = 0.2) -> Array:
    """PointcloudScaleAndTranslate (datasets/data_transforms.py:6-20)."""
    k1, k2 = jax.random.split(key)
    B = pts.shape[0]
    s = jax.random.uniform(k1, (B, 1, 3), minval=lo, maxval=hi)
    t = jax.random.uniform(k2, (B, 1, 3), minval=-trans, maxval=trans)
    return pts * s + t


def smooth_cross_entropy(logits: Array, labels: Array, eps: float = 0.3) -> Array:
    """Label-smoothed CE (the reference's smooth loss, eps 0.3)."""
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits)
    onehot = jax.nn.one_hot(labels, n)
    target = onehot * (1 - eps) + eps / n
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def cross_entropy(logits: Array, labels: Array) -> Array:
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def make_finetune_step(model, config, mesh=None, smooth: bool = False,
                       aug: str = None) -> Callable:
    npoints = int(config.get("npoints", 1024))
    if aug is None:
        # reference parity: the standard finetune applies NO train-time point
        # transform (train_transforms is commented out, runner_finetune.py:180
        # — only the FPS resample); rotate/scale-translate variants opt in via
        # config train_aug. Voting/test keep scale_translate
        # (test_transforms, :53-59).
        aug = config.get("train_aug", "none")
    loss_fn = functools.partial(smooth_cross_entropy, eps=0.3) if smooth \
        else cross_entropy
    # linear-probe mode runs every BatchNorm in EVAL mode during training
    # (set_bn_eval, runner_finetune.py:30-37, applied when optimizer.part ==
    # 'only_new'): normalization uses the pretrained running stats — the same
    # distribution the eval forward sees — and the stats are never updated.
    # Other stochastic layers (dropout/droppath) stay in train mode, exactly
    # like the reference's module-selective .eval().
    freeze_bn = config.get("optimizer", {}).get("part") == "only_new"
    import flax.linen as nn

    def _bn_eval_interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if isinstance(mod, nn.BatchNorm) and context.method_name == "__call__" \
                and mod.use_running_average is False:
            # bound modules are per-apply clones, so this only affects the
            # current trace (merge_param forbids passing the kwarg when the
            # attribute is already set)
            object.__setattr__(mod, "use_running_average", True)
        return next_fun(*args, **kwargs)

    def step(state: TrainState, pts: Array, labels: Array, key: jax.Array):
        k_fps, k_aug, k_drop = jax.random.split(key, 3)
        pts = pts[..., :3]  # classification heads consume xyz only
        pts = fps_resample(k_fps, pts, npoints)
        if aug == "scale_translate":
            pts = scale_translate(k_aug, pts)
        elif aug == "rotate":
            from ..data.corruptions import affine_rotate

            def rot(k, p):
                a, _ = affine_rotate(k, 0.0)
                return jnp.matmul(p, a, precision=jax.lax.Precision.HIGHEST)

            pts = jax.vmap(rot)(jax.random.split(k_aug, pts.shape[0]), pts)
        elif aug == "dg":
            # PointDA-10 train augs (domain_generalization.py:322-328):
            # per-cloud random z-rotation (random_rotate_one_axis) +
            # clipped jitter (jitter_pointcloud sigma .01 clip .02); the
            # host-side shuffle is a no-op for permutation-invariant models
            kr, kj = jax.random.split(k_aug)
            B = pts.shape[0]
            ang = jax.random.uniform(kr, (B,), maxval=2 * jnp.pi)
            c, s = jnp.cos(ang), jnp.sin(ang)
            z, o = jnp.zeros_like(c), jnp.ones_like(c)
            rz = jnp.stack([jnp.stack([c, -s, z], -1),
                            jnp.stack([s, c, z], -1),
                            jnp.stack([z, z, o], -1)], -2)     # (B, 3, 3)
            pts = jnp.einsum("bnc,bcd->bnd", pts, rz,
                             precision=jax.lax.Precision.HIGHEST)
            pts = pts + jnp.clip(0.01 * jax.random.normal(kj, pts.shape),
                                 -0.02, 0.02)

        def lossf(params):
            def apply():
                return state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    pts, train=True,
                    rngs={"dropout": k_drop, "droppath": k_drop},
                    mutable=["batch_stats"])

            if freeze_bn:
                with nn.intercept_methods(_bn_eval_interceptor):
                    logits, mut = apply()
            else:
                logits, mut = apply()
            loss = loss_fn(logits, labels)
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            return loss, (acc, mut["batch_stats"])

        (loss, (acc, new_bs)), grads = jax.value_and_grad(
            lossf, has_aux=True)(state.params)
        if freeze_bn:
            new_bs = state.batch_stats
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return state, {"loss": loss, "acc": acc * 100.0}

    if mesh is None:
        return jax.jit(step, donate_argnums=0)
    bsh = data_sharding(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return jax.jit(step, donate_argnums=0,
                   in_shardings=(None, bsh, bsh, rep))


def make_eval_step(model, config, mesh=None) -> Callable:
    npoints = int(config.get("npoints", 1024))

    def step(state: TrainState, pts: Array):
        pts = pts[..., :3]
        pts = gather_points(pts, furthest_point_sample(pts, npoints))
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            pts, train=False)
        return logits

    if mesh is None:
        return jax.jit(step)
    # replicated output: every host must device_get the logits, and a
    # multi-host data-sharded array is not fully addressable locally
    return jax.jit(step, in_shardings=(None, data_sharding(mesh)),
                   out_shardings=replicated_sharding(mesh))


def make_eval_step_raw(model, mesh=None) -> Callable:
    """Eval step that feeds clouds to the model as-is, with NO FPS
    resample — the ModelNet-C protocol (runner_finetune.py:641-651:
    ``model(data)`` on the raw h5 clouds, whose point count varies per
    corruption cell; FPS-to-npoints on a 256-point dropout_global_4 cloud
    would duplicate one point 768 times). One compile per distinct cell
    shape (cheap: eval-only, <=36 shapes)."""
    def step(state: TrainState, pts: Array):
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            pts[..., :3], train=False)

    if mesh is None:
        return jax.jit(step)
    return jax.jit(step, in_shardings=(None, data_sharding(mesh)),
                   out_shardings=replicated_sharding(mesh))


def make_vote_step(model, config, mesh=None, times: int = 10) -> Callable:
    """10-draw voting eval (validate_vote, runner_finetune.py:568-632):
    mean softmax logits over FPS subsample + scale/translate draws."""
    npoints = int(config.get("npoints", 1024))

    def step(state: TrainState, pts: Array, key: jax.Array):
        pts_xyz = pts[..., :3]

        def one(k):
            k1, k2 = jax.random.split(k)
            p = fps_resample(k1, pts_xyz, npoints)
            p = scale_translate(k2, p)
            return state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                p, train=False)

        keys = jax.random.split(key, times)
        logits = jax.lax.map(one, keys)          # (times, B, C)
        # reference aggregation: mean of RAW logits, then argmax
        # (validate_vote, runner_finetune.py:606-609)
        return jnp.mean(logits, axis=0)

    if mesh is None:
        return jax.jit(step)
    bsh = data_sharding(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(step, in_shardings=(None, bsh, NamedSharding(mesh, P())),
                   out_shardings=replicated_sharding(mesh))


def evaluate(eval_step, state, loader, mesh, batch_size: int) -> float:
    """Plain accuracy eval with tail-batch padding."""
    correct = total = 0
    for batch in loader:
        pts = np.asarray(batch["points"], np.float32)
        labels = np.asarray(batch["label"])
        n = pts.shape[0]
        # numpy straight to shard_batch: one upload per shard (jnp.asarray
        # first would upload the full batch unsharded, then reshard)
        logits = jax.device_get(eval_step(
            state, shard_batch(mesh, pad_to_batch(pts, batch_size))))
        pred = np.argmax(logits[:n], -1)
        correct += int((pred == labels).sum())
        total += n
    return 100.0 * correct / max(total, 1)


def run_finetune(config, args, logger_name: str = "PointDAE"):
    """Fine-tune loop (runner_finetune.run_net :83-270): FPS resample,
    (smooth) CE via the model head, grad clip, per-epoch validation, optional
    voting when acc crosses the reference's trigger (acc > 92.1 or best>91,
    :254-262), ckpt-best/last."""
    from ..data.datasets import build_dataset_from_cfg
    from ..data.loader import DataLoader
    from ..models import build_model_from_cfg
    from ..utils.checkpoint import (load_params, merge_pretrained,
                                    save_checkpoint, flatten_keys,
                                    resume_checkpoint)

    mesh = get_mesh()
    writer = ScalarWriter(getattr(args, "tfboard_path", None))
    dcfg = config["dataset"]
    train_set = build_dataset_from_cfg(dcfg["train"]["_base_"], dcfg["train"]["others"])
    val_set = build_dataset_from_cfg(dcfg["val"]["_base_"], dcfg["val"]["others"])

    total_bs = int(config.get("total_bs", 32))
    from ..parallel import loader_shard_kwargs
    import jax as _jax

    local_bs = total_bs // _jax.process_count()
    loader = DataLoader(train_set, local_bs, shuffle=True,
                        seed=getattr(args, "seed", 0),
                        **loader_shard_kwargs())
    val_loader_fn = lambda: DataLoader(val_set, total_bs, shuffle=False,
                                       drop_last=False)
    steps_per_epoch = max(len(loader), 1)
    max_epoch = int(config.get("max_epoch", 300))
    npoints = int(config.get("npoints", 1024))

    model = build_model_from_cfg(config["model"])
    rngs = {"params": jax.random.key(getattr(args, "seed", 0)),
            "dropout": jax.random.key(1), "droppath": jax.random.key(2)}
    dummy = jnp.zeros((2, npoints, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=True))(rngs, dummy)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if getattr(args, "ckpts", None):
        pretrained = load_params(args.ckpts, args.ckpts)
        params = merge_pretrained(params, flatten_keys(pretrained["params"]),
                                  logger=logger_name)
        # BN running statistics transfer too (the reference loads the full
        # torch state dict incl. buffers, builder.py:load_model) — essential
        # for linear probes, whose frozen-BN eval path consumes them
        if pretrained.get("batch_stats"):
            batch_stats = merge_pretrained(
                batch_stats, flatten_keys(pretrained["batch_stats"]),
                logger=logger_name)

    tx, sched = build_optimizer(config, params, steps_per_epoch,
                                config.get("grad_norm_clip"))
    state = TrainState.create(model.apply, params, batch_stats, tx)
    state = replicate(mesh, state)

    # both spellings: top-level `smooth` and the reference's
    # model.smoothloss (e.g. finetune_*_smooth*.yaml carry the latter);
    # string 'False'/'True' values parse correctly
    raw_smooth = config.get("smooth",
                            config.get("model", {}).get("smoothloss", False))
    smooth = str(raw_smooth).lower() in ("true", "1")
    train_step = make_finetune_step(model, config, mesh, smooth=smooth)
    eval_step = make_eval_step(model, config, mesh)
    vote_step = make_vote_step(model, config, mesh)
    key = jax.random.key(getattr(args, "seed", 0) + 7)

    best_acc, best_vote = 0.0, 0.0
    start_epoch = 0
    auto = (getattr(args, "auto_resume", False)
            and os.path.isdir(os.path.join(args.experiment_path,
                                           "ckpt-last")))
    if getattr(args, "resume", False) or auto:
        state, start_epoch, best_acc = resume_checkpoint(args.experiment_path, state)
        # the restored leaves are host-local arrays; put them back on the
        # mesh (multi-host resume would otherwise feed process-local arrays
        # into a jit expecting the replicated placement)
        state = replicate(mesh, state)

    for epoch in range(start_epoch, max_epoch + 1):
        loader.set_epoch(epoch)
        meters = AverageMeter(["loss", "acc"])
        t0 = time.time()
        step_metrics = []
        for batch in loader:
            key, sub = jax.random.split(key)
            pts = shard_batch(mesh, np.asarray(batch["points"], np.float32),
                              local=True)
            labels = shard_batch(mesh, np.asarray(batch["label"]),
                                 local=True)
            state, metrics = train_step(state, pts, labels, sub)
            # keep metrics on device — a float() here would sync every
            # step and drain the dispatch queue (cf. pretrain.py's sparse
            # metric pulls); one device_get at epoch end instead
            step_metrics.append(metrics)
        for m in jax.device_get(step_metrics):
            meters.update([float(m["loss"]), float(m["acc"])])
        # training loss/acc are first-class signals like the reference's
        # (runner_finetune.py:205-216 logs + TB scalars both)
        writer.add_scalar("Loss/Epoch/loss", meters.avg(0), epoch)
        writer.add_scalar("Metric/TrainACC", meters.avg(1), epoch)
        print_log(f"[Training] EPOCH: {epoch} EpochTime = "
                  f"{time.time() - t0:.3f} (s) "
                  f"Losses = ['{meters.avg(0):.4f}', '{meters.avg(1):.4f}']",
                  logger=logger_name)
        acc = evaluate(eval_step, state, val_loader_fn(), mesh, total_bs)
        writer.add_scalar("Metric/ACC", acc, epoch)
        print_log(f"[Validation] EPOCH: {epoch}  acc = {acc:.4f} "
                  f"time = {time.time() - t0:.1f}s", logger=logger_name)
        better = acc > best_acc
        if better:
            best_acc = acc
            save_checkpoint(args.experiment_path, "ckpt-best", state, epoch, best_acc)
        # voting trigger (runner_finetune.py:254-262): acc > 92.1 always
        # votes; the 91 band only on IMPROVING epochs (gating on the
        # post-update best_acc would degenerate to acc > 91 and re-run the
        # 10-draw eval every late epoch)
        if getattr(args, "vote", False) and (acc > 92.1 or (better and acc > 91)):
            key, sub = jax.random.split(key)
            vacc = _vote_eval(vote_step, state, val_loader_fn(), mesh, total_bs, sub)
            best_vote = max(best_vote, vacc)
            print_log(f"[Validation_vote] EPOCH: {epoch}  vote_acc = {vacc:.4f}",
                      logger=logger_name)
        save_checkpoint(args.experiment_path, "ckpt-last", state, epoch, best_acc)
    return {"best_acc": best_acc, "best_vote": best_vote, "state": state}


def _vote_eval(vote_step, state, loader, mesh, batch_size, key) -> float:
    correct = total = 0
    for batch in loader:
        pts = np.asarray(batch["points"], np.float32)
        labels = np.asarray(batch["label"])
        n = pts.shape[0]
        key, sub = jax.random.split(key)
        probs = jax.device_get(vote_step(
            state, shard_batch(mesh, pad_to_batch(pts, batch_size)), sub))
        pred = np.argmax(probs[:n], -1)
        correct += int((pred == labels).sum())
        total += n
    return 100.0 * correct / max(total, 1)


def test_net(config, args, logger_name: str = "PointDAE"):
    """Test protocol (runner_finetune.py:686-748): plain accuracy, then
    repeated voting keeping the max."""
    from ..data.datasets import build_dataset_from_cfg
    from ..data.loader import DataLoader
    from ..models import build_model_from_cfg
    from ..utils.checkpoint import load_params, merge_pretrained, flatten_keys

    mesh = get_mesh()
    dcfg = config["dataset"]
    test_set = build_dataset_from_cfg(dcfg["test"]["_base_"], dcfg["test"]["others"])
    total_bs = int(config.get("total_bs", 32))
    model = build_model_from_cfg(config["model"])
    npoints = int(config.get("npoints", 1024))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = jax.jit(functools.partial(model.init, train=True))(
        rngs, jnp.zeros((2, npoints, 3)))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    pretrained = load_params(args.ckpts, args.ckpts)
    params = merge_pretrained(params, flatten_keys(pretrained["params"]))
    if pretrained.get("batch_stats"):
        batch_stats = merge_pretrained(batch_stats,
                                       flatten_keys(pretrained["batch_stats"]))
    import optax

    state = TrainState.create(model.apply, params, batch_stats,
                              optax.identity())
    state = replicate(mesh, state)
    eval_step = make_eval_step(model, config, mesh)
    loader_fn = lambda: DataLoader(test_set, total_bs, shuffle=False, drop_last=False)
    acc = evaluate(eval_step, state, loader_fn(), mesh, total_bs)
    print_log(f"[TEST] acc = {acc:.4f}", logger=logger_name)
    if getattr(args, "vote", False):
        vote_step = make_vote_step(model, config, mesh)
        key = jax.random.key(getattr(args, "seed", 0))
        best = 0.0
        for it in range(int(getattr(args, "vote_repeats", 299))):
            key, sub = jax.random.split(key)
            v = _vote_eval(vote_step, state, loader_fn(), mesh, total_bs, sub)
            best = max(best, v)
            print_log(f"[TEST_VOTE] iter {it}: acc = {v:.4f} best = {best:.4f}",
                      logger=logger_name)
    return acc
