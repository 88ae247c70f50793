"""Frozen-feature probes: SVM grid search + task-affinity linear head
(reference: tools/runner_finetune.py:902-1289).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import furthest_point_sample, gather_points
from ..parallel import (data_sharding, get_mesh, pad_to_batch,
                        replicated_sharding, shard_batch)
from ..utils.logger import print_log

Array = jax.Array


def extract_features(model, variables, dataset, npoints: int,
                     batch_size: int = 64, mesh=None,
                     method=None) -> Tuple[np.ndarray, np.ndarray]:
    """FPS-subsample to npoints then run the feature extractor
    (runner_finetune.py:955-1035). Returns host numpy (features, labels)."""
    from ..data.loader import DataLoader

    if mesh is None:
        mesh = get_mesh()

    def fn(pts):
        pts = gather_points(pts, furthest_point_sample(pts[..., :3], npoints))
        kwargs = {} if method is None else {"method": method}
        return model.apply(variables, pts, train=False, **kwargs)

    jfn = jax.jit(fn, in_shardings=(data_sharding(mesh),),
                  out_shardings=replicated_sharding(mesh))
    loader = DataLoader(dataset, batch_size, shuffle=False, drop_last=False)
    feats, labels = [], []
    for batch in loader:
        pts = np.asarray(batch["points"], np.float32)
        n = pts.shape[0]
        f = jax.device_get(jfn(shard_batch(
            mesh, pad_to_batch(pts, batch_size))))[:n]
        feats.append(f)
        labels.append(np.asarray(batch["label"]))
    return np.concatenate(feats), np.concatenate(labels)


def svm_grid_search(train_f, train_l, test_f, test_l,
                    logger=None) -> float:
    """SVC(C=10^i, linear) for i in [-3, 2], report max accuracy
    (runner_finetune.py:1038-1049). Host-side sklearn."""
    from sklearn import svm

    best = 0.0
    for i in range(-3, 3):
        c = 10.0 ** i
        clf = svm.SVC(C=c, kernel="linear")
        clf.fit(train_f, train_l)
        acc = float(clf.score(test_f, test_l)) * 100.0
        print_log(f"[SVM] C=10^{i}: acc = {acc:.4f}", logger=logger)
        best = max(best, acc)
    print_log(f"[SVM] best acc = {best:.4f}", logger=logger)
    return best


def svm_classification(config, args, logger_name="PointDAE") -> float:
    """--svm_classification mode (runner_finetune.py:902-1050)."""
    from ..data.datasets import build_dataset_from_cfg
    from ..models import build_model_from_cfg
    from ..utils.checkpoint import (flatten_keys, load_params,
                                    merge_pretrained)

    mesh = get_mesh()
    dcfg = config["dataset"]
    train_set = build_dataset_from_cfg(dcfg["train"]["_base_"], dcfg["train"]["others"])
    test_set = build_dataset_from_cfg(dcfg["test"]["_base_"], dcfg["test"]["others"])
    npoints = int(config.get("npoints", 1024))
    model = build_model_from_cfg(config["model"])
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = jax.jit(functools.partial(model.init, train=False))(
        rngs, jnp.zeros((2, npoints, 3)))
    variables = dict(variables)
    if getattr(args, "ckpts", None):
        pretrained = load_params(args.ckpts, args.ckpts)
        variables["params"] = merge_pretrained(
            variables["params"], flatten_keys(pretrained["params"]),
            logger=logger_name)
        if pretrained.get("batch_stats"):
            variables["batch_stats"] = merge_pretrained(
                variables.get("batch_stats", {}),
                flatten_keys(pretrained["batch_stats"]), logger=logger_name)
    tr_f, tr_l = extract_features(model, variables, train_set, npoints, mesh=mesh)
    te_f, te_l = extract_features(model, variables, test_set, npoints, mesh=mesh)
    return svm_grid_search(tr_f, tr_l, te_f, te_l, logger=logger_name)


def task_affinity(config, args, logger_name="PointDAE",
                  epochs: int = 300, lr: float = 1e-3) -> float:
    """--task_affinity mode (runner_finetune.py:1052-1289): train a 1-layer
    linear head on frozen features (AdamW + cosine, 300 epochs), report test
    CE loss as the affinity score. Runs fully jitted on device."""
    from ..data.datasets import build_dataset_from_cfg
    from ..models import build_model_from_cfg
    from ..utils.checkpoint import (flatten_keys, load_params,
                                    merge_pretrained)

    mesh = get_mesh()
    dcfg = config["dataset"]
    train_set = build_dataset_from_cfg(dcfg["train"]["_base_"], dcfg["train"]["others"])
    test_set = build_dataset_from_cfg(dcfg["test"]["_base_"], dcfg["test"]["others"])
    npoints = int(config.get("npoints", 1024))
    model = build_model_from_cfg(config["model"])
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = jax.jit(functools.partial(model.init, train=False))(
        rngs, jnp.zeros((2, npoints, 3)))
    variables = dict(variables)
    if getattr(args, "ckpts", None):
        pretrained = load_params(args.ckpts, args.ckpts)
        variables["params"] = merge_pretrained(
            variables["params"], flatten_keys(pretrained["params"]),
            logger=logger_name)
        if pretrained.get("batch_stats"):
            variables["batch_stats"] = merge_pretrained(
                variables.get("batch_stats", {}),
                flatten_keys(pretrained["batch_stats"]), logger=logger_name)
    tr_f, tr_l = extract_features(model, variables, train_set, npoints, mesh=mesh)
    te_f, te_l = extract_features(model, variables, test_set, npoints, mesh=mesh)

    num_classes = int(tr_l.max()) + 1
    dim = tr_f.shape[-1]
    w = jnp.zeros((dim, num_classes))
    b = jnp.zeros((num_classes,))
    sched = optax.cosine_decay_schedule(lr, epochs)
    tx = optax.adamw(sched, weight_decay=0.05)
    opt_state = tx.init((w, b))
    xs, ys = jnp.asarray(tr_f), jnp.asarray(tr_l)

    @jax.jit
    def train_epoch(carry, _):
        (w, b), opt_state = carry

        def lossf(p):
            logits = xs @ p[0] + p[1]
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, ys[:, None], -1))

        g = jax.grad(lossf)((w, b))
        updates, opt_state = tx.update(g, opt_state, (w, b))
        return (optax.apply_updates((w, b), updates), opt_state), None

    ((w, b), _), _ = jax.lax.scan(train_epoch, ((w, b), opt_state), None,
                                  length=epochs)
    logits = jnp.asarray(te_f) @ w + b
    logp = jax.nn.log_softmax(logits)
    ce = float(-jnp.mean(jnp.take_along_axis(
        logp, jnp.asarray(te_l)[:, None], -1)))
    acc = float(jnp.mean(jnp.argmax(logits, -1) == jnp.asarray(te_l))) * 100
    print_log(f"[TaskAffinity] test CE = {ce:.4f} acc = {acc:.4f}",
              logger=logger_name)
    # reference log-format API (runner_finetune.py:1269) scraped by
    # parse_acc_affinity.py --taskaffinity (it reads the value after '= ',
    # i.e. the CE loss, and takes the min across logs)
    print_log(f"[Validation] Acc: {acc / 100.0:.4f}  loss = {ce:.4f}",
              logger=logger_name)
    return ce
