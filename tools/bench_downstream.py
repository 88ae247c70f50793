#!/usr/bin/env python
"""Downstream-path throughput (VERDICT r04 next #8): finetune and part-seg
train steps at their recipe shapes, plus the 10-draw vote eval step.

- finetune_scan_hardest_transferring_features.yaml: PointTransformer
  cls, bs 32, N_raw 2048 -> FPS 2048 in-step, smooth-CE, grad-clip 10.
- partseg_shapenetpart.yaml: PointTransformerPartSeg, bs 16, N 2048.

Reference analogs: tools/runner_finetune.py:161-200,
segmentation/main.py:181-323. Prints one JSON line per path.

Usage: PF_SKIP_GATE=1 python tools/bench_downstream.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeloop(name, fn, b, iters=8, rounds=3):
    import jax

    out = fn()
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jax.numpy.ravel(leaf)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jax.numpy.ravel(leaf)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(json.dumps({"name": name, "ms": round(best * 1e3, 2),
                      "clouds_per_sec": round(b / best, 1)}), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_dae_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bench import _wait_for_healthy_device

    if not os.environ.get("PF_SKIP_GATE"):
        tflops = _wait_for_healthy_device()
        print(f"# probe {tflops:.0f} TFLOP/s", file=sys.stderr, flush=True)

    from point_dae_tpu.engine.finetune import (make_finetune_step,
                                               make_vote_step)
    from point_dae_tpu.engine.partseg import make_seg_train_step
    from point_dae_tpu.engine.train_state import TrainState, build_optimizer
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.utils.config import ConfigDict

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    # BD_SMALL=1: tiny shapes for a CPU smoke of the tool itself
    small = os.environ.get("BD_SMALL") == "1"
    dim, depth, G, S = (64, 2, 16, 8) if small else (384, 12, 128, 32)

    # ---- finetune_scan_hardest (transferring_features recipe) ------------
    B, N = (4, 128) if small else (32, 2048)
    cfg = ConfigDict({
        "optimizer": {"type": "AdamW", "part": "all",
                      "kwargs": {"lr": 5e-4, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR",
                      "kwargs": {"epochs": 300, "initial_epochs": 10}},
        "model": {"NAME": "PointTransformer", "trans_dim": dim,
                  "depth": depth, "drop_path_rate": 0.1, "cls_dim": 15,
                  "num_heads": 2 if dim == 64 else 6, "group_size": S,
                  "num_group": G, "encoder_dims": dim, "dtype": "bf16"},
        "npoints": N, "total_bs": B, "max_epoch": 300, "grad_norm_clip": 10,
    })
    model = build_model_from_cfg(cfg["model"])
    pts = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 15, size=(B,)).astype(np.int32))
    v = jax.jit(lambda: model.init(
        {"params": key, "dropout": key, "droppath": key}, pts,
        train=True))()
    tx, _ = build_optimizer(cfg, v["params"], steps_per_epoch=100,
                            grad_norm_clip=10.0)
    state = TrainState.create(model.apply, v["params"],
                              v.get("batch_stats", {}), tx)
    fstep = make_finetune_step(model, cfg, mesh=None, smooth=True)
    hold = {"s": state}

    def ft():
        hold["s"], m = fstep(hold["s"], pts, labels,
                             jax.random.fold_in(key, 1))
        return m

    timeloop(f"finetune_scan_hardest_train_step[bs{B},N{N}]", ft, B)

    vstep = make_vote_step(model, cfg, mesh=None, times=10)

    def vote():
        return vstep(hold["s"], pts, jax.random.fold_in(key, 7))

    timeloop(f"finetune_vote10_eval_step[bs{B},N{N}]", vote, B)

    # ---- partseg_shapenetpart -------------------------------------------
    Bs, Ns = (4, 128) if small else (16, 2048)
    scfg = ConfigDict({
        "optimizer": {"type": "AdamW", "part": "all",
                      "kwargs": {"lr": 2e-4, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR",
                      "kwargs": {"epochs": 300, "initial_epochs": 10}},
        "model": {"NAME": "PointTransformerPartSeg", "trans_dim": dim,
                  "depth": 12, "drop_path_rate": 0.1, "cls_dim": 50,
                  "num_heads": 2 if dim == 64 else 6, "group_size": S,
                  "num_group": G, "encoder_dims": dim, "dtype": "bf16"},
        "npoints": Ns, "total_bs": Bs, "max_epoch": 300,
        "grad_norm_clip": 10,
    })
    smodel = build_model_from_cfg(scfg["model"])
    spts = jnp.asarray(rng.normal(size=(Bs, Ns, 3)).astype(np.float32))
    cls1h = jnp.zeros((Bs, 16), jnp.float32).at[:, 0].set(1.0)
    seg = jnp.asarray(rng.integers(0, 50, size=(Bs, Ns)).astype(np.int32))
    sv = jax.jit(lambda: smodel.init(
        {"params": key, "dropout": key, "droppath": key}, spts, cls1h,
        train=True))()
    stx, _ = build_optimizer(scfg, sv["params"], steps_per_epoch=100,
                             grad_norm_clip=10.0)
    sstate = TrainState.create(smodel.apply, sv["params"],
                               sv.get("batch_stats", {}), stx)
    sstep = make_seg_train_step(smodel, scfg, mesh=None)
    shold = {"s": sstate}

    def seg_fn():
        shold["s"], m = sstep(shold["s"], spts, cls1h, seg,
                              jax.random.fold_in(key, 3))
        return m

    timeloop(f"partseg_shapenetpart_train_step[bs{Bs},N{Ns}]", seg_fn, Bs)


if __name__ == "__main__":
    main()
