#!/usr/bin/env python
"""Interleaved A/B of the DGCNN FCOnly train step over EdgeConv backward
variants: grad_mode (first vs split) x tile size tn (128/256), plus the
reference layout as baseline. Same protocol as profile_flagship_ab2.

Usage: python tools/profile_dgcnn_ab2.py [--iters 8 --rounds 3 --batch 256]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "first_tn128": {"edgeconv_grad_mode": "first", "edgeconv_tn": 128},
    "split_tn128": {"edgeconv_grad_mode": "split", "edgeconv_tn": 128},
    "first_tn256": {"edgeconv_grad_mode": "first", "edgeconv_tn": 256},
    "first_tn512": {"edgeconv_grad_mode": "first", "edgeconv_tn": 512},
    "reference": {"edgeconv_impl": "reference"},
    # round 5: selection-value implementation (PDAE_EDGECONV_SEL) —
    # native dynamic gather (default) vs the one-hot MXU dots
    "gather_tn256": {"_SEL": "gather", "edgeconv_grad_mode": "first",
                     "edgeconv_tn": 256},
    "dot_tn256": {"_SEL": "dot", "edgeconv_grad_mode": "first",
                  "edgeconv_tn": 256},
    "gather_tn512": {"_SEL": "gather", "edgeconv_grad_mode": "first",
                     "edgeconv_tn": 512},
    "gather_tn1024": {"_SEL": "gather", "edgeconv_grad_mode": "first",
                      "edgeconv_tn": 1024},
    # round 5: packed-key selection (opt-in approximate argmin; column
    # index in the low mantissa bits -> one min-reduction per round)
    "packed_tn256": {"_ARGMIN": "packed", "edgeconv_grad_mode": "first",
                     "edgeconv_tn": 256},
    "packed_tn512": {"_ARGMIN": "packed", "edgeconv_grad_mode": "first",
                     "edgeconv_tn": 512},
    # round 5: hybrid kNN — XLA matmul+top_k indices feeding the lean
    # aggregate-from-idx kernel (PDAE_EDGECONV_KNN=xla)
    "hybrid_tn256": {"_KNN": "xla", "edgeconv_grad_mode": "first",
                     "edgeconv_tn": 256},
    "hybrid_tn512": {"_KNN": "xla", "edgeconv_grad_mode": "first",
                     "edgeconv_tn": 512},
    "hybrid_tn1024": {"_KNN": "xla", "edgeconv_grad_mode": "first",
                      "edgeconv_tn": 1024},
}


def build(name, over, B, raw):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_dae_tpu.engine.pretrain import init_model, make_train_step
    from point_dae_tpu.engine.train_state import TrainState, build_optimizer
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.utils.config import ConfigDict

    over = dict(over)
    os.environ["PDAE_EDGECONV_SEL"] = over.pop("_SEL", "dot")
    os.environ["PDAE_EDGECONV_KNN"] = over.pop("_KNN", "kernel")
    os.environ["PDAE_EDGECONV_ARGMIN"] = over.pop("_ARGMIN", "exact")
    config = ConfigDict({
        "optimizer": {"type": "AdamW", "part": "all",
                      "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 1200,
                                                  "initial_epochs": 10}},
        "dataset": {"train": {"others": {"npoints": 1024,
                                         "aug_type": ["norm"],
                                         "corrupt_type": ["affine_r3",
                                                          "dropout_local"]}}},
        "model": {"NAME": "Point_CAE_DGCNN_FCOnly",
                  "corrupt_type": ["affine_r3", "dropout_local"],
                  "loss": "cdl2", "dtype": "bf16",
                  "edgeconv_impl": "auto", **over},
        "npoints": 1024, "total_bs": B, "step_per_update": 1,
        "max_epoch": 1200, "loss_type": "xyznormal_gradual",
    })
    model = build_model_from_cfg(config["model"])
    params, batch_stats = init_model(model, config, raw)
    tx, _ = build_optimizer(config, params, steps_per_epoch=100,
                            grad_norm_clip=None)
    state = TrainState.create(model.apply, params, batch_stats, tx)
    return make_train_step(model, config, mesh=None), state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*",
                    default=["first_tn128", "split_tn128", "first_tn256"])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    names = args.variants or ["first_tn128", "split_tn128"]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_dae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bench import probe_tflops

    print(f"# probe start: {probe_tflops():.1f} TFLOP/s", flush=True)
    B = args.batch
    rng = np.random.default_rng(1)
    raw = jnp.asarray(rng.normal(size=(B, 8192, 6)).astype(np.float32))
    key = jax.random.key(1)
    gw = jnp.float32(0.5)

    steps, states = {}, {}
    for name in names:
        t0 = time.perf_counter()
        try:
            steps[name], states[name] = build(name, VARIANTS[name], B, raw)
            states[name], m = steps[name](states[name], raw, key, gw)
            loss = float(m["loss_xyz"])
        except Exception as e:  # noqa: BLE001 — e.g. VMEM overflow at tn=512
            print(f"# variant {name} failed: {type(e).__name__} "
                  f"{str(e)[:160]}", flush=True)
            steps.pop(name, None)
            continue
        print(f"# compiled {name} in {time.perf_counter()-t0:.0f}s "
              f"loss_xyz={loss:.5f}", flush=True)

    live = [n for n in names if n in steps]
    best = {n: float("inf") for n in live}
    for r in range(args.rounds):
        for name in live:
            k = jax.random.fold_in(key, r)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                k, sub = jax.random.split(k)
                states[name], m = steps[name](states[name], raw, sub, gw)
            _ = float(m["loss_xyz"])
            dt = (time.perf_counter() - t0) / args.iters
            best[name] = min(best[name], dt)
            print(f"round {r} {name}: {dt*1e3:.2f} ms", flush=True)
    print(f"# probe end: {probe_tflops():.1f} TFLOP/s", flush=True)
    for name in live:
        print(json.dumps({"variant": name, "best_ms": round(best[name]*1e3, 2),
                          "clouds_per_sec": round(B / best[name], 1)}))


if __name__ == "__main__":
    main()
