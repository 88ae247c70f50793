#!/usr/bin/env python
"""Interleaved A/B of the FULL flagship train step across folding-head
implementations at the bench shapes (bs 256, raw (256, 8192, 6)):

  - fused_fold: the Pallas kernel (ops/pallas_folding.py) that keeps the
    expanded (tile*36, 384) hiddens in VMEM (fold_impl auto, the default)
  - xla_fold: the unfused SplitMLP path (fold_impl xla)
  - xla_fold_remat: unfused + nn.remat (the escape-hatch knob)

Why: the per-HLO roofline breakdown ranks the folding head's saved
(B, M, 36, 384) bf16 hiddens (361 MB each at bs 256) as the step's largest
HBM tensors, plus the layout copies/async slices XLA stages them through.

Like tools/profile_dgcnn.py: measure the variants INTERLEAVED over several
rounds with health probes between rounds, take best-of per variant, flag
the verdict if any probe is degraded.

Prints one JSON line per measurement and a final {"name": "verdict", ...}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, iters=8, b=256):
    import jax

    try:
        out = fn()
    except Exception as e:
        print(json.dumps({"name": name, "error": type(e).__name__,
                          "detail": str(e)[:200]}), flush=True)
        return float("inf")
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 2),
                      "per_item_ms": round(dt * 1e3 / b, 4)}), flush=True)
    return dt


def main():
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_dae_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bench import DEGRADED_TFLOPS, _wait_for_healthy_device, probe_tflops

    tflops = _wait_for_healthy_device()
    print(f"# probe {tflops:.0f} TFLOP/s", file=sys.stderr, flush=True)

    from __graft_entry__ import FLAGSHIP_CONFIG
    from point_dae_tpu.engine.pretrain import init_model, make_train_step
    from point_dae_tpu.engine.train_state import TrainState, build_optimizer
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.utils.config import ConfigDict

    B = 256
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(size=(B, 8192, 6)).astype(np.float32))
    key = jax.random.key(0)

    runners = {}
    variants = {"fused_fold": {"fold_impl": "auto"},
                "xla_fold": {"fold_impl": "xla"},
                "xla_fold_remat": {"fold_impl": "xla", "remat_fold": "True"}}
    for name, tweaks in variants.items():
        cfg = copy.deepcopy(FLAGSHIP_CONFIG)
        cfg["model"]["transformer_config"].update(tweaks)
        cfg["total_bs"] = B
        config = ConfigDict(cfg)
        model = build_model_from_cfg(config["model"])
        params, bs = init_model(model, config, raw)
        tx, _ = build_optimizer(config, params, steps_per_epoch=100,
                                grad_norm_clip=None)
        holder = {"s": TrainState.create(model.apply, params, bs, tx)}
        step = make_train_step(model, config, mesh=None)

        def run(step=step, holder=holder):
            holder["s"], m = step(holder["s"], raw, key, jnp.float32(0.5))
            return m

        try:
            m = run()
            _ = float(jax.tree_util.tree_leaves(m)[0].reshape(-1)[0])
        except Exception as e:
            print(json.dumps({"name": f"step[{name}]",
                              "error": type(e).__name__,
                              "detail": str(e)[:200]}), flush=True)
            continue
        runners[name] = run

    if not runners:
        print(json.dumps({"name": "verdict", "error": "no variant ran"}),
              flush=True)
        return
    best = {k: float("inf") for k in runners}
    probes = []
    for r in range(3):
        probes.append(round(probe_tflops(iters=5), 1))
        for k, fn in runners.items():
            dt = timeit(f"step[{k}]@r{r}", fn)
            best[k] = min(best[k], dt)
    probes.append(round(probe_tflops(iters=5), 1))
    print(json.dumps({
        "name": "verdict",
        "best_variant": min(best, key=best.get),
        "step_ms": {k: round(v * 1e3, 2) for k, v in best.items()},
        "clouds_per_sec": {k: round(B / v, 1) for k, v in best.items()},
        "probe_tflops_per_round": probes,
        "degraded": min(probes) < DEGRADED_TFLOPS}), flush=True)


if __name__ == "__main__":
    main()
