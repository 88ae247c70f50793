#!/usr/bin/env python
"""Per-piece DGCNN step profiler (run on the real TPU chip).

Times the full Point_CAE_DGCNN_FCOnly pretrain step and the isolated hot
pieces of the EdgeConv stack (kNN distance+top_k, neighbor gather, edge
conv matmul, BN+relu+max) at the rerun.sh recipe shape (bs 256, N 1024,
k 20) so kernel work targets the measured bottleneck instead of a guess.

Prints one JSON line per measurement: {"name", "ms", "per_item_ms"}.
"""
import json
import os
import sys
import time

# repo root on sys.path regardless of cwd (bench + point_dae_tpu imports)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, iters=8, b=256):
    import jax

    try:
        out = fn(*args)
    except Exception as e:  # OOM on one piece must not kill the battery
        print(json.dumps({"name": name, "error": type(e).__name__,
                          "detail": str(e)[:200]}), flush=True)
        return float("inf")
    jax.block_until_ready(out)
    # force a real round-trip (axon tunnel: block_until_ready can return
    # before execution finishes)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 2),
                      "per_item_ms": round(dt * 1e3 / b, 4)}), flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_dae_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bench import DEGRADED_TFLOPS, _wait_for_healthy_device, probe_tflops

    tflops = _wait_for_healthy_device()
    print(f"# probe {tflops:.0f} TFLOP/s", file=sys.stderr, flush=True)

    from point_dae_tpu.engine.pretrain import init_model, make_train_step
    from point_dae_tpu.engine.train_state import TrainState, build_optimizer
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.models.dgcnn import get_graph_feature
    from point_dae_tpu.ops import knn
    from point_dae_tpu.utils.config import ConfigDict

    B, N, k = 256, 1024, 20
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(size=(B, 8192, 6)).astype(np.float32))
    x3 = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    x128 = jnp.asarray(rng.normal(size=(B, N, 128)).astype(np.float32))

    config = ConfigDict({
        "optimizer": {"type": "AdamW", "part": "all",
                      "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 300,
                                                  "initial_epochs": 10}},
        # corruption lives in DATASET corrupt_type like the real recipe
        # (cfgs/pretrain_PointCAE_affine_r3_dropout_local_4xlonger.yaml):
        # device_pipeline runs affine compose + dropout_local + masked
        # resample per cloud per step — in model corrupt_type those names
        # are ignored (apply_input_dropout only acts on dropout_patch/
        # global), which would profile a lighter step than the recipe
        "dataset": {"train": {"others": {"npoints": 1024,
                                         "aug_type": ["norm"],
                                         "corrupt_type": ["affine_r3",
                                                          "dropout_local"]}}},
        "model": {"NAME": "Point_CAE_DGCNN_FCOnly",
                  "corrupt_type": ["affine_r3", "dropout_local"],
                  "loss": "cdl2", "dtype": "bf16"},
        "npoints": 1024, "total_bs": B, "step_per_update": 1,
        "max_epoch": 300, "loss_type": "xyznormal_gradual",
    })
    model = build_model_from_cfg(config["model"])
    params, batch_stats = init_model(model, config, raw)
    tx, _ = build_optimizer(config, params, steps_per_epoch=100,
                            grad_norm_clip=None)
    state = TrainState.create(model.apply, params, batch_stats, tx)
    step = make_train_step(model, config, mesh=None)
    key = jax.random.key(0)
    # the step donates its state: thread it through repeated timed calls
    holder = {"s": state}

    def run_step():
        holder["s"], m = step(holder["s"], raw, key, jnp.float32(0.5))
        return m

    timeit("full_train_step", run_step)

    # pieces (forward only, jitted in isolation)
    knn_j = jax.jit(lambda a: knn(a, a, k)[1])
    timeit("knn_C3", knn_j, x3)
    knn128 = jax.jit(lambda a: knn(a, a, k)[1])
    timeit("knn_C128", knn128, x128)

    idx = knn_j(x3)
    gf = jax.jit(lambda a, i: get_graph_feature(a, k, idx=i,
                                                dtype=jnp.bfloat16))
    timeit("graph_feature_C128", gf, x128, idx)

    w = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    conv = jax.jit(lambda e, w: jnp.max(
        jax.nn.leaky_relu(jnp.einsum("bnkc,cd->bnkd",
                                     e.astype(jnp.bfloat16),
                                     w.astype(jnp.bfloat16)), 0.2), axis=2))
    edge = gf(x128, idx)
    timeit("conv_relu_max_C256", conv, edge, w)

    # encoder fwd+bwd A/B across EdgeConv implementations (one shared
    # param tree: FusedEdgeConv keeps EdgeConv's exact layout). Run at
    # B=64: the standalone reference bwd at B=256 materializes the
    # (B,N,k,2C) leaky_relu/max residuals of all four layers (>10 GiB)
    # and OOMs a single chip — per_item_ms stays comparable, and the
    # decisive number is the interleaved full-step A/B below anyway.
    from point_dae_tpu.models.dgcnn import DGCNNEncoder

    del edge, idx  # free the (B,N,k,256) profiling buffers
    Bm = 64
    x3s = x3[:Bm]
    ev = None
    for impl in ("reference", "fused", "fused_pallas"):
        enc = DGCNNEncoder(k=k, dtype=jnp.bfloat16, impl=impl)
        if ev is None:
            ev = jax.jit(lambda: enc.init({"params": jax.random.key(0)}, x3s,
                                          train=True))()

        def enc_loss(p, bs, a, enc=enc):
            (g, _), _ = enc.apply({"params": p, "batch_stats": bs}, a,
                                  train=True, mutable=["batch_stats"])
            return jnp.sum(g * g)

        fwd = jax.jit(enc_loss)
        timeit(f"encoder_fwd[{impl}]", fwd, ev["params"],
               ev["batch_stats"], x3s, b=Bm)
        bwd = jax.jit(jax.grad(enc_loss))
        timeit(f"encoder_fwd_bwd[{impl}]", bwd, ev["params"],
               ev["batch_stats"], x3s, b=Bm)

    # full train step with each EdgeConv restructuring (three-way A/B at
    # the level that decides the dispatch default). The tunnel degrades
    # transiently for long stretches, so a single-shot sequential A/B can
    # be decided by drift rather than by the kernels: measure all three
    # impls INTERLEAVED over several rounds, take best-of per impl, and
    # re-probe device health each round so a drift-poisoned verdict is
    # flagged instead of silently recorded.
    runners = {}
    for impl in ("reference", "fused", "fused_pallas"):
        config["model"]["edgeconv_impl"] = impl
        model2 = build_model_from_cfg(config["model"])
        params2, bs2 = init_model(model2, config, raw)
        tx2, _ = build_optimizer(config, params2, steps_per_epoch=100,
                                 grad_norm_clip=None)
        holder2 = {"s": TrainState.create(model2.apply, params2, bs2, tx2)}
        step2 = make_train_step(model2, config, mesh=None)

        def run_step2(step2=step2, holder2=holder2):
            holder2["s"], m = step2(holder2["s"], raw, key, jnp.float32(0.5))
            return m

        # compile + warm up outside the timed rounds
        try:
            m = run_step2()
            _ = float(jax.tree_util.tree_leaves(m)[0].reshape(-1)[0])
        except Exception as e:
            print(json.dumps({"name": f"full_train_step[{impl}]",
                              "error": type(e).__name__,
                              "detail": str(e)[:200]}), flush=True)
            continue
        runners[impl] = run_step2

    if not runners:
        print(json.dumps({"name": "verdict", "error": "no impl ran"}),
              flush=True)
        return
    best = {impl: float("inf") for impl in runners}
    probes = []
    for r in range(3):
        probes.append(round(probe_tflops(iters=5), 1))
        for impl, fn in runners.items():
            dt = timeit(f"full_train_step[{impl}]@r{r}", fn)
            best[impl] = min(best[impl], dt)
    # closing probe: degradation that starts DURING the last round would
    # otherwise skew its timings while every pre-round probe read healthy
    probes.append(round(probe_tflops(iters=5), 1))
    print(json.dumps({"name": "verdict",
                      "best_impl": min(best, key=best.get),
                      "step_ms": {k: round(v * 1e3, 2)
                                  for k, v in best.items()},
                      "probe_tflops_per_round": probes,
                      "degraded": min(probes) < DEGRADED_TFLOPS}), flush=True)


if __name__ == "__main__":
    main()
