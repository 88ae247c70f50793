#!/usr/bin/env python
"""Benchmark: ShapeNet-scale pretrain throughput (clouds/sec/chip) on the
flagship transformer DAE (PointCAE_transformer_fc_global_folding_local,
bs-per-chip 256 = the reference recipe's ENTIRE 8-GPU global batch on one
chip, 1024 points, G64xS32, the rerun2.sh recipe shapes).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}; the
second released pipeline (Point_CAE_DGCNN_FCOnly, rerun.sh recipe, bs 128)
rides along in a "secondary" field of the same line so both pipelines are
regression-tracked in BENCH_r*.json without breaking the one-line contract.
No reference throughput number exists (BASELINE.md: published = {}), so
vs_baseline is reported as null.
"""
import json
import os
import sys
import time


# below this probed matmul rate the device is considered degraded: the
# health gate keeps waiting, the measurement schedule shrinks, and the
# output JSON is flagged (single constant so the three sites never diverge)
DEGRADED_TFLOPS = 20.0


def probe_tflops(iters: int = 20) -> float:
    """One health-probe sample: achieved TFLOP/s of a 4096^2 bf16 matmul.
    The single source of the probe definition (also used by
    tools/profile_dgcnn.py and tools/hw_watch.sh). Completion is forced via
    a device-side scalar read: float(y[0, 0]) moves 4 bytes, whereas
    np.asarray(y) would pull the whole 32 MiB matrix through the tunnel
    and conflate compute with transfer bandwidth."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    y = f(x)
    _ = float(y[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x)
    _ = float(y[0, 0])
    return 2 * 4096 ** 3 * iters / (time.perf_counter() - t0) / 1e12


def _wait_for_healthy_device(min_tflops: float = DEGRADED_TFLOPS,
                             tries: int = 8,
                             sleep_s: float = 45.0) -> float:
    """The axon TPU tunnel occasionally degrades transiently (observed
    ~1.5-4 TFLOP/s on a 4k bf16 matmul vs ~150 healthy, sometimes for
    hours). Benchmarking a degraded device records a meaningless number, so
    probe with a calibration matmul and wait (bounded to ~6 min so the whole
    bench always fits the driver's timeout — a degraded-but-reported number
    beats a timeout with no number). Returns the last probed TFLOP/s so the
    caller can flag the output as degraded instead of suppressing it."""
    tflops = 0.0
    for attempt in range(tries):
        tflops = probe_tflops()
        if tflops >= min_tflops:
            return tflops
        print(f"# device degraded ({tflops:.1f} TFLOP/s), waiting...",
              file=sys.stderr)
        if attempt < tries - 1:
            time.sleep(sleep_s)
    print(f"# WARNING: device still degraded after {tries} tries; "
          f"benchmarking anyway and flagging output", file=sys.stderr)
    return tflops


def main():
    import jax

    from point_dae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    t_start = time.perf_counter()
    probe_tflops = _wait_for_healthy_device()
    print(f"# health gate done at t={time.perf_counter() - t_start:.0f}s "
          f"({probe_tflops:.0f} TFLOP/s)", file=sys.stderr, flush=True)

    sys.path.insert(0, ".")
    from __graft_entry__ import FLAGSHIP_CONFIG
    from point_dae_tpu.engine.pretrain import init_model, make_train_step
    from point_dae_tpu.engine.train_state import TrainState, build_optimizer
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.utils.config import ConfigDict

    config = ConfigDict(FLAGSHIP_CONFIG)
    config["total_bs"] = 256
    model = build_model_from_cfg(config["model"])

    B, Nraw = 256, 8192
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(size=(B, Nraw, 6)).astype(np.float32))

    params, batch_stats = init_model(model, config, raw)
    tx, _ = build_optimizer(config, params, steps_per_epoch=100,
                            grad_norm_clip=None)
    state = TrainState.create(model.apply, params, batch_stats, tx)
    step = make_train_step(model, config, mesh=None)
    # note: a k=5 scan-fused dispatch (make_train_step_multi) measures the
    # same rate — async dispatch already hides launch latency when steps are
    # enqueued back-to-back, so the simpler single-step loop is kept here

    print(f"# init done at t={time.perf_counter() - t_start:.0f}s",
          file=sys.stderr, flush=True)
    key = jax.random.key(0)
    gw = jnp.float32(0.5)
    # warmup / compile
    state, m = step(state, raw, key, gw)
    _ = float(m["loss_xyz"])
    print(f"# compile+warmup done at t={time.perf_counter() - t_start:.0f}s",
          file=sys.stderr, flush=True)

    # best of 3 rounds: remote-device tunnels occasionally degrade
    # transiently; the best round reflects steady-state capability.
    # On a degraded device, shrink the measurement so a number is still
    # reported inside the driver's budget.
    rounds, iters = (3, 16) if probe_tflops >= DEGRADED_TFLOPS else (1, 4)
    best_dt = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            state, m = step(state, raw, sub, gw)
        # force a real device round-trip: through the axon tunnel,
        # block_until_ready alone can return before execution finishes
        _ = float(m["loss_xyz"])
        best_dt = min(best_dt, (time.perf_counter() - t0) / iters)
    cps = B / best_dt

    out = {
        "metric": "pretrain_throughput_flagship_transformer",
        "value": round(cps, 2),
        "unit": "clouds/sec/chip",
        "vs_baseline": None,
    }
    if probe_tflops < DEGRADED_TFLOPS:
        out["degraded"] = True
        out["probe_tflops"] = round(probe_tflops, 1)

    # secondary metric: the non-transformer released pipeline (rerun.sh
    # recipe), guarded by remaining time so the flagship line always lands
    # inside the watchdog budget even if the DGCNN compile is cold
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "1080"))
    if time.perf_counter() - t_start < deadline - 240:
        try:
            out["secondary"] = _bench_dgcnn(probe_tflops)
        except Exception as e:  # noqa: BLE001 — never lose the flagship line
            out["secondary"] = {"metric": "pretrain_throughput_dgcnn_fconly",
                                "error": f"{type(e).__name__}: {e}"[:200]}
    else:
        print("# skipping secondary (dgcnn) bench: out of time budget",
              file=sys.stderr, flush=True)

    # end-to-end cached-pretrain metric (VERDICT r04 missing #1): the
    # device-resident dataset path — epoch permutation + in-scan gathers +
    # train steps — timed wall-clock over >=200 steps, so "training
    # throughput" is an END-TO-END number, not a resident-tensor step rate
    if time.perf_counter() - t_start < deadline - 200:
        try:
            out["e2e_cached"] = _bench_e2e_cached(
                probe_tflops, model, config, state, raw, device_cps=cps)
        except Exception as e:  # noqa: BLE001 — never lose the flagship line
            out["e2e_cached"] = {"metric": "pretrain_throughput_e2e_cached",
                                 "error": f"{type(e).__name__}: {e}"[:200]}
    else:
        print("# skipping e2e cached bench: out of time budget",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


def _bench_dgcnn(probe_tflops: float) -> dict:
    """Point_CAE_DGCNN_FCOnly full pretrain step, rerun.sh recipe shapes
    (bs 128, N 1024, affine_r3 + dropout_local device corruption,
    edgeconv_impl auto => fused_pallas on TPU)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_dae_tpu.engine.pretrain import init_model, make_train_step
    from point_dae_tpu.engine.train_state import TrainState, build_optimizer
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.utils.config import ConfigDict

    B = 128
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
                  "loss": "cdl2", "dtype": "bf16"},
        "npoints": 1024, "total_bs": B, "step_per_update": 1,
        "max_epoch": 1200, "loss_type": "xyznormal_gradual",
    })
    model = build_model_from_cfg(config["model"])
    rng = np.random.default_rng(1)
    raw = jnp.asarray(rng.normal(size=(B, 8192, 6)).astype(np.float32))
    params, batch_stats = init_model(model, config, raw)
    tx, _ = build_optimizer(config, params, steps_per_epoch=100,
                            grad_norm_clip=None)
    state = TrainState.create(model.apply, params, batch_stats, tx)
    step = make_train_step(model, config, mesh=None)
    key = jax.random.key(1)
    gw = jnp.float32(0.5)
    state, m = step(state, raw, key, gw)
    _ = float(m["loss_xyz"])
    rounds, iters = (3, 8) if probe_tflops >= DEGRADED_TFLOPS else (1, 3)
    best_dt = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            state, m = step(state, raw, sub, gw)
        _ = float(m["loss_xyz"])
        best_dt = min(best_dt, (time.perf_counter() - t0) / iters)
    sec = {"metric": "pretrain_throughput_dgcnn_fconly",
           "value": round(B / best_dt, 2),
           "unit": "clouds/sec/chip", "vs_baseline": None}
    if probe_tflops < DEGRADED_TFLOPS:
        sec["degraded"] = True
    return sec


def _bench_e2e_cached(probe_tflops: float, model, config, state, raw,
                      device_cps: float) -> dict:
    """Flagship pretrain fed by the device-resident cache
    (data/device_cache.py): a synthetic ShapeNet-55-shaped corpus is
    uploaded once, then >=200 optimizer steps run with the per-step batch
    gather staged INSIDE the scan-fused dispatch
    (engine.make_train_step_multi_cached) across real epoch boundaries
    (device-side reshuffle each epoch). Wall-clock end-to-end."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_dae_tpu.data.device_cache import DeviceCache
    from point_dae_tpu.engine.pretrain import make_train_step_multi_cached

    B = int(config["total_bs"])
    M, spd = 2048, 8
    rng = np.random.default_rng(7)
    clouds = rng.normal(size=(M,) + raw.shape[1:]).astype(np.float32)
    cache = DeviceCache(clouds, mesh=None, dtype=jnp.float16, seed=0)
    cstep = make_train_step_multi_cached(model, config, mesh=None, k=spd,
                                         batch_size=B)
    key = jax.random.key(2)
    gw = jnp.float32(0.5)
    steps_per_epoch = cache.steps_per_epoch(B)          # 8 at M=2048, B=256
    chunks_per_epoch = steps_per_epoch // spd
    # warmup/compile chunk (not timed)
    cache.set_epoch(0)
    data, perm = cache.epoch_arrays()
    state, m = cstep(state, data, perm, jnp.int32(0), key, gw)
    _ = float(m["loss_xyz"])

    n_epochs = 25 if probe_tflops >= DEGRADED_TFLOPS else 6
    t0 = time.perf_counter()
    for epoch in range(1, n_epochs + 1):
        cache.set_epoch(epoch)
        data, perm = cache.epoch_arrays()
        for ci in range(chunks_per_epoch):
            key, sub = jax.random.split(key)
            state, m = cstep(state, data, perm,
                             jnp.int32(ci * spd * B), sub, gw)
    _ = float(m["loss_xyz"])
    steps = n_epochs * chunks_per_epoch * spd
    dt = (time.perf_counter() - t0) / steps
    sec = {"metric": "pretrain_throughput_e2e_cached",
           "value": round(B / dt, 2), "unit": "clouds/sec/chip",
           "vs_baseline": None, "steps": steps,
           "upload_s": round(cache.upload_seconds, 1),
           "pct_of_device_rate": round(100.0 * (B / dt) / device_cps, 1)}
    if probe_tflops < DEGRADED_TFLOPS:
        sec["degraded"] = True
    return sec


def _fallback_line(reason: str) -> None:
    print(json.dumps({
        "metric": "pretrain_throughput_flagship_transformer",
        "value": 0.0,
        "unit": "clouds/sec/chip",
        "vs_baseline": None,
        "degraded": True,
        "error": reason[:300],
    }))
    sys.stdout.flush()


if __name__ == "__main__":
    # Watchdog: a fully wedged device tunnel hangs INSIDE jax calls (even
    # the probe matmul never returns — observed for hours at a time), which
    # no try/except can catch. Run the bench on a worker thread and, past
    # the deadline, print the fallback JSON line and exit 0 so the driver
    # always records something.
    import threading

    deadline = float(os.environ.get("BENCH_DEADLINE_S", "1080"))
    state = {"done": False, "err": None}

    def body():
        try:
            main()
            state["done"] = True
        except Exception as e:  # noqa: BLE001
            state["err"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=body, daemon=True)
    t.start()
    t.join(timeout=deadline)
    if state["done"]:
        sys.exit(0)
    if state["err"] is not None:
        _fallback_line(state["err"])
        sys.exit(0)
    _fallback_line(f"device unresponsive within {deadline:.0f}s budget")
    os._exit(0)   # jax call still hung on the worker thread
