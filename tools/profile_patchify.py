#!/usr/bin/env python
"""A/B the fused Pallas patchify front-end (ops/pallas_patchify.py) against
the unfused XLA path (FPS scan + top_k kNN), on real TPU.

Three measurements, all amortized over many enqueued dispatches so the
tunnel's ~26 ms fixed per-sync cost (evidence/PROBE_DISPATCH_r04.txt) does
not pollute the per-iteration number:
  1. correctness: fused idx vs XLA idx at flagship shapes; any mismatch must
     be a near-tie (|d_a - d_b| at f32 resolution).
  2. patchify-only latency, fused vs unfused.
  3. full flagship train step, fused vs unfused (PDAE_FUSED_PATCHIFY=0/auto
     is read at trace time, so the same process can build both variants).

Usage: python tools/profile_patchify.py [--iters 32]
"""
import argparse
import os
import sys
import time

import numpy as np

# repo root on sys.path regardless of cwd (bench + point_dae_tpu imports)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, args, iters, rounds=3):
    """Median-of-rounds amortized seconds per call; one sync per round."""
    import jax

    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--skip-step", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from point_dae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from bench import probe_tflops
    from point_dae_tpu.ops import geometry as G
    from point_dae_tpu.ops.pallas_patchify import fused_patchify_pallas

    print(f"# devices: {jax.devices()}", flush=True)
    p0 = probe_tflops()
    print(f"# probe before: {p0:.1f} TFLOP/s (tunnel-amortized)", flush=True)

    B, N, Grp, S = 256, 1024, 64, 32
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((B, N, 3)).astype(np.float32)
    x = jnp.asarray(pts)

    # --- 1. correctness on TPU
    @jax.jit
    def unfused(x):
        fps_idx = G.furthest_point_sample(x, Grp)
        center = G.gather_points(x, fps_idx)
        _, idx = G.knn(center, x, S)
        return fps_idx, idx

    fused = jax.jit(lambda x: fused_patchify_pallas(x, Grp, S))
    fa, ka = map(np.asarray, fused(x))
    fb, kb = map(np.asarray, unfused(x))
    fps_match = bool((fa == fb).all())
    mism = int((ka != kb).sum())
    print(f"fps match: {fps_match}; knn mismatches: {mism}/{kb.size}")
    if not fps_match:
        sys.exit("FPS mismatch — kernel bug")
    if mism:
        centers = pts[np.arange(B)[:, None], fa]          # (B, G, 3)
        bi, gi, si = np.nonzero(ka != kb)
        worst = 0.0
        for b, g, s in zip(bi, gi, si):
            d1 = ((pts[b, ka[b, g, s]] - centers[b, g]) ** 2).sum()
            d2 = ((pts[b, kb[b, g, s]] - centers[b, g]) ** 2).sum()
            worst = max(worst, abs(float(d1) - float(d2)))
        print(f"worst |d_fused - d_xla| among mismatches: {worst:.3e}")
        if worst > 1e-5:
            sys.exit("kNN mismatch beyond near-tie tolerance — kernel bug")

    # --- 2. patchify-only latency
    t_f = timeit(fused, (x,), args.iters)
    t_u = timeit(unfused, (x,), args.iters)
    print(f"patchify B{B} N{N} G{Grp} S{S}: fused {t_f*1e3:.3f} ms, "
          f"unfused {t_u*1e3:.3f} ms, speedup {t_u/t_f:.2f}x", flush=True)

    if args.skip_step:
        return

    # --- 3. full flagship step A/B (trace both variants via the env knob)
    sys.path.insert(0, ".")
    from __graft_entry__ import FLAGSHIP_CONFIG
    from point_dae_tpu.engine.pretrain import init_model, make_train_step
    from point_dae_tpu.engine.train_state import TrainState, build_optimizer
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.utils.config import ConfigDict

    config = ConfigDict(FLAGSHIP_CONFIG)
    config["total_bs"] = 256
    model = build_model_from_cfg(config["model"])
    raw = jnp.asarray(rng.normal(size=(256, 8192, 6)).astype(np.float32))
    params, batch_stats = init_model(model, config, raw)
    tx, _ = build_optimizer(config, params, steps_per_epoch=100,
                            grad_norm_clip=None)
    key = jax.random.key(0)
    gw = jnp.float32(0.5)

    results = {}
    for name, knob in (("fused", "auto"), ("unfused", "0")):
        os.environ["PDAE_FUSED_PATCHIFY"] = knob
        step = make_train_step(model, config, mesh=None)
        state = TrainState.create(model.apply, params, batch_stats, tx)
        state, m = step(state, raw, key, gw)    # compile
        _ = float(m["loss_xyz"])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            k = key
            for i in range(16):
                k, sub = jax.random.split(k)
                state, m = step(state, raw, sub, gw)
            _ = float(m["loss_xyz"])
            best = min(best, (time.perf_counter() - t0) / 16)
        results[name] = best
        print(f"flagship step [{name}]: {best*1e3:.2f} ms "
              f"({256/best:.1f} clouds/sec)", flush=True)
    os.environ["PDAE_FUSED_PATCHIFY"] = "auto"
    p1 = probe_tflops()
    print(f"# probe after: {p1:.1f} TFLOP/s", flush=True)
    print(f"step speedup fused vs unfused: "
          f"{results['unfused']/results['fused']:.3f}x")


if __name__ == "__main__":
    main()
