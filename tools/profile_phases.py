#!/usr/bin/env python
"""Phase profiler: times the NON-model parts of the two released pretrain
steps in isolation so byte-cut work targets measurement, not guesses.

The kernel profilers (tools/profile_dgcnn.py) cover the encoder; this tool
covers the rest of the step: on-device corruption pipeline (augment +
affine compose + dropout_local + masked resample), clean-stream resample,
chamfer loss fwd/bwd, and the AdamW update — at the recipe shapes
(rerun.sh: bs 256 N 8192->1024 affine_r3+dropout_local;
rerun2.sh flagship: bs 256, aug norm + clean + resample).

Prints one JSON line per measurement: {"name", "ms", "per_item_ms"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, iters=8, b=256):
    import jax

    try:
        out = fn(*args)
    except Exception as e:  # one failing phase must not kill the battery
        print(json.dumps({"name": name, "error": type(e).__name__,
                          "detail": str(e)[:200]}), flush=True)
        return float("inf")
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])  # force a real round-trip (axon tunnel)
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
    from bench import _wait_for_healthy_device

    tflops = _wait_for_healthy_device()
    print(f"# probe {tflops:.0f} TFLOP/s", file=sys.stderr, flush=True)

    import functools

    from point_dae_tpu.data import corruptions as C
    from point_dae_tpu.engine.pretrain import device_pipeline
    from point_dae_tpu.losses.chamfer import chamfer_l2
    from point_dae_tpu.ops import resample_to

    B, Nraw, npts = 256, 8192, 1024
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(size=(B, Nraw, 6)).astype(np.float32))
    key = jax.random.key(0)

    # ---- the DGCNN-recipe pipeline and its pieces
    dg_pipe = jax.jit(functools.partial(
        device_pipeline, aug_type=("norm",),
        corrupt_type=("affine_r3", "dropout_local"), npoints=npts))
    timeit("pipeline[dgcnn: norm+affine_r3+dropout_local]", dg_pipe, key, raw)

    fl_pipe = jax.jit(functools.partial(
        device_pipeline, aug_type=("norm",), corrupt_type=("clean",),
        npoints=npts))
    timeit("pipeline[flagship: norm+clean]", fl_pipe, key, raw)

    xyz = raw[..., :3]

    def batched(fn):
        def run(k, pts):
            return jax.vmap(fn)(jax.random.split(k, pts.shape[0]), pts)
        return jax.jit(run)

    timeit("corrupt[affine_r3 only]", batched(functools.partial(
        C.corrupt_and_sample, types=("affine_r3",), npoints=npts)), key, xyz)
    timeit("corrupt[dropout_local only]", batched(functools.partial(
        C.corrupt_and_sample, types=("dropout_local",), npoints=npts)),
        key, xyz)

    def dl_mask(k, pts):
        return C.dropout_local(k, pts, jnp.ones(pts.shape[0], bool))
    timeit("dropout_local[mask only]", batched(dl_mask), key, xyz)

    def rsamp(k, pts):
        return resample_to(k, pts, jnp.ones(pts.shape[0], bool), npts)
    timeit("resample_to[masked] (per-row vmap)", batched(rsamp), key, xyz)

    from point_dae_tpu.ops import resample_batch

    def rsamp_b(k, pts):
        return resample_batch(k, pts, jnp.ones(pts.shape[:2], bool), npts)
    timeit("resample_batch[masked rank-keyed kernel]", jax.jit(rsamp_b),
           key, xyz)

    # ---- loss + optimizer costs at recipe shapes
    a = jnp.asarray(rng.normal(size=(B, npts, 3)).astype(np.float32))
    bpts = jnp.asarray(rng.normal(size=(B, npts, 3)).astype(np.float32))
    timeit("chamfer_l2[1024x1024 fwd]", jax.jit(chamfer_l2), a, bpts)
    timeit("chamfer_l2[1024x1024 fwd+bwd]",
           jax.jit(jax.grad(lambda x, y: chamfer_l2(x, y))), a, bpts)


if __name__ == "__main__":
    main()
