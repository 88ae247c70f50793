#!/usr/bin/env python
"""Micro-A/B of row-gather/resample variants at pipeline shapes.

The one-hot MXU gather's cost scales with N*Q/128^2 weight-load passes,
XLA's per-element gather with Q rows — so the kernel wins at small N /
large Q and loses at N=8192. This tool measures both at the shapes the
pipelines actually use, to set the dispatch gates from data.

Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, iters=16):
    import jax

    try:
        out = fn(*args)
    except Exception as e:
        print(json.dumps({"name": name, "error": type(e).__name__,
                          "detail": str(e)[:200]}), flush=True)
        return float("inf")
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 3)}), flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_dae_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bench import probe_tflops

    print(json.dumps({"name": "probe_tflops",
                      "value": round(probe_tflops(iters=5), 1)}), flush=True)

    from point_dae_tpu.ops.pallas_scatter import (
        gather_by_key_small_c_pallas, gather_rows_small_c_pallas)

    rng = np.random.default_rng(0)
    B = 256

    for (N, Q, C) in [(8192, 1024, 3), (8192, 1024, 6), (1024, 2048, 3),
                      (2048, 1024, 3), (4096, 1024, 3)]:
        x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, size=(B, Q)).astype(np.int32))
        tag = f"B{B}xN{N}xC{C}->Q{Q}"
        timeit(f"xla_take_along[{tag}]",
               jax.jit(lambda a, i: jnp.take_along_axis(a, i[..., None], 1)),
               x, idx)
        timeit(f"onehot_kernel[{tag}]",
               jax.jit(gather_rows_small_c_pallas), x, idx)
        # masked variants (all-true mask: worst case for argsort, same
        # cost for the kernels)
        mask = jnp.ones((B, N), bool)
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
        keys_ = jnp.where(mask, rank, -1)
        timeit(f"rank_keyed_kernel[{tag}]",
               jax.jit(gather_by_key_small_c_pallas), x, keys_, idx)

        def argsort_pack(a, m, d):
            order = jnp.argsort(jnp.where(m, 0, 1), axis=1, stable=True)
            pos = jnp.take_along_axis(order, d, axis=1)
            return jnp.take_along_axis(a, pos[..., None], axis=1)

        timeit(f"argsort_pack_gather[{tag}]", jax.jit(argsort_pack),
               x, mask, idx)

    print(json.dumps({"name": "probe_tflops_end",
                      "value": round(probe_tflops(iters=5), 1)}), flush=True)


if __name__ == "__main__":
    main()
