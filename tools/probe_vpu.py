#!/usr/bin/env python
"""Micro-probe: is the flagship step VPU-bound on transcendentals?

profile_decompose r04 showed even the pure MLP (16384x384 @ 384x1536,
bf16) running at ~30% MFU — a shape that is firmly compute-bound on paper.
Candidate explanation: the elementwise ops BETWEEN the matmuls (exact-erf
GELU, f32 softmax exp, LayerNorm rsqrt) run on the VPU at ~1e12 op/s and
serialize against the MXU. This times the pieces in isolation at the
flagship's exact shapes (B=256, T=64, C=384, H=6, hidden=1536):

  matmul_only        fc1+fc2, no activation between
  mlp_gelu_exact     fc1 -> erf-GELU -> fc2      (the recipe's math)
  mlp_gelu_tanh      fc1 -> tanh-GELU -> fc2
  mlp_relu           fc1 -> ReLU -> fc2          (cheapest nonlinearity)
  gelu_exact_alone   erf-GELU on the (16384, 1536) hidden
  softmax_f32        jax.nn.softmax on (256, 6, 64, 64) f32
  layernorm_f32      nn.LayerNorm shapes (256, 64, 384) f32

Prints one JSON line each {"name", "ms"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, iters=30):
    import jax

    out = fn(*args)
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


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_dae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bench import _wait_for_healthy_device, probe_tflops

    t = _wait_for_healthy_device()
    print(f"# probe {t:.0f} TFLOP/s", flush=True)

    rng = np.random.default_rng(0)
    BT, C, HID = 256 * 64, 384, 1536
    x = jnp.asarray(rng.normal(size=(BT, C)).astype(np.float32)).astype(
        jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(C, HID)).astype(np.float32) * 0.05
                     ).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(HID, C)).astype(np.float32) * 0.05
                     ).astype(jnp.bfloat16)

    timeit("matmul_only", jax.jit(lambda a: (a @ w1) @ w2), x)
    timeit("mlp_gelu_exact", jax.jit(
        lambda a: jax.nn.gelu(a @ w1, approximate=False) @ w2), x)
    timeit("mlp_gelu_tanh", jax.jit(
        lambda a: jax.nn.gelu(a @ w1, approximate=True) @ w2), x)
    timeit("mlp_relu", jax.jit(
        lambda a: jax.nn.relu(a @ w1) @ w2), x)

    h = jnp.asarray(rng.normal(size=(BT, HID)).astype(np.float32)).astype(
        jnp.bfloat16)
    timeit("gelu_exact_alone", jax.jit(
        lambda a: jax.nn.gelu(a, approximate=False)), h)
    timeit("gelu_tanh_alone", jax.jit(
        lambda a: jax.nn.gelu(a, approximate=True)), h)

    s = jnp.asarray(rng.normal(size=(256, 6, 64, 64)).astype(np.float32))
    timeit("softmax_f32", jax.jit(lambda a: jax.nn.softmax(a, axis=-1)), s)
    timeit("softmax_bf16", jax.jit(
        lambda a: jax.nn.softmax(a.astype(jnp.bfloat16), axis=-1)), s)

    import flax.linen as nn
    r = jnp.asarray(rng.normal(size=(256, 64, C)).astype(np.float32))
    ln = nn.LayerNorm()
    p = ln.init(jax.random.key(0), r)
    timeit("layernorm_f32", jax.jit(lambda a: ln.apply(p, a)), r)

    # the full attention core at encoder+decoder shapes (no projections)
    q = jnp.asarray(rng.normal(size=(256, 6, 64, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    timeit("attn_core_T64", jax.jit(
        lambda a: jnp.einsum(
            "bhnm,bhmd->bhnd",
            jax.nn.softmax(jnp.einsum(
                "bhnd,bhmd->bhnm", a, a,
                preferred_element_type=jnp.float32) * 0.125, axis=-1), a)),
        q)

    print(f"# probe end {probe_tflops():.0f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
