#!/usr/bin/env python
"""Attention-core A/B at flagship shapes (scan-marginal, in-dispatch).

Times layers.Attention fwd and fwd+bwd at the encoder (B 256, T 32) and
decoder (T 64) shapes under three dispatches — XLA einsum path, fused
Pallas kernel (ops/pallas_attn.py), and qkv+proj Dense only (attention
core removed) — so the fused kernel's win/loss decomposes into core cost
vs layout-transpose overhead.

Usage: PF_SKIP_GATE=1 python tools/profile_attn_ab.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_dae_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bench import _wait_for_healthy_device
    from tools.profile_marginal import marginal

    if not os.environ.get("PF_SKIP_GATE"):
        tflops = _wait_for_healthy_device()
        print(f"# probe {tflops:.0f} TFLOP/s", file=sys.stderr, flush=True)

    import flax.linen as nn
    from point_dae_tpu.models.layers import Attention

    B, H, d = 256, 6, 64
    C = H * d
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    for T in (32, 64):
        x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
        att = Attention(C, H, dtype=jnp.bfloat16)
        v = att.init(key, x)

        class QkvProj(nn.Module):
            @nn.compact
            def __call__(self, xi):
                q = nn.Dense(C * 3, use_bias=False, dtype=jnp.bfloat16,
                             name="qkv")(xi)
                # keep a data path through the same dense shapes
                o = q[..., :C] + q[..., C:2 * C] + q[..., 2 * C:]
                return nn.Dense(C, dtype=jnp.bfloat16, name="proj")(o)

        dmod = QkvProj()
        dv = dmod.init(key, x)

        def cases():
            yield "xla", att, v, {"PDAE_FUSED_ATTN": "0"}
            yield "fused", att, v, {"PDAE_FUSED_ATTN": "1"}
            yield "dense_only", dmod, dv, {}

        for name, mod, vv, env in cases():
            for kk, vvv in env.items():
                os.environ[kk] = vvv

            def make_fwd(R, mod=mod, vv=vv):
                def run():
                    def f(c, i):
                        o = mod.apply(vv, x + c)
                        return c + 1e-6 * jnp.sum(
                            o[0, 0, :3].astype(jnp.float32)), ()
                    out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                          jnp.arange(R, dtype=jnp.uint32))
                    return out
                return jax.jit(run)

            def make_bwd(R, mod=mod, vv=vv):
                def loss(xi):
                    return jnp.vdot(
                        mod.apply(vv, xi).astype(jnp.float32), cot)

                def run():
                    def f(c, i):
                        g = jax.grad(loss)(x + c)
                        return c + 1e-6 * jnp.sum(
                            g[0, 0, :3].astype(jnp.float32)), ()
                    out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                          jnp.arange(R, dtype=jnp.uint32))
                    return out
                return jax.jit(run)

            marginal(f"attn_T{T}_{name}_fwd", make_fwd, b=B)
            marginal(f"attn_T{T}_{name}_fwd_bwd", make_bwd, b=B)
            os.environ["PDAE_FUSED_ATTN"] = "0"


if __name__ == "__main__":
    main()
