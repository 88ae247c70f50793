#!/usr/bin/env python
"""Decompose the flagship train step's ~67 ms into model sub-stacks,
each timed standalone on the TPU at the exact recipe shapes
(bs 256, G64 x S32, C384, enc depth 12 / dec depth 4, bf16 policy).

Round-4 motivation: the residual_bf16 / remat levers all measured
NEGATIVE (evidence/PROFILE_FLAGSHIP_AB_r04.txt) even though entry-edge
HBM accounting says the transformer stacks dominate traffic — so the §12
"HBM-bound on the stacks" model is at least incomplete. This tool
attributes the step wall-clock to: patch-embed fwd / fwd+bwd, encoder
stack fwd / fwd+bwd, decoder stack fwd / fwd+bwd, one isolated block,
bare attention, bare MLP — all real timed dispatches, not cost models —
so the next kernel goes where the milliseconds are.

Prints one JSON line per measurement {"name", "ms"}; sub-stack grads are
taken w.r.t. params AND inputs so the backward matches the in-step one.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, G, S, C = 256, 64, 32, 384
V = 32                      # packed visible capacity (rand_ratio >= 0.5)
DEPTH, DEC_DEPTH, HEADS = 12, 4, 6


def timeit(name, fn, *args, iters=12):
    import jax

    try:
        out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(leaf.reshape(-1)[0])
    except Exception as e:
        print(json.dumps({"name": name, "error": type(e).__name__,
                          "detail": str(e)[:160]}), flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 2)}), flush=True)


def fwd_and_bwd(apply_fn, params, *xs):
    """loss = sum(f(x)); returns (loss, grads wrt params+inputs) — the
    same backward structure the train step induces for this sub-stack."""
    import jax
    import jax.numpy as jnp

    def loss(p, *a):
        out = apply_fn(p, *a)
        return jnp.sum(out.astype(jnp.float32))

    return jax.value_and_grad(loss, argnums=tuple(range(len(xs) + 1)))(
        params, *xs)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_dae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bench import _wait_for_healthy_device, probe_tflops

    t = _wait_for_healthy_device()
    print(f"# probe {t:.0f} TFLOP/s", flush=True)

    from point_dae_tpu.models.layers import (Attention, PatchEncoder,
                                             TransformerBlock,
                                             TransformerDecoder,
                                             TransformerEncoder)

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    bf16 = jnp.bfloat16

    # in-step shapes: encoder runs on the PACKED visible buffer (B, V=32),
    # decoder on the full token set (B, G=64); patch embed on visible
    # patches only (embed_all=False default)
    x_vis = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))
    pos_vis = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))
    x_tok = jnp.asarray(rng.normal(size=(B, G, C)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(B, G, C)).astype(np.float32))
    groups = jnp.asarray(rng.normal(size=(B, V, S, 6)).astype(np.float32))
    key_mask = jnp.asarray(rng.random((B, V)) > 0.2)   # slot-valid mask

    # ---- encoder stack (12 blocks, PE re-added per block, key-masked)
    enc = TransformerEncoder(C, DEPTH, HEADS, drop_path_rate=0.0, dtype=bf16)
    p_enc = jax.jit(enc.init)(key, x_vis, pos_vis, key_mask)
    enc_fwd = jax.jit(lambda p, x, ps: enc.apply(p, x, ps, key_mask))
    timeit("enc12_fwd[V=32]", enc_fwd, p_enc, x_vis, pos_vis)
    enc_fb = jax.jit(functools.partial(
        fwd_and_bwd, lambda p, x, ps: enc.apply(p, x, ps, key_mask)))
    timeit("enc12_fwd_bwd[V=32]", enc_fb, p_enc, x_vis, pos_vis)

    # ---- decoder stack (4 blocks + final f32 LN, no mask)
    dec = TransformerDecoder(C, DEC_DEPTH, HEADS, dtype=bf16)
    p_dec = jax.jit(dec.init)(key, x_tok, pos)
    dec_fwd = jax.jit(lambda p, x, ps: dec.apply(p, x, ps))
    timeit("dec4_fwd[T=64]", dec_fwd, p_dec, x_tok, pos)
    dec_fb = jax.jit(functools.partial(
        fwd_and_bwd, lambda p, x, ps: dec.apply(p, x, ps)))
    timeit("dec4_fwd_bwd[T=64]", dec_fb, p_dec, x_tok, pos)

    # ---- patch embed (mini-PointNet, BN in train mode like the step)
    pe = PatchEncoder(C, dtype=bf16)
    pvars = jax.jit(functools.partial(pe.init, train=False))(key, groups)

    def pe_apply(p, g):
        out, _ = pe.apply(p, g, train=True, mutable=["batch_stats"])
        return out

    timeit("patch_embed_fwd[V=32]", jax.jit(pe_apply), pvars, groups)
    pe_fb = jax.jit(functools.partial(fwd_and_bwd, pe_apply))
    timeit("patch_embed_fwd_bwd[V=32]", pe_fb, pvars, groups)

    # ---- one isolated block / attention / MLP (scaling sanity, T=64)
    blk = TransformerBlock(C, HEADS, dtype=bf16)
    x2 = x_tok.reshape(B, G, C)
    p_blk = jax.jit(blk.init)(key, x2)
    timeit("block1_fwd", jax.jit(lambda p, x: blk.apply(p, x)), p_blk, x2)
    blk_fb = jax.jit(functools.partial(
        fwd_and_bwd, lambda p, x: blk.apply(p, x)))
    timeit("block1_fwd_bwd", blk_fb, p_blk, x2)

    attn = Attention(C, HEADS, dtype=bf16)
    p_att = jax.jit(attn.init)(key, x2)
    timeit("attn1_fwd", jax.jit(lambda p, x: attn.apply(p, x)), p_att, x2)

    # bare MLP at block shapes: fc1 -> gelu -> fc2
    import flax.linen as nn

    class Mlp(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(4 * C, dtype=bf16)(x)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(C, dtype=bf16)(h)

    mlp = Mlp()
    p_mlp = jax.jit(mlp.init)(key, x2)
    timeit("mlp1_fwd", jax.jit(lambda p, x: mlp.apply(p, x)), p_mlp, x2)
    mlp_fb = jax.jit(functools.partial(
        fwd_and_bwd, lambda p, x: mlp.apply(p, x)))
    timeit("mlp1_fwd_bwd", mlp_fb, p_mlp, x2)

    print(f"# probe end {probe_tflops():.0f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
