#!/usr/bin/env python
"""Scan-marginal profiler: true in-dispatch device cost of each flagship
piece, free of the axon tunnel's per-dispatch latency.

Round-4 finding (evidence/PROBE_DISPATCH_r04.txt): one jitted call through
the tunnel costs ~26 ms fixed (issue + sync readback) while the MARGINAL
matmul rate inside a dispatch is ~190 TFLOP/s — the loop-probe's ~60
TFLOP/s ceiling was measuring the tunnel, not the chip. Isolated per-piece
timings (tools/profile_flagship.py) are therefore dispatch-bound for
anything under ~10 ms. This profiler times each piece as
``lax.scan(piece, length=R)`` inside ONE dispatch for two different R and
reports the MARGINAL per-iteration cost — pure device time.

Each scanned piece folds the iteration index into its PRNG key and feeds a
data dependency through the carry so XLA cannot hoist or dedupe rounds.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R1, R2 = 4, 20


def marginal(name, make_scan, b=256, n=3, r1=R1, r2=R2):
    """make_scan(R) -> jitted zero-arg callable running R rounds.
    PM_ONLY=<substr>[,<substr>...] filters pieces by name."""
    import jax

    only = os.environ.get("PM_ONLY")
    if only and not any(s in name for s in only.split(",")):
        return
    try:
        f1, f2 = make_scan(r1), make_scan(r2)
        outs = [f1(), f2()]
        for o in outs:
            jax.block_until_ready(o)
            _ = float(jax.numpy.ravel(jax.tree_util.tree_leaves(o)[0])[0])
    except Exception as e:
        print(json.dumps({"name": name, "error": type(e).__name__,
                          "detail": str(e)[:200]}), flush=True)
        return
    times = []
    for f in (f1, f2):
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            o = f()
            _ = float(jax.numpy.ravel(jax.tree_util.tree_leaves(o)[0])[0])
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    # denominator must use the CALLER's round counts (r04 bug: the module
    # globals were used, silently scaling externally-passed r1/r2)
    per_iter = (times[1] - times[0]) / (r2 - r1) * 1e3
    print(json.dumps({"name": name, "marginal_ms": round(per_iter, 3),
                      "per_item_us": round(per_iter * 1e3 / b, 2),
                      "t_r1_ms": round(times[0] * 1e3, 1),
                      "t_r2_ms": round(times[1] * 1e3, 1)}), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_dae_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bench import _wait_for_healthy_device

    if not os.environ.get("PF_SKIP_GATE"):
        tflops = _wait_for_healthy_device()
        print(f"# probe {tflops:.0f} TFLOP/s", file=sys.stderr, flush=True)

    from __graft_entry__ import FLAGSHIP_CONFIG
    from point_dae_tpu.engine.pretrain import device_pipeline, init_model
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.ops.geometry import (furthest_point_sample,
                                            gather_points, group_points,
                                            group_neighborhood, knn)
    from point_dae_tpu.data.corruptions_patch import corrupt_patches
    from point_dae_tpu.utils.config import ConfigDict

    B = int(os.environ.get("PM_B", "256"))
    N, G, S, D = 1024, 64, 32, 384
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    raw = jnp.asarray(rng.normal(size=(B, 8192, 6)).astype(np.float32))
    key = jax.random.key(0)

    config = ConfigDict(FLAGSHIP_CONFIG)
    config["total_bs"] = B
    model = build_model_from_cfg(config["model"])
    params, batch_stats = init_model(model, config, raw)

    def scan_of(body):
        """body(i, carry_pts) -> new (B, N, 3)-shaped carry (or anything
        whose first 3 floats exist). Perturbs the carry so rounds differ."""
        def make(R):
            def run():
                def f(c, i):
                    return body(i, c), ()
                out, _ = jax.lax.scan(f, xyz, jnp.arange(R, dtype=jnp.uint32))
                return out
            return jax.jit(run)
        return make

    # ---- geometry front-end pieces ----------------------------------------
    def fps_body(i, c):
        idx = furthest_point_sample(c, G)
        return c + 1e-6 * idx[:, :1, None].astype(jnp.float32)
    marginal("fps_1024to64", scan_of(fps_body), b=B)

    def knn_body(i, c):
        ctr = c[:, :G]
        _, idx = knn(ctr, c, S)
        return c + 1e-6 * idx[:, :1, :1].astype(jnp.float32)
    marginal("knn_64q_1024db_k32", scan_of(knn_body), b=B)

    def gather_body(i, c):
        idx = (jnp.arange(G * S, dtype=jnp.int32) * (i + 1)) % N
        out = group_points(c, jnp.broadcast_to(idx.reshape(1, G, S),
                                               (B, G, S)))
        return c + 1e-6 * out[:, 0, 0, :][:, None, :]
    marginal("patch_gather_64x32", scan_of(gather_body), b=B)

    def group_body(i, c):
        neigh, ctr = group_neighborhood(c, G, S)
        return c + 1e-6 * neigh[:, 0, 0, :][:, None, :]
    marginal("group_neighborhood", scan_of(group_body), b=B)

    def corrupt_body(i, c):
        neigh = jnp.concatenate([c, c], axis=1).reshape(B, G, S, 3)
        ctr = c[:, :G]
        k = jax.random.fold_in(key, i)
        t_neigh, t_ctr = corrupt_patches(
            k, neigh, ctr, tuple(config["model"]["corrupt_type"]))
        return c + 1e-6 * t_neigh[:, 0, 0, :][:, None, :]
    marginal("corrupt_patches", scan_of(corrupt_body), b=B)

    # ---- device pipeline (augment+corrupt+resample 8192->1024) ------------
    d = config["dataset"]["train"]["others"]

    def make_pipe(R):
        def run():
            def f(c, i):
                k = jax.random.fold_in(key, i)
                cor, cln = device_pipeline(k, raw + c, tuple(d["aug_type"]),
                                           tuple(d["corrupt_type"]), N)
                return c + 1e-6 * cor[0, 0, 0], ()
            out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return jax.jit(run)
    marginal("device_pipeline_8192to1024", make_pipe, b=B)

    # ---- model fwd / fwd+bwd ----------------------------------------------
    pipe = jax.jit(lambda k, r: device_pipeline(
        k, r, tuple(d["aug_type"]), tuple(d["corrupt_type"]), N))
    corrupted, clean = pipe(key, raw)

    def loss_fn(p, cor, cln, k):
        (l1, l2), _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, cor, cln, train=True,
            rngs={"corrupt": jax.random.fold_in(k, 1),
                  "mask": jax.random.fold_in(k, 2),
                  "droppath": jax.random.fold_in(k, 3),
                  "dropout": jax.random.fold_in(k, 4)},
            mutable=["batch_stats"])
        return l1 + 0.005 * l2

    def make_fwd(R):
        def run():
            def f(c, i):
                k = jax.random.fold_in(key, i)
                l = loss_fn(params, corrupted + c, clean, k)
                return c + 1e-6 * l, ()
            out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return jax.jit(run)
    marginal("model_fwd", make_fwd, b=B, r1=2, r2=8)

    def make_bwd(R):
        def run():
            def f(c, i):
                k = jax.random.fold_in(key, i)
                g = jax.grad(loss_fn)(params, corrupted + c, clean, k)
                # consume EVERY grad leaf: summing only one leaf lets XLA
                # dead-code-eliminate the other weight-grad dots (r05 bug —
                # under-reported every fwd_bwd marginal)
                tot = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
                return c + 1e-6 * tot, ()
            out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return jax.jit(run)
    marginal("model_fwd_bwd", make_bwd, b=B, r1=2, r2=8)

    # ---- model-internal pieces (standalone modules, scan-marginal) --------
    from point_dae_tpu.models.layers import PatchEncoder, PosEmbedMLP
    from point_dae_tpu.models.transformer import (MaskTransformerEncoder,
                                                  TransformerDecoder,
                                                  _FoldingLocalHead,
                                                  sample_patch_mask)
    from point_dae_tpu.losses.chamfer import chamfer_l2

    t = config["model"]["transformer_config"]
    neigh = jnp.asarray(rng.normal(size=(B, G, S, 3)).astype(np.float32))
    center = jnp.asarray(rng.normal(size=(B, G, 3)).astype(np.float32))
    enc = MaskTransformerEncoder(
        trans_dim=t["trans_dim"], depth=t["depth"], num_heads=t["num_heads"],
        encoder_dims=t["encoder_dims"], drop_path_rate=t["drop_path_rate"],
        mask_ratio=t["mask_ratio"], rand_ratio=True, mask_type="rand",
        dtype=jnp.bfloat16)
    ev = jax.jit(lambda: enc.init(
        {"params": key, "mask": key, "droppath": key}, neigh, center,
        train=True))()

    def make_enc(R):
        def run():
            def f(c, i):
                k = jax.random.fold_in(key, i)
                x, _ = enc.apply(ev, neigh + c, center, train=True,
                                 rngs={"mask": k, "droppath": k},
                                 mutable=["batch_stats"])[0]
                return c + 1e-6 * jnp.sum(x[0, 0, :3].astype(jnp.float32)), ()
            out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return jax.jit(run)
    marginal("encoder_fwd_masked", make_enc, b=B)

    pe_mod = PatchEncoder(t["encoder_dims"], dtype=jnp.bfloat16)
    vis32 = neigh[:, :32]
    pv = jax.jit(lambda: pe_mod.init(key, vis32, train=True))()

    def make_pe(R):
        def run():
            def f(c, i):
                x, _ = pe_mod.apply(pv, vis32 + c, train=True,
                                    mutable=["batch_stats"])
                return c + 1e-6 * jnp.sum(x[0, 0, :3].astype(jnp.float32)), ()
            out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return jax.jit(run)
    marginal("patch_embed_V32", make_pe, b=B)

    D = t["trans_dim"]
    xfull = jnp.asarray(rng.normal(size=(B, G, D)).astype(np.float32))
    dec = TransformerDecoder(embed_dim=D, depth=t["decoder_depth"],
                             num_heads=t["decoder_num_heads"],
                             drop_path_rate=t["drop_path_rate"],
                             dtype=jnp.bfloat16)
    dv = jax.jit(lambda: dec.init({"params": key, "droppath": key},
                                  xfull, xfull, deterministic=False))()

    def make_dec(R):
        def run():
            def f(c, i):
                k = jax.random.fold_in(key, i)
                x = dec.apply(dv, xfull + c, xfull, deterministic=False,
                              rngs={"droppath": k})
                return c + 1e-6 * jnp.sum(x[0, 0, :3].astype(jnp.float32)), ()
            out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return jax.jit(run)
    marginal("decoder_fwd_G64", make_dec, b=B)

    pe2 = PosEmbedMLP(D)
    pv2 = jax.jit(lambda: pe2.init(key, center))()

    def make_pos(R):
        def run():
            def f(c, i):
                x = pe2.apply(pv2, center + c)
                return c + 1e-6 * jnp.sum(x[0, 0, :3].astype(jnp.float32)), ()
            out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return jax.jit(run)
    marginal("pos_embed_G64", make_pos, b=B)

    M = 51
    xloc = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    fold = _FoldingLocalHead(D, dtype=jnp.bfloat16)
    fv = jax.jit(lambda: fold.init(key, xloc))()

    def make_fold(R):
        def run():
            def f(c, i):
                x = fold.apply(fv, xloc + c)
                return c + 1e-6 * jnp.sum(
                    x.reshape(-1)[:3].astype(jnp.float32)), ()
            out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return jax.jit(run)
    marginal("folding_head_M51", make_fold, b=B)

    reb = jnp.asarray(rng.normal(size=(B * M, 36, 3)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(B * M, S, 3)).astype(np.float32))

    def make_cd(R):
        def run():
            def f(c, i):
                l = chamfer_l2(reb + c, gt)
                return c + 1e-6 * l, ()
            out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return jax.jit(run)
    try:
        marginal("patch_chamfer_36v32", make_cd, b=B)
    except Exception:
        pass

    # ---- fwd+bwd marginals per sub-module (round 5: the backward is ~2/3
    # of the step; map it before any further kernel work) -----------------
    def grad_piece(name, apply_fn, variables, *xs):
        """Time value_and_grad wrt PARAMS of apply_fn(variables, *xs)."""
        ps = variables["params"]

        def make(R):
            def loss(p, c):
                out = apply_fn({**variables, "params": p},
                               *[x + c if x.dtype == jnp.float32 else x
                                 for x in xs])
                leaf = jax.tree_util.tree_leaves(out)[0]
                return jnp.sum(leaf.astype(jnp.float32) ** 2) * 1e-6

            g = jax.grad(loss, argnums=(0, 1))

            def run():
                def f(c, i):
                    gp, gc = g(ps, c)
                    tot = sum(jnp.sum(l)
                              for l in jax.tree_util.tree_leaves(gp))
                    return 1e-6 * gc + 1e-6 * tot, ()
                out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                      jnp.arange(R, dtype=jnp.uint32))
                return out
            return jax.jit(run)

        marginal(name, make, b=B)

    grad_piece("patch_embed_V32_fwd_bwd",
               lambda v, x: pe_mod.apply(v, x, train=True,
                                         mutable=["batch_stats"])[0],
               pv, vis32)
    grad_piece("encoder_fwd_bwd_masked",
               lambda v, n, c: enc.apply(
                   v, n, c, train=True,
                   rngs={"mask": key, "droppath": key},
                   mutable=["batch_stats"])[0][0],
               ev, neigh, center)
    grad_piece("decoder_fwd_bwd_G64",
               lambda v, x, p: dec.apply(v, x, p, deterministic=False,
                                         rngs={"droppath": key}),
               dv, xfull, xfull)
    grad_piece("folding_head_fwd_bwd_M51",
               lambda v, x: fold.apply(v, x), fv, xloc)
    grad_piece("pos_embed_fwd_bwd_G64",
               lambda v, x: pe2.apply(v, x), pv2, center)

    def make_cd_bwd(R):
        def loss(a):
            return chamfer_l2(a, gt)

        g = jax.grad(loss)

        def run():
            def f(c, i):
                gr = g(reb + c)
                return c + 1e-6 * jnp.sum(gr[0, 0]), ()
            out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return jax.jit(run)
    marginal("patch_chamfer_fwd_bwd", make_cd_bwd, b=B)

    def make_mask_pack(R):
        def run():
            def f(c, i):
                k = jax.random.fold_in(key, i)
                mask = sample_patch_mask(k, B, G, 0.6, True)
                order = jnp.argsort(mask, axis=-1, stable=True)
                vis = order[:, :32]
                pc = jnp.take_along_axis(center + c, vis[:, :, None], axis=1)
                return c + 1e-6 * jnp.sum(pc[0, 0]), ()
            out, _ = jax.lax.scan(f, jnp.float32(0.0),
                                  jnp.arange(R, dtype=jnp.uint32))
            return out
        return jax.jit(run)
    marginal("mask_and_pack", make_mask_pack, b=B)

    if not os.environ.get("PF_SKIP_GATE"):
        from bench import probe_tflops

        print(json.dumps({"name": "probe_tflops_end",
                          "value": round(probe_tflops(iters=5), 1)}),
              flush=True)


if __name__ == "__main__":
    main()
