#!/usr/bin/env python
"""Per-piece flagship-step profiler (run on the real TPU chip).

bench.py measures the flagship pretrain step end-to-end (bs 256, raw
(256, 8192, 6), PointCAE_transformer_fc_global_folding_local at the
rerun2.sh shapes). tools/roofline.py puts that step at ~30% of the
probed matmul peak, so most of the wall-clock is NOT in the ViT matmuls.
This script times the step's pieces in isolation to locate the gap:

  - device_pipeline: augment + corrupt + resample (8192 -> 1024)
  - group_neighborhood: FPS centers (G=64) + kNN patches (S=32)
  - encoder / decoder / folding / coarse heads standalone
  - forward loss, forward+backward, full step (optimizer by subtraction)

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
    from bench import _wait_for_healthy_device, probe_tflops

    if not os.environ.get("PF_SKIP_GATE"):
        tflops = _wait_for_healthy_device()
        print(f"# probe {tflops:.0f} TFLOP/s", file=sys.stderr, flush=True)

    from __graft_entry__ import FLAGSHIP_CONFIG
    from point_dae_tpu.engine.pretrain import (device_pipeline, init_model,
                                               make_train_step)
    from point_dae_tpu.engine.train_state import TrainState, build_optimizer
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.ops.geometry import group_neighborhood
    from point_dae_tpu.utils.config import ConfigDict

    # PF_B/PF_NRAW let a CPU smoke run at tiny shapes before TPU time is spent
    B = int(os.environ.get("PF_B", "256"))
    Nraw = int(os.environ.get("PF_NRAW", "8192"))
    N, G, S, D = 1024, 64, 32, 384
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(size=(B, Nraw, 6)).astype(np.float32))
    key = jax.random.key(0)

    config = ConfigDict(FLAGSHIP_CONFIG)
    config["total_bs"] = B
    model = build_model_from_cfg(config["model"])
    params, batch_stats = init_model(model, config, raw)
    tx, _ = build_optimizer(config, params, steps_per_epoch=100,
                            grad_norm_clip=None)
    state = TrainState.create(model.apply, params, batch_stats, tx)
    step = make_train_step(model, config, mesh=None)
    holder = {"s": state}

    def run_step():
        holder["s"], m = step(holder["s"], raw, key, jnp.float32(0.5))
        return m

    timeit("full_train_step", run_step)

    # ---- pipeline pieces --------------------------------------------------
    d = config["dataset"]["train"]["others"]
    pipe = jax.jit(lambda k, r: device_pipeline(
        k, r, tuple(d["aug_type"]), tuple(d["corrupt_type"]), N))
    timeit("device_pipeline", pipe, key, raw)
    corrupted, clean = pipe(key, raw)

    grp = jax.jit(lambda p: group_neighborhood(p, G, S))
    timeit("group_neighborhood_G64S32", grp, clean[..., :3])

    # front-end internals: FPS vs center-gather+kNN vs patch-gather
    from point_dae_tpu.ops.geometry import (furthest_point_sample,
                                            gather_points, group_points, knn)

    xyz = clean[..., :3]
    fps = jax.jit(lambda p: furthest_point_sample(p, G))
    timeit("fps_only_1024to64", fps, xyz)
    fps_idx = fps(xyz)
    ctr = jax.jit(gather_points)
    timeit("center_gather", ctr, xyz, fps_idx)
    center0 = ctr(xyz, fps_idx)
    knn_j = jax.jit(lambda c, p: knn(c, p, S)[1])
    timeit("knn_only_64q_1024db_k32", knn_j, center0, xyz)
    kidx = knn_j(center0, xyz)
    gp = jax.jit(group_points)
    timeit("patch_gather_64x32", gp, xyz, kidx)

    # in-model patch corruption (affine_r3 + Drop-Patch)
    from point_dae_tpu.data.corruptions_patch import corrupt_patches

    neigh0, center1 = grp(xyz)
    abs_neigh = neigh0 + center1[:, :, None, :]
    cp = jax.jit(lambda k, a, c: corrupt_patches(
        k, a, c, tuple(config["model"]["corrupt_type"])))
    timeit("corrupt_patches_affine_droppatch", cp, key, abs_neigh, center1)

    # ---- model forward / backward on precomputed (corrupted, clean) ------
    # the full-step timing donated the original init buffers into the jitted
    # step; measure fwd/bwd on the LIVE post-step state instead
    params = holder["s"].params
    batch_stats = holder["s"].batch_stats

    def loss_fn(p, bs, cor, cln):
        (l1, l2), _ = model.apply(
            {"params": p, "batch_stats": bs}, cor, cln, train=True,
            rngs={"corrupt": key, "mask": key, "droppath": key,
                  "dropout": key},
            mutable=["batch_stats"])
        return l1 + 0.005 * l2

    fwd = jax.jit(loss_fn)
    timeit("model_fwd", fwd, params, batch_stats, corrupted, clean)
    bwd = jax.jit(jax.grad(loss_fn))
    timeit("model_fwd_bwd", bwd, params, batch_stats, corrupted, clean)

    # ---- heads standalone -------------------------------------------------
    from point_dae_tpu.models.transformer import (MaskTransformerEncoder,
                                                  PosEmbedMLP,
                                                  TransformerDecoder,
                                                  _FoldingLocalHead)

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
    enc_fwd = jax.jit(lambda v, a, c: enc.apply(
        v, a, c, train=True, rngs={"mask": key, "droppath": key},
        mutable=["batch_stats"])[0])
    timeit("encoder_fwd", enc_fwd, ev, neigh, center)

    xfull = jnp.asarray(rng.normal(size=(B, G, D)).astype(np.float32))
    dec = TransformerDecoder(embed_dim=D, depth=t["decoder_depth"],
                             num_heads=t["decoder_num_heads"],
                             drop_path_rate=t["drop_path_rate"],
                             dtype=jnp.bfloat16)
    dv = jax.jit(lambda: dec.init({"params": key, "droppath": key},
                                  xfull, xfull, deterministic=False))()
    dec_fwd = jax.jit(lambda v, x, p: dec.apply(
        v, x, p, deterministic=False, rngs={"droppath": key}))
    timeit("decoder_fwd", dec_fwd, dv, xfull, xfull)

    pe = PosEmbedMLP(D)
    pv = jax.jit(lambda: pe.init(key, center))()
    timeit("decoder_pos_embed", jax.jit(pe.apply), pv, center)

    # packed local-head capacity M = int(0.8 * G) = 51 at the flagship cfg
    xloc = jnp.asarray(rng.normal(size=(B, 51, D)).astype(np.float32))
    fold = _FoldingLocalHead(D, dtype=jnp.bfloat16)
    fv = jax.jit(lambda: fold.init(key, xloc))()
    timeit("folding_head_fwd_M51", jax.jit(fold.apply), fv, xloc)

    # ---- chamfer losses standalone ---------------------------------------
    from point_dae_tpu.losses.chamfer import chamfer_l2

    reb = jnp.asarray(rng.normal(size=(B * 51, 36, 3)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(B * 51, S, 3)).astype(np.float32))
    cd = jax.jit(lambda a, b_: chamfer_l2(a, b_))
    timeit("patch_chamfer_36v32", cd, reb, gt)
    coarse = jnp.asarray(rng.normal(size=(B, 64, 3)).astype(np.float32))
    timeit("global_chamfer_64v64", cd, coarse, center)

    # ---- dispatch latency (per-call tunnel overhead) ----------------------
    one = jnp.ones(())
    tiny = jax.jit(lambda a: a + 1.0)
    timeit("dispatch_tiny_jit", tiny, one, b=1)

    if not os.environ.get("PF_SKIP_GATE"):
        print(json.dumps({"name": "probe_tflops_end",
                          "value": round(probe_tflops(iters=5), 1)}),
              flush=True)


if __name__ == "__main__":
    main()
