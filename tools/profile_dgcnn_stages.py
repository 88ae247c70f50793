#!/usr/bin/env python
"""Per-stage DGCNN marginal decomposition (VERDICT r04 next #2).

Times each FusedEdgeConv stage (fwd and fwd+bwd), the conv5/1024-d head,
the corruption pipeline, and the full Point_CAE_DGCNN_FCOnly train step —
all as lax.scan marginals inside ONE dispatch (tools/profile_marginal.py
method), so the axon tunnel's fixed per-dispatch cost cancels and the
numbers are pure device time at the rerun.sh recipe shape
(bs 256, N 1024, k 20, bf16 policy).

Usage: python tools/profile_dgcnn_stages.py [--b 256]
Env: PF_SKIP_GATE=1 skips the health gate; PDAE_* knobs apply (the stages
dispatch the Pallas kernel exactly like the model does).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--r1", type=int, default=2)
    ap.add_argument("--r2", type=int, default=8)
    args = ap.parse_args()

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

    from point_dae_tpu.engine.pretrain import (device_pipeline, init_model,
                                               make_train_step_multi)
    from point_dae_tpu.engine.train_state import TrainState, build_optimizer
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.models.dgcnn import FusedEdgeConv
    from point_dae_tpu.utils.config import ConfigDict

    B, N, k = args.b, args.n, args.k
    R1, R2 = args.r1, args.r2
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(size=(B, 8192, 6)).astype(np.float32))

    config = ConfigDict({
        "optimizer": {"type": "AdamW", "part": "all",
                      "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 300,
                                                  "initial_epochs": 10}},
        "dataset": {"train": {"others": {"npoints": N,
                                         "aug_type": ["norm"],
                                         "corrupt_type": ["affine_r3",
                                                          "dropout_local"]}}},
        "model": {"NAME": "Point_CAE_DGCNN_FCOnly",
                  "corrupt_type": ["affine_r3", "dropout_local"],
                  "loss": "cdl2", "dtype": "bf16"},
        "npoints": N, "total_bs": B, "step_per_update": 1,
        "max_epoch": 300, "loss_type": "xyznormal_gradual",
    })

    # ---- full train step, scan-fused (true in-dispatch step cost) --------
    model = build_model_from_cfg(config["model"])
    params, batch_stats = init_model(model, config, raw)
    tx, _ = build_optimizer(config, params, steps_per_epoch=100,
                            grad_norm_clip=None)

    # the multi-step jit donates its state arg: hand it a fresh jitted copy
    # per call (constant per dispatch, cancels in the marginal)
    copier = jax.jit(lambda t: jax.tree_util.tree_map(lambda a: a + 0, t))
    st0 = TrainState.create(model.apply, params, batch_stats, tx)

    def make_step_scan(R):
        cfg_r = ConfigDict(dict(config))
        multi = make_train_step_multi(model, cfg_r, mesh=None, k=R)
        chunk = jnp.broadcast_to(raw[None], (R,) + raw.shape)

        def run():
            _, m = multi(copier(st0), chunk, jax.random.key(0),
                         jnp.float32(0.5))
            return m["loss_xyz"]
        return run

    marginal("train_step[dgcnn_fconly]", make_step_scan, b=B, r1=R1, r2=R2)

    # ---- corruption pipeline --------------------------------------------
    d = config["dataset"]["train"]["others"]

    def make_pipe_scan(R):
        def body(c, r):
            key = jax.random.fold_in(jax.random.key(1), r)
            cor, clean = device_pipeline(key, raw + c * 1e-6,
                                         tuple(d["aug_type"]),
                                         tuple(d["corrupt_type"]), N)
            return jnp.mean(cor) + jnp.mean(clean), None

        return jax.jit(lambda: jax.lax.scan(body, jnp.float32(0),
                                            jnp.arange(R))[0])

    marginal("device_pipeline", make_pipe_scan, b=B, r1=R1, r2=R2)

    # ---- XLA kNN alone (matmul + top_k) in-dispatch ----------------------
    from point_dae_tpu.ops import knn as _knn

    for cf in (3, 64, 128):
        xq = jnp.asarray(rng.normal(size=(B, N, cf)).astype(np.float32))

        def make_knn_scan(R, xq=xq):
            def body(c, r):
                _, idx = _knn(xq + c * 1e-6, xq + c * 1e-6, args.k)
                return jnp.sum(idx[:, 0, 0]).astype(jnp.float32) * 1e-9, None
            return jax.jit(lambda: jax.lax.scan(body, jnp.float32(0),
                                                jnp.arange(R))[0])

        marginal(f"knn_xla_C{cf}", make_knn_scan, b=B, r1=R1, r2=R2)

    # ---- per-stage EdgeConv fwd / fwd+bwd, both kNN impls ----------------
    stages = [("ec1", 3, 64), ("ec2", 64, 64), ("ec3", 64, 128),
              ("ec4", 128, 256)]
    knn_impl = os.environ.get("PDAE_EDGECONV_KNN", "kernel")
    for name, cin, cout in stages:
        x = jnp.asarray(rng.normal(size=(B, N, cin)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(B, N, cout)).astype(np.float32))
        mod = FusedEdgeConv(cout, k, dtype=jnp.bfloat16)
        v = mod.init(jax.random.key(0), x, True)

        def fwd(p, xi):
            out, _ = mod.apply({"params": p, "batch_stats": v["batch_stats"]},
                               xi, True, mutable=["batch_stats"])
            return out

        def make_fwd_scan(R, fwd=fwd, x=x):
            def body(c, r):
                out = fwd(v["params"], x + c * 1e-6)
                return jnp.mean(out), None
            return jax.jit(lambda: jax.lax.scan(body, jnp.float32(0),
                                                jnp.arange(R))[0])

        def make_bwd_scan(R, fwd=fwd, x=x, cot=cot):
            def loss(p, xi):
                return jnp.vdot(fwd(p, xi), cot)

            g = jax.grad(loss, argnums=(0, 1))

            def body(c, r):
                gp, gx = g(v["params"], x + c * 1e-6)
                tot = sum(jnp.sum(l)
                          for l in jax.tree_util.tree_leaves(gp))
                return jnp.mean(gx) + 1e-6 * tot, None
            return jax.jit(lambda: jax.lax.scan(body, jnp.float32(0),
                                                jnp.arange(R))[0])

        marginal(f"{name}_fwd[{cin}->{cout}]{knn_impl}", make_fwd_scan,
                 b=B, r1=R1, r2=R2)
        marginal(f"{name}_fwd_bwd[{cin}->{cout}]{knn_impl}", make_bwd_scan,
                 b=B, r1=R1, r2=R2)

    # ---- conv5 1024-d head (Dense+BN+leaky+max over N) -------------------
    import flax.linen as nn
    from point_dae_tpu.models.layers import leaky_relu02

    class Head(nn.Module):
        @nn.compact
        def __call__(self, h):
            h = nn.Dense(1024, use_bias=False, dtype=jnp.bfloat16,
                         name="conv5")(h)
            h = nn.BatchNorm(use_running_average=False, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name="bn5")(h)
            h = leaky_relu02(h)
            return jnp.max(h, axis=1)

    head = Head()
    h512 = jnp.asarray(rng.normal(size=(B, N, 512)).astype(np.float32))
    hv = head.init(jax.random.key(0), h512)
    hcot = jnp.asarray(rng.normal(size=(B, 1024)).astype(np.float32))

    def head_fwd(p, hi):
        out, _ = head.apply({"params": p, "batch_stats": hv["batch_stats"]},
                            hi, mutable=["batch_stats"])
        return out

    def make_head_scan(R):
        def loss(p, hi):
            return jnp.vdot(head_fwd(p, hi), hcot)

        g = jax.grad(loss, argnums=(0, 1))

        def body(c, r):
            gp, gh = g(hv["params"], h512 + c * 1e-6)
            return jnp.mean(gh), None
        return jax.jit(lambda: jax.lax.scan(body, jnp.float32(0),
                                            jnp.arange(R))[0])

    marginal("conv5_head_fwd_bwd[512->1024]", make_head_scan, b=B,
             r1=R1, r2=R2)


if __name__ == "__main__":
    main()
