#!/usr/bin/env python
"""Training-impact bound for the 1-pass EdgeConv gradient scatter.

``knn_aggregate(grad_passes=1)`` rounds each scatter contribution's
cotangent operand to bf16 (the structural argument: du's next hop is the
bf16 edge-projection backward, which rounds it to bf16 regardless —
see DESIGN.md §10c). This script bounds the TRAINING effect the same way
the BN-subset approximations were bounded (tests/test_bn_subset_bound.py):
train the DGCNN FCOnly recipe twice from identical init/data/keys — once
with exact 3-pass scatters (``exact_grads=True``), once with the 1-pass
dispatch — and report the loss trajectories. Run on the real TPU (the
rounding only exists on the MXU; in interpret mode both are exact).

Prints one JSON line per step pair and a final verdict line.
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
    from bench import probe_tflops

    from point_dae_tpu.engine.pretrain import init_model, make_train_step
    from point_dae_tpu.engine.train_state import TrainState, build_optimizer
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.utils.config import ConfigDict

    steps = int(os.environ.get("GP_STEPS", "60"))
    B = int(os.environ.get("GP_B", "64"))

    def run(exact):
        config = ConfigDict({
            "optimizer": {"type": "AdamW", "part": "all",
                          "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
            "scheduler": {"type": "CosLR",
                          "kwargs": {"epochs": 1200, "initial_epochs": 10}},
            "dataset": {"train": {"others": {
                "npoints": 1024, "aug_type": ["norm"],
                "corrupt_type": ["affine_r3", "dropout_local"]}}},
            "model": {"NAME": "Point_CAE_DGCNN_FCOnly",
                      "corrupt_type": ["affine_r3", "dropout_local"],
                      "loss": "cdl2", "dtype": "bf16",
                      "edgeconv_exact_grads": bool(exact)},
            "npoints": 1024, "total_bs": B, "step_per_update": 1,
            "max_epoch": 1200, "loss_type": "xyznormal_gradual",
        })
        model = build_model_from_cfg(config["model"])
        rng = np.random.default_rng(7)
        raw = jnp.asarray(rng.normal(size=(B, 8192, 6)).astype(np.float32))
        params, batch_stats = init_model(model, config, raw)
        tx, _ = build_optimizer(config, params, steps_per_epoch=100,
                                grad_norm_clip=None)
        state = TrainState.create(model.apply, params, batch_stats, tx)
        step = make_train_step(model, config, mesh=None)
        key = jax.random.key(3)
        gw = jnp.float32(0.5)
        losses = []
        for i in range(steps):
            key, sub = jax.random.split(key)
            state, m = step(state, raw, sub, gw)
            if i % 10 == 9 or i == 0:
                losses.append((i, float(m["loss_xyz"])))
        return losses

    print(json.dumps({"name": "probe_tflops",
                      "value": round(probe_tflops(), 1)}), flush=True)
    exact = run(True)
    onep = run(False)
    for (i, le), (_, l1) in zip(exact, onep):
        rel = abs(l1 - le) / max(abs(le), 1e-9)
        print(json.dumps({"step": i, "loss_exact3pass": round(le, 6),
                          "loss_1pass": round(l1, 6),
                          "rel_diff": round(rel, 6)}), flush=True)
    final_rel = abs(onep[-1][1] - exact[-1][1]) / max(abs(exact[-1][1]), 1e-9)
    print(json.dumps({"name": "verdict", "steps": steps, "bs": B,
                      "final_rel_diff": round(final_rel, 6),
                      "ok": final_rel < 0.02}), flush=True)


if __name__ == "__main__":
    main()
