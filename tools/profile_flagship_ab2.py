#!/usr/bin/env python
"""Interleaved A/B of flagship train-step variants driven by
transformer_config overrides (remat, residual dtype, fold_impl, ...).

Each variant is compiled once; then timed in interleaved rounds
(variant0 round, variant1 round, ...) so transient tunnel degradation
hits all variants equally. One scalar readback per round amortizes the
~5 ms dispatch overhead across the round's iterations.

Usage:
  python tools/profile_flagship_ab2.py --iters 16 --rounds 4 \
      base remat=True residual=bf16
Variant syntax: name[:k=v,k=v...] where k=v pairs go into
transformer_config (strings; 'True'/'False' kept as strings).
Special keys: PATCHIFY=0 sets PDAE_FUSED_PATCHIFY=0 for that variant.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": {},
    "remat": {"remat": True},
    "residual_bf16": {"residual_dtype": "bf16"},
    "remat+residual": {"remat": True, "residual_dtype": "bf16"},
    "fold_xla": {"fold_impl": "xla"},
    "unfused_patchify": {"_PATCHIFY": "0"},
    # no-transpose q/k/v layout (layers.py Attention, bit-exact on CPU)
    "attn_bnhd": {"_ATTN": "bnhd"},
    # disable the fused Pallas MLP (ops/pallas_mlp.py; default auto=on)
    "mlp_xla": {"_MLP": "0"},
    "mlp_tt512": {"_MLP_TT": "512"},
    "mlp_tt1024": {"_MLP_TT": "1024"},
    # round-5 kernels: fused block-diagonal attention (ops/pallas_attn.py,
    # opt-IN after the r05 A/B measured it slower than XLA) and the
    # LN2+residual fold into the MLP kernel (default on)
    "attn_on": {"_ATTN_FUSED": "1"},
    "attn_off": {"_ATTN_FUSED": "0"},
    "mlp_ln_off": {"_MLP_LN": "0"},
    "r04_base": {"_ATTN_FUSED": "0", "_MLP_LN": "0", "_SPLIT_PE": "0"},
    # patch-embed conv3 SplitDense factorization (default on, round 5)
    "split_pe_off": {"_SPLIT_PE": "0"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=["base"],
                    help=f"names from {sorted(VARIANTS)}")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    names = args.variants or ["base"]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_dae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bench import probe_tflops
    from __graft_entry__ import FLAGSHIP_CONFIG
    from point_dae_tpu.engine.pretrain import init_model, make_train_step
    from point_dae_tpu.engine.train_state import TrainState, build_optimizer
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.utils.config import ConfigDict

    print(f"# probe start: {probe_tflops():.1f} TFLOP/s", flush=True)
    B = args.batch
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(size=(B, 8192, 6)).astype(np.float32))
    key = jax.random.key(0)
    gw = jnp.float32(0.5)

    steps, states = {}, {}
    for name in names:
        over = dict(VARIANTS[name])
        patchify = over.pop("_PATCHIFY", "auto")
        os.environ["PDAE_FUSED_PATCHIFY"] = patchify
        # trace-time knobs: must be set before the compile call below
        os.environ["PDAE_ATTN_LAYOUT"] = over.pop("_ATTN", "bhnd")
        os.environ["PDAE_FUSED_MLP"] = over.pop("_MLP", "auto")
        os.environ["PDAE_MLP_TT"] = over.pop("_MLP_TT", "256")
        os.environ["PDAE_FUSED_ATTN"] = over.pop("_ATTN_FUSED", "0")
        os.environ["PDAE_FUSED_MLP_LN"] = over.pop("_MLP_LN", "auto")
        os.environ["PDAE_SPLIT_PE"] = over.pop("_SPLIT_PE", "1")
        config = ConfigDict(FLAGSHIP_CONFIG)
        config["total_bs"] = B
        config["model"]["transformer_config"].update(over)
        model = build_model_from_cfg(config["model"])
        params, batch_stats = init_model(model, config, raw)
        tx, _ = build_optimizer(config, params, steps_per_epoch=100,
                                grad_norm_clip=None)
        states[name] = TrainState.create(model.apply, params, batch_stats, tx)
        steps[name] = make_train_step(model, config, mesh=None)
        t0 = time.perf_counter()
        states[name], m = steps[name](states[name], raw, key, gw)
        loss = float(m["loss_xyz"])
        print(f"# compiled {name} in {time.perf_counter()-t0:.0f}s "
              f"loss_xyz={loss:.5f}", flush=True)
        os.environ["PDAE_FUSED_PATCHIFY"] = "auto"
        os.environ["PDAE_ATTN_LAYOUT"] = "bhnd"
        os.environ["PDAE_FUSED_MLP"] = "auto"
        os.environ["PDAE_MLP_TT"] = "256"
        os.environ["PDAE_FUSED_ATTN"] = "0"
        os.environ["PDAE_FUSED_MLP_LN"] = "auto"
        os.environ["PDAE_SPLIT_PE"] = "1"

    best = {n: float("inf") for n in names}
    for r in range(args.rounds):
        for name in names:
            k = jax.random.fold_in(key, r)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                k, sub = jax.random.split(k)
                states[name], m = steps[name](states[name], raw, sub, gw)
            _ = float(m["loss_xyz"])
            dt = (time.perf_counter() - t0) / args.iters
            best[name] = min(best[name], dt)
            print(f"round {r} {name}: {dt*1e3:.2f} ms", flush=True)
    print(f"# probe end: {probe_tflops():.1f} TFLOP/s", flush=True)
    for name in names:
        print(json.dumps({"variant": name, "best_ms": round(best[name]*1e3, 2),
                          "clouds_per_sec": round(B / best[name], 1)}))


if __name__ == "__main__":
    main()
