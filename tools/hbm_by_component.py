#!/usr/bin/env python
"""Aggregate the flagship step's entry-computation HBM traffic by model
component (the per-HLO table in tools/roofline.py, rolled up).

Each top-level HLO instruction's operand+result bytes are HBM traffic at
fusion boundaries (an upper bound; VMEM-resident traffic inside fusions is
excluded). Buckets are regexes over the op_name metadata XLA carries from
jaxpr scopes, so fwd (jvp) and bwd (transpose(jvp)) land in separate rows.

Usage: python tools/hbm_by_component.py [--batch 32] [--cpu]
"""
import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKETS = [
    ("patch_embed_bwd", r"transpose.*MAE_encoder/encoder/"),
    ("patch_embed_fwd", r"MAE_encoder/encoder/"),
    ("vit_blocks_bwd", r"transpose.*MAE_encoder/blocks/"),
    ("vit_blocks_fwd", r"MAE_encoder/blocks/"),
    ("encoder_misc", r"MAE_encoder/"),
    ("decoder_bwd", r"transpose.*MAE_decoder/"),
    ("decoder_fwd", r"MAE_decoder/"),
    ("fold_bwd", r"transpose.*/fold/"),
    ("fold_fwd", r"/fold/"),
    ("coarse_bwd", r"transpose.*coarse_pred/"),
    ("coarse_fwd", r"coarse_pred/"),
    ("pos_embed", r"pos_embed"),
    ("chamfer", r"chamfer|loss_fn|global_loss"),
    ("patchify", r"group_neighborhood|fps|knn|patchify|gather_points|"
                 r"group_points"),
    ("corrupt", r"corrupt|augment|device_pipeline|resample"),
    ("optimizer", r"adamw|apply_gradients|opt_state|scale_by"),
    ("transpose_other", r"transpose\(jvp"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--bench-batch", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import FLAGSHIP_CONFIG
    from point_dae_tpu.engine.pretrain import init_model, make_train_step
    from point_dae_tpu.engine.train_state import TrainState, build_optimizer
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.utils.config import ConfigDict
    from tools.roofline import _top_hbm_ops

    config = ConfigDict(FLAGSHIP_CONFIG)
    config["total_bs"] = args.batch
    model = build_model_from_cfg(config["model"])
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(size=(args.batch, 8192, 6)).astype(np.float32))
    params, batch_stats = init_model(model, config, raw)
    tx, _ = build_optimizer(config, params, steps_per_epoch=100,
                            grad_norm_clip=None)
    state = TrainState.create(model.apply, params, batch_stats, tx)
    step = make_train_step(model, config, mesh=None)
    compiled = step.lower(state, raw, jax.random.key(0),
                          jnp.float32(0.5)).compile()
    scale = args.bench_batch / args.batch
    rows = _top_hbm_ops(compiled, scale, top=100000)

    agg = {}
    for r in rows:
        name = r["op_name"]
        kind = r["kind"]
        bucket = None
        if not name:
            bucket = f"[no-op-name:{kind}]"
        else:
            for b, pat in BUCKETS:
                if re.search(pat, name):
                    bucket = b
                    break
        bucket = bucket or "other"
        a = agg.setdefault(bucket, {"bytes": 0.0, "count": 0, "max": None})
        a["bytes"] += r["bytes"]
        a["count"] += 1
        if a["max"] is None or r["bytes"] > a["max"][0]:
            a["max"] = (r["bytes"], name[-90:] or kind)
    total = sum(a["bytes"] for a in agg.values())
    print(f"# total entry-edge bytes (scaled to bs {args.bench_batch}): "
          f"{total/1e9:.1f} GB -> {total/819e6:.1f} ms at 819 GB/s")
    for b, a in sorted(agg.items(), key=lambda kv: -kv[1]["bytes"]):
        print(json.dumps({"bucket": b, "GB": round(a["bytes"]/1e9, 2),
                          "ms_at_819GBps": round(a["bytes"]/819e6, 2),
                          "n_ops": a["count"],
                          "top_op": a["max"][1],
                          "top_MB": round(a["max"][0]/1e6, 1)}))


if __name__ == "__main__":
    main()
