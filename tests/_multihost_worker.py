"""Worker for tests/test_multihost.py: drive the REAL pretrain engine under
jax.distributed, plus a short "exactness probe" that records global-batch
hashes and per-step losses.

Run as:  python _multihost_worker.py <pid> <nprocs> <port> <outfile> <expdir>

A 1-process run uses 4 local CPU devices; a k-process run uses 4/k local
devices each — the GLOBAL mesh is 4 devices either way, so the two runs
execute the same global program. Cross-layout numerics caveat (measured,
round 3): collective reduction order differs between layouts, giving
~1e-7 relative loss noise at step 1; kNN/argmin discreteness in the point
models amplifies that chaotically over an epoch (~0.5% param-digest drift
after 4 steps). The sharp cross-layout contracts are therefore (a) bitwise
global-batch equality and (b) tight EARLY-step loss parity; end-of-training
params get a loose sanity bound only. torch DDP has the same property
across GPU-count changes.
"""
import hashlib
import json
import os
import sys


def main():
    pid, n, port, outfile, expdir = (int(sys.argv[1]), int(sys.argv[2]),
                                     int(sys.argv[3]), sys.argv[4],
                                     sys.argv[5])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={4 // n}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    if n > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=n, process_id=pid)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np
    import jax.numpy as jnp
    from types import SimpleNamespace

    from point_dae_tpu.data.datasets import build_dataset_from_cfg
    from point_dae_tpu.data.loader import DataLoader
    from point_dae_tpu.engine.pretrain import (TrainState, build_optimizer,
                                               init_model, make_train_step,
                                               run_pretrain)
    from point_dae_tpu.parallel import (get_mesh, loader_shard_kwargs,
                                        replicate, shard_batch)
    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.utils.checkpoint import flatten_keys
    from point_dae_tpu.utils.config import ConfigDict

    corrupt = os.environ.get("MH_CORRUPT", "affine_r3")
    ds_others = {"subset": "train", "npoints": 64, "aug_type": ["norm"],
                 "corrupt_type": [corrupt] if corrupt else [], "size": 32}
    probe = {"_base_": {"NAME": "Synthetic", "N_POINTS": 256,
                        "num_classes": 4, "with_normal": True},
             "others": dict(ds_others, size=16)}
    cfg = ConfigDict({
        "optimizer": {"type": "AdamW", "part": "all",
                      "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR",
                      "kwargs": {"epochs": 1, "initial_epochs": 0}},
        "dataset": {
            "train": {"_base_": {"NAME": "Synthetic", "N_POINTS": 256,
                                 "num_classes": 4, "with_normal": True},
                      "others": ds_others},
            "val": probe, "extra_train": probe,
        },
        "model": {"NAME": "Point_CAE_DGCNN_FCOnly", "corrupt_type": [],
                  "loss": "cdl2"},
        "normal_weight": 1.0, "total_bs": 8, "max_epoch": 0,
        "loss_type": "xyz"})

    # --- Phase 1: exactness probe (engine building blocks, 2 steps) ------
    mesh = get_mesh()
    ds = build_dataset_from_cfg(cfg["dataset"]["train"]["_base_"],
                                cfg["dataset"]["train"]["others"])
    local_bs = 8 // jax.process_count()
    loader = DataLoader(ds, local_bs, shuffle=True, seed=0,
                        **loader_shard_kwargs())
    model = build_model_from_cfg(cfg["model"])
    first = next(iter(loader))
    params, batch_stats = init_model(model, cfg, first["points"], seed=0)
    tx, _ = build_optimizer(cfg, params, max(len(loader), 1), None)
    state = TrainState.create(model.apply, params, batch_stats, tx)
    state = replicate(mesh, state)
    train_step = make_train_step(model, cfg, mesh)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    gather = jax.jit(lambda x: x, out_shardings=rep)

    key = jax.random.key(0)
    gw = jnp.float32(1.0)
    batch_hashes, probe_losses = [], []
    loader.set_epoch(0)
    for bi, batch in enumerate(loader):
        if bi >= 2:
            break
        key, sub = jax.random.split(key)
        raw = shard_batch(mesh, np.asarray(batch["points"]), local=True)
        g = np.asarray(gather(raw))   # the assembled GLOBAL batch
        batch_hashes.append(hashlib.sha1(g.tobytes()).hexdigest())
        state, metrics = train_step(state, raw, sub, gw)
        probe_losses.append(float(jax.device_get(metrics)["loss_xyz"]))

    # --- Phase 2: the real engine, end to end -----------------------------
    args = SimpleNamespace(seed=0, experiment_path=expdir, val_freq=1,
                           resume=False, start_ckpts=None, tfboard_path=None)
    out = run_pretrain(cfg, args, logger_name=f"mh_worker_{pid}")

    flat = flatten_keys(jax.device_get(out["state"].params))
    digest = {k: float(abs(v).sum()) for k, v in flat.items()}

    # --- Phase 3: device-resident cache path (round 5) --------------------
    # Multi-host cache assembly: each process uploads only its devices'
    # block (make_array_from_process_local_data), the epoch permutation is
    # global, and batches are served by the shard_map psum_scatter gather —
    # the SAME global program across layouts, so served batches must be
    # bitwise layout-invariant and step losses follow the phase-1 contract.
    from point_dae_tpu.data.device_cache import build_device_cache
    from point_dae_tpu.engine.pretrain import make_train_step_multi_cached

    cache = build_device_cache(ds, mesh=mesh, dtype=jnp.float32,
                               num_hosts=jax.process_count(),
                               host_id=jax.process_index(), seed=0)
    cache.set_epoch(0)
    data, perm = cache.epoch_arrays()
    params3, bs3 = init_model(model, cfg, first["points"], seed=0)
    tx3, _ = build_optimizer(cfg, params3, cache.steps_per_epoch(8), None)
    state3 = replicate(mesh, TrainState.create(model.apply, params3, bs3,
                                               tx3))
    cstep = make_train_step_multi_cached(model, cfg, mesh, 1, 8)
    cache_hashes, cache_losses = [], []
    key3 = jax.random.key(1)
    for i in range(2):
        b = np.asarray(gather(cache.batch(i, 8)))
        cache_hashes.append(hashlib.sha1(b.tobytes()).hexdigest())
        key3, sub = jax.random.split(key3)
        state3, m = cstep(state3, data, perm, jnp.int32(i * 8), sub, gw)
        cache_losses.append(float(jax.device_get(m)["loss_xyz"]))

    with open(outfile, "w") as f:
        json.dump({"pid": pid, "n": n, "best_acc": float(out["best_acc"]),
                   "step": int(out["state"].step), "digest": digest,
                   "batch_hashes": batch_hashes,
                   "probe_losses": probe_losses,
                   "cache_hashes": cache_hashes,
                   "cache_losses": cache_losses}, f)


if __name__ == "__main__":
    main()
