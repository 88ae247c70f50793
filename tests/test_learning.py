"""End-to-end learning sanity: the finetune machinery must fit and
generalize on separable synthetic classes (blob-count classes). Guards the
whole stack — dataset -> loader -> FPS resample -> model -> loss -> optimizer.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from point_dae_tpu.data.datasets import Synthetic
from point_dae_tpu.data.loader import DataLoader
from point_dae_tpu.engine.finetune import make_eval_step, make_finetune_step
from point_dae_tpu.engine.train_state import TrainState, build_optimizer
from point_dae_tpu.models import build_model_from_cfg
from point_dae_tpu.utils.config import ConfigDict


def test_finetune_learns_synthetic_classes():
    config = ConfigDict({
        "optimizer": {"type": "AdamW", "part": "all",
                      "kwargs": {"lr": 0.002, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 12}},
        "model": {"NAME": "PointNet_NoT", "cls_dim": 3},
        "npoints": 128, "total_bs": 16})
    train = Synthetic({"size": 66, "N_POINTS": 128, "num_classes": 3,
                       "with_normal": False, "seed": 0})
    test = Synthetic({"size": 24, "N_POINTS": 128, "num_classes": 3,
                      "with_normal": False, "seed": 1})
    model = build_model_from_cfg(config["model"])
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    v = jax.jit(functools.partial(model.init, train=True))(
        rngs, jnp.zeros((2, 128, 3)))
    loader = DataLoader(train, 16, shuffle=True)
    tx, _ = build_optimizer(config, v["params"], len(loader))
    state = TrainState.create(model.apply, v["params"],
                              v.get("batch_stats", {}), tx)
    step = make_finetune_step(model, config, mesh=None, aug=False)
    eval_step = make_eval_step(model, config, mesh=None)
    key = jax.random.key(0)
    for ep in range(12):
        loader.set_epoch(ep)
        for b in loader:
            key, sk = jax.random.split(key)
            state, _ = step(state, jnp.asarray(b["points"], jnp.float32),
                            jnp.asarray(b["label"]), sk)
    correct = total = 0
    for b in DataLoader(test, 8, shuffle=False, drop_last=False):
        logits = eval_step(state, jnp.asarray(b["points"], jnp.float32))
        pred = np.argmax(np.asarray(logits), -1)
        correct += int((pred == np.asarray(b["label"])).sum())
        total += len(pred)
    acc = 100.0 * correct / total
    assert acc >= 60.0, f"learning sanity failed: {acc:.1f}% (chance 33%)"
