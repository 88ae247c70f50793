"""Train state + optimizer/scheduler factory.

Replaces tools/builder.py:38-151 in the reference:
- AdamW with torch-style no-decay groups (1-D params, biases, tokens);
- ``part`` modes: 'all', 'only_new' (train only params whose path contains
  'cls'), 'diff_lr' (0.1x lr on pretrained params), 'decoder'
  (decoder/pos-embed/head only);
- 'CosLR': timm CosineLRScheduler semantics with per-epoch stepping
  (t_in_epochs=True): cosine from base lr to lr/1000 over `epochs`.
  NOTE (reference quirk, preserved): builder.py:113 reads `warmup_epochs`
  (default 0) while every shipped config sets `initial_epochs`, so released
  runs had no warmup. We honour `warmup_epochs` when present.
- 'LambdaLR': the misc.py lambda decay 0.9^(e/21.77...) style (lr_decay ** e,
  clamped at lowest_decay), 'StepLR': step decay.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   tx=tx, apply_fn=apply_fn)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _no_decay(path, leaf) -> bool:
    """Torch add_weight_decay rule (builder.py:41-100): ndim==1, *.bias,
    or 'token' in the name -> no weight decay."""
    p = _path_str(path).lower()
    return leaf.ndim <= 1 or p.endswith("bias") or "token" in p


def make_lr_schedule(config: Dict, steps_per_epoch) -> Callable:
    """Per-step schedule implementing the reference's per-epoch schedulers.

    ``steps_per_epoch`` may be fractional: under gradient accumulation the
    optimizer count advances steps_per_epoch/k times per epoch ON AVERAGE
    (accumulation windows span epoch boundaries), so the caller passes the
    exact rational instead of a rounded integer that would drift over
    training."""
    opti = config["optimizer"]
    sche = config["scheduler"]
    base_lr = float(opti["kwargs"]["lr"])
    kw = sche.get("kwargs", {})
    epochs = int(kw.get("epochs", config.get("max_epoch", 300)))
    stype = sche["type"]

    if stype == "CosLR":
        min_lr = float(kw.get("min_lr", base_lr / 1000.0))
        warmup_epochs = int(kw.get("warmup_epochs", 0))
        warmup_lr = float(kw.get("warmup_lr", 1e-6))
        t_max = int(kw.get("t_max", epochs))

        def sched(step):
            e = jnp.floor(jnp.asarray(step, jnp.float32)
                          / jnp.float32(steps_per_epoch))
            warm = warmup_lr + (base_lr - warmup_lr) * e / jnp.maximum(warmup_epochs, 1)
            t = jnp.clip((e - warmup_epochs) / jnp.maximum(t_max - warmup_epochs, 1), 0.0, 1.0)
            cos = min_lr + 0.5 * (base_lr - min_lr) * (1.0 + jnp.cos(jnp.pi * t))
            return jnp.where(e < warmup_epochs, warm, cos)

        return sched
    if stype == "LambdaLR":
        decay = float(kw.get("lr_decay", 0.98))
        lowest = float(kw.get("lowest_decay", 0.02))
        decay_step = float(kw.get("decay_step", 1))

        def sched(step):
            epoch = jnp.floor(jnp.asarray(step, jnp.float32)
                              / jnp.float32(steps_per_epoch))
            return base_lr * jnp.maximum(decay ** (epoch / decay_step), lowest)

        return sched
    if stype == "StepLR":
        step_size = int(kw.get("step_size", 50))
        gamma = float(kw.get("gamma", 0.1))

        def sched(step):
            epoch = jnp.floor(jnp.asarray(step, jnp.float32)
                              / jnp.float32(steps_per_epoch))
            return base_lr * gamma ** (epoch // step_size)

        return sched
    if stype == "function":
        return lambda step: base_lr
    raise NotImplementedError(f"scheduler {stype!r}")


def build_optimizer(config: Dict, params, steps_per_epoch: int,
                    grad_norm_clip: Optional[float] = None
                    ) -> optax.GradientTransformation:
    """AdamW + schedule + part-mode masking (tools/builder.py:38-107)."""
    opti = config["optimizer"]
    if opti["type"] != "AdamW":
        raise NotImplementedError(opti["type"])
    wd = float(opti["kwargs"].get("weight_decay", 0.05))
    part = opti.get("part", "all")
    sched = make_lr_schedule(config, steps_per_epoch)
    # Under gradient accumulation (step_per_update k > 1) optax.MultiSteps
    # advances the inner optimizer's count once per k minibatches, so the
    # optimizer-side schedule must count UPDATES per epoch, not minibatches
    # (otherwise warmup/cosine run k-times slower than the reference's
    # per-epoch schedulers). The returned `sched` stays minibatch-based for
    # logging (callers index it with the minibatch step).
    spu = int(config.get("step_per_update", 1))
    # exact rational updates-per-epoch: MultiSteps accumulates across epoch
    # boundaries, so ceil() would under-count and drift over training
    opt_sched = sched if spu == 1 else make_lr_schedule(
        config, max(steps_per_epoch / spu, 1e-9))

    decay_mask = jax.tree_util.tree_map_with_path(
        lambda p, x: not _no_decay(p, x), params)

    def adamw(lr_fn):
        return optax.adamw(lr_fn, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=wd, mask=decay_mask)

    chain = []
    if grad_norm_clip:
        chain.append(optax.clip_by_global_norm(float(grad_norm_clip)))

    has_teacher = any("teacher" in _path_str(p).lower()
                      for p, _ in jax.tree_util.tree_leaves_with_path(params))
    if part == "all":
        if has_teacher:
            # frozen-teacher submodules (MaskFeat) never receive updates
            label = jax.tree_util.tree_map_with_path(
                lambda p, x: "frozen" if "teacher" in _path_str(p).lower()
                else "train", params)
            chain.append(optax.multi_transform(
                {"train": adamw(opt_sched), "frozen": optax.set_to_zero()}, label))
        else:
            chain.append(adamw(opt_sched))
    elif part == "only_new":
        # only 'cls' params are trained; everything else frozen
        label = jax.tree_util.tree_map_with_path(
            lambda p, x: "new" if "cls" in _path_str(p).lower() else "frozen",
            params)
        chain.append(optax.multi_transform(
            {"new": adamw(opt_sched), "frozen": optax.set_to_zero()}, label))
    elif part == "diff_lr":
        label = jax.tree_util.tree_map_with_path(
            lambda p, x: "new" if "cls" in _path_str(p).lower() else "pretrained",
            params)
        chain.append(optax.multi_transform(
            {"new": adamw(opt_sched),
             "pretrained": adamw(lambda s: opt_sched(s) * 0.1)}, label))
    elif part == "decoder":
        keys = ("decoder_pos_embed", "mae_decoder", "increase_dim")
        label = jax.tree_util.tree_map_with_path(
            lambda p, x: "new" if any(k in _path_str(p).lower() for k in keys)
            else "frozen", params)
        chain.append(optax.multi_transform(
            {"new": adamw(opt_sched), "frozen": optax.set_to_zero()}, label))
    else:
        raise NotImplementedError(f"optimizer.part {part!r}")

    tx = optax.chain(*chain)
    # gradient accumulation (runner_pretrain.py:196-199 divides the loss by
    # step_per_update and calls optimizer.step every k batches): MultiSteps
    # accumulates the mean gradient over k mini-steps then applies one update
    if spu > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=spu)
    return tx, sched
