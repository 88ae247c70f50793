"""Engine-level tests on the virtual 8-device CPU mesh: one-step training
parity, optimizer factory semantics, scheduler shapes, checkpoint round-trip
(SURVEY.md §4(c,d))."""
import functools
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_dae_tpu.engine.pretrain import (compute_loss, device_pipeline,
                                           gradual_weight_for, init_model,
                                           make_train_step)
from point_dae_tpu.engine.train_state import (TrainState, build_optimizer,
                                              make_lr_schedule)
from point_dae_tpu.models import build_model_from_cfg
from point_dae_tpu.parallel import get_mesh, replicate, shard_batch
from point_dae_tpu.utils.config import ConfigDict

TINY_CFG = ConfigDict({
    "optimizer": {"type": "AdamW", "part": "all",
                  "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
    "scheduler": {"type": "CosLR", "kwargs": {"epochs": 10, "initial_epochs": 0}},
    "dataset": {"train": {"others": {"npoints": 64, "aug_type": ["norm"],
                                     "corrupt_type": ["affine_r3"]}}},
    "model": {"NAME": "Point_CAE_DGCNN_FCOnly", "corrupt_type": [],
              "loss": "cdl2"},
    "normal_weight": 1.0, "total_bs": 8, "max_epoch": 10,
    "loss_type": "xyznormal_gradual"})


class TestSchedule:
    def test_coslr_endpoints(self):
        cfg = {"optimizer": {"kwargs": {"lr": 1e-3}},
               "scheduler": {"type": "CosLR", "kwargs": {"epochs": 100}}}
        s = make_lr_schedule(cfg, steps_per_epoch=10)
        assert abs(float(s(0)) - 1e-3) < 1e-9
        # end of schedule -> min_lr = lr/1000
        assert abs(float(s(100 * 10)) - 1e-6) < 1e-8

    def test_coslr_warmup_key_quirk(self):
        """Reference quirk: `initial_epochs` is ignored (builder.py:113 reads
        warmup_epochs); only warmup_epochs triggers warmup."""
        cfg = {"optimizer": {"kwargs": {"lr": 1e-3}},
               "scheduler": {"type": "CosLR",
                             "kwargs": {"epochs": 100, "initial_epochs": 10}}}
        s = make_lr_schedule(cfg, steps_per_epoch=1)
        assert abs(float(s(0)) - 1e-3) < 1e-9  # no warmup
        cfg["scheduler"]["kwargs"]["warmup_epochs"] = 10
        s = make_lr_schedule(cfg, steps_per_epoch=1)
        assert float(s(0)) < 1e-4              # warmup active

    def test_loss_type_switch(self):
        lx, ln = jnp.float32(2.0), jnp.float32(3.0)
        assert float(compute_loss("xyz", lx, ln, 0.5, 0.0)) == 2.0
        assert float(compute_loss("xyznormal", lx, ln, 0.5, 0.0)) == 3.5
        assert float(compute_loss("xyznormal_gradual", lx, ln, 0.5,
                                  jnp.float32(0.5))) == 2.75

    def test_gradual_weight(self):
        assert gradual_weight_for("xyznormal_gradual", 60, 120) == 0.5
        assert gradual_weight_for("xyznormal_warm", 20, 120) == 0.5
        assert gradual_weight_for("xyznormal_warm", 80, 120) == 1.0
        assert gradual_weight_for("xyz", 60, 120) == 0.0


class TestOptimizerParts:
    def _params(self):
        return {"encoder": {"fc": {"kernel": jnp.ones((4, 4)),
                                   "bias": jnp.ones(4)}},
                "cls_head": {"cls": {"kernel": jnp.ones((4, 2)),
                                     "bias": jnp.ones(2)}}}

    def _grads(self, params):
        return jax.tree_util.tree_map(jnp.ones_like, params)

    def _step(self, part):
        cfg = {"optimizer": {"type": "AdamW", "part": part,
                             "kwargs": {"lr": 0.1, "weight_decay": 0.0}},
               "scheduler": {"type": "function", "kwargs": {}}}
        params = self._params()
        tx, _ = build_optimizer(cfg, params, 1)
        state = tx.init(params)
        updates, _ = tx.update(self._grads(params), state, params)
        return updates

    def test_only_new_freezes_encoder(self):
        up = self._step("only_new")
        assert float(jnp.abs(up["encoder"]["fc"]["kernel"]).sum()) == 0.0
        assert float(jnp.abs(up["cls_head"]["cls"]["kernel"]).sum()) > 0.0

    def test_diff_lr_scales_pretrained(self):
        up = self._step("diff_lr")
        enc = float(jnp.abs(up["encoder"]["fc"]["kernel"]).mean())
        head = float(jnp.abs(up["cls_head"]["cls"]["kernel"]).mean())
        np.testing.assert_allclose(enc, head * 0.1, rtol=1e-3)

    def test_all_updates_everything(self):
        up = self._step("all")
        for leaf in jax.tree_util.tree_leaves(up):
            assert float(jnp.abs(leaf).sum()) > 0.0


class TestDevicePipeline:
    def test_shapes_and_finiteness(self):
        raw = jnp.asarray(np.random.default_rng(0).normal(
            size=(4, 256, 6)).astype(np.float32))
        corrupted, clean = jax.jit(functools.partial(
            device_pipeline, aug_type=("norm",),
            corrupt_type=("affine_r3", "dropout_local"), npoints=128))(
            jax.random.key(0), raw)
        assert corrupted.shape == (4, 128, 3)
        assert clean.shape == (4, 128, 6)
        assert np.isfinite(np.asarray(corrupted)).all()
        # clean is normalized (unit sphere)
        r = np.linalg.norm(np.asarray(clean)[..., :3], axis=-1).max()
        assert r <= 1.0 + 1e-4


class TestMeshTrainStep:
    def test_one_step_on_8dev_mesh(self):
        mesh = get_mesh()
        assert mesh.devices.size == 8
        model = build_model_from_cfg(TINY_CFG["model"])
        raw = jnp.asarray(np.random.default_rng(0).normal(
            size=(8, 128, 6)).astype(np.float32))
        params, bs = init_model(model, TINY_CFG, raw)
        tx, _ = build_optimizer(TINY_CFG, params, 10)
        state = replicate(mesh, TrainState.create(model.apply, params, bs, tx))
        before = jax.device_get(state.params)  # state is donated by the step
        step = make_train_step(model, TINY_CFG, mesh)
        state2, metrics = step(state, shard_batch(mesh, raw),
                               jax.random.key(0), jnp.float32(0.5))
        assert np.isfinite(float(metrics["loss_xyz"]))
        assert int(state2.step) == 1
        # params actually changed
        d = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - np.asarray(b)).sum()),
                                   before, jax.device_get(state2.params))
        assert sum(jax.tree_util.tree_leaves(d)) > 0.0

    def test_sharded_equals_single(self):
        """Data-parallel step == single-device step on the same batch."""
        model = build_model_from_cfg(TINY_CFG["model"])
        raw = jnp.asarray(np.random.default_rng(1).normal(
            size=(8, 128, 6)).astype(np.float32))
        params, bs = init_model(model, TINY_CFG, raw)
        tx, _ = build_optimizer(TINY_CFG, params, 10)
        # both steps donate their state: give each an independent copy
        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

        mesh = get_mesh()
        st_m = replicate(mesh, TrainState.create(model.apply, copy(params),
                                                 copy(bs), tx))
        step_m = make_train_step(model, TINY_CFG, mesh)
        _, m_mesh = step_m(st_m, shard_batch(mesh, raw), jax.random.key(3),
                           jnp.float32(0.5))

        st_1 = TrainState.create(model.apply, copy(params), copy(bs), tx)
        step_1 = make_train_step(model, TINY_CFG, mesh=None)
        _, m_one = step_1(st_1, raw, jax.random.key(3), jnp.float32(0.5))
        np.testing.assert_allclose(float(m_mesh["loss_xyz"]),
                                   float(m_one["loss_xyz"]), rtol=1e-4)

    def test_tensor_parallel_equals_data_parallel(self):
        """2-D (data, model) mesh with Megatron-sharded ViT weights gives
        the same loss as the pure-DP run (GSPMD inserts the TP collectives;
        math is unchanged up to reduction order)."""
        from point_dae_tpu.parallel import get_mesh_2d, shard_params

        # needs ViT blocks (the sharding rules target qkv/proj/mlp kernels)
        cfg = ConfigDict({**TINY_CFG, "model": {
            "NAME": "PointCAE_transformer", "corrupt_type": ["Drop-Patch"],
            "all_patch": "False", "group_size": 8, "num_group": 16,
            "loss": "cdl2",
            "transformer_config": {
                "rand_ratio": "False", "mask_ratio": 0.5, "mask_type": "rand",
                "trans_dim": 32, "encoder_dims": 32, "depth": 2,
                "drop_path_rate": 0.0, "cls_dim": 8, "num_heads": 2,
                "decoder_depth": 1, "decoder_num_heads": 2}}})
        model = build_model_from_cfg(cfg["model"])
        raw = jnp.asarray(np.random.default_rng(2).normal(
            size=(8, 128, 6)).astype(np.float32))
        params, bs = init_model(model, cfg, raw)
        tx, _ = build_optimizer(cfg, params, 10)
        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

        mesh = get_mesh()
        st_d = replicate(mesh, TrainState.create(model.apply, copy(params),
                                                 copy(bs), tx))
        _, m_dp = make_train_step(model, cfg, mesh)(
            st_d, shard_batch(mesh, raw), jax.random.key(5),
            jnp.float32(0.5))

        mesh2 = get_mesh_2d(model_parallel=2)
        assert dict(mesh2.shape) == {"data": 4, "model": 2}
        p2 = shard_params(mesh2, copy(params))
        # at least one kernel actually ends up model-sharded
        from flax.traverse_util import flatten_dict

        specs = {"/".join(map(str, k)): v.sharding.spec
                 for k, v in flatten_dict(p2).items()}
        assert any("model" in str(s) for s in specs.values()), specs
        st_t = TrainState.create(model.apply, p2, replicate(mesh2, copy(bs)),
                                 tx)
        _, m_tp = make_train_step(model, cfg, mesh2)(
            st_t, shard_batch(mesh2, raw), jax.random.key(5),
            jnp.float32(0.5))
        np.testing.assert_allclose(float(m_tp["loss_xyz"]),
                                   float(m_dp["loss_xyz"]), rtol=1e-4)


class TestCheckpoint:
    def test_roundtrip(self):
        import optax

        from point_dae_tpu.utils.checkpoint import (resume_checkpoint,
                                                    save_checkpoint)

        params = {"w": jnp.arange(6.0).reshape(2, 3)}
        tx = optax.adamw(1e-3)
        state = TrainState.create(lambda *a, **k: None, params, {}, tx)
        with tempfile.TemporaryDirectory() as d:
            save_checkpoint(d, "ckpt-last", state, epoch=7, best_metric=0.5)
            state2 = TrainState.create(
                lambda *a, **k: None, {"w": jnp.zeros((2, 3))}, {}, tx)
            state2, start, best = resume_checkpoint(d, state2)
            assert start == 8 and best == 0.5
            np.testing.assert_array_equal(np.asarray(state2.params["w"]),
                                          np.asarray(params["w"]))
            # restored optimizer state must keep its structure: a further
            # update must work (regression: orbax returns raw dicts)
            grads = jax.tree_util.tree_map(jnp.ones_like, state2.params)
            state3 = state2.apply_gradients(grads)
            assert int(state3.step) == int(state2.step) + 1

    def test_merge_pretrained_reports(self):
        from point_dae_tpu.utils.checkpoint import (flatten_keys,
                                                    merge_pretrained)

        params = {"a": {"kernel": jnp.zeros((2, 2))},
                  "b": {"bias": jnp.zeros(3)}}
        pre = {"a/kernel": np.ones((2, 2)), "zzz/unknown": np.ones(1)}
        merged = merge_pretrained(params, pre)
        np.testing.assert_array_equal(np.asarray(merged["a"]["kernel"]),
                                      np.ones((2, 2)))
        np.testing.assert_array_equal(np.asarray(merged["b"]["bias"]),
                                      np.zeros(3))


class TestFinetunePieces:
    def test_fps_resample_shapes(self):
        from point_dae_tpu.engine.finetune import fps_resample

        pts = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 1300, 3)).astype(np.float32))
        out = jax.jit(functools.partial(fps_resample, npoints=1024))(
            jax.random.key(0), pts)
        assert out.shape == (2, 1024, 3)

    def test_smooth_ce(self):
        from point_dae_tpu.engine.finetune import (cross_entropy,
                                                   smooth_cross_entropy)

        logits = jnp.asarray([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
        labels = jnp.asarray([0, 1])
        assert float(cross_entropy(logits, labels)) < 1e-3
        sm = float(smooth_cross_entropy(logits, labels, eps=0.3))
        assert sm > 1.0  # smoothing keeps loss bounded away from 0


class TestMultiStepDispatch:
    def test_scan_fused_equals_sequential(self):
        """k scan-fused steps == k sequential single steps driven with the
        same fold_in subkeys (exact param equality)."""
        from point_dae_tpu.engine.pretrain import make_train_step_multi

        k = 3
        model = build_model_from_cfg(TINY_CFG["model"])
        rng = np.random.default_rng(2)
        chunk = jnp.asarray(rng.normal(size=(k, 8, 128, 6)).astype(np.float32))
        params, bs = init_model(model, TINY_CFG, chunk[0])
        tx, _ = build_optimizer(TINY_CFG, params, 10)
        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
        key, gw = jax.random.key(5), jnp.float32(0.5)

        mesh = get_mesh()
        st_m = replicate(mesh, TrainState.create(model.apply, copy(params),
                                                 copy(bs), tx))
        multi = make_train_step_multi(model, TINY_CFG, mesh, k)
        st_m, m_multi = multi(st_m, shard_batch(mesh, chunk, dim=1), key, gw)

        # sequential reference on the SAME mesh so grad-reduction order
        # matches; only scan-vs-python-loop remains as the difference
        step1 = make_train_step(model, TINY_CFG, mesh)
        st_s = replicate(mesh, TrainState.create(model.apply, copy(params),
                                                 copy(bs), tx))
        for i in range(k):
            st_s, m_seq = step1(st_s, shard_batch(mesh, chunk[i]),
                                jax.random.fold_in(key, i), gw)

        np.testing.assert_allclose(float(m_multi["loss_xyz"]),
                                   float(m_seq["loss_xyz"]), rtol=1e-4)
        flat_m = jax.tree_util.tree_leaves(jax.device_get(st_m.params))
        flat_s = jax.tree_util.tree_leaves(jax.device_get(st_s.params))
        for a, b in zip(flat_m, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)
        assert int(st_m.step) == k

    def test_run_pretrain_steps_per_dispatch(self, tmp_path):
        """End-to-end run_pretrain with steps_per_dispatch>1, including a tail
        that doesn't fill a chunk (5 batches, chunks of 2 -> 1 tail)."""
        from types import SimpleNamespace

        from point_dae_tpu.engine.pretrain import run_pretrain

        cfg = ConfigDict({
            "optimizer": {"type": "AdamW", "part": "all",
                          "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
            "scheduler": {"type": "CosLR",
                          "kwargs": {"epochs": 1, "initial_epochs": 0}},
            "dataset": {
                "train": {"_base_": {"NAME": "Synthetic", "N_POINTS": 2048,
                                     "num_classes": 15, "with_normal": True},
                          "others": {"subset": "train", "npoints": 64,
                                     "aug_type": ["norm"],
                                     "corrupt_type": ["affine_r3"],
                                     "size": 40}}},
            "model": {"NAME": "Point_CAE_DGCNN_FCOnly", "corrupt_type": [],
                      "loss": "cdl2"},
            "normal_weight": 1.0, "total_bs": 8, "max_epoch": 0,
            "steps_per_dispatch": 2, "loss_type": "xyz"})
        args = SimpleNamespace(seed=0, experiment_path=str(tmp_path),
                               val_freq=1, resume=False, start_ckpts=None,
                               tfboard_path=None)
        out = run_pretrain(cfg, args, logger_name="test_spd")
        assert out["state"] is not None
        assert int(out["state"].step) == 5  # 2+2+1 batches all consumed


class TestGradAccumulation:
    def test_step_per_update(self):
        """step_per_update=2: params unchanged after 1 mini-step, updated
        after 2; result matches one step on the mean gradient."""
        import optax

        cfg = {"optimizer": {"type": "AdamW", "part": "all",
                             "kwargs": {"lr": 0.1, "weight_decay": 0.0}},
               "scheduler": {"type": "function", "kwargs": {}},
               "step_per_update": 2}
        params = {"w": jnp.ones((3,))}
        tx, _ = build_optimizer(cfg, params, 1)
        st = tx.init(params)
        g1 = {"w": jnp.array([1.0, 2.0, 3.0])}
        g2 = {"w": jnp.array([3.0, 2.0, 1.0])}
        up1, st = tx.update(g1, st, params)
        assert float(jnp.abs(up1["w"]).sum()) == 0.0     # accumulating
        up2, st = tx.update(g2, st, params)
        assert float(jnp.abs(up2["w"]).sum()) > 0.0      # applied

        # reference: plain tx with the mean gradient
        cfg2 = dict(cfg, step_per_update=1)
        tx2, _ = build_optimizer(cfg2, params, 1)
        st2 = tx2.init(params)
        upm, _ = tx2.update({"w": (g1["w"] + g2["w"]) / 2}, st2, params)
        np.testing.assert_allclose(np.asarray(up2["w"]), np.asarray(upm["w"]),
                                   rtol=1e-6)

    def test_schedule_counts_updates_not_minibatches(self):
        """Under step_per_update=k the optimizer-side schedule must reach
        end-of-training LR after total_minibatches/k UPDATES — MultiSteps
        advances the inner count once per k minibatches, so an unscaled
        schedule would decay k-times slower than the reference's per-epoch
        schedulers."""
        import optax

        spe, k, epochs = 8, 4, 2
        cfg = {"optimizer": {"type": "AdamW", "part": "all",
                             "kwargs": {"lr": 1.0, "weight_decay": 0.0}},
               "scheduler": {"type": "StepLR",
                             "kwargs": {"step_size": 1, "gamma": 0.1,
                                        "epochs": epochs}},
               "step_per_update": k}
        params = {"w": jnp.ones(())}
        tx, _ = build_optimizer(cfg, params, spe)
        st = tx.init(params)
        g = {"w": jnp.ones(())}
        # one epoch of minibatches (spe/k real updates), then one more full
        # accumulation window — its applied update is the first of epoch 1:
        # StepLR(step_size=1, gamma=.1) -> lr 0.1. With a constant gradient
        # AdamW's normalized update magnitude ~= lr, so |up| ~ 0.1 tells the
        # schedule advanced one epoch after spe/k updates; the unscaled bug
        # would still be at lr 1.0.
        for _ in range(spe):
            up, st = tx.update(g, st, params)
        for _ in range(k):
            up, st = tx.update(g, st, params)
        mag = float(jnp.abs(up["w"]))
        assert 0.05 < mag < 0.2, mag

    def test_schedule_fractional_steps_per_epoch_no_drift(self):
        """When steps_per_epoch % k != 0 the updates-per-epoch is fractional
        (MultiSteps windows span epoch boundaries); the schedule must accept
        the exact rational — a ceil() would drift further every epoch."""
        from point_dae_tpu.engine.train_state import make_lr_schedule

        cfg = {"optimizer": {"type": "AdamW", "part": "all",
                             "kwargs": {"lr": 1.0, "weight_decay": 0.0}},
               "scheduler": {"type": "StepLR",
                             "kwargs": {"step_size": 1, "gamma": 0.5,
                                        "epochs": 100}}}
        # 10 minibatches/epoch at k=4 -> exactly 2.5 updates per epoch
        sched = make_lr_schedule(cfg, 2.5)
        np.testing.assert_allclose(float(sched(24)), 0.5 ** 9)   # epoch 9
        np.testing.assert_allclose(float(sched(25)), 0.5 ** 10)  # epoch 10


class TestBNMomentumScheduler:
    def test_reblend_matches_schedule(self):
        """With bnmscheduler configured, the step re-blends running stats to
        the scheduled torch-momentum; bn=0.1 reproduces the unscheduled step
        exactly, bn=0.5 moves the stats 5x further from old."""
        from point_dae_tpu.engine.pretrain import _make_step_body

        cfg = ConfigDict({**TINY_CFG, "bnmscheduler":
                          {"type": "Lambda",
                           "kwargs": {"bn_momentum": 0.5, "bn_decay": 0.5,
                                      "decay_step": 10, "lowest_decay": 0.01}}})
        model = build_model_from_cfg(cfg["model"])
        raw = jnp.asarray(np.random.default_rng(0).normal(
            size=(4, 128, 6)).astype(np.float32))
        params, bs = init_model(model, cfg, raw)
        tx, _ = build_optimizer(cfg, params, 10)
        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
        body = jax.jit(_make_step_body(model, cfg))
        key, gw = jax.random.key(0), jnp.float32(0.5)

        def run(bn):
            st = TrainState.create(model.apply, copy(params), copy(bs), tx)
            st, _ = body(st, raw, key, gw, jnp.float32(bn))
            return jax.device_get(st.batch_stats)

        base = run(0.1)          # identity re-blend
        st0 = TrainState.create(model.apply, copy(params), copy(bs), tx)
        plain = jax.jit(_make_step_body(model, ConfigDict(dict(TINY_CFG))))
        st0, _ = plain(st0, raw, key, gw)
        for a, b in zip(jax.tree_util.tree_leaves(base),
                        jax.tree_util.tree_leaves(
                            jax.device_get(st0.batch_stats))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)

        fast = run(0.5)
        old = jax.device_get(bs)
        for f, b0, o in zip(jax.tree_util.tree_leaves(fast),
                            jax.tree_util.tree_leaves(base),
                            jax.tree_util.tree_leaves(old)):
            np.testing.assert_allclose(np.asarray(f) - np.asarray(o),
                                       5.0 * (np.asarray(b0) - np.asarray(o)),
                                       rtol=1e-4, atol=1e-7)

    def test_run_pretrain_with_bnm(self, tmp_path):
        from types import SimpleNamespace

        from point_dae_tpu.engine.pretrain import run_pretrain

        cfg = ConfigDict({
            "optimizer": {"type": "AdamW", "part": "all",
                          "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
            "scheduler": {"type": "CosLR",
                          "kwargs": {"epochs": 1, "initial_epochs": 0}},
            "bnmscheduler": {"type": "Lambda",
                             "kwargs": {"bn_momentum": 0.5, "bn_decay": 0.5,
                                        "decay_step": 10,
                                        "lowest_decay": 0.01}},
            "dataset": {
                "train": {"_base_": {"NAME": "Synthetic", "N_POINTS": 2048,
                                     "num_classes": 15, "with_normal": True},
                          "others": {"subset": "train", "npoints": 64,
                                     "aug_type": ["norm"],
                                     "corrupt_type": ["affine_r3"],
                                     "size": 16}}},
            "model": {"NAME": "Point_CAE_DGCNN_FCOnly", "corrupt_type": [],
                      "loss": "cdl2"},
            "normal_weight": 1.0, "total_bs": 8, "max_epoch": 0,
            "loss_type": "xyz"})
        args = SimpleNamespace(seed=0, experiment_path=str(tmp_path),
                               val_freq=1, resume=False, start_ckpts=None,
                               tfboard_path=None)
        out = run_pretrain(cfg, args, logger_name="test_bnm")
        assert int(out["state"].step) == 2


class TestWarmStartBatchStats:
    def test_ckpts_merges_bn_stats(self, tmp_path):
        """--ckpts must transfer BN running statistics, not just params —
        linear probes evaluate with frozen running averages."""
        from types import SimpleNamespace

        import optax

        from point_dae_tpu.engine.finetune import run_finetune
        from point_dae_tpu.models import build_model_from_cfg
        from point_dae_tpu.utils.checkpoint import save_checkpoint

        # make a 'pretrained' checkpoint with recognizable BN means
        model = build_model_from_cfg(ConfigDict({"NAME": "PointNet_NoT",
                                                 "cls_dim": 15}))
        dummy = jnp.zeros((2, 64, 3), jnp.float32)
        v = model.init({"params": jax.random.key(0),
                        "dropout": jax.random.key(1)}, dummy, train=True)
        marked_bs = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, 0.123), v["batch_stats"])
        tx = optax.adamw(1e-3)
        st = TrainState.create(model.apply, v["params"], marked_bs, tx)
        ck = tmp_path / "pre"
        save_checkpoint(str(ck), "ckpt-best", st, 0, 0.0)

        base = {"NAME": "Synthetic", "N_POINTS": 2048, "num_classes": 15,
                "with_normal": True}
        cfg = ConfigDict({
            "optimizer": {"type": "AdamW", "part": "only_new",
                          "kwargs": {"lr": 0.01, "weight_decay": 0.0}},
            "scheduler": {"type": "CosLR",
                          "kwargs": {"epochs": 1, "initial_epochs": 0}},
            "dataset": {
                "train": {"_base_": dict(base),
                          "others": {"subset": "train", "npoints": 64,
                                     "size": 16}},
                "val": {"_base_": dict(base),
                        "others": {"subset": "test", "npoints": 64,
                                   "size": 8, "seed": 1}}},
            "model": {"NAME": "PointNet_NoT", "cls_dim": 15},
            "npoints": 64, "total_bs": 8, "max_epoch": 0, "smooth": "False"})
        args = SimpleNamespace(seed=0, experiment_path=str(tmp_path / "exp"),
                               val_freq=1, resume=False, start_ckpts=None,
                               ckpts=str(ck / "ckpt-best"),
                               tfboard_path=None, vote=False,
                               way=-1, shot=-1, fold=-1)
        out = run_finetune(cfg, args, logger_name="test_bnmerge")
        # the marked running stats made it into the trained state AND stayed
        # exactly frozen: 'only_new' linear probes pin BN statistics
        # (set_bn_eval, runner_finetune.py:30-37 -> freeze_bn in the step)
        for leaf in jax.tree_util.tree_leaves(
                jax.device_get(out["state"].batch_stats)):
            np.testing.assert_allclose(np.asarray(leaf), 0.123, rtol=1e-6)


class TestFreezeBNForwardSemantics:
    def test_only_new_trains_with_running_stats(self):
        """'only_new' probe training must normalize with the pretrained
        RUNNING stats (reference set_bn_eval puts BN in eval mode,
        runner_finetune.py:30-37) — not merely freeze the stat updates while
        still normalizing per batch. DGCNN_Linear has BN but no dropout, so
        the probe step's loss must equal the eval-mode CE exactly."""
        import optax

        from point_dae_tpu.engine.finetune import (cross_entropy,
                                                   fps_resample,
                                                   make_finetune_step)
        from point_dae_tpu.models import build_model_from_cfg

        npoints = 64
        cfg = ConfigDict({
            "optimizer": {"type": "AdamW", "part": "only_new",
                          "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
            "scheduler": {"type": "function", "kwargs": {}},
            "model": {"NAME": "DGCNN_Linear", "cls_dim": 5},
            "npoints": npoints})
        model = build_model_from_cfg(cfg["model"])
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.normal(size=(4, npoints, 3)).astype(np.float32)
                          + 0.7)   # nonzero mean: batch vs running stats differ
        labels = jnp.asarray(rng.integers(0, 5, 4))
        v = model.init({"params": jax.random.key(0),
                        "dropout": jax.random.key(1)}, pts, train=True)
        key = jax.random.key(9)

        # expected: eval-mode forward (running stats) on the same resample
        # (computed first — the train steps donate their state buffers)
        k_fps, _, _ = jax.random.split(key, 3)
        p = fps_resample(k_fps, pts[..., :3], npoints)
        logits_eval = model.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            p, train=False)
        loss_eval = float(cross_entropy(logits_eval, labels))

        def fresh_state():
            copy = jax.tree_util.tree_map(jnp.array, v)
            return TrainState.create(model.apply, copy["params"],
                                     copy.get("batch_stats", {}),
                                     optax.adamw(1e-3))

        step = make_finetune_step(model, cfg, mesh=None)
        _, metrics = step(fresh_state(), pts, labels, key)
        np.testing.assert_allclose(float(metrics["loss"]), loss_eval,
                                   rtol=1e-5)

        # sanity: a non-probe config (part=all, batch statistics) differs,
        # i.e. this test would catch a regression to batch-stat training
        cfg2 = ConfigDict(dict(cfg, optimizer={
            "type": "AdamW", "part": "all",
            "kwargs": {"lr": 0.001, "weight_decay": 0.05}}))
        step2 = make_finetune_step(model, cfg2, mesh=None)
        _, metrics2 = step2(fresh_state(), pts, labels, key)
        assert abs(float(metrics2["loss"]) - loss_eval) > 1e-4


class TestEvalOutputReplication:
    def test_eval_outputs_fully_replicated(self):
        """Eval-step outputs must be fully replicated: every host
        device_gets them, and a multi-host data-sharded array is not
        fully addressable locally (mesh.py:shard_batch docs)."""
        from point_dae_tpu.engine.finetune import (make_eval_step,
                                                   make_vote_step)
        from point_dae_tpu.models import build_model_from_cfg
        from point_dae_tpu.parallel import get_mesh, replicate, shard_batch

        mesh = get_mesh()
        cfg = ConfigDict({"model": {"NAME": "PointNet_NoT", "cls_dim": 15},
                          "npoints": 64})
        model = build_model_from_cfg(cfg["model"])
        pts = jnp.asarray(np.random.default_rng(0).normal(
            size=(8, 64, 3)).astype(np.float32))
        v = model.init({"params": jax.random.key(0),
                        "dropout": jax.random.key(1)}, pts, train=True)
        import optax
        st = replicate(mesh, TrainState.create(
            model.apply, v["params"], v.get("batch_stats", {}),
            optax.adamw(1e-3)))
        logits = make_eval_step(model, cfg, mesh)(st, shard_batch(mesh, pts))
        assert logits.sharding.is_fully_replicated
        vlogits = make_vote_step(model, cfg, mesh, times=2)(
            st, shard_batch(mesh, pts), jax.random.key(2))
        assert vlogits.sharding.is_fully_replicated
