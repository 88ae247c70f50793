"""Device-resident dataset cache (data/device_cache.py): permutation
semantics, storage dtype error bounds, mesh sharding of served batches,
and the pretrain-engine integration knob."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_dae_tpu.data.device_cache import DeviceCache, build_device_cache


def _clouds(m=40, n=16, c=6, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(m, n, c)).astype(np.float32)


class TestDeviceCache:
    def test_epoch_partitions_dataset(self):
        pts = _clouds()
        cache = DeviceCache(pts, dtype=jnp.float32)
        cache.set_epoch(3)
        bs = 8
        seen = []
        for i in range(cache.steps_per_epoch(bs)):
            b = np.asarray(cache.batch(i, bs))
            assert b.shape == (bs, 16, 6) and b.dtype == np.float32
            # recover source row ids by exact match (f32 storage)
            for row in b:
                hit = np.where((pts == row).all(axis=(1, 2)))[0]
                assert len(hit) == 1
                seen.append(int(hit[0]))
        assert len(seen) == len(set(seen))        # no repeats in an epoch
        assert len(seen) == 40                    # full coverage (40 % 8 == 0)

    def test_shuffle_differs_across_epochs_and_is_deterministic(self):
        cache = DeviceCache(_clouds(), dtype=jnp.float32, seed=7)
        cache.set_epoch(0)
        b0 = np.asarray(cache.batch(0, 8))
        cache.set_epoch(1)
        b1 = np.asarray(cache.batch(0, 8))
        assert not np.array_equal(b0, b1)
        cache2 = DeviceCache(_clouds(), dtype=jnp.float32, seed=7)
        cache2.set_epoch(0)
        np.testing.assert_array_equal(np.asarray(cache2.batch(0, 8)), b0)

    def test_drop_last(self):
        cache = DeviceCache(_clouds(m=41), dtype=jnp.float32)
        assert cache.steps_per_epoch(8) == 5      # 41 // 8

    def test_f16_storage_error_bound(self):
        pts = _clouds()
        cache = DeviceCache(pts, dtype=jnp.float16)
        cache.set_epoch(0)
        b = np.asarray(cache.batch(0, 8))
        # unit-scale clouds: f16 quantization is ~2^-11 relative
        for row in b:
            errs = np.abs(pts[:, None] - row[None, None, 0]).sum()
            assert np.isfinite(errs)
        src = pts.astype(np.float16).astype(np.float32)
        hit = np.where((src == b[0]).all(axis=(1, 2)))[0]
        assert len(hit) == 1
        np.testing.assert_allclose(b[0], pts[hit[0]], atol=2e-3)

    def test_mesh_batch_sharded_over_data_axis(self):
        from point_dae_tpu.parallel import get_mesh

        mesh = get_mesh()                         # 8 virtual CPU devices
        cache = DeviceCache(_clouds(m=64), mesh=mesh, dtype=jnp.float32)
        cache.set_epoch(0)
        b = cache.batch(0, 16)
        assert b.shape == (16, 16, 6)
        # served batch must be sharded over the data axis like
        # shard_batch() output (the train step's in_sharding)
        shard_shapes = {s.data.shape for s in b.addressable_shards}
        assert shard_shapes == {(16 // mesh.devices.size, 16, 6)}

    def test_iter_refuses(self):
        cache = DeviceCache(_clouds(), dtype=jnp.float32)
        with pytest.raises(TypeError):
            iter(cache)


class _MapSet:
    def __init__(self, pts):
        self.pts = pts

    def __len__(self):
        return len(self.pts)

    def __getitem__(self, i):
        return {"points": self.pts[i]}


class TestBuildDeviceCache:
    def test_budget_fallback(self):
        got = build_device_cache(_MapSet(_clouds()), max_bytes=10)
        assert got is None

    def test_builds_and_serves(self):
        cache = build_device_cache(_MapSet(_clouds()), dtype=jnp.float32,
                                   max_bytes=1 << 30)
        assert cache is not None and len(cache) == 40
        cache.set_epoch(0)
        assert np.asarray(cache.batch(0, 4)).shape == (4, 16, 6)


class TestEngineIntegration:
    def test_pretrain_runs_with_device_cache(self, tmp_path):
        """The device_cache knob drives a full (tiny) pretrain epoch loop:
        right step count, finite losses, checkpoints written."""
        import os
        import types

        from point_dae_tpu.engine.pretrain import run_pretrain
        from point_dae_tpu.utils.config import ConfigDict

        cfg = ConfigDict({
            "optimizer": {"type": "AdamW", "part": "all",
                          "kwargs": {"lr": 1e-3, "weight_decay": 0.05}},
            "scheduler": {"type": "CosLR",
                          "kwargs": {"epochs": 2, "initial_epochs": 1}},
            "dataset": {"train": {
                "_base_": {"NAME": "Synthetic", "N_POINTS": 64,
                           "num_classes": 15, "with_normal": True},
                "others": {"subset": "train", "size": 24, "npoints": 32,
                           "aug_type": ["norm"], "corrupt_type": ["clean"],
                           "device_cache": True,
                           "device_cache_dtype": "float32"}}},
            "model": {"NAME": "Point_CAE_DGCNN_FCOnly",
                      "corrupt_type": [], "num_group": 16, "loss": "cdl2"},
            "normal_weight": 1.0, "npoints": 32, "total_bs": 8,
            "step_per_update": 1, "max_epoch": 1, "loss_type": "xyz",
        })
        args = types.SimpleNamespace(
            experiment_path=str(tmp_path), tfboard_path=None, seed=0,
            resume=False, start_ckpts=None, val_freq=1)
        out = run_pretrain(cfg, args, logger_name="devcache_test")
        assert out["best_acc"] >= 0.0
        assert os.path.exists(os.path.join(tmp_path, "ckpt-last"))
