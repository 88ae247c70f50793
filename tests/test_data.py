"""Dataset / loader / transforms / native IO tests."""
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_dae_tpu.data.datasets import Synthetic, build_dataset_from_cfg
from point_dae_tpu.data.loader import DataLoader
from point_dae_tpu.data import transforms as T


class TestSynthetic:
    def test_deterministic(self):
        ds = Synthetic({"size": 8, "N_POINTS": 256})
        a = ds[3]["points"]
        b = ds[3]["points"]
        np.testing.assert_array_equal(a, b)
        assert a.shape == (256, 6)
        assert ds[0]["label"] != ds[1]["label"]

    def test_build_from_cfg(self):
        ds = build_dataset_from_cfg({"NAME": "Synthetic", "size": 4},
                                    {"N_POINTS": 128, "subset": "train"})
        assert len(ds) == 4
        assert ds[0]["points"].shape == (128, 6)


class TestLoader:
    def test_batches_and_epochs(self):
        ds = Synthetic({"size": 20, "N_POINTS": 64})
        loader = DataLoader(ds, 8, shuffle=True, drop_last=True, seed=1)
        assert len(loader) == 2
        b1 = [b["points"].shape for b in loader]
        assert b1 == [(8, 64, 6), (8, 64, 6)]
        first_epoch0 = next(iter(loader))["model_id"]
        loader.set_epoch(1)
        first_epoch1 = next(iter(loader))["model_id"]
        assert list(first_epoch0) != list(first_epoch1)  # reshuffled

    def test_host_sharding(self):
        ds = Synthetic({"size": 16, "N_POINTS": 32})
        l0 = DataLoader(ds, 4, shuffle=False, num_hosts=2, host_id=0)
        l1 = DataLoader(ds, 4, shuffle=False, num_hosts=2, host_id=1)
        ids0 = {m for b in l0 for m in b["model_id"]}
        ids1 = {m for b in l1 for m in b["model_id"]}
        assert not ids0 & ids1

    def test_host_sharding_tail_padding(self):
        """drop_last=False under multi-host must pad the tail global batch
        by wrapping (DistributedSampler semantics): every host yields the
        SAME number of FULL batches — a short/empty host-local tail would
        deadlock the mesh collectives on the other hosts."""
        ds = Synthetic({"size": 10, "N_POINTS": 32})  # gb=8 -> tail of 2
        loaders = [DataLoader(ds, 4, shuffle=False, drop_last=False,
                              num_hosts=2, host_id=h) for h in (0, 1)]
        assert [len(l) for l in loaders] == [2, 2]
        batches = [[b["model_id"] for b in l] for l in loaders]
        for per_host in batches:
            assert len(per_host) == 2
            assert all(len(b) == 4 for b in per_host)
        # global batch 0 covers samples 0..7 in order; tail batch covers
        # 8,9 then wraps to 0,1 (host 0) and 2..5 (host 1)
        assert list(batches[0][0]) + list(batches[1][0]) == [
            f"{i:06d}" for i in range(8)]
        tail = list(batches[0][1]) + list(batches[1][1])
        assert tail[:2] == ["000008", "000009"]
        assert tail[2:] == [f"{i:06d}" for i in range(6)]

    def test_dataset_error_propagates(self):
        """A dataset read error must RAISE on the consumer, not kill the
        prefetch thread before the end sentinel and hang q.get() forever."""

        class Exploding:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                if i >= 4:
                    raise OSError(f"bad shard {i}")
                return {"points": np.zeros((16, 3), np.float32),
                        "label": 0}

        loader = DataLoader(Exploding(), 4, shuffle=False, drop_last=True)
        import pytest

        with pytest.raises(OSError, match="bad shard"):
            for _ in loader:
                pass

    def test_abandoned_iterator_does_not_leak_blocked_worker(self):
        """Breaking out mid-epoch must release the worker thread (it checks
        the stop flag while blocked on the full prefetch queue)."""
        import threading

        before = threading.active_count()
        ds = Synthetic({"size": 64, "N_POINTS": 16})
        for _ in range(8):
            it = iter(DataLoader(ds, 4, shuffle=False, prefetch=1))
            next(it)
            it.close()          # abandon mid-epoch
        import time

        deadline = time.time() + 5.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before + 1


class TestTransforms:
    def setup_method(self):
        self.pts = jnp.asarray(np.random.default_rng(0).normal(
            size=(4, 64, 3)).astype(np.float32))

    def test_scale_translate_bounds(self):
        out = T.pointcloud_scale_and_translate(jax.random.key(0), self.pts)
        assert out.shape == self.pts.shape
        assert not np.allclose(np.asarray(out), np.asarray(self.pts))

    def test_rotate_preserves_norms(self):
        centered = self.pts - self.pts.mean(axis=1, keepdims=True)
        out = T.pointcloud_rotate(jax.random.key(1), centered)
        n_in = np.linalg.norm(np.asarray(centered), axis=-1)
        n_out = np.linalg.norm(np.asarray(out), axis=-1)
        np.testing.assert_allclose(n_in, n_out, rtol=1e-4, atol=1e-5)

    def test_jitter_clip(self):
        out = T.pointcloud_jitter(jax.random.key(2), self.pts, std=0.5,
                                  clip=0.05)
        assert float(jnp.abs(out - self.pts).max()) <= 0.05 + 1e-6

    def test_input_dropout_replaces_with_first(self):
        out = np.asarray(T.random_input_dropout(jax.random.key(3), self.pts))
        first = np.asarray(self.pts)[:, :1, :]
        orig = np.asarray(self.pts)
        replaced = np.all(out == first, axis=-1)
        kept = np.all(out == orig, axis=-1)
        assert np.all(replaced | kept)

    def test_hflip_keeps_up_axis(self):
        out = np.asarray(T.random_horizontal_flip(jax.random.key(4), self.pts,
                                                  upright_axis=2))
        np.testing.assert_array_equal(out[..., 2], np.asarray(self.pts)[..., 2])
        assert np.all(np.abs(out) == np.abs(np.asarray(self.pts)))


class TestNativeIO:
    def test_batch_loader_matches_numpy(self):
        from point_dae_tpu.data import native_io

        if not native_io.available():
            pytest.skip("native library not built")
        with tempfile.TemporaryDirectory() as d:
            paths = []
            for i in range(4):
                a = np.random.default_rng(i).normal(size=(128, 3)).astype(np.float32)
                p = os.path.join(d, f"{i}.npy")
                np.save(p, a)
                paths.append(p)
            batch, ok = native_io.load_npy_batch(paths, 128, 3)
            assert ok.all()
            for i, p in enumerate(paths):
                np.testing.assert_array_equal(batch[i], np.load(p))

    def test_render_shapes(self):
        from point_dae_tpu.data import native_io

        pts = np.random.default_rng(0).normal(size=(256, 3)).astype(np.float32)
        pts /= np.abs(pts).max()
        img = native_io.render_balls(pts, h=64, w=64)
        assert img.shape == (64, 64, 3)
        assert img.max() > 0  # something was drawn


class TestConverter:
    def test_linear_transpose_and_paths(self):
        from point_dae_tpu.utils.convert_torch import convert_state_dict

        sd = {
            "pos_embed.0.weight": np.zeros((128, 3), np.float32),
            "pos_embed.0.bias": np.zeros(128, np.float32),
            "blocks.blocks.0.attn.qkv.weight": np.zeros((96, 32), np.float32),
            "norm.weight": np.ones(32, np.float32),
            "norm.bias": np.zeros(32, np.float32),
            "mask_token": np.zeros((1, 1, 32), np.float32),
            "increase_dim.0.weight": np.zeros((96, 32, 1), np.float32),
        }
        flat = convert_state_dict(sd, "transformer")
        assert flat["pos_embed/fc1/kernel"].shape == (3, 128)
        assert flat["blocks/block0/attn/qkv/kernel"].shape == (32, 96)
        assert flat["norm/scale"].shape == (32,)
        assert flat["increase_dim/kernel"].shape == (32, 96)
        assert flat["mask_token"].shape == (1, 1, 32)

    def test_prefix_strip(self):
        from point_dae_tpu.utils.checkpoint import strip_torch_prefixes

        sd = {"module.MAE_encoder.norm.weight": np.ones(3),
              "module.base_model.foo": np.ones(2),
              "plain": np.ones(1)}
        out = strip_torch_prefixes(sd)
        assert set(out) == {"norm.weight", "foo", "plain"}


class TestParseResults:
    def test_scrapes_log_lines(self, tmp_path):
        import subprocess
        import sys

        log = tmp_path / "run1" / "a.log"
        log.parent.mkdir()
        log.write_text(
            "[Validation] EPOCH: 1  acc = 85.1000\n"
            "[Validation] EPOCH: 2  acc = 91.2000\n")
        out = subprocess.run(
            [sys.executable, "tools/parse_results.py", str(tmp_path)],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
        assert "91.20" in out.stdout

    def test_test_vote_line_outranks_plain_test(self, tmp_path):
        """A test-mode log holds both [TEST] and [TEST_VOTE] lines; the
        aggregate must report the (higher) vote best, matching the engine's
        actual 'best = ' spelling (finetune.test_net)."""
        from tools.parse_results import best_from_log

        log = tmp_path / "t.log"
        log.write_text(
            "[TEST] acc = 92.1000\n"
            "[TEST_VOTE] iter 0: acc = 92.8000 best = 92.8000\n"
            "[TEST_VOTE] iter 1: acc = 92.5000 best = 93.1000\n")
        assert best_from_log(str(log), "acc") == 93.1

    def _run(self, *argv):
        import subprocess
        import sys

        return subprocess.run(
            [sys.executable, "tools/parse_results.py", *argv],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))).stdout

    def test_affinity_matrix_mode(self, tmp_path):
        """--matrix pivots multi-exp dirs into (corruption x task) cells
        (the parse_acc_affinity.py aggregation)."""
        for corrupt in ("affine_r3", "dropout_local"):
            for task in ("scan_hardest", "modelnet"):
                d = tmp_path / f"pretrain_PointCAE_{corrupt}Point_{task}"
                d.mkdir()
                acc = 80.0 if corrupt == "affine_r3" else 70.0
                (d / "a.log").write_text(
                    f"[Validation] EPOCH: 1  acc = {acc:.4f}\n")
        out = self._run(str(tmp_path), "--matrix")
        assert "affine_r3" in out and "dropout_local" in out
        assert "scan_hardest" in out and "modelnet" in out
        assert "80.000" in out and "70.000" in out

    def test_name_filters(self, tmp_path):
        for name, acc in (("exp_keepme_seed0", 90.0), ("exp_dropme", 10.0)):
            d = tmp_path / name
            d.mkdir()
            (d / "a.log").write_text(
                f"[Validation] EPOCH: 1  acc = {acc:.4f}\n")
        out = self._run(str(tmp_path), "--multi-exp",
                        "--name_required", "keepme")
        assert "90.000" in out and "10.000" not in out
        out = self._run(str(tmp_path), "--multi-exp",
                        "--name_forbidded", "dropme")
        assert "90.000" in out and "10.000" not in out

    def test_fewshot_from_args_lines(self, tmp_path):
        """way/shot read from the logged 'args.way :' lines like the
        reference's parse_function_fewshot (parse_acc_affinity.py:152-183)."""
        d = tmp_path / "run_seed0"
        d.mkdir()
        (d / "a.log").write_text(
            "args.way : 5\nargs.shot : 10\n"
            "[Validation] EPOCH: 3  acc = 95.5000\n")
        out = self._run(str(tmp_path), "--few-shot")
        assert "5way_10shot" in out and "95.500" in out

    def test_taskaffinity_reference_line(self, tmp_path):
        """The reference '[Validation] Acc: ... loss = <v>' line parses
        (min across values)."""
        d = tmp_path / "aff"
        d.mkdir()
        (d / "a.log").write_text(
            "[Validation] Acc: 0.8000  loss = 1.2345\n"
            "[Validation] Acc: 0.9000  loss = 0.5000\n")
        out = self._run(str(tmp_path), "--mode", "taskaffinity")
        assert "0.500" in out


class TestConverterNumeric:
    def test_linear_matches_torch(self):
        """A converted torch Linear must compute the same function as Dense."""
        import torch

        from point_dae_tpu.utils.convert_torch import convert_state_dict

        torch.manual_seed(0)
        lin = torch.nn.Linear(6, 4)
        x = torch.randn(5, 6)
        want = lin(x).detach().numpy()

        sd = {"pos_embed.0.weight": lin.weight.detach().numpy(),
              "pos_embed.0.bias": lin.bias.detach().numpy()}
        flat = convert_state_dict(sd, "transformer")
        out = np.asarray(x.numpy() @ flat["pos_embed/fc1/kernel"] +
                         flat["pos_embed/fc1/bias"])
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

    def test_conv1d_k1_matches_torch(self):
        import torch

        from point_dae_tpu.utils.convert_torch import convert_state_dict

        torch.manual_seed(1)
        conv = torch.nn.Conv1d(6, 4, 1)
        x = torch.randn(2, 6, 5)                     # (B, C, N)
        want = conv(x).permute(0, 2, 1).detach().numpy()   # (B, N, 4)

        sd = {"increase_dim.0.weight": conv.weight.detach().numpy(),
              "increase_dim.0.bias": conv.bias.detach().numpy()}
        flat = convert_state_dict(sd, "transformer")
        xl = x.permute(0, 2, 1).numpy()              # channel-last
        out = xl @ flat["increase_dim/kernel"] + flat["increase_dim/bias"]
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


class TestGeneratedConfigCorpus:
    def test_generator_emits_valid_configs(self, tmp_path):
        """tools/gen_cfgs.py output loads, builds, and resolves corruption
        names (sampled)."""
        import subprocess
        import sys

        out = tmp_path / "gen"
        r = subprocess.run([sys.executable, "tools/gen_cfgs.py", "--out",
                            str(out)], capture_output=True, text=True,
                           cwd=".")
        assert r.returncode == 0, r.stderr
        files = sorted(out.glob("*.yaml"))
        assert len(files) >= 300
        from point_dae_tpu.data.corruptions import corruption_capacity
        from point_dae_tpu.models import build_model_from_cfg
        from point_dae_tpu.utils.config import cfg_from_yaml_file

        for f in files[::40]:                       # sample across the corpus
            cfg = cfg_from_yaml_file(str(f))
            build_model_from_cfg(cfg["model"])
            ct = cfg["dataset"]["train"]["others"].get("corrupt_type", [])
            corruption_capacity(1024, tuple(ct))

        # every file must survive a strict loader that rejects duplicate
        # mapping keys (PyYAML's silent last-wins previously hid a doubled
        # encoder_dims in the m2ae finetune configs)
        import yaml

        class _Strict(yaml.SafeLoader):
            pass

        def _no_dupes(loader, node, deep=False):
            m = {}
            for k, v in node.value:
                key = loader.construct_object(k, deep=deep)
                assert key not in m, f"duplicate key {key!r}"
                m[key] = loader.construct_object(v, deep=deep)
            return m

        _Strict.add_constructor(
            yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG, _no_dupes)
        from point_dae_tpu.data.corruptions_patch import PATCH_SUPPORTED

        for f in files:
            with open(f) as fh:
                loaded = yaml.load(fh, Loader=_Strict)
            # transformer recipes corrupt IN-MODEL at patch level: every
            # model corrupt_type must be dispatchable by corrupt_patches
            # (an unsupported name NotImplementedErrors at the first
            # train-step trace — ~50 generated maskpatch files used to)
            mdl = loaded.get("model", {})
            if "transformer" in str(mdl.get("NAME", "")):
                for c in mdl.get("corrupt_type", []):
                    assert c in PATCH_SUPPORTED, (f.name, c)


class TestConfigRoundtrip:
    def test_saved_experiment_config_reloads(self, tmp_path):
        """save_config inlines _base_ as a nested dict; re-reading the
        copied config.yaml (the resume flow) must merge it instead of
        crashing in os.path.isabs(dict)."""
        from point_dae_tpu.utils.config import (cfg_from_yaml_file,
                                                save_config)

        base = tmp_path / "cfgs" / "dataset_configs" / "Base.yaml"
        base.parent.mkdir(parents=True)
        base.write_text("NAME: Synthetic\nN_POINTS: 64\n")
        main = tmp_path / "cfgs" / "main.yaml"
        main.write_text(
            "dataset:\n  train:\n    _base_: cfgs/dataset_configs/Base.yaml\n"
            "    others: {subset: train, npoints: 32}\n"
            "model: {NAME: PointNet_NoT, cls_dim: 5}\n")
        cfg = cfg_from_yaml_file(str(main))
        assert cfg["dataset"]["train"]["_base_"]["NAME"] == "Synthetic"
        saved = tmp_path / "exp" / "config.yaml"
        save_config(cfg, str(saved))
        cfg2 = cfg_from_yaml_file(str(saved))
        assert cfg2["dataset"]["train"]["_base_"]["NAME"] == "Synthetic"
        assert cfg2["model"]["NAME"] == "PointNet_NoT"

    def test_list_of_dicts_gets_attribute_access(self, tmp_path):
        from point_dae_tpu.utils.config import cfg_from_yaml_file

        f = tmp_path / "c.yaml"
        f.write_text("stages:\n  - {NAME: a, dim: 1}\n  - {NAME: b, dim: 2}\n")
        cfg = cfg_from_yaml_file(str(f))
        assert cfg.stages[0].NAME == "a" and cfg.stages[1].dim == 2


class TestUtilRegression:
    def test_load_params_typo_reports_original_path(self):
        from point_dae_tpu.utils.checkpoint import load_params

        import pytest

        with pytest.raises(FileNotFoundError, match="no/such/ckpt-bets"):
            load_params("no/such/ckpt-bets", "no/such/ckpt-bets")

    def test_logger_honors_new_log_file(self, tmp_path):
        """A cached logger must attach a handler for a NEW log file so a
        second run in the same process still writes its own log."""
        from point_dae_tpu.utils.logger import get_logger

        f1 = tmp_path / "run1" / "a.log"
        f2 = tmp_path / "run2" / "b.log"
        lg = get_logger("t_logger_cache", str(f1))
        lg.info("first")
        lg2 = get_logger("t_logger_cache", str(f2))
        lg2.info("second")
        assert "second" in f2.read_text()
        # ...and the old file handler is REPLACED: run 2's lines must not
        # land in run 1's log (the scraper takes a per-file max, so run 1's
        # dir would otherwise report run 2's results)
        assert "second" not in f1.read_text()
        assert "first" in f1.read_text()


class TestNativeBatchPath:
    def test_shapenet_load_batch_matches_getitem(self, tmp_path):
        """ShapeNet.load_batch (native threaded reader) returns the same
        clouds as per-item __getitem__, and the DataLoader prefers it."""
        from point_dae_tpu.data import native_io
        from point_dae_tpu.data.datasets import build_dataset_from_cfg
        from point_dae_tpu.data.loader import DataLoader

        rng = np.random.default_rng(0)
        pc = tmp_path / "pc"
        pc.mkdir()
        names = []
        for i in range(6):
            nm = f"tax{i % 2}-model{i}.npy"
            np.save(pc / nm, rng.normal(size=(64, 6)).astype(np.float32))
            names.append(nm)
        (tmp_path / "train.txt").write_text("\n".join(names))

        ds = build_dataset_from_cfg(
            {"NAME": "ShapeNet", "DATA_PATH": str(tmp_path),
             "PC_PATH": str(pc), "N_POINTS": 64, "with_normal": True},
            {"subset": "train", "npoints": 32})
        got = ds.load_batch([0, 3, 5])
        assert got["points"].shape == (3, 64, 6)
        for j, i in enumerate([0, 3, 5]):
            np.testing.assert_allclose(got["points"][j],
                                       ds[i]["points"], rtol=1e-6)
        if native_io.available():
            # loader path uses it end to end
            loader = DataLoader(ds, 2, shuffle=False)
            batch = next(iter(loader))
            np.testing.assert_allclose(np.asarray(batch["points"][0]),
                                       ds[0]["points"], rtol=1e-6)


class TestDGDatasets:
    """Per-domain PointDA-10 loaders: three distinct layouts + the
    label-conditional orientation fixes (domain_generalization.py:282-507)."""

    def _npy_tree(self, tmp, classes=("chair", "plant"), n=3, npts=32):
        rng = np.random.default_rng(0)
        for c in classes:
            for split in ("train", "test"):
                d = os.path.join(tmp, c, split)
                os.makedirs(d, exist_ok=True)
                for i in range(n):
                    np.save(os.path.join(d, f"{c}_{i}.npy"),
                            rng.normal(size=(npts, 6)).astype(np.float32))

    def test_modelnet_dg_layout_and_norm(self, tmp_path):
        from point_dae_tpu.data.datasets import Modelnet40_DG

        self._npy_tree(str(tmp_path))
        ds = Modelnet40_DG({"DATA_PATH": str(tmp_path), "subset": "train",
                            "N_POINTS": 32})
        assert len(ds) == 6
        # labels are the canonical PointDA-10 indices even on a partial
        # tree (a missing class dir must not shift later labels vs the
        # h5-stored Scannet_DG indices)
        from point_dae_tpu.data.datasets import DG_LABEL_TO_IDX
        assert ds.classes[4] == "chair" and ds.classes[7] == "plant"
        assert sorted({l for _, l in ds.items}) == [
            DG_LABEL_TO_IDX["chair"], DG_LABEL_TO_IDX["plant"]]
        item = ds[0]
        pts = item["points"]
        assert pts.shape[-1] == 3                 # xyz only
        # normal_pc: centered, max L2 norm == 1
        np.testing.assert_allclose(pts.mean(0), 0, atol=1e-5)
        np.testing.assert_allclose(
            np.max(np.linalg.norm(pts, axis=-1)), 1.0, rtol=1e-5)

    def test_shapenet_dg_label_conditional_rotation(self, tmp_path):
        from point_dae_tpu.data.datasets import (Shapenet_DG, dg_normal_pc,
                                                 dg_rotate_shape_x)

        self._npy_tree(str(tmp_path))
        ds = Shapenet_DG({"DATA_PATH": str(tmp_path), "subset": "train",
                          "N_POINTS": 16})
        chair = next(i for i, (p, l) in enumerate(ds.items)
                     if ds.classes[l] == "chair")
        plant = next(i for i, (p, l) in enumerate(ds.items)
                     if ds.classes[l] == "plant")
        # recompute expectations from the raw files
        raw_c = np.load(ds.items[chair][0])[:16, :3].astype(np.float32)
        want_c = dg_rotate_shape_x(dg_normal_pc(raw_c), -np.pi / 2)
        np.testing.assert_allclose(ds[chair]["points"], want_c, atol=1e-6)
        raw_p = np.load(ds.items[plant][0])[:16, :3].astype(np.float32)
        np.testing.assert_allclose(ds[plant]["points"],
                                   dg_normal_pc(raw_p), atol=1e-6)  # no rot

    def test_scannet_dg_h5_catalog(self, tmp_path):
        import h5py

        from point_dae_tpu.data.datasets import (Scannet_DG, dg_normal_pc,
                                                 dg_rotate_shape_x)

        rng = np.random.default_rng(1)
        data = rng.normal(size=(5, 24, 3)).astype(np.float32)
        labels = rng.integers(0, 10, 5)
        with h5py.File(tmp_path / "shard0.h5", "w") as f:
            f.create_dataset("data", data=data[:3])
            f.create_dataset("label", data=labels[:3].reshape(-1, 1))
        with h5py.File(tmp_path / "shard1.h5", "w") as f:
            f.create_dataset("data", data=data[3:])
            f.create_dataset("label", data=labels[3:].reshape(-1, 1))
        # catalog entries carry foreign path prefixes that load_dir re-roots
        (tmp_path / "train_files.txt").write_text(
            "data/scannet/shard0.h5\ndata/scannet/shard1.h5\n")

        ds = Scannet_DG({"DATA_PATH": str(tmp_path), "subset": "train",
                         "N_POINTS": 16})
        assert len(ds) == 5
        item = ds[4]
        assert item["label"] == int(labels[4])
        want = dg_rotate_shape_x(dg_normal_pc(data[4][:16]), -np.pi / 2)
        np.testing.assert_allclose(item["points"], want, atol=1e-6)

    def test_dg_train_aug_on_device(self):
        """'dg' train_aug: per-cloud z-rotation preserves z and norms;
        jitter bounded by the 0.02 clip."""
        from point_dae_tpu.engine.finetune import make_finetune_step
        from point_dae_tpu.engine.train_state import TrainState
        from point_dae_tpu.models import build_model_from_cfg
        import optax

        cfg = {"npoints": 16, "train_aug": "dg", "optimizer": {"part": "all"},
               "model": {"NAME": "PointNet_NoT", "cls_dim": 4}}
        model = build_model_from_cfg(cfg["model"])
        rng = np.random.default_rng(2)
        pts = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
        variables = jax.jit(lambda: model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            pts, train=True))()
        state = TrainState.create(
            model.apply, variables["params"],
            variables.get("batch_stats", {}), optax.sgd(1e-3))
        step = make_finetune_step(model, cfg, mesh=None)
        labels = jnp.asarray([0, 1])
        state2, metrics = step(state, pts, labels, jax.random.key(3))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["acc"]))
