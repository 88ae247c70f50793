"""End-to-end CLI-mode coverage: every `main.py` dispatch target runs on the
synthetic dataset with a tiny model + a real saved checkpoint (the class of
path where the --ckpts join bug hid)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from point_dae_tpu.engine.train_state import TrainState
from point_dae_tpu.models import build_model_from_cfg
from point_dae_tpu.utils.checkpoint import save_checkpoint
from point_dae_tpu.utils.config import ConfigDict

BASE = {"NAME": "Synthetic", "N_POINTS": 2048, "num_classes": 15,
        "with_normal": True}
OTH = {"subset": "train", "npoints": 64, "size": 16}
MODEL = {"NAME": "PointNet_NoT", "cls_dim": 15}


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    """A real saved checkpoint of the tiny classifier."""
    model = build_model_from_cfg(ConfigDict(MODEL))
    v = model.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)},
                   jnp.zeros((2, 64, 3)), train=True)
    st = TrainState.create(model.apply, v["params"], v["batch_stats"],
                           optax.adamw(1e-3))
    d = tmp_path_factory.mktemp("ck")
    save_checkpoint(str(d), "ckpt-best", st, 0, 0.0)
    return str(d / "ckpt-best")


def _cfg(**over):
    cfg = {"optimizer": {"type": "AdamW", "part": "all",
                         "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
           "scheduler": {"type": "CosLR",
                         "kwargs": {"epochs": 1, "initial_epochs": 0}},
           "dataset": {
               "train": {"_base_": dict(BASE), "others": dict(OTH)},
               "val": {"_base_": dict(BASE),
                       "others": dict(OTH, subset="test", size=8, seed=1)},
               "test": {"_base_": dict(BASE),
                        "others": dict(OTH, subset="test", size=8, seed=1)},
               "extra_train": {"_base_": dict(BASE),
                               "others": dict(OTH, size=8, seed=2)}},
           "model": dict(MODEL),
           "npoints": 64, "total_bs": 8, "max_epoch": 0, "smooth": "False"}
    cfg.update(over)
    return ConfigDict(cfg)


def _args(tmp_path, **over):
    from types import SimpleNamespace

    d = dict(seed=0, experiment_path=str(tmp_path), val_freq=1, resume=False,
             start_ckpts=None, ckpts=None, tfboard_path=None, vote=False,
             way=-1, shot=-1, fold=-1, mode=None, vote_repeats=2)
    d.update(over)
    return SimpleNamespace(**d)


class TestCLIModes:
    def test_svm_classification(self, ckpt, tmp_path):
        from point_dae_tpu.engine.probe import svm_classification

        acc = svm_classification(_cfg(), _args(tmp_path, ckpts=ckpt),
                                 logger_name="t_svm")
        assert 0.0 <= acc <= 100.0

    def test_task_affinity(self, ckpt, tmp_path):
        from point_dae_tpu.engine.probe import task_affinity

        ce = task_affinity(_cfg(), _args(tmp_path, ckpts=ckpt),
                           logger_name="t_aff", epochs=3)
        assert np.isfinite(ce) and ce > 0.0

    def test_so3_rotation(self, ckpt, tmp_path):
        from point_dae_tpu.engine.rotation import run_net_rotation

        out = run_net_rotation(_cfg(), _args(tmp_path, ckpts=ckpt,
                                             mode="z2so3"),
                               logger_name="t_rot")
        assert out is not None

    def test_test_net_with_vote(self, ckpt, tmp_path):
        from point_dae_tpu.engine.finetune import test_net

        acc = test_net(_cfg(), _args(tmp_path, ckpts=ckpt, vote=True),
                       logger_name="t_test")
        assert 0.0 <= acc <= 100.0

    @pytest.mark.parametrize("model_cfg", [
        # single-array reconstruct (FC cloud): used to be unpacked as a
        # tuple, silently rendering batch samples 0/1 as coarse/rebuild
        {"NAME": "Point_CAE_DGCNN_FCOnly", "corrupt_type": [],
         "num_group": 16, "loss": "cdl2"},
        # tuple reconstruct (coarse, rebuild, mask) on the flagship
        {"NAME": "PointCAE_transformer_fc_global_folding_local",
         "corrupt_type": ["affine_r3", "Drop-Patch"], "all_patch": "False",
         "group_size": 8, "num_group": 8, "loss": "cdl2",
         "transformer_config": {
             "rand_ratio": "False", "mask_ratio": 0.5, "mask_type": "rand",
             "trans_dim": 32, "encoder_dims": 32, "depth": 1,
             "drop_path_rate": 0.0, "cls_dim": 8, "num_heads": 2,
             "decoder_depth": 1, "decoder_num_heads": 2}},
    ], ids=["fconly_single_array", "flagship_tuple"])
    def test_vis_reconstruction(self, tmp_path, model_cfg):
        import os

        from point_dae_tpu.engine.visualization import test_vis_reconstruction

        out_dir = test_vis_reconstruction(
            _cfg(model=dict(model_cfg)), _args(tmp_path),
            logger_name="t_vis", max_samples=2)
        npz = [f for f in os.listdir(out_dir) if f.endswith(".npz")]
        assert len(npz) == 2
        d = np.load(os.path.join(out_dir, npz[0]))
        # coarse/rebuild are full per-sample clouds, not batch slices
        assert d["gt"].shape == (64, 3)
        assert d["coarse"].ndim == 2 and d["coarse"].shape[-1] == 3
        assert d["rebuild"].ndim == 2 and d["rebuild"].shape[-1] == 3
        assert np.isfinite(d["rebuild"]).all()

    def test_saliency(self, ckpt, tmp_path):
        from point_dae_tpu.engine.saliency import vis_saliency_map

        out = vis_saliency_map(_cfg(), _args(tmp_path, ckpts=ckpt),
                               logger_name="t_sal")
        assert out is not None

    def test_corruption_robustness(self, ckpt, tmp_path):
        from point_dae_tpu.engine.robustness import test_net_corruption

        res = test_net_corruption(_cfg(), _args(tmp_path, ckpts=ckpt),
                                  logger_name="t_rob")
        assert res is not None


class TestResumeFlow:
    def test_pretrain_resume_continues_epochs(self, tmp_path):
        """run_pretrain --resume restores state and continues from the next
        epoch (runner resume path, builder.py:resume_model role)."""
        from types import SimpleNamespace

        from point_dae_tpu.engine.pretrain import run_pretrain

        cfg = ConfigDict({
            "optimizer": {"type": "AdamW", "part": "all",
                          "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
            "scheduler": {"type": "CosLR",
                          "kwargs": {"epochs": 3, "initial_epochs": 0}},
            "dataset": {
                "train": {"_base_": dict(BASE), "others": dict(OTH)}},
            "model": {"NAME": "Point_CAE_DGCNN_FCOnly", "corrupt_type": [],
                      "loss": "cdl2"},
            "normal_weight": 1.0, "npoints": 64, "total_bs": 8,
            "max_epoch": 1, "loss_type": "xyz"})
        args = SimpleNamespace(seed=0, experiment_path=str(tmp_path),
                               val_freq=1, resume=False, start_ckpts=None,
                               tfboard_path=None)
        out1 = run_pretrain(cfg, args, logger_name="t_resume1")
        steps_after_first = int(out1["state"].step)
        assert steps_after_first == 4          # 2 epochs (0..1) x 2 batches

        cfg["max_epoch"] = 2
        args2 = SimpleNamespace(seed=0, experiment_path=str(tmp_path),
                                val_freq=1, resume=True, start_ckpts=None,
                                tfboard_path=None)
        out2 = run_pretrain(cfg, args2, logger_name="t_resume2")
        # resumed from epoch 2 only: exactly one more epoch of steps
        assert int(out2["state"].step) == steps_after_first + 2


class TestPlotResults:
    def test_three_modes_from_fabricated_logs(self, tmp_path):
        """tools/plot_results.py consumes the log-line API and writes PNGs."""
        import subprocess
        import sys

        exp = tmp_path / "exp_a"
        exp.mkdir()
        (exp / "run.log").write_text(
            "x [Validation] EPOCH: 0  acc = 0.5000\n"
            "x [Validation] EPOCH: 1  acc = 0.7000\n"
            "x [TEST] acc = 0.7100\n"
            "x [Corruption] jitter level 0: OA = 0.9000\n"
            "x [Corruption] jitter level 1: OA = 0.8000\n"
            "x [Corruption] scale level 0: OA = 0.8500\n")
        for mode, out in (("accuracy", "a.png"), ("corruption", "c.png"),
                          ("curves", "v.png")):
            r = subprocess.run(
                [sys.executable, "tools/plot_results.py", mode, str(exp),
                 "-o", str(tmp_path / out)],
                capture_output=True, text=True, cwd=".",
                env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
            assert r.returncode == 0, r.stderr
            assert (tmp_path / out).stat().st_size > 1000

    def test_new_figure_modes(self, tmp_path):
        """robustness_bars / fewshot / affinity_matrix modes + the
        harness's dict-format corruption lines."""
        import subprocess
        import sys
        import os as _os

        env = {**_os.environ, "JAX_PLATFORMS": "cpu"}

        def run(mode, target, out):
            r = subprocess.run(
                [sys.executable, "tools/plot_results.py", mode, target,
                 "-o", str(tmp_path / out)],
                capture_output=True, text=True, cwd=".", env=env)
            assert r.returncode == 0, r.stderr
            assert (tmp_path / out).stat().st_size > 1000

        rob = tmp_path / "rob"
        rob.mkdir()
        (rob / "run.log").write_text(
            "x {'acc': 0.91, 'corruption': 'scale', 'level': 0}\n"
            "x {'acc': 0.90, 'corruption': 'scale', 'level': 1}\n"
            "x {'CE': 0.957, 'OA': 0.91, 'RCE': 1.05, "
            "'corruption': 'scale', 'level': 'Overall'}\n"
            "x {'CE': 0.883, 'OA': 0.721, 'RCE': 0.868, "
            "'corruption': 'jitter', 'level': 'Overall'}\n")
        run("robustness_bars", str(rob), "rb.png")
        run("corruption", str(rob), "ch.png")   # dict-format lines parse

        for w, s, acc in ((5, 10, 95.0), (5, 20, 97.0), (10, 10, 90.0)):
            d = tmp_path / f"fs_{w}_{s}"
            d.mkdir()
            (d / "run.log").write_text(
                f"args.way : {w}\nargs.shot : {s}\n"
                f"x [TEST] acc = {acc:.4f}\n")
        run("fewshot", str(tmp_path / "fs_*"), "fs.png")

        for corrupt in ("affine_r3", "dropout_local"):
            d = tmp_path / f"pretrain_PointCAE_{corrupt}Point_scan_hardest"
            d.mkdir()
            (d / "run.log").write_text("x [TEST] acc = 85.0000\n")
        run("affinity_matrix", str(tmp_path / "pretrain_*"), "am.png")

    def test_ablation_and_dataset_variants(self, tmp_path):
        """ablation (acc vs swept value, plot.py:17-99) and
        dataset_variants (corruption x pose grouped bars,
        plot_results_dataset_variants.py:14-44) figure modes."""
        import subprocess
        import sys
        import os as _os

        env = {**_os.environ, "JAX_PLATFORMS": "cpu"}

        def run(mode, target, out):
            r = subprocess.run(
                [sys.executable, "tools/plot_results.py", mode, target,
                 "-o", str(tmp_path / out)],
                capture_output=True, text=True, cwd=".", env=env)
            assert r.returncode == 0, r.stderr
            assert (tmp_path / out).stat().st_size > 1000

        for alpha, acc in ((0.0, 77.1), (0.4, 81.8), (0.8, 82.8)):
            d = tmp_path / f"sweep_alpha{alpha}"
            d.mkdir()
            (d / "run.log").write_text(f"x [TEST] acc = {acc:.4f}\n")
        run("ablation", str(tmp_path / "sweep_*"), "ab.png")

        for name, acc in (("finetune_affine_r3", 80.4),
                          ("finetune_affine_r3_svd_pose", 81.4),
                          ("finetune_jitter", 73.6),
                          ("finetune_jitter_svd_pose", 73.8)):
            d = tmp_path / name
            d.mkdir()
            (d / "run.log").write_text(f"x [TEST] acc = {acc:.4f}\n")
        run("dataset_variants", str(tmp_path / "finetune_*"), "dv.png")


class TestArgParser:
    def test_validations_and_exp_name_decorations(self, tmp_path,
                                                  monkeypatch):
        """get_args mirrors utils/parser.py:108-132: flag exclusivity,
        'none' model_name sentinel, test_/test_corruption_/_mode exp_name
        decorations, --root_folder experiment tree."""
        import os

        import pytest

        from point_dae_tpu.cli import get_args

        monkeypatch.chdir(tmp_path)
        cfg = tmp_path / "cfgs" / "finetune_x.yaml"
        cfg.parent.mkdir()
        cfg.write_text("model: {NAME: DGCNN}\n")

        with pytest.raises(ValueError):
            get_args(["--config", str(cfg), "--test", "--resume"])
        with pytest.raises(ValueError):
            get_args(["--config", str(cfg), "--resume",
                      "--start_ckpts", "x"])
        with pytest.raises(ValueError):
            get_args(["--config", str(cfg), "--test"])   # no --ckpts

        a = get_args(["--config", str(cfg), "--test", "--ckpts", "c.pth",
                      "--mode", "hard", "--model_name", "none"])
        assert a.exp_name == "test_default_hard"
        assert a.model_name is None
        assert a.experiment_path.endswith(
            os.path.join("finetune_x", "cfgs", "test_default_hard"))

        b = get_args(["--config", str(cfg), "--root_folder", "exp2",
                      "--model_name", "DGCNN_Linear"])
        assert os.path.join("exp2", "finetune_xDGCNN_Linear", "cfgs",
                            "default") in b.experiment_path
        assert os.path.isdir(b.experiment_path)


class TestCorruptionGallery:
    def test_gallery_tool(self, tmp_path):
        """tools/corruption_gallery.py writes one PLY per corruption family
        (Corruption_visualization.py parity) + the PNG contact sheet."""
        import subprocess
        import sys
        import os as _os

        r = subprocess.run(
            [sys.executable, "tools/corruption_gallery.py",
             "--out", str(tmp_path), "--npoints", "64", "--png"],
            capture_output=True, text=True, cwd=".",
            env={**_os.environ, "JAX_PLATFORMS": "cpu"})
        assert r.returncode == 0, r.stderr
        plys = list(tmp_path.glob("*.ply"))
        assert len(plys) == 14
        head = plys[0].read_text().splitlines()
        assert head[0] == "ply" and "element vertex 64" in head[2]
        assert (tmp_path / "gallery-synthetic.png").stat().st_size > 1000


class TestAutoResume:
    def test_auto_resume_picks_up_ckpt_last(self, tmp_path):
        """--auto_resume restores from ckpt-last when present and is a
        no-op on a fresh experiment dir (preemption-safe restarts)."""
        from types import SimpleNamespace

        from point_dae_tpu.engine.pretrain import run_pretrain

        cfg = ConfigDict({
            "optimizer": {"type": "AdamW", "part": "all",
                          "kwargs": {"lr": 0.001, "weight_decay": 0.05}},
            "scheduler": {"type": "CosLR",
                          "kwargs": {"epochs": 3, "initial_epochs": 0}},
            "dataset": {
                "train": {"_base_": dict(BASE), "others": dict(OTH)}},
            "model": {"NAME": "Point_CAE_DGCNN_FCOnly", "corrupt_type": [],
                      "loss": "cdl2"},
            "normal_weight": 1.0, "npoints": 64, "total_bs": 8,
            "max_epoch": 1, "loss_type": "xyz"})

        def args(**over):
            d = dict(seed=0, experiment_path=str(tmp_path), val_freq=1,
                     resume=False, auto_resume=True, start_ckpts=None,
                     tfboard_path=None)
            d.update(over)
            return SimpleNamespace(**d)

        # fresh dir: auto_resume is a no-op
        out1 = run_pretrain(cfg, args(), logger_name="t_auto1")
        steps = int(out1["state"].step)
        assert steps == 4

        # second invocation with auto_resume continues instead of restarting
        cfg["max_epoch"] = 2
        out2 = run_pretrain(cfg, args(), logger_name="t_auto2")
        assert int(out2["state"].step) == steps + 2
