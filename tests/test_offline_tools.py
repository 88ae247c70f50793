"""Smoke tests for the offline partseg visualizer and the task-affinity
subset generator (segmentation/main_visual.py and
datasets/generate_ShapeNet55DatasetClass_for_task_affinity.py roles)."""
import functools
import os

import numpy as np

from tests.test_partseg_e2e import _fake_shapenetpart


def test_partseg_visual_writes_objs(tmp_path):
    import jax
    import jax.numpy as jnp

    from point_dae_tpu.models import build_model_from_cfg
    from point_dae_tpu.utils.checkpoint import save_checkpoint
    from point_dae_tpu.engine.train_state import TrainState
    import optax
    from tools.partseg_visual import visualize_partseg

    root = str(tmp_path / "shapenetpart")
    os.makedirs(root)
    _fake_shapenetpart(root)
    npoints = 64
    config = {
        "dataset": {"test": {"_base_": {"NAME": "ShapeNetPart",
                                        "DATA_PATH": root},
                             "others": {"subset": "test",
                                        "npoints": npoints}}},
        "model": {"NAME": "PointTransformerPartSeg", "trans_dim": 24,
                  "depth": 4, "drop_path_rate": 0.0, "cls_dim": 50,
                  "num_heads": 2, "group_size": 8, "num_group": 8,
                  "encoder_dims": 24},
    }
    model = build_model_from_cfg(config["model"])
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = jax.jit(functools.partial(model.init, train=True))(
        rngs, jnp.zeros((2, npoints, 3)), jnp.zeros((2, 16)))
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats", {}),
                              optax.adamw(1e-3))
    ckpt_dir = str(tmp_path / "exp")
    os.makedirs(ckpt_dir)
    save_checkpoint(ckpt_dir, "best_model", state, 0, 0.0)

    out_dir = str(tmp_path / "vis")
    files = visualize_partseg(
        config, {"mae": os.path.join(ckpt_dir, "best_model")}, out_dir,
        indices=[0, 1, 999999], logger_name="partseg-vis-test")
    # 2 in-range indices -> 2 prediction objs + 2 gt objs
    assert len(files) == 4
    pred = [f for f in files if f.endswith("mae.obj")]
    gts = [f for f in files if f.endswith("gt.obj")]
    assert len(pred) == 2 and len(gts) == 2
    for f in files:
        lines = open(f).read().strip().splitlines()
        assert len(lines) == npoints
        parts = lines[0].split()
        assert parts[0] == "v" and len(parts) == 7
        rgb = np.array([float(x) for x in parts[4:]])
        assert (rgb >= 0).all() and (rgb <= 1).all()
    # file names carry the category and test-set index
    assert any(os.path.basename(f)[0].isupper() for f in files)
    # predictions are within-category colors: every color row is one of
    # the first 4 palette rows (both fixture categories have 4 parts)
    from tools.partseg_visual import CMAP
    for f in pred:
        for ln in open(f).read().strip().splitlines():
            rgb = tuple(round(float(x), 4) for x in ln.split()[4:])
            assert rgb in {tuple(np.round(c, 4)) for c in CMAP[:4]}


def test_generate_task_affinity_subset(tmp_path):
    from tools.generate_task_affinity_subset import generate_subset

    list_dir = str(tmp_path / "lists")
    os.makedirs(list_dir)
    rng = np.random.RandomState(0)
    cats = ["02691156", "03001627", "04379243"]
    counts = {"train": [60, 40, 5], "test": [150, 90, 120]}
    for subset in ("train", "test"):
        with open(os.path.join(list_dir, f"{subset}.txt"), "w") as f:
            for cat, n in zip(cats, counts[subset]):
                for j in range(n):
                    f.write(f"{cat}-{rng.bytes(8).hex()}.npy\n")

    out = str(tmp_path / "subset")
    kept = generate_subset(list_dir, out, per_cat_train=50,
                           per_cat_test=100, seed=0)
    # caps apply per category; smaller categories are kept whole
    assert kept == {"train": 50 + 40 + 5, "test": 100 + 90 + 100}
    for subset, total in kept.items():
        lines = open(os.path.join(out, f"{subset}.txt")).read().splitlines()
        assert len(lines) == total
        assert all(ln.endswith(".npy") and "-" in ln for ln in lines)
    # seeded: same inputs -> identical lists
    out2 = str(tmp_path / "subset2")
    generate_subset(list_dir, out2, per_cat_train=50, per_cat_test=100,
                    seed=0)
    for subset in ("train", "test"):
        assert (open(os.path.join(out, f"{subset}.txt")).read()
                == open(os.path.join(out2, f"{subset}.txt")).read())


def test_pcviews_voxel_roundtrip_and_views(tmp_path):
    from point_dae_tpu.utils import pcviews

    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.9, 0.9, (256, 3)).astype(np.float32)
    vol = pcviews.point_cloud_to_volume(pts, vsize=12, radius=1.0)
    assert vol.shape == (12, 12, 12)
    assert 0 < vol.sum() <= 256
    # out-of-radius points are dropped, not wrapped — including points just
    # below -radius, where int truncation (instead of floor) would wrap the
    # index to 0 and falsely occupy a boundary voxel
    far = np.array([[5.0, 0.0, 0.0], [-1.05, 0.3, 0.3]], np.float32)
    assert pcviews.point_cloud_to_volume(far, 12).sum() == 0
    # ...while a point just INSIDE -radius lands in the index-0 voxel
    edge = np.array([[-0.99, 0.0, 0.0]], np.float32)
    vol_edge = pcviews.point_cloud_to_volume(edge, 12)
    assert vol_edge[0, 6, 6] == 1.0 and vol_edge.sum() == 1

    back = pcviews.volume_to_point_cloud(vol)
    assert back.shape[1] == 3 and len(back) == int(vol.sum())
    # every recovered voxel index really is occupied
    idx = back.astype(np.int64)
    assert (vol[idx[:, 0], idx[:, 1], idx[:, 2]] == 1.0).all()

    batch = pcviews.point_cloud_to_volume_batch(
        np.stack([pts, pts]), vsize=8, flatten=True)
    assert batch.shape == (2, 512)
    nb = pcviews.point_cloud_to_volume_batch(
        np.stack([pts, pts]), vsize=8, flatten=False)
    assert nb.shape == (2, 8, 8, 8, 1)

    ply = str(tmp_path / "c.ply")
    pcviews.write_ply(ply, pts)
    rt = pcviews.read_ply(ply)
    np.testing.assert_allclose(rt, pts, atol=1e-5)

    img = pcviews.point_cloud_three_views(pts, canvas_size=64)
    assert img.shape == (64, 192)
    assert img.max() > 0  # something rendered
    # the three views differ (rotations actually applied)
    v1, v2, v3 = img[:, :64], img[:, 64:128], img[:, 128:]
    assert not np.array_equal(v1, v2) and not np.array_equal(v2, v3)


def test_convert_checkpoint_cli_roundtrip(tmp_path):
    """tools/convert_checkpoint.py end-to-end: a reference-layout .pth
    (base_model + module. prefixes, encoder-only warm start) converts into
    an Orbax checkpoint that load_params restores with the translated
    weights actually landed in the model tree."""
    import torch
    import yaml

    from tests.test_convert_parity import TorchDGCNNEncoder
    from tools.convert_checkpoint import convert, guess_family
    from point_dae_tpu.utils.checkpoint import (flatten_keys,
                                                load_params,
                                                load_torch_checkpoint)
    from point_dae_tpu.utils.convert_torch import convert_state_dict

    assert guess_family("DGCNN_feat") == "dgcnn"
    assert guess_family("PointCAE_transformer_fc_global_folding_local") \
        == "transformer"
    assert guess_family("MaskSurf_v2") == "masksurf"
    assert guess_family("PointCAE_pointnetv2") == "pointnet2"

    torch.manual_seed(3)
    tm = TorchDGCNNEncoder(k=6)
    sd = {}
    for i in range(1, 6):
        conv = getattr(tm, f"conv{i}")
        sd[f"dgcnn_encoder.conv{i}.0.weight"] = conv[0].weight.detach()
        for leaf, v in conv[1].state_dict().items():
            sd[f"dgcnn_encoder.bn{i}.{leaf}"] = v
    pth = str(tmp_path / "ckpt.pth")
    torch.save({"base_model": {"module." + k: torch.as_tensor(v)
                               for k, v in sd.items()}}, pth)

    cfgp = str(tmp_path / "cfg.yaml")
    yaml.safe_dump({"model": {"NAME": "DGCNN", "cls_dim": 15, "k": 6},
                    "npoints": 48}, open(cfgp, "w"))
    out = str(tmp_path / "converted")
    convert(pth, cfgp, out)

    restored = load_params(out, out)
    flat_params = flatten_keys(restored["params"])
    flat_bs = flatten_keys(restored["batch_stats"])
    # the translated encoder weights landed exactly
    want = convert_state_dict(load_torch_checkpoint(pth), "dgcnn")
    for k, v in want.items():
        pool = flat_bs if k.endswith(("/mean", "/var")) else flat_params
        assert k in pool, k
        np.testing.assert_allclose(np.asarray(pool[k]), v, rtol=1e-6,
                                   atol=1e-6)
    # the cls head was NOT in the .pth: fresh init values are kept
    assert any(k.startswith("cls_head/") for k in flat_params)
