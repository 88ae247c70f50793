"""Draw-level parity against the reference's OWN importable code.

Round-3 VERDICT item 3: all numerical-parity artifacts so far compare
against builder-written torch twins — a twin can repeat the same misreading
and stay green. This module imports the reference's own
``datasets/corrupt_util.py`` (with tiny stubs for easydict / ipdb /
torchvision / timm / knn_cuda / pointnet2_ops) and
``segmentation/models/pointnet2_utils.py`` (imports clean), drives them
with RECORDED random draws, and replays the same draws through OUR
production building blocks, asserting numerical equality of the outputs —
the math is deterministic once the draws are fixed.

What each test pins to the reference's own code:
- affine families: matrix construction (_rot_from_eulers, shear_matrix,
  rotz_matrix) + the x @ A + b application convention
- composites (affine_r3/r5): member order, per-member levels, and the
  (A, b) composition algebra
- selection families (dropout_global/local, density): the exact keep/drop
  set via _k_smallest_mask and histogram_sizes
- additive families (add_global/local): ball_from_draws, cluster_slots,
  per-cluster sigma, sphere_pullback
- geometry ops: furthest_point_sample / ball_query / three_nn vs the
  reference's pure-python oracles (pointnet2_utils.py:60-116 etc.)
"""
import importlib.util
import math
import random as _pyrandom
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"


# --------------------------------------------------------------------------
# reference module loading (file-level, with dependency stubs)

def _install_stubs():
    import torch

    if "easydict" not in sys.modules or not hasattr(
            sys.modules["easydict"], "EasyDict"):
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            __getattr__ = dict.get
            __setattr__ = dict.__setitem__

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed
    ipdb = types.ModuleType("ipdb")
    ipdb.set_trace = lambda: None
    sys.modules.setdefault("ipdb", ipdb)
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)
    sys.modules.setdefault("timm", types.ModuleType("timm"))

    if "knn_cuda" not in sys.modules:
        knn_mod = types.ModuleType("knn_cuda")

        class KNN:
            """CPU stand-in for the KNN_CUDA wheel (transpose_mode=True):
            (ref (B,N,D), query (B,M,D)) -> (dist (B,M,k), idx (B,M,k))
            ascending."""

            def __init__(self, k, transpose_mode=True):
                self.k = k

            def __call__(self, ref, query):
                d = torch.cdist(query, ref)
                dist, idx = torch.topk(d, self.k, dim=-1, largest=False)
                return dist, idx

        knn_mod.KNN = KNN
        sys.modules["knn_cuda"] = knn_mod

    if "pointnet2_ops" not in sys.modules:
        p2 = types.ModuleType("pointnet2_ops")
        p2u = types.ModuleType("pointnet2_ops.pointnet2_utils")
        p2u.furthest_point_sample = None  # only needed for import
        p2.pointnet2_utils = p2u
        sys.modules["pointnet2_ops"] = p2
        sys.modules["pointnet2_ops.pointnet2_utils"] = p2u


def _load(modname, path):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_cu():
    _install_stubs()
    return _load("ref_corrupt_util",
                 f"{REF_ROOT}/datasets/corrupt_util.py")


@pytest.fixture(scope="module")
def ref_p2u():
    _install_stubs()
    return _load("ref_pointnet2_utils",
                 f"{REF_ROOT}/segmentation/models/pointnet2_utils.py")


# --------------------------------------------------------------------------
# draw recording

class _Recorder:
    """Patches np.random.* (and random.*) with delegating wrappers that log
    every draw, so the reference's randomness becomes replayable input."""

    NP_FNS = ("uniform", "randn", "randint", "rand", "normal", "choice")
    PY_FNS = ("random", "choice", "sample")

    def __init__(self, seed):
        self.rng = np.random.RandomState(seed)
        self.pyrng = _pyrandom.Random(seed)
        self.log = []

    def __enter__(self):
        self._saved_np = {n: getattr(np.random, n) for n in self.NP_FNS}
        self._saved_py = {n: getattr(_pyrandom, n) for n in self.PY_FNS}
        for n in self.NP_FNS:
            setattr(np.random, n, self._mk(self.rng, n))
        for n in self.PY_FNS:
            setattr(_pyrandom, n, self._mk(self.pyrng, n))
        return self

    def __exit__(self, *exc):
        for n, f in self._saved_np.items():
            setattr(np.random, n, f)
        for n, f in self._saved_py.items():
            setattr(_pyrandom, n, f)

    def _mk(self, rng, name):
        log = self.log

        def wrapper(*a, **k):
            v = getattr(rng, name)(*a, **k)
            log.append((name, v))
            return v

        return wrapper

    def by_name(self, name):
        return [v for n, v in self.log if n == name]


def _rows_sorted(a):
    a = np.asarray(a, np.float64)
    return a[np.lexsort(a.T)]


def _cloud(n=256, seed=0):
    rng = np.random.default_rng(seed)
    # offset from the origin so every |p|^2 > 1e-3 (the CUDA-FPS guard our
    # implementation preserves has no analog in the python oracles)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    x = x + np.sign(x) * 0.2
    return x


# --------------------------------------------------------------------------
# affine families: matrix construction + x @ A + b convention

AFFINE_CASES = [
    # (ref fn name, draws -> (A, b) via OUR production math)
    ("corrupt_tranlate", lambda cu, d: (np.eye(3), d[0])),
    ("corrupt_tranlate_tiny", lambda cu, d: (np.eye(3), d[0])),
    ("corrupt_tranlate_middle", lambda cu, d: (np.eye(3), d[0])),
    ("corrupt_tranlate_too_large", lambda cu, d: (np.eye(3), d[0])),
    ("corrupt_scale_nonorm_2p", lambda cu, d: (np.diag(d[0]), np.zeros(3))),
    ("corrupt_scale_nonorm_1p5", lambda cu, d: (np.diag(d[0]), np.zeros(3))),
    ("corrupt_scale_nonorm_4", lambda cu, d: (np.diag(d[0]), np.zeros(3))),
    ("corrupt_scale_nonorm_10", lambda cu, d: (np.diag(d[0]), np.zeros(3))),
]


@pytest.mark.parametrize("ref_name,build", AFFINE_CASES,
                         ids=[c[0] for c in AFFINE_CASES])
def test_affine_translate_scale_draw_parity(ref_cu, ref_name, build):
    x = _cloud()
    with _Recorder(seed=1) as rec:
        ref_out = getattr(ref_cu, ref_name)(x.copy(), 2)
    draws = rec.by_name("uniform")
    A, b = build(ref_cu, draws)
    mine = x.astype(np.float64) @ np.asarray(A, np.float64) + b
    np.testing.assert_allclose(np.asarray(ref_out, np.float64), mine,
                               rtol=1e-5, atol=1e-6)


def test_rotate_draw_parity(ref_cu):
    from point_dae_tpu.data.corruptions import _rot_from_eulers

    x = _cloud()
    for level_fn in ("corrupt_rotate_360", "corrupt_rotate_360_level2"):
        with _Recorder(seed=2) as rec:
            ref_out = getattr(ref_cu, level_fn)(x.copy(), None)
        angles = rec.by_name("uniform")[0]
        A = np.asarray(_rot_from_eulers(np.asarray(angles, np.float32)))
        np.testing.assert_allclose(np.asarray(ref_out, np.float32),
                                   x @ A, rtol=1e-4, atol=1e-5)


def test_reflection_draw_parity(ref_cu):
    x = _cloud()
    with _Recorder(seed=3) as rec:
        ref_out = ref_cu.corrupt_reflection(x.copy(), None)
    signs = rec.by_name("choice")[0]
    # the reference's Rz @ Ry @ Rx of single-axis reflections == diag(signs)
    np.testing.assert_allclose(np.asarray(ref_out, np.float64),
                               x.astype(np.float64) @ np.diag(
                                   np.asarray(signs, np.float64)),
                               rtol=1e-6)


def test_shear_draw_parity(ref_cu):
    from point_dae_tpu.data.corruptions import shear_matrix

    x = _cloud()
    for fn in ("corrupt_shear_p5", "corrupt_shear_2p", "corrupt_shear_small"):
        with _Recorder(seed=4) as rec:
            ref_out = getattr(ref_cu, fn)(x.copy(), 3)
        s = rec.by_name("uniform")[0]
        A = np.asarray(shear_matrix(np.asarray(s, np.float32)))
        np.testing.assert_allclose(np.asarray(ref_out, np.float32),
                                   x @ A, rtol=1e-5, atol=1e-6)


def test_rotate_z_draw_parity(ref_cu):
    from point_dae_tpu.data.corruptions import rotz_matrix

    x = _cloud()
    with _Recorder(seed=5) as rec:
        ref_out = ref_cu.corrupt_rotate_z_360(x.copy(), 4)
    ang = rec.by_name("uniform")[0][0]
    A = np.asarray(rotz_matrix(np.float32(ang)))
    np.testing.assert_allclose(np.asarray(ref_out, np.float32), x @ A,
                               rtol=1e-4, atol=1e-5)


def test_jitter_draw_parity(ref_cu):
    x = _cloud()
    for level in (0, 4):
        with _Recorder(seed=6) as rec:
            ref_out = ref_cu.corrupt_jitter(x.copy(), level)
        noise = rec.by_name("randn")[0]
        sigma = 0.01 * (level + 1)           # our corrupt_jitter's formula
        np.testing.assert_allclose(ref_out, x + sigma * noise, rtol=1e-6)


def test_pc_normalize_parity(ref_cu):
    from point_dae_tpu.data.corruptions import pc_normalize

    x = _cloud()
    np.testing.assert_allclose(np.asarray(pc_normalize(x)),
                               ref_cu._pc_normalize(x.copy()),
                               rtol=1e-5, atol=1e-6)


def test_scale_with_norm_draw_parity(ref_cu):
    """corrupt_scale = anisotropic scale THEN _pc_normalize (:59-69)."""
    from point_dae_tpu.data.corruptions import pc_normalize

    x = _cloud()
    with _Recorder(seed=7) as rec:
        ref_out = ref_cu.corrupt_scale(x.copy(), 1)
    d = rec.by_name("uniform")[0]
    mine = np.asarray(pc_normalize((x * d).astype(np.float32)))
    np.testing.assert_allclose(np.asarray(ref_out, np.float32), mine,
                               rtol=1e-4, atol=1e-5)


def test_affine_r3_composite_draw_parity(ref_cu):
    """corrupt_data(['affine_r3']) (:1046-1093): member subset, order,
    levels, and composition algebra — replayed through OUR per-family
    (A, b) builders and fold."""
    from point_dae_tpu.data import corruptions as C

    x = _cloud()
    with _Recorder(seed=8) as rec:
        ref_out = ref_cu.corrupt_data(x.copy(), type=["affine_r3"])

    py = [(n, v) for n, v in rec.log if n in ("choice", "sample")]
    count = py[0][1]
    members = py[1][1]
    levels = [v for n, v in py[2:2 + count]]
    assert len(members) == count
    np_draws = iter(rec.by_name("uniform") + [])
    choice_draws = iter([v for n, v in rec.log if n == "choice"
                         and isinstance(v, np.ndarray)])

    A = np.eye(3, dtype=np.float64)
    b = np.zeros(3, dtype=np.float64)
    for name, level in zip(members, levels):
        if name == "translate":
            Ai, bi = np.eye(3), np.asarray(next(np_draws), np.float64)
        elif name == "scale_nonorm":
            Ai, bi = np.diag(np.asarray(next(np_draws))), np.zeros(3)
        elif name == "rotate":
            Ai = np.asarray(C._rot_from_eulers(
                np.asarray(next(np_draws), np.float32)), np.float64)
            bi = np.zeros(3)
        elif name == "reflection":
            Ai, bi = np.diag(np.asarray(next(choice_draws),
                                        np.float64)), np.zeros(3)
        elif name == "shear":
            Ai = np.asarray(C.shear_matrix(
                np.asarray(next(np_draws), np.float32)), np.float64)
            bi = np.zeros(3)
        else:
            raise AssertionError(f"unexpected member {name}")
        # same fold as compose_random_affines: x@A+b then @Ai+bi
        A, b = A @ Ai, b @ Ai + bi
    np.testing.assert_allclose(np.asarray(ref_out, np.float32),
                               (x.astype(np.float64) @ A + b).astype(
                                   np.float32), rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# selection families

def test_dropout_global_draw_parity(ref_cu):
    """dropout_global_random (:572-588) keeps the rows whose shuffle draws
    are the int(N*(1-rate)) smallest — exactly our _k_smallest_mask
    contract."""
    import torch

    import jax.numpy as jnp
    from point_dae_tpu.data.corruptions import _k_smallest_mask

    x = _cloud(128)
    xt = torch.from_numpy(x)[None]
    draws = {}
    orig = torch.rand

    def fake_rand(*shape, **kw):
        v = orig(*shape, **kw)
        draws["r"] = v
        return v

    torch.rand = fake_rand
    try:
        ref_out = ref_cu.dropout_global_random(xt, drop_rate=0.5)
    finally:
        torch.rand = orig
    r = draws["r"][0, :, 0].numpy()
    keep = _k_smallest_mask(jnp.asarray(r), jnp.ones(128, bool),
                            jnp.int32(int(128 * 0.5)))
    mine = x[np.asarray(keep)]
    np.testing.assert_allclose(_rows_sorted(mine),
                               _rows_sorted(ref_out[0].numpy()), rtol=1e-6)


def test_dropout_local_draw_parity(ref_cu):
    """corrupt_dropout_local (:590-612): replay ratio/cluster-count/sizes
    and each cluster's seed point through histogram_sizes +
    _k_smallest_mask; assert the surviving SET matches exactly."""
    import jax.numpy as jnp
    from point_dae_tpu.data.corruptions import (_k_smallest_mask,
                                                histogram_sizes)

    x = _cloud(200, seed=11)
    shuffles = []
    orig_shuffle = ref_cu._shuffle_pointcloud

    def logging_shuffle(pcd):
        out = orig_shuffle(pcd)
        shuffles.append(out.copy())
        return out

    ref_cu._shuffle_pointcloud = logging_shuffle
    try:
        with _Recorder(seed=12) as rec:
            ref_out = ref_cu.corrupt_dropout_local(x.copy(), 2)
    finally:
        ref_cu._shuffle_pointcloud = orig_shuffle

    ratio = rec.by_name("uniform")[0][0]
    ints = rec.by_name("randint")
    num_clusters = int(ints[0])
    picks = np.asarray(ints[1])
    total = int(200 * ratio)
    sizes = np.asarray(histogram_sizes(jnp.asarray(picks, jnp.int32),
                                       jnp.int32(total), num_clusters))
    # reference's own histogram agrees with ours given the same picks
    assert sizes[:num_clusters].sum() == total

    mask = np.ones(200, bool)
    for i in range(num_clusters):
        seed_row = shuffles[i][0]
        (seed_idx,) = np.nonzero((x == seed_row).all(axis=1))
        assert seed_idx.size == 1
        d = np.sum((x - x[seed_idx[0]]) ** 2, axis=1)
        drop = np.asarray(_k_smallest_mask(
            jnp.asarray(d), jnp.asarray(mask), jnp.int32(int(sizes[i]))))
        mask &= ~drop
    np.testing.assert_allclose(_rows_sorted(x[mask]), _rows_sorted(ref_out),
                               rtol=1e-6)
    assert mask.sum() == ref_out.shape[0]


def test_density_draw_parity(ref_cu):
    """density (:875-894): keep iff |p - v|/2 * gate < r."""
    x = _cloud(180, seed=13)
    level = 3
    with _Recorder(seed=14) as rec:
        ref_out = ref_cu.density(x.copy(), level)
    v = rec.by_name("normal")[0]
    r = rec.by_name("uniform")[0]
    v = v / np.linalg.norm(v)
    gate = level / 4.0 + 0.1
    dist = np.linalg.norm(x - v.reshape(1, 3), axis=1) / 2.0
    keep = dist * gate < r                  # our nonuniform_density formula
    np.testing.assert_allclose(x[keep], ref_out, rtol=1e-6)


# --------------------------------------------------------------------------
# additive families

def test_add_global_draw_parity(ref_cu):
    from point_dae_tpu.data.corruptions import ball_from_draws

    x = _cloud(160, seed=15)
    level = 2
    with _Recorder(seed=16) as rec:
        ref_out = ref_cu.corrupt_add_global(x.copy(), level)
    n_add = int(160 * (level + 1) * 0.1)    # our add_global count formula
    assert ref_out.shape[0] == 160 + n_add
    u = rec.by_name("uniform")
    mine_ball = np.asarray(ball_from_draws(
        np.asarray(u[0], np.float32), np.asarray(u[1], np.float32),
        np.asarray(u[2], np.float32)))
    np.testing.assert_allclose(ref_out[160:], mine_ball, rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(ref_out[:160], x, rtol=1e-6)


def test_add_local_draw_parity(ref_cu):
    """corrupt_add_local (:844-870): per-cluster sigma (the round-4 fix),
    contiguous slot assignment, anchor choice, sphere pullback."""
    import jax.numpy as jnp
    from point_dae_tpu.data.corruptions import (cluster_slots,
                                                histogram_sizes,
                                                sphere_pullback)

    x = _cloud(150, seed=17)
    level = 3
    shuffles = []
    orig_shuffle = ref_cu._shuffle_pointcloud

    def logging_shuffle(pcd):
        out = orig_shuffle(pcd)
        shuffles.append(out.copy())
        return out

    ref_cu._shuffle_pointcloud = logging_shuffle
    try:
        with _Recorder(seed=18) as rec:
            ref_out = ref_cu.corrupt_add_local(x.copy(), level)
    finally:
        ref_cu._shuffle_pointcloud = orig_shuffle

    total = int(150 * (level + 1) * 0.1)
    ints = rec.by_name("randint")
    num_clusters = int(ints[0])
    picks = np.asarray(ints[1])
    sizes = np.asarray(histogram_sizes(jnp.asarray(picks, jnp.int32),
                                       jnp.int32(total), num_clusters))
    shuffled = shuffles[0]
    sigmas = rec.by_name("uniform")
    noises = rec.by_name("randn")
    assert len(sigmas) == num_clusters and len(noises) == num_clusters

    ci = np.asarray(cluster_slots(jnp.asarray(sizes, jnp.int32), total))
    anchors = shuffled[:num_clusters]
    sig = np.asarray([float(np.asarray(s).ravel()[0]) for s in sigmas])
    noise = np.concatenate([np.asarray(n).reshape(-1, 3) for n in noises]
                           + [np.zeros((0, 3))], axis=0)
    assert noise.shape[0] == total
    mine_tail = anchors[ci] + sig[ci][:, None] * noise
    mine_tail = np.asarray(sphere_pullback(
        jnp.asarray(mine_tail, jnp.float32)))
    np.testing.assert_allclose(np.asarray(ref_out[150:], np.float32),
                               mine_tail, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ref_out[:150], shuffled, rtol=1e-6)


# --------------------------------------------------------------------------
# geometry ops vs the reference's pure-python oracles

def test_fps_vs_reference_python_oracle(ref_p2u):
    """farthest_point_sample (pointnet2_utils.py:60-82) with the random
    start pinned to 0 == our CUDA-convention FPS (first pick = 0)."""
    import torch

    from point_dae_tpu.ops.geometry import furthest_point_sample

    x = np.stack([_cloud(128, seed=s) for s in range(4)])
    orig = torch.randint

    def zero_randint(*a, **k):
        return torch.zeros(a[-1] if isinstance(a[-1], tuple) else k["size"],
                           dtype=torch.long)

    torch.randint = zero_randint
    try:
        ref_idx = ref_p2u.farthest_point_sample(torch.from_numpy(x), 32)
    finally:
        torch.randint = orig
    mine = np.asarray(furthest_point_sample(x, 32))
    np.testing.assert_array_equal(mine, ref_idx.numpy())


def test_ball_query_vs_reference_python_oracle(ref_p2u):
    """query_ball_point (pointnet2_utils.py:95-116): same in-range index
    order and first-index fill."""
    import torch

    from point_dae_tpu.ops.geometry import ball_query

    x = np.stack([_cloud(128, seed=s + 10) for s in range(3)])
    centers = x[:, :16]
    ref_idx = ref_p2u.query_ball_point(
        0.9, 8, torch.from_numpy(x), torch.from_numpy(centers))
    mine = np.asarray(ball_query(0.9, 8, x, centers))
    np.testing.assert_array_equal(mine, ref_idx.numpy())


def test_three_nn_vs_reference_square_distance(ref_p2u):
    """Our three_nn == 3 smallest of the reference's square_distance
    (the FP module's interpolation neighbourhood,
    pointnet2_utils.py:19-38 + :231-258)."""
    import torch

    from point_dae_tpu.ops.geometry import three_nn

    unknown = np.stack([_cloud(96, seed=s + 20) for s in range(2)])
    known = np.stack([_cloud(24, seed=s + 30) for s in range(2)])
    d = ref_p2u.square_distance(torch.from_numpy(unknown),
                                torch.from_numpy(known))
    ref_d, ref_i = d.sort(dim=-1)
    mine_d, mine_i = three_nn(unknown, known)
    np.testing.assert_array_equal(np.asarray(mine_i),
                                  ref_i[..., :3].numpy())
    np.testing.assert_allclose(np.asarray(mine_d), ref_d[..., :3].numpy(),
                               rtol=1e-4, atol=1e-5)
