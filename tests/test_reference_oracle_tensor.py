"""Draw-level parity against the reference's OWN batch-tensor corruption
library (``datasets/corrupt_util_tensor.py`` — the GPU-side library the
transformer models call inside forward, dispatched at :706-730).

Same method as tests/test_reference_oracle.py: import the reference module
with stubs, record every random draw (np.random, python random, torch.rand
/ torch.normal / Tensor.uniform_), replay through OUR production math from
point_dae_tpu/data/corruptions_patch.py, assert numerical equality.

Reference quirks these tests pin (all preserved in corruptions_patch.py):
- translate MULTIPLIES (corrupt_util_tensor.py:104-113);
- reflection writes the z flip to matrix entry [0][0] (:278-280), so the
  effective transform is diag(r0*r2, r1, 1) — z is never flipped;
- density's ``gate = level + 1`` is dead: the selection is dist < r (:568).
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

REF_PATH = "/root/reference/datasets/corrupt_util_tensor.py"


@pytest.fixture(scope="module")
def ref_ct():
    from tests.test_reference_oracle import _install_stubs

    _install_stubs()
    spec = importlib.util.spec_from_file_location("ref_corrupt_util_tensor",
                                                  REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _TorchRecorder:
    """Log torch.rand / torch.normal / Tensor.uniform_ draws."""

    def __init__(self, seed):
        import torch

        self.torch = torch
        torch.manual_seed(seed)
        self.log = []

    def __enter__(self):
        torch = self.torch
        self._rand, self._normal = torch.rand, torch.normal
        self._uniform = torch.Tensor.uniform_
        log = self.log

        def rand(*a, **k):
            v = self._rand(*a, **k)
            log.append(("rand", v.clone()))
            return v

        def normal(*a, **k):
            v = self._normal(*a, **k)
            log.append(("normal", v.clone()))
            return v

        rec = self

        def uniform_(self_t, a=0.0, b=1.0):
            out = rec._uniform(self_t, a, b)
            log.append(("uniform_", out.clone()))
            return out

        torch.rand = rand
        torch.normal = normal
        torch.Tensor.uniform_ = uniform_
        return self

    def __exit__(self, *exc):
        self.torch.rand = self._rand
        self.torch.normal = self._normal
        self.torch.Tensor.uniform_ = self._uniform

    def by_name(self, name):
        return [v for n, v in self.log if n == name]


def _patches(b=4, g=8, s=16, seed=0):
    import torch

    rng = np.random.default_rng(seed)
    neigh = rng.normal(size=(b, g, s, 3)).astype(np.float32)
    center = rng.normal(size=(b, g, 3)).astype(np.float32)
    return torch.from_numpy(neigh), torch.from_numpy(center)


def _apply_mine(neigh, center, A, b, m):
    import jax.numpy as jnp

    from point_dae_tpu.data.corruptions_patch import _apply

    tn, tc = _apply(jnp.asarray(np.asarray(neigh)),
                    jnp.asarray(np.asarray(center)),
                    jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
                    jnp.asarray(m, jnp.float32))
    return np.asarray(tn), np.asarray(tc)


def _assert_pair(ref_pair, mine_pair, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(ref_pair[0].numpy(), mine_pair[0],
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(ref_pair[1].numpy(), mine_pair[1],
                               rtol=rtol, atol=atol)


def test_tensor_scale_nonorm_draw_parity(ref_ct):
    neigh, center = _patches()
    B = neigh.shape[0]
    with _TorchRecorder(0) as rec:
        ref = ref_ct.corrupt_scale_nonorm(neigh.clone(), center.clone(), 4)
    v = rec.by_name("uniform_")[0].reshape(B, 3).numpy()
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    mine = _apply_mine(neigh, center, eye, np.zeros((B, 3)), v)
    _assert_pair(ref, mine)


def test_tensor_translate_multiplies_draw_parity(ref_ct):
    """The preserved translate bug: x * v, not x + v (:104-113)."""
    neigh, center = _patches(seed=1)
    B = neigh.shape[0]
    with _TorchRecorder(1) as rec:
        ref = ref_ct.corrupt_tranlate(neigh.clone(), center.clone(), 4)
    v = rec.by_name("uniform_")[0].reshape(B, 3).numpy()
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    mine = _apply_mine(neigh, center, eye, np.zeros((B, 3)), v)
    _assert_pair(ref, mine)


def test_tensor_jitter_draw_parity(ref_ct):
    neigh, center = _patches(seed=2)
    with _TorchRecorder(2) as rec:
        ref = ref_ct.corrupt_jitter(neigh.clone(), center.clone(), 4)
    n1, n2 = rec.by_name("normal")
    sigma = 0.01 * (4 + 1)                 # our jitter_patches formula
    np.testing.assert_allclose(ref[0].numpy(),
                               neigh.numpy() + sigma * n1.numpy(), rtol=1e-5)
    np.testing.assert_allclose(ref[1].numpy(),
                               center.numpy() + sigma * n2.numpy(), rtol=1e-5)


def test_tensor_rotate_draw_parity(ref_ct):
    from point_dae_tpu.data.corruptions_patch import _batched_rot

    neigh, center = _patches(seed=3)
    B = neigh.shape[0]
    with _TorchRecorder(3) as rec:
        ref = ref_ct.corrupt_rotate_360(neigh.clone(), center.clone(), 4)
    angles = rec.by_name("uniform_")[0].numpy()          # (B, 3)
    A = np.asarray(_batched_rot(angles.astype(np.float32)))
    mine = _apply_mine(neigh, center, A, np.zeros((B, 3)), np.ones((B, 3)))
    _assert_pair(ref, mine)


def test_tensor_rotate_z_draw_parity(ref_ct):
    from point_dae_tpu.data.corruptions_patch import _batched_rot

    neigh, center = _patches(seed=4)
    B = neigh.shape[0]
    with _TorchRecorder(4) as rec:
        ref = ref_ct.corrupt_rotate_z_360(neigh.clone(), center.clone(), 4)
    angles = rec.by_name("uniform_")[0].numpy()          # (B, 3); only z used
    az = np.zeros((B, 3), np.float32)
    az[:, 2] = angles[:, 2]
    A = np.asarray(_batched_rot(az))
    mine = _apply_mine(neigh, center, A, np.zeros((B, 3)), np.ones((B, 3)))
    _assert_pair(ref, mine)


def test_tensor_reflection_quirk_draw_parity(ref_ct):
    """The z flip lands on entry [0][0] (:278-280): effective
    diag(r0*r2, r1, 1) — exactly what our _params('reflection') models."""
    neigh, center = _patches(seed=5)
    B = neigh.shape[0]
    saved = np.random.choice
    drawn = {}

    def logging_choice(*a, **k):
        v = saved(*a, **k)
        drawn["r"] = v
        return v

    np.random.choice = logging_choice
    try:
        ref = ref_ct.corrupt_reflection(neigh.clone(), center.clone())
    finally:
        np.random.choice = saved
    r = drawn["r"].astype(np.float32)                     # (B, 3)
    m = np.stack([r[:, 0] * r[:, 2], r[:, 1], np.ones(B, np.float32)], -1)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    mine = _apply_mine(neigh, center, eye, np.zeros((B, 3)), m)
    _assert_pair(ref, mine)
    # and the quirk is real: some sample flips x via the z draw
    assert not np.allclose(m, r)


def test_tensor_shear_draw_parity(ref_ct):
    neigh, center = _patches(seed=6)
    B = neigh.shape[0]
    saved = np.random.uniform
    drawn = {}

    def logging_uniform(*a, **k):
        v = saved(*a, **k)
        drawn["s"] = v
        return v

    np.random.uniform = logging_uniform
    try:
        ref = ref_ct.corrupt_shear(neigh.clone(), center.clone(), 4)
    finally:
        np.random.uniform = saved
    s = drawn["s"].astype(np.float32)                     # (B, 6)
    one = np.ones(B, np.float32)
    A = np.stack([
        np.stack([one, s[:, 0], s[:, 1]], -1),
        np.stack([s[:, 2], one, s[:, 3]], -1),
        np.stack([s[:, 4], s[:, 5], one], -1)], -2)       # our _params math
    mine = _apply_mine(neigh, center, A, np.zeros((B, 3)), np.ones((B, 3)))
    _assert_pair(ref, mine)


def test_tensor_dropout_global_draw_parity(ref_ct):
    """dropout_global_random (:382-415): per-patch keep of the
    int(S*(1-rate)) smallest draws — our argsort convention, with our
    fixed-shape refill on top (first `keep` slots must match exactly)."""
    neigh, center = _patches(b=2, g=4, s=16, seed=7)
    with _TorchRecorder(7) as rec:
        ref, _ = ref_ct.dropout_global_random(neigh.clone(), center.clone(),
                                              level=2)
    r = rec.by_name("rand")[0][..., 0].numpy()            # (B, G, S)
    keep = int(16 * (1 - 0.5))
    order = np.argsort(r, axis=-1)
    mine = np.take_along_axis(neigh.numpy(), order[..., :keep, None], axis=2)
    np.testing.assert_allclose(ref.numpy(), mine, rtol=1e-6)


def test_tensor_density_draw_parity(ref_ct):
    """density (:531-577): selection is dist < r (gate dead), dropped
    slots become the patch center; the reference also permutes each patch
    — compare sorted rows per patch. S must be 32: the reference
    hard-codes the center-slot sentinel index 33 (:571), so the function
    only works at its recipe's patch size."""
    import jax
    import jax.numpy as jnp

    from point_dae_tpu.data.corruptions_patch import scan_density_patches

    neigh, center = _patches(b=2, g=4, s=32, seed=8)
    with _TorchRecorder(8) as rec:
        ref, _ = ref_ct.density(neigh.clone(), center.clone(), level=4)
    v = rec.by_name("normal")[0].numpy()
    r = rec.by_name("rand")[0].numpy()
    v = v / np.linalg.norm(v)
    dist = np.linalg.norm(neigh.numpy() - v.reshape(1, 1, 1, 3), axis=-1) / 2
    keep = dist < r                       # our scan_density_patches formula
    mine = np.where(keep[..., None], neigh.numpy(),
                    center.numpy()[:, :, None, :])
    ref_np = ref.numpy()
    for b in range(2):
        for g in range(4):
            a = mine[b, g][np.lexsort(mine[b, g].T)]
            c = ref_np[b, g][np.lexsort(ref_np[b, g].T)]
            np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)

    # and the production function with its own key produces the same
    # per-patch drop statistics family (smoke: shape + points from
    # {input points} ∪ {center})
    out = np.asarray(scan_density_patches(jax.random.key(0),
                                          jnp.asarray(neigh.numpy()),
                                          jnp.asarray(center.numpy())))
    assert out.shape == neigh.shape


def test_tensor_add_local_proportion(ref_ct):
    """corrupt_add_local (:462-502) grows S -> S + int(rate*S); our
    fixed-shape variant preserves the noised-point PROPORTION via
    add_n = S*rate/(1+rate). Assert the reference's actual grown
    proportion equals our target within 1/S."""
    neigh, center = _patches(b=2, g=4, s=32, seed=9)
    with _TorchRecorder(9) as rec:
        ref, _ = ref_ct.corrupt_add_local(neigh.clone(), center.clone(), 4)
    S = 32
    rate = (4 + 1) * 0.1
    grown = ref.shape[2]
    assert grown == S + int(rate * S)
    ref_prop = int(rate * S) / grown
    mine_add_n = int(S * rate / (1.0 + rate))
    assert abs(mine_add_n / S - ref_prop) <= 1.0 / S


def test_tensor_affine_r3_dispatch_draw_parity(ref_ct):
    """corrupt_data(['affine_r3']) (:706-728): member subset/order from
    python random, level PINNED to 4, sequential application — replayed
    through our (A, b, m) builders and _apply fold."""
    import random as _pyrandom

    from point_dae_tpu.data.corruptions_patch import _batched_rot

    neigh, center = _patches(seed=10)
    B = neigh.shape[0]
    py_log = []
    saved_choice, saved_sample = _pyrandom.choice, _pyrandom.sample
    rng = _pyrandom.Random(10)

    def choice(seq):
        v = rng.choice(seq)
        py_log.append(("choice", v))
        return v

    def sample(seq, n):
        v = rng.sample(seq, n)
        py_log.append(("sample", v))
        return v

    np_drawn = []
    saved_np_choice = np.random.choice
    saved_np_uniform = np.random.uniform

    def np_choice(*a, **k):
        v = saved_np_choice(*a, **k)
        np_drawn.append(("choice", v))
        return v

    def np_uniform(*a, **k):
        v = saved_np_uniform(*a, **k)
        np_drawn.append(("uniform", v))
        return v

    _pyrandom.choice, _pyrandom.sample = choice, sample
    np.random.choice, np.random.uniform = np_choice, np_uniform
    try:
        with _TorchRecorder(10) as rec:
            ref = ref_ct.corrupt_data(neigh.clone(), center.clone(),
                                      type=["affine_r3"])
    finally:
        _pyrandom.choice, _pyrandom.sample = saved_choice, saved_sample
        np.random.choice = saved_np_choice
        np.random.uniform = saved_np_uniform

    members = py_log[1][1]
    assert len(members) == py_log[0][1]
    tu = iter(rec.by_name("uniform_"))
    npd = iter(np_drawn)

    tn, tc = neigh.numpy(), center.numpy()
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    ones, zeros = np.ones((B, 3), np.float32), np.zeros((B, 3), np.float32)
    for name in members:
        if name == "translate":
            v = next(tu).reshape(B, 3).numpy()
            A, b, m = eye, zeros, v                      # multiplicative bug
        elif name == "scale_nonorm":
            A, b, m = eye, zeros, next(tu).reshape(B, 3).numpy()
        elif name == "rotate":
            ang = next(tu).numpy().astype(np.float32)
            A, b, m = np.asarray(_batched_rot(ang)), zeros, ones
        elif name == "reflection":
            r = next(npd)[1].astype(np.float32)
            A, b = eye, zeros
            m = np.stack([r[:, 0] * r[:, 2], r[:, 1],
                          np.ones(B, np.float32)], -1)
        elif name == "shear":
            s = next(npd)[1].astype(np.float32)
            one = np.ones(B, np.float32)
            A = np.stack([
                np.stack([one, s[:, 0], s[:, 1]], -1),
                np.stack([s[:, 2], one, s[:, 3]], -1),
                np.stack([s[:, 4], s[:, 5], one], -1)], -2)
            b, m = zeros, ones
        else:
            raise AssertionError(name)
        tn, tc = _apply_mine(tn, tc, A, b, m)
    np.testing.assert_allclose(ref[0].numpy(), tn, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ref[1].numpy(), tc, rtol=1e-4, atol=1e-5)
