"""Chamfer / EMD golden tests vs numpy brute force (SURVEY.md §7 step 2)."""
import numpy as np
import jax
import jax.numpy as jnp

from point_dae_tpu import losses


def np_nn(x, y):
    d = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return d.min(1), d.argmin(1)


class TestNNDistance:
    def test_matches_bruteforce(self, rng):
        x = rng.normal(size=(3, 40, 3)).astype(np.float32)
        y = rng.normal(size=(3, 50, 3)).astype(np.float32)
        d1, d2, i1, i2 = losses.nn_distance(jnp.array(x), jnp.array(y))
        for b in range(3):
            wd1, wi1 = np_nn(x[b], y[b])
            wd2, wi2 = np_nn(y[b], x[b])
            np.testing.assert_allclose(np.asarray(d1[b]), wd1, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(d2[b]), wd2, rtol=1e-4, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(i1[b]), wi1)
            np.testing.assert_array_equal(np.asarray(i2[b]), wi2)

    def test_grad_matches_finite_diff(self, rng):
        x = jnp.array(rng.normal(size=(1, 6, 3)).astype(np.float32))
        y = jnp.array(rng.normal(size=(1, 7, 3)).astype(np.float32))

        def f(x, y):
            return losses.chamfer_l2(x, y)

        gx, gy = jax.grad(f, argnums=(0, 1))(x, y)
        eps = 1e-3
        for (arr, g, arg) in [(x, gx, 0), (y, gy, 1)]:
            flat = np.asarray(arr).ravel()
            for k in [0, 5, 11]:
                d = np.zeros_like(flat)
                d[k] = eps
                pert = jnp.array((flat + d).reshape(arr.shape))
                args = [x, y]
                args[arg] = pert
                f_plus = float(f(*args))
                pert = jnp.array((flat - d).reshape(arr.shape))
                args = [x, y]
                args[arg] = pert
                f_minus = float(f(*args))
                fd = (f_plus - f_minus) / (2 * eps)
                np.testing.assert_allclose(np.asarray(g).ravel()[k], fd,
                                           rtol=5e-2, atol=5e-3)


class TestLossVariants:
    def test_l2_zero_on_identical(self, rng):
        x = jnp.array(rng.normal(size=(2, 32, 3)).astype(np.float32))
        assert float(losses.chamfer_l2(x, x)) < 1e-6
        assert float(losses.chamfer_l1(x, x)) < 1e-3

    def test_split_sums_to_l2(self, rng):
        x = jnp.array(rng.normal(size=(2, 16, 3)).astype(np.float32))
        y = jnp.array(rng.normal(size=(2, 24, 3)).astype(np.float32))
        a, b = losses.chamfer_l2_split(x, y)
        np.testing.assert_allclose(float(a + b), float(losses.chamfer_l2(x, y)),
                                   rtol=1e-5)

    def test_masked_equals_gathered(self, rng):
        """Weighted in-place chamfer == chamfer over the gathered subset."""
        pred = rng.normal(size=(8, 16, 3)).astype(np.float32)
        gt = rng.normal(size=(8, 16, 3)).astype(np.float32)
        w = np.array([1, 0, 1, 1, 0, 0, 1, 0], np.float32)
        got = float(losses.masked_chamfer_l2(jnp.array(pred), jnp.array(gt),
                                             jnp.array(w)))
        sel = w.astype(bool)
        want = float(losses.chamfer_l2(jnp.array(pred[sel]), jnp.array(gt[sel])))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_withnormal_orientation_invariance(self, rng):
        x = jnp.array(rng.normal(size=(1, 10, 3)).astype(np.float32))
        n = jnp.array(rng.normal(size=(1, 10, 3)).astype(np.float32))
        _, nd_same = losses.chamfer_l2_withnormal(x, x, n, n)
        _, nd_flip = losses.chamfer_l2_withnormal(x, x, n, -n)
        assert float(nd_same) < 1e-5
        assert float(nd_flip) < 1e-5  # unoriented distance

    def test_withnormal_strict_detects_flip(self, rng):
        x = jnp.array(rng.normal(size=(1, 10, 3)).astype(np.float32))
        n = jnp.array(rng.normal(size=(1, 10, 3)).astype(np.float32))
        _, nd_flip = losses.chamfer_l2_withnormal_strict(x, x, n, -n)
        assert float(nd_flip) > 1.0  # strict: flipped normals are far

    def test_coarse2fine_shapes(self, rng):
        c1 = jnp.array(rng.normal(size=(2, 8, 3)).astype(np.float32))
        c2 = jnp.array(rng.normal(size=(2, 8, 3)).astype(np.float32))
        f1 = jnp.array(rng.normal(size=(2, 8, 6, 3)).astype(np.float32))
        f2 = jnp.array(rng.normal(size=(2, 8, 6, 3)).astype(np.float32))
        coarse, fine = losses.chamfer_l2_coarse2fine(c1, c2, f1, f2)
        assert np.isfinite(float(coarse)) and np.isfinite(float(fine))
        # identical inputs -> both zero
        coarse0, fine0 = losses.chamfer_l2_coarse2fine(c1, c1, f1, f1)
        assert float(coarse0) < 1e-6 and float(fine0) < 1e-6


def approxmatch_oracle(xyz1, xyz2):
    """float64 numpy port of the reference auction matcher
    (extensions/emd/cuda/emd_kernel.cu:26-158): 10 rounds with
    level = -4^j for j = 7..-1 then 0; rows claim capacity against
    remaining column capacity, columns scale back over-commitment.
    xyz1 (n, 3) 'dataset', xyz2 (m, 3) 'query' -> match (m, n), the CUDA
    layout. Capacity init keeps the C++ integer-division semantics
    (multiR = n / m, emd_kernel.cu:29-35)."""
    n, m = len(xyz1), len(xyz2)
    if n >= m:
        multi_l, multi_r = 1.0, float(n // m)
    else:
        multi_l, multi_r = float(m // n), 1.0
    remain_l = np.full(n, multi_l, np.float64)
    remain_r = np.full(m, multi_r, np.float64)
    match = np.zeros((m, n), np.float64)
    d = ((xyz1[None, :, :].astype(np.float64)
          - xyz2[:, None, :].astype(np.float64)) ** 2).sum(-1)   # (m, n)
    for j in range(7, -3, -1):
        level = 0.0 if j == -2 else -(4.0 ** j)
        e = np.exp(level * d)
        suml = e.T @ remain_r + 1e-9                             # (n,)
        ratio_l = remain_l / suml
        sumr = (e @ ratio_l) * remain_r                          # (m,)
        consumption = np.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = np.maximum(0.0, remain_r - sumr)
        w = e * ratio_r[:, None] * ratio_l[None, :]
        match += w
        remain_l = np.maximum(0.0, remain_l - w.sum(0))
    return match


class TestEMD:
    def test_zero_on_identical(self, rng):
        x = jnp.array(rng.normal(size=(2, 64, 3)).astype(np.float32))
        val = float(losses.emd_loss(x, x))
        assert val < 1e-4

    def test_detects_offset(self, rng):
        x = jnp.array(rng.normal(size=(2, 64, 3)).astype(np.float32))
        y = x + 1.0
        # per-point EMD of a unit-diagonal shift ~ shift^2 = 3
        val = float(losses.emd_loss(x, y))
        assert 1.0 < val < 10.0

    def test_match_is_doubly_stochasticish(self, rng):
        x = jnp.array(rng.normal(size=(1, 32, 3)).astype(np.float32))
        y = jnp.array(rng.normal(size=(1, 32, 3)).astype(np.float32))
        m = np.asarray(losses.emd_approx(x, y))
        np.testing.assert_allclose(m.sum(2), 1.0, atol=0.05)
        np.testing.assert_allclose(m.sum(1), 1.0, atol=0.05)

    def test_golden_vs_reference_oracle(self, rng):
        """emd_approx/emd_cost reproduce the reference CUDA algorithm:
        golden vs a float64 numpy port of approxmatch + matchcost."""
        for n, m in ((16, 16), (32, 32), (48, 16), (64, 64)):
            x = rng.normal(size=(2, n, 3)).astype(np.float32)
            y = rng.normal(size=(2, m, 3)).astype(np.float32)
            got_match = np.asarray(losses.emd_approx(jnp.array(x),
                                                     jnp.array(y)))
            got_cost = np.asarray(losses.emd_cost(jnp.array(x),
                                                  jnp.array(y)))
            for b in range(2):
                want_match = approxmatch_oracle(x[b], y[b]).T   # -> (n, m)
                d = ((x[b][:, None, :] - y[b][None, :, :]) ** 2).sum(-1)
                want_cost = (want_match * d).sum()
                np.testing.assert_allclose(got_match[b], want_match,
                                           rtol=2e-3, atol=2e-3)
                np.testing.assert_allclose(got_cost[b], want_cost,
                                           rtol=2e-3)

    def test_gradient_flows_through_cost_only(self, rng):
        """matchcostgrad semantics: d(cost)/d(xyz) treats match as
        constant — grad equals sum_j match[i,j] * 2 (x_i - y_j)."""
        x = jnp.array(rng.normal(size=(1, 12, 3)).astype(np.float32))
        y = jnp.array(rng.normal(size=(1, 12, 3)).astype(np.float32))
        g = jax.grad(lambda a: jnp.sum(losses.emd_cost(a, y)))(x)
        match = np.asarray(losses.emd_approx(x, y))[0]
        xn, yn = np.asarray(x)[0], np.asarray(y)[0]
        want = 2.0 * (match.sum(1)[:, None] * xn - match @ yn)
        np.testing.assert_allclose(np.asarray(g)[0], want,
                                   rtol=1e-4, atol=1e-5)


class TestSmallPatchPallas:
    def test_matches_xla_half(self):
        """Batch-on-lanes patch-chamfer kernel (interpret mode) == XLA path,
        incl. the padded-batch tail and the in-kernel nearest-coord output."""
        from jax.experimental.pallas import tpu as pltpu

        from point_dae_tpu.losses.chamfer import (_nn_half_small_pallas,
                                                  _nn_half_xla)

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(37, 12, 3)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(37, 8, 3)).astype(np.float32))
        dx, ix = _nn_half_xla(a, b)
        with pltpu.force_tpu_interpret_mode():
            dp, ip, near = _nn_half_small_pallas(a, b, lane_tile=16)
        np.testing.assert_array_equal(np.asarray(ix), np.asarray(ip))
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dp),
                                   rtol=1e-5, atol=1e-6)
        want_near = jnp.take_along_axis(b, ix[..., None], axis=1)
        np.testing.assert_allclose(np.asarray(near), np.asarray(want_near),
                                   rtol=1e-6)
