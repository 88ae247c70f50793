"""Golden tests for geometry ops against pure-numpy oracles.

The oracles mirror the pure-python implementations the reference itself
ships for cross-checking (segmentation/models/pointnet2_utils.py:158-311 and
datasets/ModelNetDataset.py:34-55)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_dae_tpu import ops


def np_pairwise_sqdist(x, y):
    return ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)


def np_fps(points, n):
    """Oracle mirroring the CUDA kernel: start at 0, skip |p|^2 <= 1e-3."""
    N = points.shape[0]
    mag = (points ** 2).sum(-1)
    min_d = np.full(N, 1e10)
    out = np.zeros(n, dtype=np.int64)
    last = 0
    for i in range(n):
        out[i] = last
        d = ((points - points[last]) ** 2).sum(-1)
        min_d = np.minimum(min_d, d)
        cand = np.where(mag > 1e-3, min_d, -1.0)
        last = int(np.argmax(cand))
    return out


class TestPairwise:
    def test_matches_numpy(self, rng):
        x = rng.normal(size=(2, 17, 3)).astype(np.float32)
        y = rng.normal(size=(2, 23, 3)).astype(np.float32)
        got = np.asarray(ops.pairwise_sqdist(jnp.array(x), jnp.array(y)))
        for b in range(2):
            want = np_pairwise_sqdist(x[b], y[b])
            np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)


class TestKNN:
    def test_sorted_and_correct(self, rng):
        q = rng.normal(size=(2, 8, 3)).astype(np.float32)
        db = rng.normal(size=(2, 64, 3)).astype(np.float32)
        d, idx = ops.knn(jnp.array(q), jnp.array(db), 5)
        d, idx = np.asarray(d), np.asarray(idx)
        assert np.all(np.diff(d, axis=-1) >= -1e-6)  # ascending
        for b in range(2):
            full = np_pairwise_sqdist(q[b], db[b])
            want = np.sort(full, axis=-1)[:, :5]
            np.testing.assert_allclose(np.sort(d[b], -1), want, rtol=1e-4, atol=1e-5)
            # indices actually are the nearest set
            want_idx = np.argsort(full, axis=-1)[:, :5]
            assert all(set(idx[b, i]) == set(want_idx[i]) for i in range(8))

    def test_mask_excludes(self, rng):
        q = jnp.zeros((1, 1, 3))
        db = jnp.array(rng.normal(size=(1, 10, 3)).astype(np.float32))
        mask = jnp.arange(10) >= 5
        _, idx = ops.knn(q, db, 3, db_mask=mask[None])
        assert np.all(np.asarray(idx) >= 5)


class TestFPS:
    def test_matches_oracle(self, rng):
        pts = rng.normal(size=(3, 128, 3)).astype(np.float32)
        got = np.asarray(ops.furthest_point_sample(jnp.array(pts), 16))
        for b in range(3):
            np.testing.assert_array_equal(got[b], np_fps(pts[b], 16))

    def test_skips_near_origin(self, rng):
        pts = rng.normal(size=(1, 64, 3)).astype(np.float32) + 3.0
        pts[0, 10:20] = 0.0  # zero padding — never selectable
        got = np.asarray(ops.furthest_point_sample(jnp.array(pts), 32))
        assert not np.any((got >= 10) & (got < 20))

    def test_first_index_zero(self, rng):
        pts = rng.normal(size=(2, 32, 3)).astype(np.float32)
        got = np.asarray(ops.furthest_point_sample(jnp.array(pts), 4))
        assert np.all(got[:, 0] == 0)


class TestBallQuery:
    def test_matches_cuda_semantics(self, rng):
        xyz = rng.uniform(-1, 1, size=(2, 64, 3)).astype(np.float32)
        new_xyz = xyz[:, :8]
        r, k = 0.4, 16
        idx = np.asarray(ops.ball_query(r, k, jnp.array(xyz), jnp.array(new_xyz)))
        for b in range(2):
            for m in range(8):
                d = ((xyz[b] - new_xyz[b, m]) ** 2).sum(-1)
                in_range = np.flatnonzero(d < r * r)
                want = list(in_range[:k])
                if len(want) == 0:
                    want = [0] * k
                else:
                    want = want + [want[0]] * (k - len(want))
                np.testing.assert_array_equal(idx[b, m], want)


class TestGatherGroup:
    def test_gather(self, rng):
        pts = rng.normal(size=(2, 16, 5)).astype(np.float32)
        idx = rng.integers(0, 16, size=(2, 6)).astype(np.int32)
        got = np.asarray(ops.gather_points(jnp.array(pts), jnp.array(idx)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], pts[b][idx[b]])

    def test_group(self, rng):
        pts = rng.normal(size=(2, 16, 5)).astype(np.float32)
        idx = rng.integers(0, 16, size=(2, 4, 3)).astype(np.int32)
        got = np.asarray(ops.group_points(jnp.array(pts), jnp.array(idx)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], pts[b][idx[b]])


class TestInterpolate:
    def test_three_nn_weights(self, rng):
        unknown = rng.normal(size=(1, 10, 3)).astype(np.float32)
        known = rng.normal(size=(1, 6, 3)).astype(np.float32)
        feats = rng.normal(size=(1, 6, 4)).astype(np.float32)
        dist, idx = ops.three_nn(jnp.array(unknown), jnp.array(known))
        out = np.asarray(ops.three_interpolate(jnp.array(feats), idx, dist))
        d, i = np.asarray(dist), np.asarray(idx)
        for n in range(10):
            w = 1.0 / (d[0, n] + 1e-8)
            w = w / w.sum()
            want = (feats[0][i[0, n]] * w[:, None]).sum(0)
            np.testing.assert_allclose(out[0, n], want, rtol=1e-4, atol=1e-5)

    def test_exact_at_known_point(self, rng):
        known = rng.normal(size=(1, 6, 3)).astype(np.float32)
        feats = rng.normal(size=(1, 6, 4)).astype(np.float32)
        dist, idx = ops.three_nn(jnp.array(known), jnp.array(known))
        out = np.asarray(ops.three_interpolate(jnp.array(feats), idx, dist))
        np.testing.assert_allclose(out[0], feats[0], rtol=1e-3, atol=1e-4)


class TestGroupNeighborhood:
    def test_shapes_and_centering(self, rng):
        xyz = rng.normal(size=(2, 256, 3)).astype(np.float32)
        neigh, center = ops.group_neighborhood(jnp.array(xyz), 16, 8)
        assert neigh.shape == (2, 16, 8, 3)
        assert center.shape == (2, 16, 3)
        # each patch contains its center (distance 0 after centering)
        mins = np.asarray(jnp.min(jnp.sum(neigh ** 2, -1), axis=-1))
        assert np.all(mins < 1e-8)


class TestResample:
    def test_only_valid_points(self, rng):
        pts = rng.normal(size=(32, 3)).astype(np.float32)
        mask = np.zeros(32, bool)
        mask[5:9] = True
        out = np.asarray(ops.resample_to(jax.random.key(0), jnp.array(pts),
                                         jnp.array(mask), 64))
        valid = pts[5:9]
        for p in out:
            assert np.any(np.all(np.isclose(p, valid), axis=-1))

    def test_jit_and_vmap(self, rng):
        pts = jnp.array(rng.normal(size=(4, 32, 3)).astype(np.float32))
        mask = jnp.ones((4, 32), bool)
        keys = jax.random.split(jax.random.key(1), 4)
        out = jax.jit(jax.vmap(ops.resample_to, in_axes=(0, 0, 0, None)),
                      static_argnums=3)(keys, pts, mask, 16)
        assert out.shape == (4, 16, 3)

    def test_resample_batch_masked_only_valid(self, rng):
        pts = rng.normal(size=(3, 64, 3)).astype(np.float32)
        mask = rng.random(size=(3, 64)) > 0.6
        mask[:, :2] = True                       # >= 1 valid per row
        out = np.asarray(ops.resample_batch(
            jax.random.key(0), jnp.array(pts), jnp.array(mask), 32))
        assert out.shape == (3, 32, 3)
        for b in range(3):
            valid = pts[b][mask[b]]
            for p in out[b]:
                assert np.any(np.all(np.isclose(p, valid), axis=-1))

    def test_resample_batch_none_mask_shape(self, rng):
        pts = jnp.array(rng.normal(size=(3, 64, 3)).astype(np.float32))
        out = ops.resample_batch(jax.random.key(0), pts, None, 128)
        assert out.shape == (3, 128, 3)
        flat = np.asarray(pts).reshape(-1, 3)
        for p in np.asarray(out).reshape(-1, 3):
            assert np.any(np.all(np.isclose(p, flat), axis=-1))

    def test_rank_keyed_kernel_equals_argsort_pack(self, rng):
        """The rank-keyed one-hot gather (interpret mode) selects bitwise
        the same points as the stable argsort-pack + double-gather it
        replaces (the q-th packed valid point is the rank-q valid point)."""
        from jax.experimental.pallas import tpu as pltpu

        from point_dae_tpu.ops.pallas_scatter import \
            gather_by_key_small_c_pallas

        pts = jnp.array(rng.normal(size=(4, 64, 3)).astype(np.float32))
        mask = jnp.array(rng.random(size=(4, 64)) > 0.4)
        mask = mask.at[:, 0].set(True)
        cnt = jnp.maximum(jnp.sum(mask, axis=1, dtype=jnp.int32), 1)
        draw = jax.random.randint(jax.random.key(3), (4, 50), 0,
                                  cnt[:, None])
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
        keys_ = jnp.where(mask, rank, -1)
        with pltpu.force_tpu_interpret_mode():
            got = gather_by_key_small_c_pallas(pts, keys_, draw, tq=16)
        order = jnp.argsort(jnp.where(mask, 0, 1), axis=1, stable=True)
        pos = jnp.take_along_axis(order, draw, axis=1)
        want = jnp.take_along_axis(pts, pos[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestPallasFPS:
    def test_matches_xla_path(self, rng):
        """Pallas FPS (interpret mode on CPU) == the lax.fori_loop path."""
        from jax.experimental.pallas import tpu as pltpu

        from point_dae_tpu.ops.pallas_fps import fps_pallas

        pts = jnp.array(rng.normal(size=(3, 256, 3)).astype(np.float32))
        want = np.asarray(ops.furthest_point_sample(pts, 32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fps_pallas(pts, 32))
        np.testing.assert_array_equal(got, want)

    def test_batched_kernel_matches_xla_path(self, rng):
        """Batched-layout Pallas FPS (N on lanes, whole batch tile per
        iteration) == the lax.fori_loop path, including the near-origin
        exclusion and first-pick-0 conventions; both divisor and fallback
        batch-tile shapes."""
        from jax.experimental.pallas import tpu as pltpu

        from point_dae_tpu.ops.pallas_fps import fps_pallas_batched

        for B in (4, 3):          # 3 exercises the BT=1 fallback
            pts = rng.normal(size=(B, 256, 3)).astype(np.float32)
            pts[0, :5] = 0.0      # near-origin points must never be picked
            pts = jnp.array(pts)
            want = np.asarray(ops.furthest_point_sample(pts, 32))
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(fps_pallas_batched(pts, 32, batch_tile=2))
            np.testing.assert_array_equal(got, want)


class TestSeparatePointCloud:
    def test_crop_semantics(self, rng):
        from point_dae_tpu.ops.geometry import separate_point_cloud

        pts = jnp.array(rng.normal(size=(2, 64, 3)).astype(np.float32))
        inp, crop = separate_point_cloud(jax.random.key(0), pts, 16)
        assert inp.shape == (2, 48, 3) and crop.shape == (2, 16, 3)
        # crop points are the nearest to SOME unit vector; crop+input = cloud
        both = np.sort(np.concatenate([np.asarray(inp), np.asarray(crop)],
                                      axis=1), axis=1)
        np.testing.assert_allclose(both, np.sort(np.asarray(pts), axis=1),
                                   rtol=1e-6)

    def test_fixed_point_and_padding(self, rng):
        from point_dae_tpu.ops.geometry import separate_point_cloud

        pts = jnp.array(rng.normal(size=(1, 64, 3)).astype(np.float32))
        fp = np.array([1.0, 0.0, 0.0], np.float32)
        inp, crop = separate_point_cloud(jax.random.key(0), pts, 8,
                                         fixed_point=fp, padding_zeros=True)
        assert inp.shape == (1, 64, 3)
        # zeroed exactly at the 8 points nearest the fixed viewpoint
        d = np.linalg.norm(fp - np.asarray(pts)[0], axis=-1)
        near = set(np.argsort(d)[:8].tolist())
        zeroed = set(np.where(~np.asarray(inp)[0].any(-1))[0].tolist())
        assert zeroed == near


class TestGatherRowsScatterBwd:
    def test_fwd_and_fallback_bwd(self, rng):
        """gather_rows fwd == take_along_axis; small-shape bwd uses the
        .at-add fallback and matches autodiff exactly."""
        import jax

        from point_dae_tpu.ops.pallas_scatter import gather_rows

        x = jnp.array(rng.normal(size=(2, 32, 8)).astype(np.float32))
        idx = jnp.array(rng.integers(0, 32, size=(2, 40)).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(gather_rows(x, idx)),
            np.asarray(jnp.take_along_axis(x, idx[..., None], axis=1)))
        g1 = jax.grad(lambda a: jnp.sum(gather_rows(a, idx) ** 2))(x)
        g2 = jax.grad(lambda a: jnp.sum(
            jnp.take_along_axis(a, idx[..., None], axis=1) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)

    def test_small_c_gather_kernel_interpret(self, rng):
        """The transposed one-hot gather (tiny C) == take_along_axis
        bit-exactly (selection products have a single nonzero term), incl.
        the padded-Q tail and duplicate indices."""
        from jax.experimental.pallas import tpu as pltpu

        from point_dae_tpu.ops.pallas_scatter import gather_rows_small_c_pallas

        x = jnp.array(rng.normal(size=(2, 16, 3)).astype(np.float32))
        idx = jnp.array(rng.integers(0, 16, size=(2, 50)).astype(np.int32))
        want = jnp.take_along_axis(x, idx[..., None], axis=1)
        with pltpu.force_tpu_interpret_mode():
            got = gather_rows_small_c_pallas(x, idx, tq=16)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_small_c_gather_kernel_tiled_n_interpret(self, rng):
        """N-tiled accumulation path (N > the 2048 source tile) is exact.

        Uses a patched tile height via big-N shape divisible by tile."""
        from jax.experimental.pallas import tpu as pltpu

        from point_dae_tpu.ops import pallas_scatter as ps

        x = jnp.array(rng.normal(size=(1, 4096, 6)).astype(np.float32))
        idx = jnp.array(rng.integers(0, 4096, size=(1, 64)).astype(np.int32))
        want = jnp.take_along_axis(x, idx[..., None], axis=1)
        with pltpu.force_tpu_interpret_mode():
            got = ps.gather_rows_small_c_pallas(x, idx, tq=64)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_mxu_scatter_kernel_interpret(self, rng):
        """The Pallas scatter-add == .at add (interpret mode), incl. the
        padded-Q tail and duplicate indices."""
        from jax.experimental.pallas import tpu as pltpu

        from point_dae_tpu.ops.pallas_scatter import scatter_rows_add_pallas

        idx = jnp.array(rng.integers(0, 16, size=(2, 50)).astype(np.int32))
        g = jnp.array(rng.normal(size=(2, 50, 8)).astype(np.float32))
        want = jnp.zeros((2, 16, 8)).at[jnp.arange(2)[:, None], idx].add(g)
        with pltpu.force_tpu_interpret_mode():
            got = scatter_rows_add_pallas(idx, g, 16, tq=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


class TestFusedPatchify:
    def test_matches_unfused_front_end(self, rng):
        """Fused FPS+kNN Pallas program (interpret mode) == the composed
        furthest_point_sample -> gather -> knn pipeline, idx-exact (both
        phases recompute distances coordinate-wise, so no near-tie
        divergence on generic float inputs)."""
        from point_dae_tpu.ops.pallas_patchify import fused_patchify_pallas

        B, N, G, S = 3, 512, 16, 8
        pts = jnp.array(rng.normal(size=(B, N, 3)).astype(np.float32))
        fps_want = ops.furthest_point_sample(pts, G)
        center = ops.gather_points(pts, fps_want)
        _, knn_want = ops.knn(center, pts, S)
        fps_got, knn_got = fused_patchify_pallas(pts, G, S, batch_tile=2,
                                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(fps_got),
                                      np.asarray(fps_want))
        np.testing.assert_array_equal(np.asarray(knn_got),
                                      np.asarray(knn_want))

    def test_fps_knn_wrapper_off_tpu(self, rng):
        """ops.fps_knn returns the composed-path results on CPU (the fused
        kernel only dispatches on real TPU) with idx sorted ascending."""
        pts = jnp.array(rng.normal(size=(2, 256, 3)).astype(np.float32))
        fps_idx, center, idx = ops.fps_knn(pts, 8, 4)
        assert fps_idx.shape == (2, 8) and center.shape == (2, 8, 3)
        assert idx.shape == (2, 8, 4)
        np.testing.assert_allclose(np.asarray(center),
                                   np.asarray(ops.gather_points(pts, fps_idx)))
