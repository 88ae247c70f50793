"""Statistical parity tests for the corruption library vs the reference's
numpy semantics (SURVEY.md §7 step 3): distributions, not bitwise streams."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_dae_tpu.data import corruptions as C
from point_dae_tpu.data import corruptions_patch as CP


def cloud(rng, n=256):
    x = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.array(x / np.linalg.norm(x, axis=1).max())


class TestAffine:
    def test_translate_bounds(self, rng):
        pts = cloud(rng)
        shifts = []
        for i in range(200):
            a, b = C.affine_translate(jax.random.key(i), 0.0)
            shifts.append(np.asarray(b))
        shifts = np.stack(shifts)
        assert np.all(np.abs(shifts) <= 0.5)
        assert np.abs(shifts).max() > 0.4  # actually spans the range

    def test_rotate_is_orthogonal(self):
        a, _ = C.affine_rotate(jax.random.key(3), None)
        a = np.asarray(a)
        np.testing.assert_allclose(a @ a.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(a), 1.0, atol=1e-5)

    def test_reflection_signs(self):
        a, _ = C.affine_reflection(jax.random.key(0), None)
        a = np.asarray(a)
        assert np.all(np.isin(np.diag(a), [-1.0, 1.0]))
        assert np.allclose(a, np.diag(np.diag(a)))

    def test_scale_range(self):
        vals = []
        for i in range(300):
            a, _ = C.affine_scale_nonorm(jax.random.key(i), 0.0)
            vals.append(np.diag(np.asarray(a)))
        vals = np.stack(vals)
        assert vals.min() >= 0.5 and vals.max() <= 2.0

    def test_compose_r3_is_affine(self, rng):
        """Composite acts identically on any point: x @ A + b."""
        A, b = C.compose_random_affines(jax.random.key(7), 3)
        pts = cloud(rng, 32)
        out = pts @ A + b
        assert out.shape == (32, 3)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_compose_count_distribution(self):
        """With max_n=1 subset is exactly one transform; A differs from I."""
        A, b = C.compose_random_affines(jax.random.key(11), 1)
        assert not np.allclose(np.asarray(A), np.eye(3)) or \
            not np.allclose(np.asarray(b), 0.0)


class TestDropoutLocal:
    def test_drop_fraction_range(self, rng):
        pts = cloud(rng, 512)
        mask0 = jnp.ones(512, bool)
        fracs = []
        for i in range(30):
            m = C.dropout_local(jax.random.key(i), pts, mask0)
            fracs.append(1.0 - float(jnp.sum(m)) / 512)
        fracs = np.array(fracs)
        # reference: ratio ~ U(0.1, 0.5) but clusters overlap re-picks can
        # only reduce; total drop == ratio exactly (disjoint removals)
        assert fracs.min() >= 0.08 and fracs.max() <= 0.52
        assert fracs.std() > 0.02

    def test_clusters_are_local(self, rng):
        """Dropped points concentrate: mean pairwise distance among dropped
        is well below that of random subsets."""
        pts = np.asarray(cloud(rng, 512))
        mask0 = jnp.ones(512, bool)
        m = np.asarray(C.dropout_local(jax.random.key(1), jnp.array(pts), mask0,
                                       drop_ratio=0.3, max_clusters=2))
        dropped = pts[~m]
        d_dropped = np.linalg.norm(dropped[:, None] - dropped[None], axis=-1).mean()
        d_all = np.linalg.norm(pts[:, None] - pts[None], axis=-1).mean()
        assert d_dropped < d_all * 0.8

    def test_pinned_variants(self, rng):
        pts = cloud(rng, 500)
        out, mask = C.corrupt_cloud(jax.random.key(0), pts,
                                    ("dropout_local_c5d3",))
        frac = 1.0 - float(jnp.sum(mask)) / 500
        assert abs(frac - 0.3) < 0.02


class TestKSmallestMask:
    """The sort-free exact-k selection must pick EXACTLY the set a stable
    argsort + rank comparison picks (the formulation dropout_local/
    dropout_global used before the TPU byte-cut), including ties."""

    @staticmethod
    def _oracle(d, mask, k):
        d = np.where(np.asarray(mask), np.asarray(d, np.float32), np.inf)
        order = np.argsort(d, kind="stable")
        rank = np.empty(len(d), np.int64)
        rank[order] = np.arange(len(d))
        return np.asarray(mask) & (rank < k)

    @pytest.mark.parametrize("k", [0, 1, 7, 64, 100])
    def test_matches_stable_argsort_rank(self, rng, k):
        d = jnp.asarray(rng.random(100).astype(np.float32))
        mask = jnp.asarray(rng.random(100) > 0.3)
        got = np.asarray(C._k_smallest_mask(d, mask, jnp.int32(k)))
        np.testing.assert_array_equal(got, self._oracle(d, mask, k))

    def test_ties_broken_by_index(self, rng):
        # heavy duplication: quantized values force many exact ties
        d = jnp.asarray((rng.integers(0, 5, 200) / 4.0).astype(np.float32))
        mask = jnp.asarray(rng.random(200) > 0.2)
        for k in (0, 3, 50, 150):
            got = np.asarray(C._k_smallest_mask(d, mask, jnp.int32(k)))
            np.testing.assert_array_equal(got, self._oracle(d, mask, k))

    def test_k_exceeding_valid_selects_all_valid(self, rng):
        d = jnp.asarray(rng.random(50).astype(np.float32))
        mask = jnp.asarray(rng.random(50) > 0.5)
        got = np.asarray(C._k_smallest_mask(d, mask, jnp.int32(50)))
        np.testing.assert_array_equal(got, np.asarray(mask))

    def test_inf_rows_never_selected(self):
        d = jnp.asarray([0.5, jnp.inf, 0.25, jnp.inf, 1.0])
        mask = jnp.ones(5, bool)
        got = np.asarray(C._k_smallest_mask(d, mask, jnp.int32(3)))
        np.testing.assert_array_equal(got, [True, False, True, False, True])

    def test_dropout_local_matches_argsort_formulation(self, rng):
        """End-to-end: dropout_local with the sort-free selection equals a
        numpy re-derivation of the old argsort+rank cluster loop."""
        pts = cloud(rng, 256)
        mask0 = jnp.ones(256, bool)
        got = np.asarray(C.dropout_local(jax.random.key(7), pts, mask0,
                                         drop_ratio=0.4, max_clusters=4))
        assert got.sum() < 256  # something was dropped
        # re-run the cluster loop with the oracle selection on host
        n = 256
        k_ratio, k_nc, k_sizes, k_seeds = jax.random.split(jax.random.key(7), 4)
        total = int(256 * 0.4)
        num_clusters = jax.random.randint(k_nc, (), 1, 4)
        sizes = np.asarray(C._multinomial_sizes(k_sizes, jnp.int32(total),
                                                num_clusters, 3, n_max=n))
        seed_keys = jax.random.split(k_seeds, 3)
        mask = np.ones(n, bool)
        P = np.asarray(pts)
        for i in range(3):
            r = np.asarray(jax.random.uniform(seed_keys[i], (n,)))
            r = np.where(mask, r, -1.0)
            seed_idx = int(np.argmax(r))
            d = np.sum((P - P[seed_idx]) ** 2, axis=-1).astype(np.float32)
            drop = self._oracle(d, mask, int(sizes[i]))
            mask = mask & ~drop
        np.testing.assert_array_equal(got, mask)


class TestAddDensity:
    def test_add_global_counts(self, rng):
        pts = cloud(rng, 200)
        out, mask = C.corrupt_cloud(jax.random.key(5), pts, ("add_global",))
        n_new = int(jnp.sum(mask)) - 200
        # level in {0..4} -> add 10%..50%
        assert 200 * 0.1 - 2 <= n_new <= 200 * 0.5 + 2
        # added points inside unit ball
        added = np.asarray(out[200:])[np.asarray(mask[200:])]
        assert np.all(np.linalg.norm(added, axis=1) <= 1.0 + 1e-5)

    def test_density_drops_far_side(self, rng):
        pts = cloud(rng, 400)
        kept = []
        for i in range(20):
            m = C.nonuniform_density(jax.random.key(i), pts,
                                     jnp.ones(400, bool), jnp.float32(4.0))
            kept.append(float(jnp.sum(m)) / 400)
        assert 0.2 < np.mean(kept) < 0.9


class TestPipeline:
    def test_affine_r3_dropout_local(self, rng):
        """The flagship non-transformer recipe end to end."""
        pts = cloud(rng, 1024)
        out = C.corrupt_and_sample(jax.random.key(0), pts,
                                   ("affine_r3", "dropout_local"), 1024)
        assert out.shape == (1024, 3)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_jit_once(self, rng):
        pts = jnp.array(rng.normal(size=(4, 256, 3)).astype(np.float32))
        f = jax.jit(lambda k, p: C.corrupt_batch(k, p, ("affine_r3",), 128))
        out = f(jax.random.key(0), pts)
        assert out.shape == (4, 128, 3)

    def test_augment_norm(self, rng):
        pts = jnp.array(rng.normal(size=(64, 3)).astype(np.float32) * 5)
        out = C.augment_cloud(jax.random.key(0), pts, ("norm",))
        r = np.linalg.norm(np.asarray(out), axis=1)
        np.testing.assert_allclose(r.max(), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out).mean(0), 0.0, atol=1e-5)


class TestPatchCorruptions:
    def _patches(self, rng, B=2, G=8, S=16):
        center = rng.normal(size=(B, G, 3)).astype(np.float32)
        neigh = center[:, :, None, :] + 0.05 * rng.normal(size=(B, G, S, 3)).astype(np.float32)
        return jnp.array(neigh), jnp.array(center)

    def test_affine_r3_consistency(self, rng):
        """Neighbourhood and center receive the same transform: relative
        offsets transform linearly (no translation leak)."""
        neigh, center = self._patches(rng)
        # additive-translate mode: offsets must be translation-invariant
        tn, tc = CP.affine_r3_patches(jax.random.key(0), neigh, center,
                                      fix_translate_bug=True)
        rel_before = np.asarray(neigh - center[:, :, None, :])
        rel_after = np.asarray(tn - tc[:, :, None, :])
        # linear map: ratio of norms is bounded and consistent per sample
        assert rel_after.shape == rel_before.shape
        assert np.all(np.isfinite(rel_after))

    def test_translate_bug_is_multiplicative(self, rng):
        neigh, center = self._patches(rng)
        key = jax.random.key(42)
        A, b, m = CP._params(jax.random.key(1), "translate", 2, 4.0, False)
        assert np.allclose(np.asarray(b), 0.0)      # bug: no additive part
        assert not np.allclose(np.asarray(m), 1.0)  # multiplies instead
        A, b, m = CP._params(jax.random.key(1), "translate", 2, 4.0, True)
        assert np.allclose(np.asarray(m), 1.0)
        assert not np.allclose(np.asarray(b), 0.0)

    def test_dropout_global_keeps_shape(self, rng):
        neigh, center = self._patches(rng)
        out = CP.dropout_global_patches(jax.random.key(0), neigh)
        assert out.shape == neigh.shape
        # every output point existed in the input patch
        a = np.asarray(out[0, 0])
        b = np.asarray(neigh[0, 0])
        for p in a:
            assert np.any(np.all(np.isclose(p, b), axis=-1))

    def test_scan_replaces_with_center(self, rng):
        neigh, center = self._patches(rng)
        out = CP.scan_density_patches(jax.random.key(0), neigh, center,
                                      level=jnp.float32(4.0))
        assert out.shape == neigh.shape

    def test_full_dispatch(self, rng):
        neigh, center = self._patches(rng)
        tn, tc = CP.corrupt_patches(jax.random.key(0), neigh, center,
                                    ("affine_r3", "Drop-Patch"))
        assert tn.shape == neigh.shape and tc.shape == center.shape

    def test_add_local_replaces_random_slots_not_nearest(self, rng):
        """add_local keeps S - add_n ORIGINAL points chosen uniformly — in
        particular slot 0 (the kNN-nearest/center point) must survive in a
        healthy fraction of patches (the old code always overwrote the first
        add_n slots, deleting every patch's nearest points)."""
        neigh, center = self._patches(rng, B=4, G=16, S=18)
        out = np.asarray(CP.add_local_patches(jax.random.key(3), neigh,
                                              level=4.0))
        src = np.asarray(neigh)
        B, G, S, _ = src.shape
        add_n = int(S * 0.5 / 1.5)
        kept_counts, slot0_kept = [], 0
        for b in range(B):
            for g in range(G):
                outset = out[b, g]
                kept = [p for p in src[b, g]
                        if np.any(np.all(np.isclose(outset, p, atol=1e-6), -1))]
                kept_counts.append(len(kept))
                if any(np.allclose(src[b, g, 0], p) for p in kept):
                    slot0_kept += 1
        # exactly S - add_n originals survive per patch (noised copies are
        # almost surely not equal to any original)
        assert all(c == S - add_n for c in kept_counts), set(kept_counts)
        # slot 0 survives at the uniform-keep rate, not never
        assert slot0_kept / (B * G) > 0.4

    def test_masked_scale_normalizes_valid_rows_only(self, rng):
        """'dropout_local' then 'scale': pc_normalize must use only the
        surviving rows — the valid cloud ends exactly on the unit sphere
        and centered, regardless of what the dead rows hold."""
        pts = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32) * 5.0)
        out, mask = C.corrupt_cloud(jax.random.key(5), pts,
                                    ("dropout_local", "scale"))
        o = np.asarray(out)
        m = np.asarray(mask)
        assert m.sum() > 0 and not m.all()
        valid = o[m]
        np.testing.assert_allclose(valid.mean(0), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(valid, axis=1).max(), 1.0,
                                   rtol=1e-5)


ALL_NAMES = [
    "clean", "scale", "scale_single", "scale_nonorm", "scale_nonorm_1p5",
    "scale_nonorm_4", "scale_nonorm_10", "translate", "translate_tiny",
    "translate_middle", "translate_too_large", "jitter", "jitter_p01",
    "jitter_p03", "jitter_p05", "jitter_p1", "rotate", "rotate_level0",
    "rotate_level1", "rotate_level2", "rotate_level3", "rotate_level4",
    "reflection", "shear", "shear_p1", "shear_p3", "shear_p8", "shear_1p",
    "shear_2p", "shear_small", "rotate_z", "dropout_local",
    "dropout_local_c5d1", "dropout_local_c5d3", "dropout_local_c5d5",
    "dropout_local_c5d7", "dropout_local_c5d9", "dropout_local_c1d3",
    "dropout_local_c2d3", "dropout_local_c3d3", "dropout_local_c8d3",
    "add_global", "add_local", "nonuniform_density", "affine_r3", "affine_r5",
    "affine_r3_v2", "affine_r5_v2", "dropout_patch_pointmae",
    "dropout_global_p5",
]


class TestEveryRegistryName:
    """Every corruption name from the reference registry
    (corrupt_util.py:984-1038) must run and produce finite output."""

    @pytest.mark.parametrize("name", ALL_NAMES)
    def test_name(self, name, rng):
        pts = cloud(rng, 200)
        out = C.corrupt_and_sample(jax.random.key(1), pts, (name,), 128)
        assert out.shape == (128, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestRound2Names:
    def test_shear_p5_alias(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from point_dae_tpu.data.corruptions import corrupt_cloud

        pts = jnp.asarray(np.random.default_rng(0).normal(
            size=(64, 3)).astype(np.float32))
        out, mask = corrupt_cloud(jax.random.key(0), pts, ("shear_p5",))
        assert out.shape == pts.shape and mask is None
        assert not np.allclose(np.asarray(out), np.asarray(pts))

    def test_random_add_grows_capacity_and_masks(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from point_dae_tpu.data.corruptions import (corrupt_cloud,
                                                    corruption_capacity)

        n = 64
        pts = jnp.asarray(np.random.default_rng(1).normal(
            size=(n, 3)).astype(np.float32))
        assert corruption_capacity(n, ("random_add",)) == n + n // 2
        out, mask = corrupt_cloud(jax.random.key(1), pts, ("random_add",))
        assert out.shape[0] == n + n // 2
        got = int(np.asarray(mask).sum())
        assert n <= got <= n + n // 2            # originals + some additions
