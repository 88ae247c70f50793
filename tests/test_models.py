"""Model zoo smoke + semantics tests (tiny shapes, one jit per test class).

These mirror the reference's missing test pyramid (SURVEY.md §4): shapes,
loss finiteness, gradient flow, and the static-shape masking equivalence.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_dae_tpu.models import build_model_from_cfg
from point_dae_tpu.utils.config import ConfigDict

TINY_TF = {
    "corrupt_type": ["affine_r3", "Drop-Patch"],
    "all_patch": "False", "group_size": 8, "num_group": 16, "loss": "cdl2",
    "transformer_config": {
        "rand_ratio": "True", "mask_ratio": 0.6, "mask_type": "rand",
        "trans_dim": 32, "encoder_dims": 32, "depth": 2,
        "drop_path_rate": 0.1, "cls_dim": 15, "num_heads": 2,
        "decoder_depth": 1, "decoder_num_heads": 2}}


def init_and_apply(cfg, B=2, N=64, C=3, seed=0):
    model = build_model_from_cfg(ConfigDict(cfg))
    rng = np.random.default_rng(seed)
    corrupted = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    clean = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    rngs = {"params": jax.random.key(0), "corrupt": jax.random.key(1),
            "mask": jax.random.key(2), "droppath": jax.random.key(3),
            "dropout": jax.random.key(4)}

    @jax.jit
    def run():
        v = model.init(rngs, corrupted, clean, train=True)
        out, _ = model.apply(v, corrupted, clean, train=True,
                             rngs={k: jax.random.key(9) for k in
                                   ("corrupt", "mask", "droppath", "dropout")},
                             mutable=["batch_stats"])
        return v, out

    v, out = run()
    return model, v, out, (corrupted, clean)


class TestDGCNNFamily:
    def test_fconly_losses_finite(self):
        _, _, out, _ = init_and_apply({"NAME": "Point_CAE_DGCNN_FCOnly",
                                       "corrupt_type": [], "loss": "cdl2"})
        assert np.isfinite(float(out[0])) and float(out[1]) == 0.0

    def test_pcn_two_losses(self):
        _, _, out, _ = init_and_apply({"NAME": "Point_CAE_DGCNN",
                                       "corrupt_type": [], "loss": "cdl2"})
        assert np.isfinite(float(out[0])) and np.isfinite(float(out[1]))
        assert float(out[1]) > 0.0  # fine loss is real

    def test_grad_flows(self):
        model, v, _, (corrupted, clean) = init_and_apply(
            {"NAME": "Point_CAE_DGCNN_FCOnly", "corrupt_type": [],
             "loss": "cdl2"})

        @jax.jit
        def g(params):
            (l, _), _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                corrupted, clean, train=True,
                rngs={"corrupt": jax.random.key(0)},
                mutable=["batch_stats"])
            return l

        grads = jax.grad(g)(v["params"])
        norms = [float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads)]
        assert sum(n > 0 for n in norms) > len(norms) * 0.5


class TestTransformerFamily:
    def test_flagship(self):
        cfg = dict(TINY_TF, NAME="PointCAE_transformer_fc_global_folding_local")
        model, v, out, (corrupted, clean) = init_and_apply(cfg, N=128)
        assert np.isfinite(float(out[0])) and np.isfinite(float(out[1]))
        # encode path (SVM features)
        feat = jax.jit(functools.partial(
            model.apply, train=False, method="encode"))(v, clean)
        assert feat.shape == (2, 32)

    def test_fc_local(self):
        cfg = dict(TINY_TF, NAME="PointCAE_transformer")
        _, _, out, _ = init_and_apply(cfg, N=128)
        assert np.isfinite(float(out[0]))

    def test_no_mask_variant(self):
        cfg = dict(TINY_TF, NAME="PointCAE_transformer",
                   corrupt_type=["affine_r3"])  # no Drop-Patch
        _, _, out, _ = init_and_apply(cfg, N=128)
        assert np.isfinite(float(out[0]))

    def test_point_mae(self):
        cfg = dict(TINY_TF, NAME="Point_MAE", corrupt_type=["Drop-Patch"])
        _, _, out, _ = init_and_apply(cfg, N=128)
        assert np.isfinite(float(out[0]))


class TestMaskingEquivalence:
    """The static-shape design claim: visible-token encoder outputs must be
    independent of masked-token *contents* (masked tokens excluded as keys)."""

    def test_visible_independent_of_masked(self):
        from point_dae_tpu.models.transformer import MaskTransformerEncoder

        enc = MaskTransformerEncoder(trans_dim=32, depth=2, num_heads=2,
                                     encoder_dims=32, drop_path_rate=0.0,
                                     mask_ratio=0.5, rand_ratio=False)
        rng = np.random.default_rng(0)
        neigh = jnp.asarray(rng.normal(size=(1, 8, 4, 3)).astype(np.float32))
        center = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))
        rngs = {"params": jax.random.key(0), "mask": jax.random.key(1)}

        @jax.jit
        def run(neigh):
            v = enc.init(rngs, neigh, center, train=False)
            # fixed mask key -> same mask both runs
            x, mask = enc.apply(v, neigh, center, train=False,
                                rngs={"mask": jax.random.key(7)})
            return x, mask

        x1, mask = run(neigh)
        # perturb ONLY masked patches' contents
        m = np.asarray(mask)[0]
        neigh2 = np.asarray(neigh).copy()
        neigh2[0, m] += 100.0
        x2, mask2 = run(jnp.asarray(neigh2))
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask2))
        vis = ~m
        np.testing.assert_allclose(np.asarray(x1)[0, vis],
                                   np.asarray(x2)[0, vis], atol=2e-4)

    def test_mask_count(self):
        from point_dae_tpu.models.transformer import sample_patch_mask

        mask = sample_patch_mask(jax.random.key(0), 4, 64, 0.6, False)
        counts = np.asarray(jnp.sum(mask, -1))
        np.testing.assert_array_equal(counts, 38)  # floor(0.6*64)

    def test_mask_count_matches_static_capacity(self):
        """Regression: the in-graph masked count (f32 floor) and the static
        V/M capacities must agree for every legal fixed ratio — a Python
        float64 floor disagrees for e.g. ratio=0.53 G=100 (would drop a
        visible token) and 0.7 G=90 (would leak a masked one)."""
        from point_dae_tpu.models.transformer import (sample_patch_mask,
                                                      static_num_masked)

        for G in (64, 90, 100, 128):
            for ratio in np.round(np.arange(0.40, 0.91, 0.01), 2):
                ratio = float(ratio)
                mask = sample_patch_mask(jax.random.key(1), 1, G, ratio,
                                         False)
                n = int(jnp.sum(mask))
                assert n == static_num_masked(ratio, G), (ratio, G)

    def test_block_mask_contiguous_and_counted(self):
        """Block masking (Point_MAE.py:273-299): exactly int(ratio*G)
        masked, and they are the nearest patches to one seed center."""
        from point_dae_tpu.models.transformer import (sample_block_mask,
                                                      static_num_masked)

        rng = np.random.default_rng(0)
        centers = jnp.asarray(rng.normal(size=(3, 32, 3)).astype(np.float32))
        mask = sample_block_mask(jax.random.key(2), centers, 0.6)
        n = static_num_masked(0.6, 32)
        np.testing.assert_array_equal(np.asarray(jnp.sum(mask, -1)), n)
        # contiguity: the masked set is a metric ball around some center —
        # every masked point is closer to the masked centroid than every
        # unmasked point is... use the seed-ball property directly: for the
        # masked set S there exists s in S with max_{j in S} d(s,j)
        # < min_{j not in S} d(s,j)
        c = np.asarray(centers)
        m = np.asarray(mask)
        for b in range(3):
            found = False
            for s in np.where(m[b])[0]:
                d = np.linalg.norm(c[b] - c[b, s], axis=-1)
                if d[m[b]].max() <= d[~m[b]].min() + 1e-6:
                    found = True
                    break
            assert found

    def test_block_mask_end_to_end(self):
        """A masked model with mask_type='block' runs and yields finite
        losses."""
        from point_dae_tpu.models import build_model_from_cfg
        from point_dae_tpu.utils.config import ConfigDict

        cfg = ConfigDict({
            "NAME": "PointCAE_transformer", "corrupt_type": ["Drop-Patch"],
            "all_patch": "False", "group_size": 8, "num_group": 16,
            "loss": "cdl2",
            "transformer_config": {
                "rand_ratio": "True", "mask_ratio": 0.6,
                "mask_type": "block", "trans_dim": 32, "encoder_dims": 32,
                "depth": 1, "drop_path_rate": 0.0, "cls_dim": 8,
                "num_heads": 2, "decoder_depth": 1,
                "decoder_num_heads": 2}})
        model = build_model_from_cfg(cfg)
        rng = np.random.default_rng(1)
        clean = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        rngs = {"params": jax.random.key(0), "corrupt": jax.random.key(1),
                "mask": jax.random.key(2), "droppath": jax.random.key(3)}
        v = model.init(rngs, clean, clean, train=True)
        out, _ = model.apply(
            {"params": v["params"], **({"batch_stats": v["batch_stats"]}
                                       if "batch_stats" in v else {})},
            clean, clean, train=True, mutable=["batch_stats"],
            rngs={"corrupt": jax.random.key(4), "mask": jax.random.key(5),
                  "droppath": jax.random.key(6)})
        assert np.isfinite(float(out[0]))

    def test_mask_type_forwarded_to_every_family_encoder(self):
        """mask_type must reach the encoder in EVERY masked family — the
        Point_MAE/MaskFeat/MlMAE constructors used to omit it, silently
        training rand masking on a 'block' config while the pack-capacity
        logic (_masked_pack_idx) DID honor block, mismatching capacities."""
        from point_dae_tpu.models import build_model_from_cfg
        from point_dae_tpu.utils.config import ConfigDict

        # depth 4: Point_MlMAE fetches encoder level 3
        tcfg = {"rand_ratio": "False", "mask_ratio": 0.5,
                "mask_type": "block", "trans_dim": 32, "encoder_dims": 32,
                "depth": 4, "drop_path_rate": 0.0, "cls_dim": 8,
                "num_heads": 2, "decoder_depth": 1, "decoder_num_heads": 2}
        rng = np.random.default_rng(0)
        clean = jnp.asarray(rng.normal(size=(2, 128, 6)).astype(np.float32))
        rngs = {"params": jax.random.key(0), "corrupt": jax.random.key(1),
                "mask": jax.random.key(2), "droppath": jax.random.key(3)}
        for name in ("Point_MAE", "Point_MAE_folding", "MaskFeat_transformer",
                     "MaskFeat_dgcnn", "Point_MlMAE", "MaskSurf",
                     "MaskSurf_v2_local_point_only", "PointCAE_transformer"):
            cfg = ConfigDict({
                "NAME": name, "corrupt_type": ["Drop-Patch"],
                "all_patch": "False", "group_size": 8, "num_group": 16,
                "loss": "cdl2", "transformer_config": dict(tcfg)})
            model = build_model_from_cfg(cfg)
            v = model.init(rngs, clean, clean, train=True)
            bound = model.bind(dict(v))
            assert bound.MAE_encoder.mask_type == "block", name

    def test_block_mask_end_to_end_mlmae(self):
        """_MlEncoder's block branch runs end-to-end with finite losses and
        an actually-contiguous mask (it had no block support at all)."""
        from point_dae_tpu.models import build_model_from_cfg
        from point_dae_tpu.utils.config import ConfigDict

        cfg = ConfigDict({
            "NAME": "Point_MlMAE", "corrupt_type": ["Drop-Patch"],
            "all_patch": "False", "group_size": 8, "num_group": 16,
            "loss": "cdl2", "feat_loss": "high3",
            "transformer_config": {
                "rand_ratio": "True", "mask_ratio": 0.6, "mask_type": "block",
                "trans_dim": 32, "encoder_dims": 32, "depth": 4,
                "drop_path_rate": 0.0, "cls_dim": 8, "num_heads": 2,
                "decoder_depth": 2, "decoder_num_heads": 2}})
        model = build_model_from_cfg(cfg)
        rng = np.random.default_rng(1)
        clean = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        rngs = {"params": jax.random.key(0), "corrupt": jax.random.key(1),
                "mask": jax.random.key(2), "droppath": jax.random.key(3)}
        v = model.init(rngs, clean, clean, train=True)
        out, _ = model.apply(
            {"params": v["params"], **({"batch_stats": v["batch_stats"]}
                                       if "batch_stats" in v else {})},
            clean, clean, train=True, mutable=["batch_stats"],
            rngs={"corrupt": jax.random.key(4), "mask": jax.random.key(5),
                  "droppath": jax.random.key(6)})
        assert np.isfinite(float(out[0]))

    def test_rand_ratio_mask_within_static_capacity(self):
        """rand_ratio masked counts always fit the packed-buffer capacities
        derived from the 0.5/0.8 endpoints."""
        from point_dae_tpu.models.transformer import (sample_patch_mask,
                                                      static_num_masked)

        G = 64
        lo, hi = static_num_masked(0.5, G), static_num_masked(0.8, G)
        for i in range(50):
            mask = sample_patch_mask(jax.random.key(i), 2, G, 0.6, True)
            n = int(jnp.sum(mask[0]))
            assert lo <= n <= hi

    def test_rand_ratio_range(self):
        from point_dae_tpu.models.transformer import sample_patch_mask

        ratios = []
        for i in range(20):
            mask = sample_patch_mask(jax.random.key(i), 2, 64, 0.6, True)
            ratios.append(float(jnp.sum(mask[0])) / 64)
        assert 0.45 <= min(ratios) and max(ratios) <= 0.82

    def test_packed_local_loss_equals_inplace(self):
        """The masked-token packing in _local_recon_inputs must give exactly
        the loss of the all-token layout with mask weights (same per-patch
        values, same sum(w*per)/sum(w) normalization)."""
        from point_dae_tpu.losses import masked_chamfer_l2
        from point_dae_tpu.models import build_model_from_cfg
        from point_dae_tpu.models.transformer import sample_patch_mask

        cfg = dict(TINY_TF, NAME="PointCAE_transformer")
        model = build_model_from_cfg(ConfigDict(cfg))
        B, G, S, C = 2, 16, 4, 8
        rng = np.random.default_rng(3)
        x_rec = jnp.asarray(rng.normal(size=(B, G, C)).astype(np.float32))
        neigh = jnp.asarray(rng.normal(size=(B, G, S, 3)).astype(np.float32))
        mask = sample_patch_mask(jax.random.key(5), B, G,
                                 model.tcfg.get("mask_ratio", 0.6),
                                 str(model.tcfg.get("rand_ratio", "False"))
                                 == "True")

        # pure config/jnp logic — callable on the unbound module
        x_m, gt, w = model._local_recon_inputs(x_rec, neigh, mask)
        assert x_m.shape[1] < G          # packing actually engaged
        # fabricate a "rebuild" deterministically from the token feature so
        # packed and in-place paths see identical per-patch point sets
        def rebuild_from(x):
            r = jnp.tanh(x[..., : 3 * S]) if x.shape[-1] >= 3 * S else \
                jnp.tanh(jnp.tile(x, (1, 1, (3 * S) // x.shape[-1] + 1))[..., :3 * S])
            return r.reshape(-1, S, 3)

        packed = masked_chamfer_l2(rebuild_from(x_m), gt, w)
        inplace = masked_chamfer_l2(rebuild_from(x_rec),
                                    neigh.reshape(B * G, S, 3),
                                    mask.astype(jnp.float32).reshape(-1))
        np.testing.assert_allclose(float(packed), float(inplace), rtol=1e-6)


class TestFinetuneHeads:
    def test_point_transformer_cls(self):
        cfg = {"NAME": "PointTransformer", "trans_dim": 32, "depth": 2,
               "drop_path_rate": 0.1, "cls_dim": 15, "num_heads": 2,
               "group_size": 8, "num_group": 16, "encoder_dims": 32}
        model = build_model_from_cfg(ConfigDict(cfg))
        pts = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 128, 3)).astype(np.float32))
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
                "droppath": jax.random.key(2)}

        @jax.jit
        def run():
            v = model.init(rngs, pts, train=True)
            logits = model.apply(v, pts, train=False)
            return logits

        logits = run()
        assert logits.shape == (2, 15)

    def test_dgcnn_cls(self):
        cfg = {"NAME": "DGCNN", "cls_dim": 15}
        model = build_model_from_cfg(ConfigDict(cfg))
        pts = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 64, 3)).astype(np.float32))
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}

        @jax.jit
        def run():
            v = model.init(rngs, pts, train=True)
            return model.apply(v, pts, train=False)

        assert run().shape == (2, 15)

    def test_pointnet2_cls(self):
        cfg = {"NAME": "PointNetv2", "cls_dim": 15}
        model = build_model_from_cfg(ConfigDict(cfg))
        pts = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 128, 3)).astype(np.float32))
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}

        @jax.jit
        def run():
            v = model.init(rngs, pts, train=True)
            return model.apply(v, pts, train=False)

        assert run().shape == (2, 15)


class TestPointNetFamily:
    def test_pointnet_dae(self):
        _, _, out, _ = init_and_apply({"NAME": "Point_CAE_PointNet",
                                       "corrupt_type": [], "loss": "cdl2"})
        assert np.isfinite(float(out[0]))

    def test_pointnet2_dae(self):
        _, _, out, _ = init_and_apply({"NAME": "Point_CAE_PointNetv2",
                                       "corrupt_type": [], "loss": "cdl2"},
                                      N=128)
        assert np.isfinite(float(out[0])) and np.isfinite(float(out[1]))


class TestPartSeg:
    def test_shapes(self):
        cfg = {"NAME": "PointTransformerPartSeg", "trans_dim": 32, "depth": 4,
               "num_heads": 2, "group_size": 8, "num_group": 16,
               "encoder_dims": 32, "cls_dim": 50, "drop_path_rate": 0.1}
        from point_dae_tpu.models.partseg import seg_nll_loss

        model = build_model_from_cfg(ConfigDict(cfg))
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        cls_onehot = jax.nn.one_hot(jnp.asarray([0, 3]), 16)
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
                "droppath": jax.random.key(2)}

        @jax.jit
        def run():
            v = model.init(rngs, pts, cls_onehot, train=True)
            return model.apply(v, pts, cls_onehot, train=False)

        logp = run()
        assert logp.shape == (2, 128, 50)
        target = jnp.zeros((2, 128), jnp.int32)
        assert np.isfinite(float(seg_nll_loss(logp, target)))


class TestDGCNNBf16Policy:
    def test_bf16_loss_close_to_f32(self):
        """The bf16 encoder policy (edge tensors + convs bf16; kNN, BN stats,
        losses f32) must track the f32 forward closely on identical params."""
        cfg = {"NAME": "Point_CAE_DGCNN_FCOnly", "corrupt_type": [],
               "loss": "cdl2"}
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
        rngs = {"params": jax.random.key(0)}

        m32 = build_model_from_cfg(ConfigDict(cfg))
        v = m32.init(rngs, pts, pts, train=False)
        (l32, _) = m32.apply(v, pts, pts, train=False)

        m16 = build_model_from_cfg(ConfigDict(dict(cfg, dtype="bf16")))
        (l16, _) = m16.apply(v, pts, pts, train=False)   # same params
        assert abs(float(l16) - float(l32)) / max(abs(float(l32)), 1e-8) < 0.02
