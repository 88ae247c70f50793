"""Fused EdgeConv correctness: the split-projection + aggregate
restructuring (ops/pallas_edgeconv.py, models/dgcnn.py:FusedEdgeConv) must
match the reference EdgeConv layout exactly — forward, batch-stat updates,
and gradients — on a shared parameter tree. The Pallas kernel runs in
interpreter mode on the CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_dae_tpu.models.dgcnn import (DGCNNEncoder, EdgeConv,
                                        FusedEdgeConv)
from point_dae_tpu.ops import knn
from point_dae_tpu.ops.pallas_edgeconv import (knn_aggregate,
                                               knn_aggregate_xla)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=shape).astype(np.float32))


class TestAggregateKernel:
    def test_forward_matches_xla(self):
        B, N, C, Cf, k = 2, 128, 16, 8, 5
        U = _rand((B, N, C), 1)
        xf = _rand((B, N, Cf), 2)
        M, m, S1, S2, idx = knn_aggregate(U, xf, k, interpret=True)
        _, idx_ref = knn(xf, xf, k)
        # the selected neighbor SET must match ops.knn (aggregates are
        # order-invariant, so compare sorted)
        np.testing.assert_array_equal(np.sort(np.asarray(idx), -1),
                                      np.sort(np.asarray(idx_ref), -1))
        Mr, mr, S1r, S2r = knn_aggregate_xla(U, idx_ref)
        np.testing.assert_allclose(np.asarray(M), np.asarray(Mr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(m), np.asarray(mr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(S1), np.asarray(S1r),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(S2), np.asarray(S2r),
                                   atol=1e-4)

    def test_gradient_matches_xla(self):
        B, N, C, Cf, k = 2, 128, 8, 4, 4
        U = _rand((B, N, C), 3)
        xf = _rand((B, N, Cf), 4)
        w = [_rand((B, N, C), 10 + i) for i in range(4)]
        idx_ref = jax.lax.stop_gradient(knn(xf, xf, k)[1])

        def loss_pallas(U):
            M, m, S1, S2, _ = knn_aggregate(U, xf, k, interpret=True)
            return (jnp.sum(w[0] * M) + jnp.sum(w[1] * m)
                    + jnp.sum(w[2] * S1) + jnp.sum(w[3] * S2))

        def loss_xla(U):
            M, m, S1, S2 = knn_aggregate_xla(U, idx_ref)
            return (jnp.sum(w[0] * M) + jnp.sum(w[1] * m)
                    + jnp.sum(w[2] * S1) + jnp.sum(w[3] * S2))

        gp = jax.grad(loss_pallas)(U)
        gx = jax.grad(loss_xla)(U)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-4)


class TestGatherSelImpl:
    """sel_impl='gather' (native dynamic gather, round 5): bit-exact f32
    selection — forward aggregates match the XLA oracle EXACTLY, both
    grad modes agree with the dot path, and the model dispatch honors
    PDAE_EDGECONV_SEL."""

    def test_forward_exact_vs_oracle(self):
        B, N, C, Cf, k = 2, 128, 16, 8, 5
        U = _rand((B, N, C), 1)
        xf = _rand((B, N, Cf), 2)
        M, m, S1, S2, idx = knn_aggregate(U, xf, k, interpret=True,
                                          sel_impl="gather")
        _, idx_ref = knn(xf, xf, k)
        np.testing.assert_array_equal(np.sort(np.asarray(idx), -1),
                                      np.sort(np.asarray(idx_ref), -1))
        Mr, mr, S1r, S2r = knn_aggregate_xla(U, idx_ref)
        # gather selection is exact f32: max/min match BITWISE; sums agree
        # to f32 accumulation-order noise
        np.testing.assert_array_equal(np.asarray(M), np.asarray(Mr))
        np.testing.assert_array_equal(np.asarray(m), np.asarray(mr))
        np.testing.assert_allclose(np.asarray(S1), np.asarray(S1r),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(S2), np.asarray(S2r),
                                   atol=1e-5)

    @pytest.mark.parametrize("grad_mode", ["split", "first"])
    def test_gradients_match_dot_path(self, grad_mode):
        B, N, C, Cf, k = 2, 128, 8, 4, 4
        U = _rand((B, N, C), 3)
        xf = _rand((B, N, Cf), 4)
        w = [_rand((B, N, C), 20 + i) for i in range(4)]

        def loss(U, impl):
            M, m, S1, S2, _ = knn_aggregate(U, xf, k, interpret=True,
                                            grad_mode=grad_mode,
                                            sel_impl=impl)
            return (jnp.sum(w[0] * M) + jnp.sum(w[1] * m)
                    + jnp.sum(w[2] * S1) + jnp.sum(w[3] * S2))

        gg = jax.grad(lambda u: loss(u, "gather"))(U)
        gd = jax.grad(lambda u: loss(u, "dot"))(U)
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gd),
                                   rtol=1e-5, atol=1e-5)

    def test_model_env_knob(self, monkeypatch):
        from point_dae_tpu.ops import pallas_edgeconv as pe

        seen = {}
        orig = pe.knn_aggregate

        def spy(*a, **kw):
            seen["sel_impl"] = kw.get("sel_impl", "dot")
            return orig(*a, **kw)

        monkeypatch.setattr(pe, "knn_aggregate", spy)
        x = _rand((1, 128, 8), 36)
        mod = FusedEdgeConv(12, 4, use_pallas=True, interpret=True)
        v = mod.init({"params": jax.random.key(5)}, x, train=True)
        mod.apply({"params": v["params"], "batch_stats": v["batch_stats"]},
                  x, train=False)
        # default is 'dot': Mosaic's dynamic_gather rejects N > one vreg
        # on current hardware toolchains (r05 finding)
        assert seen["sel_impl"] == "dot"
        monkeypatch.setenv("PDAE_EDGECONV_SEL", "gather")
        mod.apply({"params": v["params"], "batch_stats": v["batch_stats"]},
                  x, train=False)
        assert seen["sel_impl"] == "gather"


class TestPackedArgmin:
    """PDAE_EDGECONV_ARGMIN=packed (opt-in): the column index rides the
    low mantissa bits of the distance keys, making each round's
    argmin+tiebreak one min-reduction. On data without near-ties inside
    the 2^-(23-log2 N) quantization band it must match the exact path
    bitwise, including exact-duplicate tie-breaking (lowest col)."""

    def test_matches_exact_away_from_ties(self, monkeypatch):
        B, N, C, Cf, k = 2, 128, 16, 8, 5
        U = _rand((B, N, C), 11)
        xf = _rand((B, N, Cf), 12)
        exact = knn_aggregate(U, xf, k, interpret=True)
        monkeypatch.setenv("PDAE_EDGECONV_ARGMIN", "packed")
        packed = knn_aggregate(U, xf, k, interpret=True)
        for e, p, name in zip(exact, packed, ("M", "m", "S1", "S2", "idx")):
            np.testing.assert_array_equal(np.asarray(e), np.asarray(p),
                                          err_msg=name)

    def test_duplicate_points_tiebreak(self, monkeypatch):
        # exact duplicates: distance 0 ties -> both paths pick lowest col
        rng = np.random.default_rng(13)
        base = rng.normal(size=(1, 64, 4)).astype(np.float32)
        xf = jnp.asarray(np.concatenate([base, base], axis=1))  # dup rows
        U = _rand((1, 128, 8), 14)
        exact_idx = np.asarray(knn_aggregate(U, xf, 4, interpret=True)[4])
        monkeypatch.setenv("PDAE_EDGECONV_ARGMIN", "packed")
        packed_idx = np.asarray(knn_aggregate(U, xf, 4, interpret=True)[4])
        np.testing.assert_array_equal(exact_idx, packed_idx)


class TestAggregateFromIdx:
    """Hybrid path (round 5): XLA kNN + the lean aggregate-from-idx
    kernel must reproduce knn_aggregate exactly (same idx convention,
    same VJP), and the PDAE_EDGECONV_KNN=xla knob must dispatch it."""

    def test_matches_knn_aggregate(self):
        B, N, C, Cf, k = 2, 128, 16, 8, 5
        U = _rand((B, N, C), 1)
        xf = _rand((B, N, Cf), 2)
        Mk, mk, S1k, S2k, idx = knn_aggregate(U, xf, k, interpret=True)
        Mi, mi, S1i, S2i = __import__(
            "point_dae_tpu.ops.pallas_edgeconv",
            fromlist=["aggregate_from_idx"]).aggregate_from_idx(
            U, idx, k, interpret=True, grad_mode="split")
        np.testing.assert_allclose(np.asarray(Mi), np.asarray(Mk),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(mi), np.asarray(mk),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(S1i), np.asarray(S1k),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(S2i), np.asarray(S2k),
                                   atol=1e-5)

    @pytest.mark.parametrize("grad_mode", ["split", "first"])
    def test_gradients_match(self, grad_mode):
        from point_dae_tpu.ops.pallas_edgeconv import aggregate_from_idx

        B, N, C, Cf, k = 2, 128, 8, 4, 4
        U = _rand((B, N, C), 3)
        xf = _rand((B, N, Cf), 4)
        w = [_rand((B, N, C), 30 + i) for i in range(4)]
        idx = jax.lax.stop_gradient(
            knn_aggregate(U, xf, k, interpret=True)[4])

        def loss_k(U):
            M, m, S1, S2, _ = knn_aggregate(U, xf, k, interpret=True,
                                            grad_mode=grad_mode)
            return (jnp.sum(w[0] * M) + jnp.sum(w[1] * m)
                    + jnp.sum(w[2] * S1) + jnp.sum(w[3] * S2))

        def loss_i(U):
            M, m, S1, S2 = aggregate_from_idx(U, idx, k, interpret=True,
                                              grad_mode=grad_mode)
            return (jnp.sum(w[0] * M) + jnp.sum(w[1] * m)
                    + jnp.sum(w[2] * S1) + jnp.sum(w[3] * S2))

        gk = jax.grad(loss_k)(U)
        gi = jax.grad(loss_i)(U)
        np.testing.assert_allclose(np.asarray(gi), np.asarray(gk),
                                   rtol=1e-5, atol=1e-5)

    def test_model_knob_dispatches_hybrid(self, monkeypatch):
        from point_dae_tpu.ops import pallas_edgeconv as pe

        seen = {}
        orig = pe.aggregate_from_idx

        def spy(*a, **kw):
            seen["called"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(pe, "aggregate_from_idx", spy)
        monkeypatch.setenv("PDAE_EDGECONV_KNN", "xla")
        x = _rand((1, 128, 8), 37)
        mod = FusedEdgeConv(12, 4, use_pallas=True, interpret=True)
        v = mod.init({"params": jax.random.key(5)}, x, train=True)
        out = mod.apply({"params": v["params"],
                         "batch_stats": v["batch_stats"]}, x, train=False)
        assert seen.get("called") and out.shape == (1, 128, 12)
        # parity with the in-kernel-selection path on the same params
        monkeypatch.setenv("PDAE_EDGECONV_KNN", "kernel")
        out2 = mod.apply({"params": v["params"],
                          "batch_stats": v["batch_stats"]}, x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                   rtol=1e-5, atol=1e-5)


class TestFusedEdgeConv:
    def _pair(self, out_dim=24, k=6, interpret=False):
        ref = EdgeConv(out_dim, k)
        fused = FusedEdgeConv(out_dim, k, use_pallas=interpret,
                              interpret=interpret)
        return ref, fused

    @pytest.mark.parametrize("train", [True, False])
    @pytest.mark.parametrize("interpret", [False, True])
    def test_forward_parity(self, train, interpret):
        x = _rand((2, 128, 12), 5)
        ref, fused = self._pair(interpret=interpret)
        v = ref.init({"params": jax.random.key(0)}, x, train=True)
        kwargs = dict(mutable=["batch_stats"]) if train else {}
        args = {"params": v["params"], "batch_stats": v["batch_stats"]}
        if train:
            want, vr = ref.apply(args, x, train=True, **kwargs)
            got, vf = fused.apply(args, x, train=True, **kwargs)
            # BN running-stat updates must match too
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
                vr["batch_stats"], vf["batch_stats"])
        else:
            want = ref.apply(args, x, train=False)
            got = fused.apply(args, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_negative_bn_scale_uses_min(self):
        """With a negative BN scale the post-BN max corresponds to the
        pre-BN min — the sign-select must keep parity."""
        x = _rand((2, 64, 8), 6)
        ref, fused = self._pair(out_dim=10, k=4)
        v = ref.init({"params": jax.random.key(1)}, x, train=True)
        params = jax.tree_util.tree_map(lambda a: a, v["params"])
        params["bn"]["scale"] = params["bn"]["scale"].at[::2].set(-1.5)
        args = {"params": params, "batch_stats": v["batch_stats"]}
        want = ref.apply(args, x, train=False)
        got = fused.apply(args, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_gradient_parity(self):
        x = _rand((2, 64, 8), 7)
        ref, fused = self._pair(out_dim=12, k=4)
        v = ref.init({"params": jax.random.key(2)}, x, train=True)

        def loss(mod, p):
            out, _ = mod.apply({"params": p, "batch_stats": v["batch_stats"]},
                               x, train=True, mutable=["batch_stats"])
            return jnp.sum(out * out)

        gr = jax.grad(lambda p: loss(ref, p))(v["params"])
        gf = jax.grad(lambda p: loss(fused, p))(v["params"])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4),
            gr, gf)

    def test_encoder_impl_parity(self):
        """DGCNNEncoder impl='fused' == impl='reference' on one param tree."""
        x = _rand((2, 128, 3), 8)
        ref = DGCNNEncoder(k=6)
        fused = DGCNNEncoder(k=6, impl="fused")
        v = ref.init({"params": jax.random.key(3)}, x, train=True)
        args = {"params": v["params"], "batch_stats": v["batch_stats"]}
        (gw, pw), _ = ref.apply(args, x, train=True, mutable=["batch_stats"])
        (gg, pg), _ = fused.apply(args, x, train=True,
                                  mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pg), np.asarray(pw),
                                   rtol=1e-3, atol=1e-3)


class TestValuePasses:
    """value_passes=1 drops the mantissa split on the selection dots; it
    must be BIT-exact vs the 3-pass kernel whenever U carries only bf16
    mantissas (the FusedEdgeConv bf16-policy dispatch precondition)."""

    @staticmethod
    def _bf16_mantissa(shape, seed):
        # f32 values that survive bf16 rounding: round-trip through bf16
        return _rand(shape, seed).astype(jnp.bfloat16).astype(jnp.float32)

    def test_forward_bit_exact_on_bf16_mantissa(self):
        B, N, C, Cf, k = 2, 128, 16, 8, 5
        U = self._bf16_mantissa((B, N, C), 31)
        xf = _rand((B, N, Cf), 32)
        out3 = knn_aggregate(U, xf, k, interpret=True, value_passes=3)
        out1 = knn_aggregate(U, xf, k, interpret=True, value_passes=1)
        for a, b in zip(out1, out3):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_gradient_bit_exact_on_bf16_mantissa(self):
        B, N, C, Cf, k = 2, 128, 8, 4, 4
        U = self._bf16_mantissa((B, N, C), 33)
        xf = _rand((B, N, Cf), 34)
        w = [_rand((B, N, C), 40 + i) for i in range(4)]

        def loss(U, passes):
            M, m, S1, S2, _ = knn_aggregate(U, xf, k, interpret=True,
                                            value_passes=passes)
            return (jnp.sum(w[0] * M) + jnp.sum(w[1] * m)
                    + jnp.sum(w[2] * S1) + jnp.sum(w[3] * S2))

        g3 = jax.grad(lambda u: loss(u, 3))(U)
        g1 = jax.grad(lambda u: loss(u, 1))(U)
        # cotangents w are general f32, so the scatter keeps 3 passes and
        # the gradients must agree bit-for-bit (only the selection dots —
        # whose values are bf16-exact — changed pass count)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g3))

    def test_dispatch_uses_single_pass_for_bf16(self, monkeypatch):
        """FusedEdgeConv(dtype=bf16) must request value_passes=1 AND
        grad_passes=1 from the kernel (the backward scatter's output feeds
        the bf16 edge-projection backward, which rounds it to bf16 anyway);
        f32 must keep 3/3, and exact_grads=True must pin grad_passes=3."""
        from point_dae_tpu.ops import pallas_edgeconv as pe

        seen = {}
        orig = pe.knn_aggregate

        def spy(U, xf, k, tn=128, interpret=False, value_passes=3,
                grad_passes=3, grad_mode="split", sel_impl="dot"):
            seen["passes"] = value_passes
            seen["grad_passes"] = grad_passes
            seen["grad_mode"] = grad_mode
            seen["sel_impl"] = sel_impl
            return orig(U, xf, k, tn=tn, interpret=interpret,
                        value_passes=value_passes, grad_passes=grad_passes,
                        grad_mode=grad_mode, sel_impl=sel_impl)

        monkeypatch.setattr(pe, "knn_aggregate", spy)
        x = _rand((1, 128, 8), 35)
        for dt, exact, want, want_g in ((jnp.bfloat16, False, 1, 1),
                                        (jnp.bfloat16, True, 1, 3),
                                        (None, False, 3, 3)):
            mod = FusedEdgeConv(12, 4, dtype=dt, use_pallas=True,
                                interpret=True, exact_grads=exact)
            v = mod.init({"params": jax.random.key(5)}, x, train=True)
            mod.apply({"params": v["params"],
                       "batch_stats": v["batch_stats"]}, x, train=False)
            assert seen["passes"] == want, (dt, seen)
            assert seen["grad_passes"] == want_g, (dt, exact, seen)
            # exact_grads pins the jnp-semantics 'split' tie mode too
            assert seen["grad_mode"] == ("split" if exact else "first")


class TestGradPasses:
    """grad_passes changes MXU operand rounding on hardware. In interpreter
    mode every dot is an exact f32 dot, so 1-pass is exactly the true
    cotangent and 3-pass differs only by the mantissa-split's final f32
    additions (~1 ulp of w per contribution) — agreement at ~1e-6 relative
    pins that the knob changes rounding, not the scatter algebra."""

    def test_gradient_structure_identical_in_interpret(self):
        B, N, C, Cf, k = 2, 128, 8, 4, 4
        U = _rand((B, N, C), 51)
        xf = _rand((B, N, Cf), 52)
        w = [_rand((B, N, C), 60 + i) for i in range(4)]

        def loss(U, gp):
            M, m, S1, S2, _ = knn_aggregate(U, xf, k, interpret=True,
                                            grad_passes=gp)
            return (jnp.sum(w[0] * M) + jnp.sum(w[1] * m)
                    + jnp.sum(w[2] * S1) + jnp.sum(w[3] * S2))

        g3 = jax.grad(lambda u: loss(u, 3))(U)
        g1 = jax.grad(lambda u: loss(u, 1))(U)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g3),
                                   rtol=3e-6, atol=1e-6)


class TestAutoImplResolution:
    def test_auto_resolves_to_reference_off_tpu(self):
        """'auto' must resolve by backend: reference EdgeConv off-TPU,
        fused_pallas on TPU (bench.py and every default config rely on
        this; an unresolved 'auto' used to fall through to reference
        everywhere)."""
        from point_dae_tpu.models.dgcnn import DGCNNEncoder

        enc = DGCNNEncoder(impl="auto")
        assert enc._resolved_impl() == "reference"  # CPU test mesh
        assert DGCNNEncoder(impl="fused")._resolved_impl() == "fused"

    def test_auto_resolves_to_fused_pallas_on_tpu(self, monkeypatch):
        from point_dae_tpu.models import dgcnn as dg

        class _Dev:
            platform = "tpu"

        monkeypatch.setattr(dg.jax, "devices", lambda: [_Dev()])
        assert dg.DGCNNEncoder(impl="auto")._resolved_impl() == "fused_pallas"
        assert dg.DGCNNEncoder(impl="reference")._resolved_impl() == "reference"


class TestBf16Policy:
    def test_fused_tracks_reference_under_bf16(self):
        """bf16 compute policy: fused forward within tolerance of the
        reference layout (separate U/V projections round differently)."""
        x = _rand((2, 128, 12), 9)
        ref = EdgeConv(24, 6, dtype=jnp.bfloat16)
        fused = FusedEdgeConv(24, 6, dtype=jnp.bfloat16, use_pallas=False)
        v = ref.init({"params": jax.random.key(4)}, x, train=True)
        args = {"params": v["params"], "batch_stats": v["batch_stats"]}
        want = ref.apply(args, x, train=False)
        got = fused.apply(args, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0.05, atol=0.05)


class TestAggregateKernelMultiTile:
    """N=256 with tn=128 exercises the grid's second row tile: the
    backward kernel's zero-init predicate (program_id(1)==0) and the
    cross-tile accumulation into the shared (B, N, C) output block are
    otherwise untested off-hardware (every other interpret test is a
    single 128-point tile)."""

    def test_forward_matches_xla_two_tiles(self):
        B, N, C, Cf, k = 2, 256, 16, 8, 5
        U = _rand((B, N, C), 7)
        xf = _rand((B, N, Cf), 8)
        M, m, S1, S2, idx = knn_aggregate(U, xf, k, tn=128, interpret=True)
        _, idx_ref = knn(xf, xf, k)
        np.testing.assert_array_equal(np.sort(np.asarray(idx), -1),
                                      np.sort(np.asarray(idx_ref), -1))
        Mr, mr, S1r, S2r = knn_aggregate_xla(U, idx_ref)
        np.testing.assert_allclose(np.asarray(M), np.asarray(Mr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(m), np.asarray(mr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(S1), np.asarray(S1r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(S2), np.asarray(S2r), atol=1e-4)

    def test_gradient_matches_xla_two_tiles(self):
        B, N, C, Cf, k = 2, 256, 8, 4, 4
        U = _rand((B, N, C), 9)
        xf = _rand((B, N, Cf), 11)
        w = [_rand((B, N, C), 20 + i) for i in range(4)]
        idx_ref = jax.lax.stop_gradient(knn(xf, xf, k)[1])

        def loss_pallas(U):
            M, m, S1, S2, _ = knn_aggregate(U, xf, k, tn=128, interpret=True)
            return (jnp.sum(w[0] * M) + jnp.sum(w[1] * m)
                    + jnp.sum(w[2] * S1) + jnp.sum(w[3] * S2))

        def loss_xla(U):
            M, m, S1, S2 = knn_aggregate_xla(U, idx_ref)
            return (jnp.sum(w[0] * M) + jnp.sum(w[1] * m)
                    + jnp.sum(w[2] * S1) + jnp.sum(w[3] * S2))

        gp = jax.grad(loss_pallas)(U)
        gx = jax.grad(loss_xla)(U)
        # a broken zero-init or per-tile accumulation shows up as a
        # first-tile-only (or doubled) gradient — exact per-element match
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-4)


class TestGradModeFirst:
    """'first' tie routing (torch .max backward semantics): k scatter dots
    + 2 membership dots instead of 2k dots (_bwd_kernel_first)."""

    def test_forward_identical_to_split(self):
        B, N, C, Cf, k = 2, 128, 8, 4, 5
        U = _rand((B, N, C), 20)
        xf = _rand((B, N, Cf), 21)
        a = knn_aggregate(U, xf, k, interpret=True, grad_mode="split")
        b = knn_aggregate(U, xf, k, interpret=True, grad_mode="first")
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_gradient_matches_split_when_tie_free(self):
        """Generic float inputs have no exact value ties among a point's
        neighbors, so both tie conventions give the same cotangent."""
        B, N, C, Cf, k = 2, 128, 8, 4, 4
        U = _rand((B, N, C), 22)
        xf = _rand((B, N, Cf), 23)
        w = [_rand((B, N, C), 30 + i) for i in range(4)]

        def loss(U, mode):
            M, m, S1, S2, _ = knn_aggregate(U, xf, k, interpret=True,
                                            grad_mode=mode)
            return (jnp.sum(w[0] * M) + jnp.sum(w[1] * m)
                    + jnp.sum(w[2] * S1) + jnp.sum(w[3] * S2))

        gs = jax.grad(lambda U: loss(U, "split"))(U)
        gf = jax.grad(lambda U: loss(U, "first"))(U)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                                   rtol=1e-5, atol=1e-5)

    def test_duplicated_points_preserve_total_cotangent(self):
        """On duplicated points (resampling with replacement) the tie
        conventions differ per-copy but the SUM of du over the copies — the
        only thing parameter gradients see, since equal rows contribute
        equal outer products — must match."""
        B, N, C, Cf, k = 1, 128, 8, 4, 5
        rng = np.random.default_rng(24)
        xf_np = rng.normal(size=(B, N, Cf)).astype(np.float32)
        U_np = rng.normal(size=(B, N, C)).astype(np.float32)
        # duplicate point 0 into slots 1 and 2 (same position AND values)
        for d in (1, 2):
            xf_np[:, d] = xf_np[:, 0]
            U_np[:, d] = U_np[:, 0]
        U = jnp.asarray(U_np)
        xf = jnp.asarray(xf_np)
        w = [_rand((B, N, C), 40 + i) for i in range(4)]

        def grad(mode):
            def loss(U):
                M, m, S1, S2, _ = knn_aggregate(U, xf, k, interpret=True,
                                                grad_mode=mode)
                return (jnp.sum(w[0] * M) + jnp.sum(w[1] * m)
                        + jnp.sum(w[2] * S1) + jnp.sum(w[3] * S2))
            return np.asarray(jax.grad(loss)(U))

        gs, gf = grad("split"), grad("first")
        dup, rest = [0, 1, 2], list(range(3, N))
        np.testing.assert_allclose(gf[:, dup].sum(1), gs[:, dup].sum(1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(gf[:, rest], gs[:, rest],
                                   rtol=1e-5, atol=1e-5)

    def test_fused_edgeconv_first_matches_reference_grads(self):
        """FusedEdgeConv(grad_mode='first') end-to-end gradient parity with
        the reference EdgeConv layout on tie-free inputs, shared params."""
        x = _rand((2, 128, 12), 25)
        ref = EdgeConv(16, 5)
        fus = FusedEdgeConv(16, 5, use_pallas=True, interpret=True,
                            grad_mode="first")
        v = ref.init({"params": jax.random.key(6)}, x, train=True)

        def loss(mod, p):
            out, _ = mod.apply({"params": p,
                                "batch_stats": v["batch_stats"]}, x,
                               train=True, mutable=["batch_stats"])
            return jnp.sum(out * out)

        gr = jax.grad(lambda p: loss(ref, p))(v["params"])
        gf = jax.grad(lambda p: loss(fus, p))(v["params"])
        for kr, kf in zip(jax.tree_util.tree_leaves(gr),
                          jax.tree_util.tree_leaves(gf)):
            np.testing.assert_allclose(np.asarray(kf), np.asarray(kr),
                                       rtol=2e-4, atol=2e-4)
