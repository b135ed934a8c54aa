"""Production 3DGUT pipeline (Pallas interpret mode) vs pure-JAX oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scene_utils import make_test_scene
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.gut import render_gut
from threedgrut_tpu.render.oracle import render_oracle

UT = UTConfig()
RC = RasterConfig(max_pairs=1 << 14)


class TestRenderParity:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_forward_matches_oracle(self, seed):
        cam, model = make_test_scene(n=96, seed=seed, res=(64, 48))
        ref = render_oracle(cam, UT, RC, model, sh_degree=3)
        got = render_gut(cam, UT, RC, model, sh_degree=3, interpret=True)
        # fast path (chunk_hits_fast) is an algebraic reformulation ->
        # small fp differences vs the oracle's direct canonical transform
        np.testing.assert_allclose(got["pred_features"], ref["pred_features"],
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(got["pred_opacity"], ref["pred_opacity"],
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(got["pred_dist"], ref["pred_dist"],
                                   atol=2e-3, rtol=1e-3)
        hits_diff = np.abs(np.asarray(got["hits_count"], np.int64)
                           - np.asarray(ref["hits_count"], np.int64))
        assert (hits_diff > 0).mean() < 0.01  # borderline hits may flip

    def test_inactive_particles_ignored(self):
        cam, model = make_test_scene(n=64, capacity=96, n_active=32)
        out = render_gut(cam, UT, RC, model, sh_degree=0, interpret=True)
        cam2, model_small = make_test_scene(n=64, capacity=96, n_active=32)
        assert np.all(np.isfinite(np.asarray(out["pred_features"])))
        # visibility mask must be false for inactive slots
        vis = np.asarray(out["mog_visibility"])
        assert not vis[32:].any()

    def test_gradients_match_oracle(self):
        cam, model = make_test_scene(n=48, seed=3, res=(32, 32))
        target = jnp.zeros((32, 32, 3))

        def loss_gut(params):
            m = model.replace(params=params)
            out = render_gut(cam, UT, RC, m, sh_degree=1, interpret=True)
            return jnp.mean((out["pred_features"] - target) ** 2) \
                + 0.1 * jnp.mean(out["pred_opacity"]) \
                + 0.01 * jnp.mean(out["pred_dist"])

        def loss_oracle(params):
            m = model.replace(params=params)
            out = render_oracle(cam, UT, RC, m, sh_degree=1)
            return jnp.mean((out["pred_features"] - target) ** 2) \
                + 0.1 * jnp.mean(out["pred_opacity"]) \
                + 0.01 * jnp.mean(out["pred_dist"])

        g_gut = jax.grad(loss_gut)(model.params)
        g_ref = jax.grad(loss_oracle)(model.params)
        for name in ["positions", "rotation", "scale", "density",
                     "features_albedo", "features_specular"]:
            a = np.asarray(getattr(g_gut, name))
            b = np.asarray(getattr(g_ref, name))
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-3,
                                       err_msg=f"grad mismatch: {name}")

    def test_overflow_counter(self):
        cam, model = make_test_scene(n=96, res=(64, 48))
        rc_small = RasterConfig(max_pairs=256)
        out = render_gut(cam, UT, rc_small, model, sh_degree=0,
                         interpret=True)
        assert int(out["pairs_overflow"]) > 0


@pytest.mark.slow
class TestSortedBackwardParity:
    def test_hand_sorted_bwd_matches_vjp_route(self):
        """The hand-derived sorted backward (_bwd_chunk_fast_sorted,
        shared-origin path) against the independent jax.vjp route (the
        general-geometry path taken when explicit rays disable the
        shared-origin factorization). Same camera, same windows."""
        from threedgrut_tpu.render.common import camera_rays_world

        cam, model = make_test_scene(n=48, seed=5, res=(32, 32))
        rc = RasterConfig(max_pairs=1 << 13, sorted_compositing=True,
                          sort_window=64, kernel_degree=4,
                          min_transmittance=1e-3)
        ro, rd = camera_rays_world(cam)
        target = jnp.zeros((32, 32, 3))

        def loss(params, use_rays):
            m = model.replace(params=params)
            out = render_gut(cam, UT, rc, m, sh_degree=1, interpret=True,
                             rays=(ro, rd) if use_rays else None)
            return jnp.mean((out["pred_features"] - target) ** 2) \
                + 0.1 * jnp.mean(out["pred_opacity"]) \
                + 0.01 * jnp.mean(out["pred_dist"])

        f_hand = float(loss(model.params, False))
        f_vjp = float(loss(model.params, True))
        np.testing.assert_allclose(f_hand, f_vjp, rtol=1e-4)

        g_hand = jax.grad(lambda p: loss(p, False))(model.params)
        g_vjp = jax.grad(lambda p: loss(p, True))(model.params)
        for name in ["positions", "rotation", "scale", "density",
                     "features_albedo"]:
            a = np.asarray(getattr(g_hand, name))
            b = np.asarray(getattr(g_vjp, name))
            assert np.isfinite(a).all(), f"nonfinite grad: {name}"
            scale = np.abs(b).max() + 1e-10
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-3,
                                       err_msg=f"grad mismatch: {name}")


class TestRelaxedKill:
    def test_forward_close_to_exact(self):
        # exact_kill=False lets transmittance keep decaying past
        # min_transmittance instead of freezing (render/common.py);
        # adopted as the 3dgut training default after the on-chip A/B
        # (tests/tpu_profile15.py). The residual must stay far below
        # 8-bit quantization.
        cam, model = make_test_scene(n=96, seed=0, res=(64, 48))
        rc_nk = RasterConfig(max_pairs=1 << 14, exact_kill=False)
        ref = render_gut(cam, UT, RC, model, sh_degree=3, interpret=True)
        got = render_gut(cam, UT, rc_nk, model, sh_degree=3,
                         interpret=True)
        diff = np.abs(np.asarray(got["pred_features"])
                      - np.asarray(ref["pred_features"]))
        assert diff.max() < 2e-3, diff.max()
        do = np.abs(np.asarray(got["pred_opacity"])
                    - np.asarray(ref["pred_opacity"]))
        assert do.max() < 2e-3, do.max()

    def test_gradients_finite_and_aligned(self):
        cam, model = make_test_scene(n=48, seed=3, res=(32, 32))
        target = jnp.zeros((32, 32, 3))

        def make_loss(rc):
            def loss(params):
                m = model.replace(params=params)
                out = render_gut(cam, UT, rc, m, sh_degree=1,
                                 interpret=True)
                return jnp.mean((out["pred_features"] - target) ** 2)
            return loss

        rc_nk = RasterConfig(max_pairs=1 << 14, exact_kill=False)
        g_nk = jax.grad(make_loss(rc_nk))(model.params)
        g_ex = jax.grad(make_loss(RC))(model.params)
        for name in ["positions", "scale", "density", "features_albedo"]:
            a = np.asarray(getattr(g_nk, name)).ravel()
            b = np.asarray(getattr(g_ex, name)).ravel()
            assert np.isfinite(a).all(), name
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)
                                 + 1e-20))
            assert cos > 0.999, f"relaxed-kill grad off for {name}: {cos}"


class TestBf16Records:
    def test_forward_close_to_f32(self):
        cam, model = make_test_scene(n=96, seed=0, res=(64, 48))
        rc16 = RasterConfig(max_pairs=1 << 14, records_bf16=True)
        ref = render_gut(cam, UT, RC, model, sh_degree=3, interpret=True)
        got = render_gut(cam, UT, rc16, model, sh_degree=3, interpret=True)
        # bf16 quantizes the canonical-frame geometry (~0.2% relative)
        # -> borderline hits shift; almost all pixels stay at the
        # quantization level, a small tail flips acceptance
        diff = np.abs(np.asarray(got["pred_features"])
                      - np.asarray(ref["pred_features"]))
        assert np.quantile(diff, 0.99) < 2e-2, np.quantile(diff, 0.99)
        assert diff.max() < 0.2, diff.max()
        do = np.abs(np.asarray(got["pred_opacity"])
                    - np.asarray(ref["pred_opacity"]))
        assert np.quantile(do, 0.99) < 5e-2 and do.max() < 0.2

    def test_gradients_close_and_f32(self):
        cam, model = make_test_scene(n=48, seed=3, res=(32, 32))
        target = jnp.zeros((32, 32, 3))

        def make_loss(rc):
            def loss(params):
                m = model.replace(params=params)
                out = render_gut(cam, UT, rc, m, sh_degree=1,
                                 interpret=True)
                return jnp.mean((out["pred_features"] - target) ** 2)
            return loss

        rc16 = RasterConfig(max_pairs=1 << 14, records_bf16=True)
        g16 = jax.grad(make_loss(rc16))(model.params)
        g32 = jax.grad(make_loss(RC))(model.params)
        for name in ["positions", "scale", "density", "features_albedo"]:
            a = np.asarray(getattr(g16, name)).ravel()
            b = np.asarray(getattr(g32, name)).ravel()
            assert a.dtype == np.float32, name
            assert np.isfinite(a).all(), name
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)
                                 + 1e-20))
            assert cos > 0.99, f"bf16 grad direction off for {name}: {cos}"

class TestMxuScan:
    """scan_mxu swaps the Hillis-Steele prefix product for a log-space
    triangular matmul (ops/pallas/raster.py:_prefix_product_excl_mxu).
    At Precision.HIGHEST the result is f32-accurate (probe: max|T err|
    3e-8), so forward and gradients must match the shift chain tightly.
    """

    def test_forward_matches_vpu_scan(self):
        cam, model = make_test_scene(n=96, seed=0, res=(64, 48))
        rc_mxu = RasterConfig(max_pairs=1 << 14, scan_mxu=True)
        # the VPU shift chain is the reference (scan_mxu defaults True,
        # so RC alone would compare the mxu scan against itself)
        ref = render_gut(cam, UT, RC.replace(scan_mxu=False), model,
                         sh_degree=3, interpret=True)
        got = render_gut(cam, UT, rc_mxu, model, sh_degree=3,
                         interpret=True)
        for k in ["pred_features", "pred_opacity", "pred_dist"]:
            np.testing.assert_allclose(got[k], ref[k], atol=5e-5,
                                       rtol=1e-4, err_msg=k)

    def test_gradients_match_vpu_scan(self):
        cam, model = make_test_scene(n=48, seed=3, res=(32, 32))
        target = jnp.zeros((32, 32, 3))

        def make_loss(rc):
            def loss(params):
                m = model.replace(params=params)
                out = render_gut(cam, UT, rc, m, sh_degree=1,
                                 interpret=True)
                return jnp.mean((out["pred_features"] - target) ** 2)
            return loss

        rc_mxu = RasterConfig(max_pairs=1 << 14, scan_mxu=True)
        g_mxu = jax.grad(make_loss(rc_mxu))(model.params)
        g_ref = jax.grad(make_loss(RC.replace(scan_mxu=False)))(
            model.params)
        for name in ["positions", "scale", "density", "features_albedo"]:
            a = np.asarray(getattr(g_mxu, name)).ravel()
            b = np.asarray(getattr(g_ref, name)).ravel()
            assert np.isfinite(a).all(), name
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)
                                 + 1e-20))
            assert cos > 0.9999, f"mxu-scan grad off for {name}: {cos}"


class TestFusedMxu:
    """fused_mxu packs the 7 per-chunk hit-model contractions into one
    wide lane-concatenated dot_f32 (raster.py:_fused_hits_mm); it is the
    forward default, so parity runs against the unfused small-dot path.
    fused_mxu_bwd does the analogous packing for the pullback's 7
    pixel-dim contractions (off by default)."""

    def test_forward_matches_unfused(self):
        cam, model = make_test_scene(n=96, seed=1, res=(64, 48))
        ref = render_gut(cam, UT, RC.replace(fused_mxu=False), model,
                         sh_degree=3, interpret=True)
        got = render_gut(cam, UT, RC.replace(fused_mxu=True), model,
                         sh_degree=3, interpret=True)
        for k in ["pred_features", "pred_opacity", "pred_dist",
                  "hits_count"]:
            np.testing.assert_allclose(got[k], ref[k], atol=5e-5,
                                       rtol=1e-4, err_msg=k)

    def test_gradients_match_unfused(self):
        cam, model = make_test_scene(n=48, seed=5, res=(32, 32))
        target = jnp.zeros((32, 32, 3))

        def make_loss(rc):
            def loss(params):
                m = model.replace(params=params)
                out = render_gut(cam, UT, rc, m, sh_degree=1,
                                 interpret=True)
                return jnp.mean((out["pred_features"] - target) ** 2)
            return loss

        g_ref = jax.grad(make_loss(RC.replace(
            fused_mxu=False)))(model.params)
        for rc in [RC.replace(fused_mxu=True),
                   RC.replace(fused_mxu=True, fused_mxu_bwd=True)]:
            g = jax.grad(make_loss(rc))(model.params)
            for name in ["positions", "scale", "density",
                         "features_albedo"]:
                a = np.asarray(getattr(g, name)).ravel()
                b = np.asarray(getattr(g_ref, name)).ravel()
                assert np.isfinite(a).all(), name
                cos = float(a @ b / (np.linalg.norm(a)
                                     * np.linalg.norm(b) + 1e-20))
                assert cos > 0.9999, f"fused grad off for {name}: {cos}"


class TestAlignedSegments:
    """aligned_segments re-bases tile segments to chunk boundaries
    (ops/binning.py _align_segments); forward and gradients must match
    the raw layout exactly (same math, different slot layout)."""

    def test_forward_matches_raw(self):
        cam, model = make_test_scene(n=96, seed=2, res=(64, 48))
        raw = render_gut(cam, UT, RC, model, sh_degree=3, interpret=True)
        ali = render_gut(cam, UT, RC.replace(aligned_segments=True),
                         model, sh_degree=3, interpret=True)
        for k in ["pred_features", "pred_opacity", "pred_dist",
                  "hits_count"]:
            # 1e-5: the two layouts chunk the accumulation differently,
            # so dot_f32's dropped lo*lo terms differ per chunking
            np.testing.assert_allclose(ali[k], raw[k], atol=1e-5,
                                       rtol=1e-5, err_msg=k)
        assert int(ali["pairs_overflow"]) == 0

    def test_gradients_match_raw(self):
        cam, model = make_test_scene(n=48, seed=4, res=(32, 32))
        target = jnp.zeros((32, 32, 3))

        def make_loss(rc):
            def loss(params):
                m = model.replace(params=params)
                out = render_gut(cam, UT, rc, m, sh_degree=1,
                                 interpret=True)
                return jnp.mean((out["pred_features"] - target) ** 2) \
                    + 0.1 * jnp.mean(out["pred_opacity"])
            return loss

        g_raw = jax.grad(make_loss(RC))(model.params)
        g_ali = jax.grad(make_loss(RC.replace(aligned_segments=True)))(
            model.params)
        for name in ["positions", "rotation", "scale", "density",
                     "features_albedo", "features_specular"]:
            a = np.asarray(getattr(g_ali, name))
            b = np.asarray(getattr(g_raw, name))
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-5,
                                       err_msg=f"grad mismatch: {name}")

    def test_alignment_overflow_reported(self):
        # budget fits the raw pairs but not the chunk padding -> the
        # overflow signal must fire so auto-calibration grows the budget
        cam, model = make_test_scene(n=96, res=(64, 48))
        raw = render_gut(cam, UT, RasterConfig(max_pairs=1 << 14), model,
                         sh_degree=0, interpret=True)
        n_raw = int(raw["num_pairs"])
        from threedgrut_tpu.ops.pallas.raster import CHUNK
        tight = ((n_raw + CHUNK - 1) // CHUNK) * CHUNK + CHUNK
        tight += (-tight) % 1024  # max_pairs must divide the expand slab
        ali = render_gut(cam, UT,
                         RasterConfig(max_pairs=tight,
                                      aligned_segments=True),
                         model, sh_degree=0, interpret=True)
        assert int(ali["pairs_overflow"]) > 0

    def test_weight_telemetry_matches_raw(self):
        cam, model = make_test_scene(n=96, seed=5, res=(64, 48))
        raw = render_gut(cam, UT, RC, model, sh_degree=0, interpret=True,
                         weight_telemetry=True)
        ali = render_gut(cam, UT, RC.replace(aligned_segments=True),
                         model, sh_degree=0, interpret=True,
                         weight_telemetry=True)
        np.testing.assert_allclose(ali["particle_wmax"],
                                   raw["particle_wmax"], atol=1e-6)


class TestSkipDeadGuards:
    """All-dead chunk-visit skip guards (round 5): bit-identical A/B.

    Oracle provenance: pinned knob A/B — both sides explicit, never the
    RasterConfig default (PARITY_ORACLES.md rule).
    """

    def test_sorted_forward_identical(self):
        cam, model = make_test_scene(n=96, seed=2, res=(64, 48))
        base = RasterConfig(max_pairs=1 << 14, sorted_compositing=True,
                            sort_window=16, kernel_degree=4,
                            min_transmittance=1e-3)
        on = render_gut(cam, UT, base.replace(sort_skip_dead=True), model,
                        sh_degree=2, interpret=True)
        off = render_gut(cam, UT, base.replace(sort_skip_dead=False),
                         model, sh_degree=2, interpret=True)
        for k in ("pred_features", "pred_opacity", "pred_dist"):
            np.testing.assert_array_equal(np.asarray(on[k]),
                                          np.asarray(off[k]), err_msg=k)

    @pytest.mark.parametrize("sorted_mode", [False, True])
    def test_backward_identical(self, sorted_mode):
        cam, model = make_test_scene(n=48, seed=5, res=(32, 32))
        target = jnp.zeros((32, 32, 3))
        base = RasterConfig(max_pairs=1 << 14,
                            sorted_compositing=sorted_mode,
                            sort_window=16 if sorted_mode else 256)

        def grads(rc):
            def loss(params):
                m = model.replace(params=params)
                out = render_gut(cam, UT, rc, m, sh_degree=1,
                                 interpret=True)
                return jnp.mean((out["pred_features"] - target) ** 2)
            return jax.grad(loss)(model.params)

        if sorted_mode:
            g_on = grads(base.replace(sort_skip_dead=True))
            g_off = grads(base.replace(sort_skip_dead=False))
        else:
            g_on = grads(base.replace(skip_dead_bwd=True))
            g_off = grads(base.replace(skip_dead_bwd=False))
        for name in ["positions", "scale", "density", "features_albedo"]:
            np.testing.assert_array_equal(
                np.asarray(getattr(g_on, name)),
                np.asarray(getattr(g_off, name)), err_msg=name)
