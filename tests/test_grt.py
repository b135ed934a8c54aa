"""3DGRT path: sorted compositing semantics + arbitrary-ray trace API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scene_utils import make_test_scene
from threedgrut_tpu.ops.pallas.raster import bitonic_sort_by_key
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.grt import render_grt, trace
from threedgrut_tpu.render.gut import render_gut

UT = UTConfig()
RC = RasterConfig(max_pairs=1 << 13)


def _run_bitonic(key, payload):
    """Run the sort inside interpret-mode pallas (pltpu.roll has no eager
    impl outside a kernel - production only ever sorts in-kernel)."""
    from jax.experimental import pallas as pl

    def kern(k_ref, p_ref, ok_ref, op_ref):
        sk, (sp,) = bitonic_sort_by_key(k_ref[...], [p_ref[...]])
        ok_ref[...] = sk
        op_ref[...] = sp

    return pl.pallas_call(
        kern, out_shape=[jax.ShapeDtypeStruct(key.shape, key.dtype)] * 2,
        interpret=True)(key, payload)


class TestBitonicSort:
    def test_sorts_keys(self):
        rng = np.random.default_rng(0)
        key = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
        payload = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
        skey, spay = _run_bitonic(key, payload)
        k = np.asarray(skey)
        assert np.all(np.diff(k, axis=1) >= 0), "keys not sorted"
        # payload permuted consistently: sums preserved per row
        np.testing.assert_allclose(np.sort(np.asarray(payload), axis=1),
                                   np.sort(np.asarray(spay), axis=1),
                                   atol=1e-6)

    def test_payload_follows_key(self):
        key = jnp.asarray([[3.0, 1.0, 4.0, 2.0] + list(range(5, 129))],
                          jnp.float32)
        pay = key * 10.0
        skey, spay = _run_bitonic(key, pay)
        np.testing.assert_allclose(np.asarray(spay), np.asarray(skey) * 10,
                                   atol=1e-5)


class TestGRT:
    def test_render_runs_and_orders(self):
        cam, model = make_test_scene(n=96, seed=0, res=(48, 32))
        out = render_grt(cam, UT, RC, model, sh_degree=2, interpret=True)
        f = np.asarray(out["pred_features"])
        assert np.all(np.isfinite(f)) and f.max() > 0

    def test_sorted_vs_unsorted_differ_only_slightly(self):
        # same scene through 3DGUT (global-z) vs 3DGRT (per-ray sorted):
        # images should be close (ordering refinement), not wildly apart
        cam, model = make_test_scene(n=96, seed=1, res=(48, 32))
        rc4 = RasterConfig(max_pairs=1 << 13, kernel_degree=4,
                           min_transmittance=1e-3)
        a = render_gut(cam, UT, rc4, model, sh_degree=2, interpret=True)
        b = render_grt(cam, UT, rc4.replace(sorted_compositing=True), model,
                       sh_degree=2, interpret=True)
        fa = np.asarray(a["pred_features"])
        fb = np.asarray(b["pred_features"])
        assert np.abs(fa - fb).mean() < 0.05
        np.testing.assert_allclose(np.asarray(a["pred_opacity"]),
                                   np.asarray(b["pred_opacity"]), atol=0.05)

    @pytest.mark.slow
    def test_sorted_gradients_flow(self):
        cam, model = make_test_scene(n=32, seed=2, res=(32, 32))
        rc = RasterConfig(max_pairs=1 << 12, sorted_compositing=True)

        def loss(params):
            m = model.replace(params=params)
            out = render_gut(cam, UT, rc, m, sh_degree=0, interpret=True)
            return jnp.mean(out["pred_features"]) + jnp.mean(
                out["pred_dist"])

        g = jax.grad(loss)(model.params)
        assert all(bool(jnp.all(jnp.isfinite(x)))
                   for x in jax.tree.leaves(g))
        assert float(jnp.abs(g.positions).max()) > 0

    def test_trace_matches_camera_render(self):
        """trace() on camera rays should approximate the raster output."""
        cam, model = make_test_scene(n=64, seed=3, res=(32, 32))
        rc = RasterConfig(max_pairs=1 << 13)
        out_cam = render_grt(cam, UT, rc, model, sh_degree=0,
                             interpret=True)
        from threedgrut_tpu.render.common import camera_rays_world
        ro, rd = camera_rays_world(cam)
        out_tr = trace(model, ro, rd, sh_degree=0, interpret=True)
        a = np.asarray(out_cam["pred_opacity"])
        b = np.asarray(out_tr["pred_opacity"])
        # binning culls low-contribution tails; allow small deviations
        assert np.abs(a - b).mean() < 0.02

    def test_trace_arbitrary_shape(self):
        _, model = make_test_scene(n=32, seed=4)
        ro = jnp.zeros((7, 3))
        rd = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (7, 1))
        out = trace(model, ro, rd, sh_degree=0, interpret=True)
        assert out["pred_features"].shape == (7, 3)
        assert float(out["pred_opacity"].max()) > 0.1


@pytest.mark.slow
class TestTraceGradients:
    def test_gradients_accumulate_across_blocks(self):
        """512 rays = 2 programs sharing one segment: the full-batch grad
        must equal the sum of per-block grads (exercises the
        shared_segments read-modify-write backward)."""
        _, model = make_test_scene(n=48, seed=5)
        rng = np.random.default_rng(0)
        ro = jnp.zeros((512, 3))
        d = rng.normal(size=(512, 3)) * 0.12 + np.array([0, 0, 1.0])
        rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                         jnp.float32)

        def loss(density, rays_o, rays_d):
            m = model.replace(params=model.params.replace(density=density))
            out = trace(m, rays_o, rays_d, sh_degree=0, interpret=True)
            return jnp.sum(out["pred_features"]) + jnp.sum(
                out["pred_opacity"])

        g_full = jax.grad(loss)(model.params.density, ro, rd)
        g_a = jax.grad(loss)(model.params.density, ro[:256], rd[:256])
        g_b = jax.grad(loss)(model.params.density, ro[256:], rd[256:])
        assert float(jnp.abs(g_full).max()) > 0
        np.testing.assert_allclose(np.asarray(g_full),
                                   np.asarray(g_a + g_b),
                                   rtol=1e-4, atol=1e-6)

    def test_gradient_matches_finite_difference(self):
        _, model = make_test_scene(n=24, seed=6)
        ro = jnp.zeros((32, 3))
        rng = np.random.default_rng(1)
        d = rng.normal(size=(32, 3)) * 0.1 + np.array([0, 0, 1.0])
        rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                         jnp.float32)

        def loss(density):
            m = model.replace(params=model.params.replace(density=density))
            out = trace(m, ro, rd, sh_degree=0, interpret=True)
            return jnp.sum(out["pred_features"])

        g = np.asarray(jax.grad(loss)(model.params.density))
        # check the 3 largest-gradient entries by central differences
        flat = np.abs(g).ravel()
        eps = 1e-3
        for j in np.argsort(flat)[-3:]:
            d0 = np.asarray(model.params.density).copy().ravel()
            dp, dm = d0.copy(), d0.copy()
            dp[j] += eps
            dm[j] -= eps
            fp = float(loss(jnp.asarray(dp.reshape(g.shape))))
            fm = float(loss(jnp.asarray(dm.reshape(g.shape))))
            fd = (fp - fm) / (2 * eps)
            np.testing.assert_allclose(g.ravel()[j], fd, rtol=5e-3,
                                       atol=1e-5)


class TestAcceleratedTrace:
    def test_matches_brute_force(self):
        import jax
        import jax.numpy as jnp

        from scene_utils import make_test_scene
        from threedgrut_tpu.render.common import RasterConfig
        from threedgrut_tpu.render.grt import trace

        _, model = make_test_scene(n=512, capacity=512, seed=4,
                                   res=(32, 32))
        rng = np.random.default_rng(0)
        r = 300
        ro = rng.uniform(-0.2, 0.2, (r, 3)).astype(np.float32)
        ro[:, 2] = -6.0
        rd = rng.normal(size=(r, 3)).astype(np.float32)
        rd[:, 2] = np.abs(rd[:, 2]) + 2.0
        rd /= np.linalg.norm(rd, axis=1, keepdims=True)
        rc = RasterConfig(max_pairs=1 << 12)

        # exact check under rank-order compositing (_sorted=False): both
        # paths composite the identical candidate sequence, so coverage,
        # dedup and ordering of the grid must match brute bit-for-bit
        kwargs = dict(sh_degree=1, raster_cfg=rc, interpret=True)
        gkw = dict(grid_dims=4, max_cells=64, cell_cap=512, global_cap=512)
        brute = trace(model, jnp.asarray(ro), jnp.asarray(rd),
                      accelerate=False, _sorted=False, **kwargs)
        accel = trace(model, jnp.asarray(ro), jnp.asarray(rd),
                      accelerate=True, _sorted=False, **gkw, **kwargs)
        assert int(accel["accel_overflow"]) == 0
        np.testing.assert_allclose(np.asarray(accel["pred_features"]),
                                   np.asarray(brute["pred_features"]),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(accel["pred_opacity"]),
                                   np.asarray(brute["pred_opacity"]),
                                   atol=1e-5, rtol=1e-5)
        # sorted (production) mode: the grid repacks candidates, so the
        # CHUNK-lane re-sort windows fall on different chunk boundaries
        # -> small localized differences only. Bounds calibrated per
        # CHUNK: narrower windows (CHUNK=128 default since round 3)
        # leave more cross-window inversions to differ between the two
        # packings (measured mean 5.7e-4 / max 0.075 at 128 on this
        # scene vs ~1e-5 / 0.03 at 256).
        brute_s = trace(model, jnp.asarray(ro), jnp.asarray(rd),
                        accelerate=False, **kwargs)
        accel_s = trace(model, jnp.asarray(ro), jnp.asarray(rd),
                        accelerate=True, **gkw, **kwargs)
        d = np.abs(np.asarray(accel_s["pred_features"])
                   - np.asarray(brute_s["pred_features"]))
        from threedgrut_tpu.ops.pallas.raster import CHUNK
        mean_b, max_b = (1e-4, 0.05) if CHUNK >= 256 else (2e-3, 0.15)
        assert d.mean() < mean_b and d.max() < max_b, (d.mean(), d.max())

    @pytest.mark.slow
    def test_accelerated_gradients_finite_and_match(self):
        import jax
        import jax.numpy as jnp

        from scene_utils import make_test_scene
        from threedgrut_tpu.render.common import RasterConfig
        from threedgrut_tpu.render.grt import trace

        _, model = make_test_scene(n=256, capacity=256, seed=5,
                                   res=(32, 32))
        rng = np.random.default_rng(1)
        r = 64
        ro = np.tile(np.array([[0.0, 0.0, -6.0]], np.float32), (r, 1))
        rd = rng.normal(size=(r, 3)).astype(np.float32)
        rd[:, 2] = np.abs(rd[:, 2]) + 2.0
        rd /= np.linalg.norm(rd, axis=1, keepdims=True)
        rc = RasterConfig(max_pairs=1 << 12)

        def loss(params, acc):
            m = model.replace(params=params)
            # _sorted=False: the bitonic re-sort's interpret-mode vjp is
            # minutes-slow to compile and orthogonal to the accelerated
            # path's gradient plumbing (segment layout, disjoint backward,
            # cluster-gather transpose) under test here
            out = trace(m, jnp.asarray(ro), jnp.asarray(rd), sh_degree=1,
                        raster_cfg=rc, accelerate=acc, interpret=True,
                        grid_dims=4, max_cells=64, cell_cap=512,
                        global_cap=512, _sorted=False)
            return jnp.mean(out["pred_features"]) \
                + 0.1 * jnp.mean(out["pred_opacity"])

        g_b = jax.grad(lambda p: loss(p, False))(model.params)
        g_a = jax.grad(lambda p: loss(p, True))(model.params)
        for name in ["positions", "rotation", "scale", "density",
                     "features_albedo"]:
            a = np.asarray(getattr(g_a, name))
            b = np.asarray(getattr(g_b, name))
            assert np.isfinite(a).all(), f"nonfinite grad: {name}"
            scale = np.abs(b).max() + 1e-10
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                       err_msg=f"grad mismatch: {name}")


    @pytest.mark.slow
    def test_perpendicular_rays_bounded_candidates(self):
        """Worst case of round 1's depth-slab clusters: rays
        perpendicular to the depth-sort axis. The uniform grid selects
        spatially local cells, so the candidate set stays bounded AND
        the result still matches brute force under generous budgets."""
        import jax.numpy as jnp

        from scene_utils import make_test_scene
        from threedgrut_tpu.render.common import RasterConfig
        from threedgrut_tpu.render.grt import trace

        _, model = make_test_scene(n=512, capacity=512, seed=7,
                                   res=(32, 32), scale_range=(0.02, 0.06),
                                   z_range=(2.5, 6.0))
        rng = np.random.default_rng(2)
        r = 128
        # rays sweeping sideways (+x), perpendicular to the +z depth axis
        ro = np.zeros((r, 3), np.float32)
        ro[:, 0] = -4.0
        ro[:, 1] = rng.uniform(-1.0, 1.0, r)
        ro[:, 2] = rng.uniform(3.0, 5.0, r)
        rd = np.zeros((r, 3), np.float32)
        rd[:, 0] = 1.0
        rc = RasterConfig(max_pairs=1 << 12)

        brute = trace(model, jnp.asarray(ro), jnp.asarray(rd),
                      sh_degree=1, raster_cfg=rc, accelerate=False,
                      _sorted=False, interpret=True)
        accel = trace(model, jnp.asarray(ro), jnp.asarray(rd),
                      sh_degree=1, raster_cfg=rc, accelerate=True,
                      grid_dims=4, max_cells=64, cell_cap=512,
                      global_cap=512, _sorted=False, interpret=True)
        assert float(brute["pred_opacity"].max()) > 0.1
        np.testing.assert_allclose(np.asarray(accel["pred_features"]),
                                   np.asarray(brute["pred_features"]),
                                   atol=1e-5, rtol=1e-5)

    @pytest.mark.slow
    def test_grid_reuse_across_calls(self):
        """A prebuilt GridAccel (playground per-frame build) matches the
        per-call build."""
        import jax.numpy as jnp

        from scene_utils import make_test_scene
        from threedgrut_tpu.render.common import RasterConfig
        from threedgrut_tpu.render.grt import build_grid, trace

        _, model = make_test_scene(n=256, capacity=256, seed=8,
                                   res=(32, 32))
        rng = np.random.default_rng(3)
        ro = np.zeros((64, 3), np.float32)
        ro[:, 2] = -6.0
        rd = rng.normal(size=(64, 3)).astype(np.float32)
        rd[:, 2] = np.abs(rd[:, 2]) + 2.0
        rd /= np.linalg.norm(rd, axis=1, keepdims=True)
        rc = RasterConfig(max_pairs=1 << 12)

        grid = build_grid(model, jnp.mean(jnp.asarray(ro), axis=0),
                          grid_dims=4, global_cap=512)
        a = trace(model, jnp.asarray(ro), jnp.asarray(rd), sh_degree=1,
                  raster_cfg=rc, accel=grid, max_cells=64, cell_cap=512,
                  global_cap=512, interpret=True)
        b = trace(model, jnp.asarray(ro), jnp.asarray(rd), sh_degree=1,
                  raster_cfg=rc, accelerate=True, grid_dims=4,
                  max_cells=64, cell_cap=512, global_cap=512,
                  interpret=True)
        np.testing.assert_allclose(np.asarray(a["pred_features"]),
                                   np.asarray(b["pred_features"]),
                                   atol=1e-6)
