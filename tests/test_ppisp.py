"""Full-depth PPISP tests: ISP transform chain, controller CNN
architecture contract, and the optimization SH bake.

Reference surfaces: ppisp_usd_spg.cu:199 (applyPPISPColor chain),
ppisp_controller_weights.py:84 (ControllerArchitectureSpec / 241,961
weight elements), sh_bake.py (scale_sh_output + photometric fit).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedgrut_tpu.models import ppisp as P


class TestHomography:
    def test_identity_at_zero_latents(self):
        h = np.asarray(P.compute_homography(jnp.zeros(8)))
        np.testing.assert_allclose(h, np.eye(3), atol=1e-5)

    def test_batched(self):
        lat = jax.random.normal(jax.random.PRNGKey(0), (5, 8)) * 0.3
        h = np.asarray(P.compute_homography(lat))
        assert h.shape == (5, 3, 3)
        assert np.isfinite(h).all()
        # normalized: h[2,2] == 1
        np.testing.assert_allclose(h[:, 2, 2], 1.0, atol=1e-5)

    def test_smooth_in_latents(self):
        lat = jnp.zeros(8)
        j = jax.jacobian(lambda l: P.compute_homography(l))(lat)
        assert bool(jnp.isfinite(j).all())


class TestCRF:
    def test_monotone_on_unit_interval(self):
        x = jnp.linspace(0.0, 1.0, 101)[:, None] * jnp.ones((1, 3))
        crf = jnp.asarray([[0.3, -0.2, 0.5, 0.1]] * 3)
        y = np.asarray(P.apply_crf(x, crf))
        assert np.isfinite(y).all()
        assert (np.diff(y, axis=0) >= -1e-5).all(), "CRF not monotone"
        assert y.min() >= 0.0 and y.max() <= 1.0 + 1e-6

    def test_endpoints(self):
        crf = jnp.zeros((3, 4))
        y0 = np.asarray(P.apply_crf(jnp.zeros((1, 3)), crf))
        y1 = np.asarray(P.apply_crf(jnp.ones((1, 3)), crf))
        np.testing.assert_allclose(y0, 0.0, atol=1e-4)
        np.testing.assert_allclose(y1, 1.0, atol=1e-4)

    def test_gradient_finite_at_edges(self):
        crf = jnp.asarray([[0.5, 0.5, 0.0, 0.0]] * 3)
        g = jax.grad(lambda x: jnp.sum(P.apply_crf(x, crf)))(
            jnp.asarray([[0.0, 0.5, 1.0]]))
        assert bool(jnp.isfinite(g).all())


class TestISPChain:
    def test_vignetting_darkens_corners(self):
        params = P.init_ppisp_params(1, 1)
        params["vig_alpha"] = params["vig_alpha"].at[:, :, 0].set(-1.5)
        rgb = jnp.full((32, 32, 3), 0.5)
        out = np.asarray(P.apply_ppisp_full(params, rgb, 0, 0))
        center = out[16, 16].mean()
        corner = out[0, 0].mean()
        assert corner < center

    def test_exposure_brightens(self):
        params = P.init_ppisp_params(1, 2)
        params["exposure"] = params["exposure"].at[1].set(1.0)  # +1 stop
        rgb = jnp.full((8, 8, 3), 0.2)
        base = np.asarray(P.apply_ppisp_full(params, rgb, 0, 0)).mean()
        bright = np.asarray(P.apply_ppisp_full(params, rgb, 0, 1)).mean()
        assert bright > base

    @pytest.mark.slow
    def test_grad_flows_everywhere(self):
        params = P.init_ppisp_params(1, 1)
        # nonzero vignetting so centers get gradient too
        params["vig_alpha"] = params["vig_alpha"].at[:, :, 0].set(-0.5)
        rgb = jnp.clip(jax.random.uniform(
            jax.random.PRNGKey(1), (16, 16, 3)), 0.05, 0.95)
        tgt = rgb * 0.7

        def loss(p):
            return jnp.mean((P.apply_ppisp_full(p, rgb, 0, 0) - tgt) ** 2)
        g = jax.grad(loss)(params)
        for k, v in g.items():
            assert bool(jnp.isfinite(v).all()), k
            assert float(jnp.abs(v).max()) > 0, f"no grad into {k}"

    def test_fits_a_synthetic_look(self):
        # end-to-end: can the ISP learn a warm exposure+tint look?
        rng = jax.random.PRNGKey(2)
        rgb = jnp.clip(jax.random.uniform(rng, (24, 24, 3)), 0.05, 0.9)
        look = jnp.clip(rgb * jnp.asarray([1.4, 1.1, 0.8]) * 0.9, 0, 1)
        params = P.init_ppisp_params(1, 1)
        import optax
        tx = optax.adam(3e-2)
        opt = tx.init(params)

        @jax.jit
        def step(p, o):
            def loss(pp):
                return jnp.mean(
                    (P.apply_ppisp_full(pp, rgb, 0, 0) - look) ** 2)
            l, g = jax.value_and_grad(loss)(p)
            u, o = tx.update(g, o)
            return optax.apply_updates(p, u), o, l
        l0 = None
        for i in range(150):
            params, opt, l = step(params, opt)
            if l0 is None:
                l0 = float(l)
        assert float(l) < l0 * 0.1, (l0, float(l))


class TestController:
    def test_weight_count_matches_reference(self):
        ctrl = P.PPISPControllerCNN(seed=0)
        flat = P.flatten_controller_weights(ctrl.params)
        assert flat.size == 241961  # ControllerArchitectureSpec default

    def test_predict_shapes(self):
        ctrl = P.PPISPControllerCNN(seed=1)
        e, c = ctrl.predict(ctrl.params, jnp.ones((45, 60, 3)) * 0.3, 0.2)
        assert np.asarray(e).shape == ()
        assert np.asarray(c).shape == (8,)

    def test_resolution_independent(self):
        # adaptive pooling: different input sizes, same weight tensors
        ctrl = P.PPISPControllerCNN(seed=1)
        for hw in [(30, 30), (64, 48), (100, 75)]:
            e, c = ctrl.predict(ctrl.params, jnp.ones(hw + (3,)) * 0.5, 0.0)
            assert bool(jnp.isfinite(e)) and bool(jnp.isfinite(c).all())


class TestSHBake:
    def test_bake_recovers_scale(self):
        """Photometric bake on a toy linear 'renderer' recovers an
        exposure-scale look exactly (linear case has an exact SH
        solution)."""
        from threedgrut_tpu.export.sh_bake import bake_post_processing
        rng = np.random.default_rng(0)
        n, k = 32, 4
        alb = jnp.asarray(rng.normal(0, 0.2, (n, 1, 3)), jnp.float32)
        spec = jnp.asarray(rng.normal(0, 0.05, (n, k - 1, 3)), jnp.float32)
        basis = jnp.asarray(rng.normal(0, 1, (3, 8, n)), jnp.float32)

        def render_fn(a, s, fr):
            coeff = jnp.concatenate([a, s], axis=1)   # [n, k, 3]
            img = jnp.einsum("fpn,nkc->fpc", basis[fr:fr + 1],
                             jnp.sum(coeff, axis=1, keepdims=True)
                             )[0]                     # [8, 3]
            return (img + 0.5).reshape(2, 4, 3)

        s_target = 1.35

        def isp_fn(rgb, fr):
            return rgb * s_target

        out = bake_post_processing(render_fn, isp_fn, alb, spec,
                                   frames=[0, 1, 2], iters=300, lr=5e-3)
        baked_img = render_fn(out["features_albedo"],
                              out["features_specular"], 0)
        target_img = isp_fn(render_fn(alb, spec, 0), 0)
        np.testing.assert_allclose(np.asarray(baked_img),
                                   np.asarray(target_img), atol=2e-2)
        assert out["loss_history"][-1] < out["loss_history"][0]

    def test_warm_start_scale_exact_for_dc(self):
        from threedgrut_tpu.export.sh_bake import (SH_C0,
                                                   scale_sh_warm_start)
        alb = jnp.asarray([[0.4, 0.2, 0.1]])
        spec = jnp.asarray([[[0.05, 0.0, 0.0]]])
        a2, s2 = scale_sh_warm_start(alb, spec, 2.0)
        # radiance = C0 * alb + 0.5 (+ specular terms)
        r1 = SH_C0 * np.asarray(alb) + 0.5
        r2 = SH_C0 * np.asarray(a2) + 0.5
        np.testing.assert_allclose(r2, 2.0 * r1, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s2),
                                   2.0 * np.asarray(spec), atol=1e-7)


class TestViewInterpolation:
    def _ring_poses(self, n=12, radius=4.0, jitter=0.0, seed=0):
        """Inward-looking cameras on a circle, returned SHUFFLED."""
        rng = np.random.default_rng(seed)
        poses = []
        for a in np.linspace(0, 2 * np.pi, n, endpoint=False):
            pos = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
            pos += rng.normal(0, jitter, 3)
            fwd = -pos / np.linalg.norm(pos)
            up = np.array([0.0, 0.0, 1.0])
            right = np.cross(up, fwd)
            right /= np.linalg.norm(right)
            upv = np.cross(fwd, right)
            p = np.eye(4)
            p[:3, 0], p[:3, 1], p[:3, 2], p[:3, 3] = right, upv, fwd, pos
            poses.append(p)
        perm = rng.permutation(n)
        return np.stack(poses)[perm], perm

    def test_ordering_recovers_ring(self):
        from threedgrut_tpu.export.view_interpolation import (
            order_views_along_trajectory)
        poses, perm = self._ring_poses()
        order, cum = order_views_along_trajectory(poses)
        # the recovered path visits ring neighbors: consecutive original
        # angular indices differ by 1 (mod n) except at most one seam
        ring_idx = perm[np.asarray(order)]
        n = len(ring_idx)
        steps = (np.diff(ring_idx) % n)
        non_adjacent = int(np.sum((steps != 1) & (steps != n - 1)))
        assert non_adjacent <= 1, (ring_idx, steps)
        assert cum[0] == 0.0 and abs(cum[-1] - 1.0) < 1e-12
        assert (np.diff(cum) >= 0).all()

    def test_slerp_pose_endpoints_and_rotation(self):
        from threedgrut_tpu.export.view_interpolation import slerp_pose
        poses, _ = self._ring_poses(n=4)
        a, b = poses[0], poses[1]
        np.testing.assert_allclose(slerp_pose(a, b, 0.0), a, atol=1e-9)
        np.testing.assert_allclose(slerp_pose(a, b, 1.0), b, atol=1e-9)
        mid = slerp_pose(a, b, 0.5)
        r = mid[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)

    def test_sampler_brackets_and_lerps(self):
        from threedgrut_tpu.export.view_interpolation import (
            TrajectoryViewSampler)
        poses, _ = self._ring_poses()
        s = TrajectoryViewSampler(poses)
        pose, (lo, hi, w) = s.sample(0.37)
        assert 0.0 <= w <= 1.0 and lo != hi
        vals = np.arange(len(poses), dtype=np.float64)
        v = s.interpolate_frame_values(vals, lo, hi, w)
        assert min(vals[lo], vals[hi]) - 1e-9 <= v <= max(
            vals[lo], vals[hi]) + 1e-9
        r = pose[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)


class TestFisheyeRays:
    def test_equidistant_mapping_and_mask(self):
        import jax.numpy as jnp
        from threedgrut_tpu.playground.engine import fisheye_rays
        fov = np.pi  # 180 degrees
        h = w = 64
        ro, rd, mask = fisheye_rays(np.eye(4), fov, w, h)
        rd = np.asarray(rd)
        mask = np.asarray(mask)[..., 0]
        # center ray along +z
        c = rd[h // 2, w // 2]
        assert c[2] > 0.999
        # angular distance from axis == r * fov/2 for in-fov pixels
        xs = (np.arange(w) + 0.5) / w * 2 - 1
        ys = (np.arange(h) + 0.5) / h * 2 - 1
        r = np.sqrt(xs[None, :] ** 2 + ys[:, None] ** 2)
        theta = np.arccos(np.clip(rd[..., 2], -1, 1))
        np.testing.assert_allclose(theta[mask], (r * fov / 2)[mask],
                                   atol=1e-5)
        # corners (r > 1) masked out; unit-norm directions
        assert not mask[0, 0] and mask[h // 2, w // 2]
        np.testing.assert_allclose(np.linalg.norm(rd, axis=-1), 1.0,
                                   atol=1e-5)


@pytest.mark.slow
def test_bake_ppisp_trajectory_smoke():
    """bake_ppisp view_sampling='trajectory' end to end on a tiny scene:
    synthesized slerped views render, ISP params lerp, loss decreases."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_training import SyntheticDataset, make_trainer

    from threedgrut_tpu.export.sh_bake import bake_ppisp
    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.render.common import RasterConfig

    tr = make_trainer("gs")
    ppisp = P.init_ppisp_params(1, len(tr.dataset))
    ppisp["exposure"] = ppisp["exposure"].at[:].add(0.3)
    out = bake_ppisp(tr.model, ppisp, tr.dataset, UTConfig(),
                     RasterConfig(max_pairs=1 << 13), sh_degree=1,
                     iters=6, n_views=3, view_sampling="trajectory")
    assert np.isfinite(out["loss_history"]).all()
    assert out["loss_history"][-1] <= out["loss_history"][0] * 1.5
