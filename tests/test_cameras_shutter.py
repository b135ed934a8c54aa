"""FTheta + rolling-shutter numeric parity tests (VERDICT r2 item 5).

Oracles are independent numpy transcriptions of the reference math:
- FTheta projection incl. Newton inversion of the pixeldist->angle
  polynomial: threedgut_tracer .../sensors/cameraProjections.cuh:148-232
- relative shutter time: cameraProjections.cuh:50-65
- iterative rolling-shutter projection: cameraProjections.cuh:218-257
- mid-shutter ray-generation pose: src/gutRenderer.cu:265-267
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from threedgrut_tpu.ops.cameras import (CameraModelType, ShutterType,
                                        make_ftheta, make_pinhole,
                                        project_point,
                                        project_point_with_shutter,
                                        relative_shutter_time)

FT_DEG = 6


def _horner_np(coeffs, x):
    y = np.zeros_like(x) + coeffs[-1]
    for c in coeffs[-2::-1]:
        y = x * y + c
    return y


def _make_ftheta_polys(max_angle=1.6):
    """A realistic automotive ftheta lens: forward poly f(theta) -> pixel
    distance, plus its degree-5 polynomial inverse fit."""
    fwd = np.array([0.0, 540.0, 8.0, -22.0, 14.0, -3.0], np.float64)
    theta = np.linspace(0.0, max_angle, 512)
    dist = _horner_np(fwd, theta)
    # inverse: pixeldist -> angle (polyfit returns highest-first)
    inv = np.polyfit(dist, theta, FT_DEG - 1)[::-1].copy()
    return fwd.astype(np.float32), inv.astype(np.float32)


def _ftheta_oracle_np(p, fwd, inv, cde, principal, max_angle,
                      reference_poly, res, n_newton=3):
    """Literal numpy transcription of cameraProjections.cuh:148-232."""
    p = np.asarray(p, np.float64)
    rho = np.maximum(np.hypot(p[..., 0], p[..., 1]), 1.1754944e-38)
    theta_full = np.arctan2(rho, p[..., 2])
    theta = np.minimum(theta_full, max_angle)
    if reference_poly == 1:  # PIXELDIST_TO_ANGLE is the reference poly
        delta = _horner_np(fwd, theta)
        dcoef = np.arange(1, FT_DEG) * inv[1:]
        for _ in range(n_newton):
            dfdx = _horner_np(dcoef, delta)
            residual = _horner_np(inv, delta) - theta
            delta = delta - residual / dfdx
    else:
        delta = _horner_np(fwd, theta)
    c, d, e = cde
    proj = (delta / rho)[..., None] * np.stack(
        [c * p[..., 0] + d * p[..., 1], e * p[..., 0] + p[..., 1]], axis=-1)
    proj = proj + np.asarray(principal) + 0.5
    w, h = res
    inside = ((proj[..., 0] > 0) & (proj[..., 1] > 0)
              & (proj[..., 0] < w) & (proj[..., 1] < h))
    return proj, (theta < max_angle) & inside


def _sample_points(n=256, seed=3):
    rng = np.random.default_rng(seed)
    # camera-space points across the full hemisphere incl. behind-ish
    d = rng.normal(size=(n, 3))
    d[:, 2] = np.abs(d[:, 2]) * 0.8 + 0.05
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (d * rng.uniform(0.5, 20.0, size=(n, 1))).astype(np.float32)


class TestFTheta:
    @pytest.mark.parametrize("reference_poly", [0, 1])
    def test_matches_numpy_oracle(self, reference_poly):
        fwd, inv = _make_ftheta_polys()
        cde = (1.002, 0.0013, -0.0008)
        res, principal = (1920, 1280), (958.3, 642.1)
        cam = make_ftheta(res, principal, fwd, inv,
                          reference_poly=reference_poly, linear_cde=cde,
                          max_angle=1.6)
        pts = _sample_points()
        proj, valid = jax.jit(lambda p: project_point(cam, p))(pts)
        proj_o, valid_o = _ftheta_oracle_np(pts, fwd, inv, cde, principal,
                                            1.6, reference_poly, res)
        proj, valid = np.asarray(proj), np.asarray(valid)
        assert (valid == valid_o).mean() > 0.99  # borderline f32 flips only
        both = valid & valid_o
        assert both.sum() > 50
        err = np.abs(proj[both] - proj_o[both])
        assert err.max() < 0.02, f"max pixel err {err.max()}"

    def test_newton_inversion_converges(self):
        """After the 3 Newton steps, delta satisfies the reference
        (pixeldist->angle) polynomial to sub-milliradian accuracy."""
        fwd, inv = _make_ftheta_polys()
        cam = make_ftheta((1920, 1280), (958.3, 642.1), fwd, inv,
                          reference_poly=1, linear_cde=(1.0, 0.0, 0.0),
                          max_angle=1.6)
        pts = _sample_points(n=512, seed=7)
        proj, valid = project_point(cam, pts)
        proj, valid = np.asarray(proj), np.asarray(valid)
        p = pts[valid]
        uv = proj[valid] - np.array([958.3, 642.1]) - 0.5
        delta = np.hypot(uv[:, 0], uv[:, 1])
        theta_back = _horner_np(inv.astype(np.float64), delta)
        rho = np.hypot(p[:, 0], p[:, 1])
        theta_true = np.arctan2(rho, p[:, 2])
        assert np.abs(theta_back - theta_true).max() < 1e-3

    def test_forward_inverse_round_trip(self):
        """reference_poly=0 (direct) and =1 (Newton) agree on the same
        lens to a fraction of a pixel."""
        fwd, inv = _make_ftheta_polys()
        kw = dict(resolution=(1920, 1280), principal=(958.3, 642.1),
                  angle_to_pixeldist=fwd, pixeldist_to_angle=inv,
                  linear_cde=(1.0, 0.0, 0.0), max_angle=1.6)
        cam_fw = make_ftheta(reference_poly=0, **kw)
        cam_bw = make_ftheta(reference_poly=1, **kw)
        pts = _sample_points(n=512, seed=11)
        pf, vf = project_point(cam_fw, pts)
        pb, vb = project_point(cam_bw, pts)
        both = np.asarray(vf & vb)
        # the polyfit inverse is itself ~0.1 px accurate; Newton must not
        # add error beyond that
        assert np.abs(np.asarray(pf)[both] - np.asarray(pb)[both]).max() < 0.5

    def test_max_angle_invalidates(self):
        fwd, inv = _make_ftheta_polys()
        cam = make_ftheta((1920, 1280), (958.3, 642.1), fwd, inv,
                          reference_poly=0, linear_cde=(1.0, 0.0, 0.0),
                          max_angle=1.0)
        # a point at theta ~ 1.4 > max_angle
        p = np.array([[np.sin(1.4), 0.0, np.cos(1.4)]], np.float32) * 5.0
        _, valid = project_point(cam, p)
        assert not bool(valid[0])


def _pose_at(t0, q0, t1, q1, alpha):
    """numpy slerp pose (shortest path), matching quat_slerp."""
    q0 = np.asarray(q0, np.float64)
    q1 = np.asarray(q1, np.float64)
    d = float(np.dot(q0, q1))
    if d < 0:
        q1, d = -q1, -d
    d = min(d, 1.0)
    th = np.arccos(d)
    if np.sin(th) < 1e-7:
        q = (1 - alpha) * q0 + alpha * q1
    else:
        q = (np.sin((1 - alpha) * th) * q0 + np.sin(alpha * th) * q1) / np.sin(th)
    q /= np.linalg.norm(q)
    t = (1 - alpha) * np.asarray(t0) + alpha * np.asarray(t1)
    return t, q


def _quat_rot_np(q, p):
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return p @ R.T


SHUTTERS = [ShutterType.ROLLING_TOP_TO_BOTTOM,
            ShutterType.ROLLING_LEFT_TO_RIGHT,
            ShutterType.ROLLING_BOTTOM_TO_TOP,
            ShutterType.ROLLING_RIGHT_TO_LEFT]


def _shutter_cam(shutter, model="pinhole"):
    t0 = np.array([0.05, -0.02, 2.0], np.float32)
    # small rotation + translation over the shutter interval
    ang = 0.02
    q0 = np.array([1.0, 0, 0, 0], np.float32)
    q1 = np.array([np.cos(ang / 2), 0.0, np.sin(ang / 2), 0.0], np.float32)
    t1 = t0 + np.array([0.06, 0.03, -0.04], np.float32)
    kw = dict(t=t0, q=q0, t_end=t1, q_end=q1, shutter_type=int(shutter))
    if model == "pinhole":
        return make_pinhole((640, 480), (500.0, 500.0), (320.0, 240.0), **kw)
    fwd, inv = _make_ftheta_polys()
    return make_ftheta((640, 480), (319.5, 239.5), fwd, inv,
                       reference_poly=1, linear_cde=(1.0, 0.0, 0.0),
                       max_angle=1.6, **kw)


def _rel_time_np(shutter, res, uv):
    w, h = res
    if shutter == ShutterType.ROLLING_TOP_TO_BOTTOM:
        return np.floor(uv[1]) / (h - 1.0)
    if shutter == ShutterType.ROLLING_LEFT_TO_RIGHT:
        return np.floor(uv[0]) / (w - 1.0)
    if shutter == ShutterType.ROLLING_BOTTOM_TO_TOP:
        return (h - np.ceil(uv[1])) / (h - 1.0)
    return (w - np.ceil(uv[0])) / (w - 1.0)


def _dense_oracle(cam, shutter, pts, n_alpha):
    """Exhaustive fixed-point scan: for every point, project through the
    pose at EVERY shutter time alpha (one batched call) and keep the
    alpha minimizing |alpha - rel_time(proj(alpha))|. Returns
    (uv [N,2], found [N])."""
    t0, q0 = np.array(cam.t_start), np.array(cam.q_start)
    t1, q1 = np.array(cam.t_end), np.array(cam.q_end)
    alphas = np.linspace(0.0, 1.0, n_alpha)
    poses = [_pose_at(t0, q0, t1, q1, a) for a in alphas]
    # [A, N, 3] camera-space points for every (alpha, point)
    p_cam = np.stack([_quat_rot_np(q, pts) + t for (t, q) in poses])
    proj_fn = jax.jit(lambda p: project_point(cam, p))
    uv_all, valid_all = proj_fn(jnp.asarray(p_cam, jnp.float32))
    uv_all = np.asarray(uv_all)          # [A, N, 2]
    valid_all = np.asarray(valid_all)    # [A, N]
    w, h = cam.resolution
    if shutter == ShutterType.ROLLING_TOP_TO_BOTTOM:
        rel = np.floor(uv_all[..., 1]) / (h - 1.0)
    elif shutter == ShutterType.ROLLING_LEFT_TO_RIGHT:
        rel = np.floor(uv_all[..., 0]) / (w - 1.0)
    elif shutter == ShutterType.ROLLING_BOTTOM_TO_TOP:
        rel = (h - np.ceil(uv_all[..., 1])) / (h - 1.0)
    else:
        rel = (w - np.ceil(uv_all[..., 0])) / (w - 1.0)
    res = np.abs(alphas[:, None] - rel)
    res[~valid_all] = np.inf
    best = np.argmin(res, axis=0)                      # [N]
    found = np.isfinite(res[best, np.arange(len(pts))])
    uv = uv_all[best, np.arange(len(pts))]
    return uv, found


class TestRollingShutter:
    @pytest.mark.parametrize("shutter", SHUTTERS)
    def test_fixed_point_vs_dense_oracle(self, shutter):
        """The 5-iteration solve lands on the dense-scan fixed point:
        projecting through the pose at EVERY shutter time alpha, the
        consistent solution is the alpha minimizing
        |alpha - rel_time(proj(alpha))| (cameraProjections.cuh:218-257
        semantics made exhaustive)."""
        cam = _shutter_cam(shutter)
        pts = _sample_points(n=128, seed=23) + np.array([0, 0, 4.0],
                                                        np.float32)
        proj, valid = jax.jit(
            lambda p: project_point_with_shutter(cam, p))(pts)
        proj, valid = np.asarray(proj), np.asarray(valid)
        uv_o, found = _dense_oracle(cam, shutter, pts, n_alpha=2001)
        check = valid & found
        assert check.sum() >= 20
        err = np.abs(proj[check] - uv_o[check]).max()
        assert err < 1.0, f"max solver-vs-oracle pixel err {err}"

    def test_global_shutter_is_single_projection(self):
        cam = _shutter_cam(ShutterType.ROLLING_TOP_TO_BOTTOM)
        cam_g = make_pinhole((640, 480), (500.0, 500.0), (320.0, 240.0),
                             t=cam.t_start, q=cam.q_start)
        pts = _sample_points(n=64, seed=5) + np.array([0, 0, 4.0], np.float32)
        pg, vg = project_point_with_shutter(cam_g, pts)
        import numpy.testing as npt
        from threedgrut_tpu.ops.cameras import world_to_camera
        p0, v0 = project_point(
            cam_g, world_to_camera(cam_g, pts, cam_g.t_start, cam_g.q_start))
        npt.assert_allclose(np.asarray(pg), np.asarray(p0), rtol=0, atol=0)

    def test_both_seeds_invalid_is_invalid(self):
        """Reference returns invalid when both the start- and end-pose
        projections fail (cameraProjections.cuh:227-232)."""
        cam = _shutter_cam(ShutterType.ROLLING_TOP_TO_BOTTOM)
        # far behind the camera at both poses
        pts = np.array([[0.0, 0.0, -50.0]], np.float32)
        _, valid = project_point_with_shutter(cam, pts)
        assert not bool(valid[0])

    @pytest.mark.parametrize("shutter", SHUTTERS)
    def test_rel_time_matches_reference_table(self, shutter):
        cam = _shutter_cam(shutter)
        uv = np.array([[12.7, 400.2], [0.0, 0.0], [639.0, 479.0]],
                      np.float32)
        got = np.asarray(relative_shutter_time(cam, jnp.asarray(uv)))
        want = np.array([_rel_time_np(shutter, cam.resolution, u)
                         for u in uv])
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_ftheta_with_rolling_shutter(self):
        """FTheta + shutter solve: same dense-oracle check on a coarse
        alpha grid (automotive NCore configuration)."""
        cam = _shutter_cam(ShutterType.ROLLING_TOP_TO_BOTTOM,
                           model="ftheta")
        pts = _sample_points(n=32, seed=31) + np.array([0, 0, 4.0],
                                                       np.float32)
        proj, valid = project_point_with_shutter(cam, pts)
        proj, valid = np.asarray(proj), np.asarray(valid)
        uv_o, found = _dense_oracle(cam, ShutterType.ROLLING_TOP_TO_BOTTOM,
                                    pts, n_alpha=801)
        check = valid & found
        assert check.sum() >= 5
        assert np.abs(proj[check] - uv_o[check]).max() < 1.5


@pytest.mark.slow
class TestRollingShutterRender:
    """Full-image rolling-shutter render through the production pipeline
    (general-geometry kernel path: shared_origin disabled for non-global
    shutters, render/gut.py) vs the pure-JAX oracle renderer."""

    def _scene(self, shutter):
        from scene_utils import make_test_scene
        cam0, model = make_test_scene(n=96, seed=4, res=(64, 48))
        ang = 0.015
        cam = make_pinhole(
            (64, 48), (0.9 * 64, 0.9 * 64), (32.0, 24.0),
            t=np.zeros(3, np.float32), q=np.array([1., 0, 0, 0], np.float32),
            t_end=np.array([0.08, -0.04, 0.05], np.float32),
            q_end=np.array([np.cos(ang / 2), 0.0, np.sin(ang / 2), 0.0],
                           np.float32),
            shutter_type=int(shutter))
        return cam, model

    @pytest.mark.parametrize("shutter",
                             [ShutterType.ROLLING_TOP_TO_BOTTOM,
                              ShutterType.ROLLING_LEFT_TO_RIGHT])
    def test_production_matches_oracle(self, shutter):
        from threedgrut_tpu.ops.ut import UTConfig
        from threedgrut_tpu.render.common import RasterConfig
        from threedgrut_tpu.render.gut import render_gut
        from threedgrut_tpu.render.oracle import render_oracle

        cam, model = self._scene(shutter)
        ut, rc = UTConfig(), RasterConfig(max_pairs=1 << 14)
        ref = render_oracle(cam, ut, rc, model, sh_degree=3)
        got = render_gut(cam, ut, rc, model, sh_degree=3, interpret=True)
        np.testing.assert_allclose(got["pred_features"],
                                   ref["pred_features"],
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(got["pred_opacity"], ref["pred_opacity"],
                                   atol=5e-4, rtol=1e-3)

    def test_shutter_actually_shears(self):
        """Rolling vs global shutter renders differ (the pose motion is
        visible), guarding against the shutter path silently collapsing
        to the global one."""
        from threedgrut_tpu.ops.ut import UTConfig
        from threedgrut_tpu.render.common import RasterConfig
        from threedgrut_tpu.render.gut import render_gut

        cam_r, model = self._scene(ShutterType.ROLLING_TOP_TO_BOTTOM)
        cam_g = cam_r.replace(shutter_type=int(ShutterType.GLOBAL))
        ut, rc = UTConfig(), RasterConfig(max_pairs=1 << 14)
        img_r = render_gut(cam_r, ut, rc, model, sh_degree=0,
                           interpret=True)["pred_features"]
        img_g = render_gut(cam_g, ut, rc, model, sh_degree=0,
                           interpret=True)["pred_features"]
        assert np.abs(np.asarray(img_r) - np.asarray(img_g)).max() > 1e-3
