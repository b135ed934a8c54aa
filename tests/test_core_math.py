"""Unit tests for quaternion / SH / particle-response primitives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedgrut_tpu.ops import hit as hit_ops
from threedgrut_tpu.ops import sh as sh_ops
from threedgrut_tpu.ops.quaternion import (quat_normalize, quat_slerp,
                                           quat_to_rotmat, safe_normalize)


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestQuaternion:
    def test_rotmat_orthonormal(self):
        q = quat_normalize(rand(0, 64, 4))
        r = quat_to_rotmat(q)
        eye = jnp.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0,
                                   atol=1e-5)

    def test_identity(self):
        q = jnp.array([1.0, 0, 0, 0])
        np.testing.assert_allclose(quat_to_rotmat(q), np.eye(3), atol=1e-7)

    def test_z_rotation(self):
        # 90 deg about z: w = cos(45), z = sin(45)
        c = np.cos(np.pi / 4)
        q = jnp.array([c, 0.0, 0.0, c])
        r = quat_to_rotmat(q)
        np.testing.assert_allclose(
            r @ jnp.array([1.0, 0, 0]), [0.0, 1.0, 0.0], atol=1e-6)

    def test_slerp_endpoints(self):
        q0 = quat_normalize(rand(1, 4))
        q1 = quat_normalize(rand(2, 4))
        np.testing.assert_allclose(quat_slerp(q0, q1, 0.0), q0, atol=1e-5)
        s1 = quat_slerp(q0, q1, 1.0)
        # sign-invariant comparison
        sign = np.sign(np.dot(np.asarray(s1), np.asarray(q1)))
        np.testing.assert_allclose(sign * s1, q1, atol=1e-5)

    def test_slerp_midpoint_is_unit(self):
        q0 = quat_normalize(rand(3, 16, 4))
        q1 = quat_normalize(rand(4, 16, 4))
        qm = quat_slerp(q0, q1, 0.5)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(qm), axis=-1),
                                   1.0, atol=1e-5)


class TestSH:
    def test_degree0_constant(self):
        coeffs = rand(0, 5, 16, 3)
        dirs = safe_normalize(rand(1, 5, 3))
        rad = sh_ops.eval_sh_radiance(coeffs, dirs, degree=0, clamped=False)
        expected = sh_ops.SH_C0 * coeffs[:, 0, :] + 0.5
        np.testing.assert_allclose(rad, expected, atol=1e-6)

    def test_matches_reference_formula_deg3(self):
        """Compare against a direct transcription of the reference formula."""
        coeffs = np.asarray(rand(2, 16, 3))
        d = np.asarray(safe_normalize(rand(3, 3)))
        x, y, z = d
        C0, C1 = sh_ops.SH_C0, sh_ops.SH_C1
        C2, C3 = sh_ops.SH_C2, sh_ops.SH_C3
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        expected = C0 * coeffs[0]
        expected = (expected - C1 * y * coeffs[1] + C1 * z * coeffs[2]
                    - C1 * x * coeffs[3])
        expected = (expected + C2[0] * xy * coeffs[4] + C2[1] * yz * coeffs[5]
                    + C2[2] * (2 * zz - xx - yy) * coeffs[6]
                    + C2[3] * xz * coeffs[7] + C2[4] * (xx - yy) * coeffs[8])
        expected = (expected
                    + C3[0] * y * (3 * xx - yy) * coeffs[9]
                    + C3[1] * xy * z * coeffs[10]
                    + C3[2] * y * (4 * zz - xx - yy) * coeffs[11]
                    + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * coeffs[12]
                    + C3[4] * x * (4 * zz - xx - yy) * coeffs[13]
                    + C3[5] * z * (xx - yy) * coeffs[14]
                    + C3[6] * x * (xx - 3 * yy) * coeffs[15])
        expected = np.maximum(expected + 0.5, 0.0)
        got = sh_ops.eval_sh_radiance(jnp.asarray(coeffs), jnp.asarray(d),
                                      degree=3)
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(
            sh_ops.sh0_to_rgb(sh_ops.rgb_to_sh0(rgb)), rgb, atol=1e-6)


class TestResponse:
    def test_degree2_gaussian(self):
        d = jnp.abs(rand(0, 100))
        np.testing.assert_allclose(hit_ops.particle_response(d, 2),
                                   np.exp(-0.5 * np.asarray(d)), atol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4, 5, 8])
    def test_value_at_3sigma(self, deg):
        # generalized gaussians are normalized so response(9.0) = exp(-4.5)
        val = hit_ops.particle_response(jnp.asarray(9.0), deg)
        np.testing.assert_allclose(val, np.exp(-4.5), rtol=1e-4)

    def test_linear_kernel(self):
        assert hit_ops.particle_response(jnp.asarray(0.0), 0) == 1.0
        big = hit_ops.particle_response(jnp.asarray(100.0), 0)
        assert big == 0.0


class TestDensityHit:
    def test_ray_through_center(self):
        res = hit_ops.density_hit(
            ray_o=jnp.array([0.0, 0.0, -5.0]),
            ray_d=jnp.array([0.0, 0.0, 1.0]),
            pos=jnp.zeros(3), quat=jnp.array([1.0, 0, 0, 0]),
            scale=jnp.ones(3) * 0.5, density=jnp.asarray(0.7))
        assert bool(res.accept)
        np.testing.assert_allclose(res.alpha, 0.7, atol=1e-6)
        np.testing.assert_allclose(res.hit_t, 5.0, atol=1e-5)

    def test_max_alpha_clamp(self):
        res = hit_ops.density_hit(
            ray_o=jnp.array([0.0, 0.0, -5.0]),
            ray_d=jnp.array([0.0, 0.0, 1.0]),
            pos=jnp.zeros(3), quat=jnp.array([1.0, 0, 0, 0]),
            scale=jnp.ones(3), density=jnp.asarray(5.0), max_alpha=0.99)
        np.testing.assert_allclose(res.alpha, 0.99, atol=1e-6)

    def test_isotropic_matches_analytic(self):
        """For isotropic scale s, response = exp(-0.5 * (b/s)^2) with b the
        perpendicular distance of the center to the ray."""
        s = 0.3
        offset = jnp.array([0.4, -0.2, 0.0])
        res = hit_ops.density_hit(
            ray_o=jnp.array([0.0, 0.0, -5.0]) + offset,
            ray_d=jnp.array([0.0, 0.0, 1.0]),
            pos=jnp.zeros(3), quat=jnp.array([1.0, 0, 0, 0]),
            scale=jnp.full(3, s), density=jnp.asarray(1.0),
            min_alpha=0.0, min_response=0.0)
        b2 = float(offset[0] ** 2 + offset[1] ** 2)
        np.testing.assert_allclose(res.alpha, np.exp(-0.5 * b2 / s**2),
                                   rtol=1e-5)

    def test_rotation_invariance(self):
        """Rotating particle and ray together leaves alpha unchanged."""
        q = quat_normalize(rand(7, 4))
        r = quat_to_rotmat(q)
        ray_o = jnp.array([0.3, -0.1, -4.0])
        ray_d = safe_normalize(jnp.array([0.05, 0.02, 1.0]))
        pos = jnp.array([0.2, 0.1, 0.4])
        pq = quat_normalize(rand(8, 4))
        scale = jnp.array([0.2, 0.5, 0.1])
        a0 = hit_ops.density_hit(ray_o, ray_d, pos, pq, scale,
                                 jnp.asarray(0.8))
        # rotate everything by r: rotated quaternion = q * pq
        def qmul(a, b):
            w1, x1, y1, z1 = a
            w2, x2, y2, z2 = b
            return jnp.array([
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            ])
        a1 = hit_ops.density_hit(r @ ray_o, r @ ray_d, r @ pos,
                                 qmul(q, pq), scale, jnp.asarray(0.8))
        np.testing.assert_allclose(a0.alpha, a1.alpha, rtol=2e-4)
        np.testing.assert_allclose(a0.hit_t, a1.hit_t, rtol=2e-4)

    def test_differentiable(self):
        def loss(pos):
            r = hit_ops.density_hit(
                jnp.array([0.0, 0.0, -5.0]), jnp.array([0.0, 0.0, 1.0]),
                pos, jnp.array([1.0, 0, 0, 0]), jnp.ones(3) * 0.5,
                jnp.asarray(0.7))
            return r.alpha
        g = jax.grad(loss)(jnp.array([0.1, 0.0, 0.0]))
        assert np.all(np.isfinite(np.asarray(g)))
        assert g[0] < 0  # moving +x away from the ray reduces alpha


class TestCompositing:
    def test_integrate_matches_manual(self):
        alphas = jnp.array([0.5, 0.25, 0.9])
        ts = jnp.array([1.0, 2.0, 3.0])
        feats = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        f, a, d, h = hit_ops.integrate_hits_scan(alphas, ts, feats, 1e-4)
        w = [0.5, 0.5 * 0.25, 0.5 * 0.75 * 0.9]
        np.testing.assert_allclose(f, w, atol=1e-6)
        np.testing.assert_allclose(a, sum(w), atol=1e-6)
        np.testing.assert_allclose(d, w[0] + 2 * w[1] + 3 * w[2], atol=1e-6)
        assert int(h) == 3

    def test_early_out(self):
        alphas = jnp.array([0.99999, 0.5])
        ts = jnp.ones(2)
        feats = jnp.ones((2, 1))
        f, a, d, h = hit_ops.integrate_hits_scan(alphas, ts, feats, 1e-4)
        assert int(h) == 1  # second hit killed


class TestWindowedBitonic:
    def test_windowed_sort_groups(self):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl

        from threedgrut_tpu.ops.pallas.raster import bitonic_sort_by_key

        rng = np.random.default_rng(0)
        key = rng.normal(size=(8, 256)).astype(np.float32)
        pay = rng.normal(size=(8, 256)).astype(np.float32)

        for window in (32, 64, 256):
            def kern(k_ref, p_ref, ok_ref, op_ref):
                sk, (sp,) = bitonic_sort_by_key(k_ref[...], [p_ref[...]],
                                                window=window)
                ok_ref[...] = sk
                op_ref[...] = sp

            out_k, out_p = pl.pallas_call(
                kern,
                out_shape=[jax.ShapeDtypeStruct((8, 256), jnp.float32)] * 2,
                interpret=True)(jnp.asarray(key), jnp.asarray(pay))
            out_k, out_p = np.asarray(out_k), np.asarray(out_p)
            for g0 in range(0, 256, window):
                sl = slice(g0, g0 + window)
                order = np.argsort(key[:, sl], axis=1, kind="stable")
                np.testing.assert_allclose(
                    out_k[:, sl], np.take_along_axis(key[:, sl], order, 1),
                    rtol=1e-6, err_msg=f"window={window} keys")
                np.testing.assert_allclose(
                    out_p[:, sl], np.take_along_axis(pay[:, sl], order, 1),
                    rtol=1e-6, err_msg=f"window={window} payload")


class TestBitonicReplayUnsort:
    def test_replay_inverts_permutation(self):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl

        from threedgrut_tpu.ops.pallas.raster import (bitonic_replay_unsort,
                                                      bitonic_sort_by_key)

        rng = np.random.default_rng(1)
        key = rng.normal(size=(8, 256)).astype(np.float32)
        pay = rng.normal(size=(8, 256)).astype(np.float32)

        for window in (16, 64, 256):
            def kern(k_ref, p_ref, out_ref):
                _, (sp,), masks = bitonic_sort_by_key(
                    k_ref[...], [p_ref[...]], window=window,
                    return_masks=True)
                # transform in the sorted domain, then replay back
                (up,) = bitonic_replay_unsort(masks, [sp * 2.0])
                out_ref[...] = up

            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
                interpret=True)(jnp.asarray(key), jnp.asarray(pay))
            # replay must restore ORIGINAL lane order exactly
            np.testing.assert_array_equal(np.asarray(out), pay * 2.0,
                                          err_msg=f"window={window}")
