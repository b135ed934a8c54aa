"""Regression: needle-like gaussians must not produce NaN gradients.

Round-2 convergence-collapse root cause: |M d|^2 computed through the
quadratic-form monomial expansion (dmono . p6) cancels catastrophically
for high-anisotropy particles (scale ratio >~ 3e3) when the ray runs
along the long axis — m <= 0 -> inf reciprocals -> 0 * inf = NaN in the
hand-derived pullback, which the gradient fold's suffix sums then smear
over whole 256-lane chunks of particles. The fix computes m as a sum of
squares of the b = M d components (the reference's dot(grd, grd) form,
gaussianParticles.cuh:377-383) plus an inv_m clamp.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedgrut_tpu.ops.pallas.raster import (CHUNK, RasterKernelConfig,
                                              _bwd_chunk_fast,
                                              _fast_fwd_vals,
                                              chunk_hits_fast)
from threedgrut_tpu.ops.quaternion import quat_to_rotmat


def _needle_records(ratios, axis_dir, n_rays=256, feat_dim=3):
    """One chunk of records for needle particles whose LONG axis is
    axis_dir; rays march along axis_dir (worst-case cancellation)."""
    axis_dir = {"x": (1.0, 0.0, 0.0), "y": (0.0, 1.0, 0.0),
                "z": (0.0, 0.0, 1.0)}.get(axis_dir, axis_dir)
    k = CHUNK
    cfg = RasterKernelConfig(feat_dim=feat_dim)
    rng = np.random.default_rng(0)
    rec = np.zeros((cfg.record_dim, k), np.float32)
    axis = np.asarray(axis_dir, np.float32)
    axis /= np.linalg.norm(axis)
    # orthonormal frame with axis as column 0
    tmp = np.array([0.3, 1.0, 0.2], np.float32)
    e1 = np.cross(axis, tmp)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(axis, e1)
    r_mat = np.stack([axis, e1, e2], axis=1)       # world<-local
    for i in range(k):
        ratio = ratios[i % len(ratios)]
        s = np.array([1.0, 1.0 / ratio, 1.0 / ratio], np.float32)
        m = (r_mat / s[None, :]).T                  # M = diag(1/s) R^T
        pos = axis * (2.0 + 0.01 * i) + 0.05 * rng.normal(size=3)
        a = m @ (np.zeros(3, np.float32) - pos)     # origin at 0
        rec[0:3, i] = a
        rec[3:12, i] = m.reshape(-1)
        rec[12, i] = 0.9                            # density row
        rec[cfg.feat_offset:cfg.feat_offset + feat_dim, i] = rng.uniform(
            0.2, 0.8, feat_dim)
    ray_d = np.tile(axis[None], (n_rays, 1)).astype(np.float32)
    # small angular spread so some rays are EXACTLY axial, some near
    ray_d[1::2] += 1e-4 * rng.normal(size=(n_rays // 2, 3))
    ray_d /= np.linalg.norm(ray_d, axis=1, keepdims=True)
    return cfg, jnp.asarray(rec), jnp.asarray(ray_d)


class TestNeedleStability:
    @pytest.mark.parametrize("ratio", [1e3, 1e4, 3e5])
    def test_forward_m_nonnegative(self, ratio):
        cfg, rec, ray_d = _needle_records([ratio, 1.0], "z")
        b3, *_ , inv_m, c2, sq, resp, dens, alpha_raw, alpha, hit_t = \
            _fast_fwd_vals(rec, ray_d, cfg)
        for v in (inv_m, sq, resp, alpha, hit_t):
            assert bool(jnp.isfinite(v).all()), "nonfinite forward value"
        assert bool((inv_m > 0).all())
        assert bool((sq >= 0).all()), "negative squared distance"

    @pytest.mark.parametrize("ratio", [1e4, 3e5])
    def test_backward_finite(self, ratio):
        cfg, rec, ray_d = _needle_records([ratio, 10.0], "z")
        tmin = jnp.zeros((256, 1))
        tmax = jnp.full((256, 1), 1e9)
        t_in = jnp.ones((256, 1))
        lane_mask = jnp.ones((1, CHUNK), bool)
        g_feat = jnp.ones((256, cfg.feat_dim))
        g_t = jnp.ones((256, 1)) * 0.3
        g_depth = jnp.ones((256, 1)) * 0.1
        phi_rem = jnp.ones((256, 1))
        t_final = jnp.full((256, 1), 0.5)
        d_rec, t_out, psi = _bwd_chunk_fast(
            rec, ray_d, tmin, tmax, t_in, phi_rem, t_final, g_feat, g_t,
            g_depth, lane_mask, cfg)
        assert bool(jnp.isfinite(d_rec).all()), "NaN in d_rec"
        assert bool(jnp.isfinite(t_out).all())
        assert bool(jnp.isfinite(psi).all())

    def test_chunk_hits_fast_paths_agree(self):
        # hot path (MXU operands) vs canonical b-path on a mixed chunk
        cfg, rec, ray_d = _needle_records([50.0, 3.0, 1.0], "x")
        a_hot, t_hot, _, _ = chunk_hits_fast(rec, ray_d, cfg)
        a_can, t_can, _, _ = chunk_hits_fast(rec, ray_d, cfg,
                                             need_canonical=True)
        np.testing.assert_allclose(np.asarray(a_hot), np.asarray(a_can),
                                   atol=2e-5)
        mask = np.asarray(a_hot) > 1e-4
        np.testing.assert_allclose(np.asarray(t_hot)[mask],
                                   np.asarray(t_can)[mask], rtol=1e-3,
                                   atol=1e-3)

    def test_degenerate_zero_ray_is_finite(self):
        # all-zero ray directions (padded rays) must not NaN the pullback
        cfg, rec, _ = _needle_records([100.0], "z")
        ray_d = jnp.zeros((256, 3))
        vals = _fast_fwd_vals(rec, ray_d, cfg)
        for v in vals[1:]:
            assert bool(jnp.isfinite(jnp.asarray(v)).all())
