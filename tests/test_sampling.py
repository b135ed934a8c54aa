"""Playground sampling / materials / denoise tests.

Covers the reference's SPP mode surface (utils/spp.py:28), the Burley
shuffled-scrambled Sobol sequence (utils/rng.py), Shirley's concentric
disc (utils/depth_of_field.py:56), the stochastic microfacet BRDF
(materials.cuh:248), and the à-trous denoiser stand-in
(hybridTracer.cpp:503).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedgrut_tpu.playground import sampling as S
from threedgrut_tpu.playground import materials as M
from threedgrut_tpu.playground.denoise import atrous_denoise


class TestSobol:
    def test_dim0_is_bit_reversal(self):
        idx = jnp.arange(64, dtype=jnp.uint32)
        x0, _ = S.sobol2d(idx)
        assert np.array_equal(np.asarray(x0),
                              np.asarray(S.reverse_bits32(idx)))

    def test_dim1_canonical_prefix(self):
        # classic Sobol dim-2 sequence in 1/16ths:
        # 0, 8, 12, 4, 10, 2, 6, 14 (indices 0..7, scaled by 2^28)
        _, x1 = S.sobol2d(jnp.arange(8, dtype=jnp.uint32))
        got = [int(v) >> 28 for v in np.asarray(x1)]
        assert got == [0, 8, 12, 4, 10, 2, 6, 14]

    def test_owen_scramble_is_permutation_of_strata(self):
        # scrambling preserves the stratification: any 2^k consecutive
        # indices cover all 2^k strata exactly once in each dim
        idx = jnp.arange(16, dtype=jnp.uint32)
        seed = jnp.full((16,), 77, jnp.uint32)
        u, v = S.ld_random_val_2d(idx, seed)
        for x in (np.asarray(u), np.asarray(v)):
            strata = np.floor(x * 16).astype(int)
            assert sorted(strata.tolist()) == list(range(16))

    def test_ld_range(self):
        idx = jnp.arange(1, 1025, dtype=jnp.uint32)
        u, v = S.ld_random_val_2d(idx, jnp.full((1024,), 5, jnp.uint32))
        for x in (np.asarray(u), np.asarray(v)):
            assert (x >= 0).all() and (x < 1).all()
            assert abs(x.mean() - 0.5) < 0.05


class TestSPP:
    @pytest.mark.parametrize("mode,spp", [
        ("none", 1), ("independent_random", 4), ("msaa", 8),
        ("low_discrepancy_seq", 16)])
    def test_modes(self, mode, spp):
        s = S.SPP(mode=mode, spp=spp)
        j = np.asarray(s(8, 8))
        assert j.shape == (8, 8, 2)
        assert (j >= -0.75).all() and (j <= 0.75).all()

    def test_accumulation_contract(self):
        s = S.SPP(mode="msaa", spp=4)
        s.reset_accumulation()
        n = 0
        while s.has_more_to_accumulate():
            s(4, 4)
            n += 1
        assert n == 4

    def test_msaa_rejects_bad_spp(self):
        with pytest.raises(ValueError):
            S.SPP(mode="msaa", spp=3)


class TestDoF:
    def test_concentric_disc_in_unit_disc(self):
        uv = jax.random.uniform(jax.random.PRNGKey(0), (5000, 2))
        x, y = S.concentric_disc(uv[:, 0], uv[:, 1])
        r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
        assert (r2 <= 1.0 + 1e-6).all()
        # area-preserving: quarter-radius disc holds ~1/16 of samples
        assert abs((r2 < 0.25).mean() - 0.25) < 0.03

    def test_rays_refocus_at_focus_plane(self):
        dof = S.DepthOfField(spp=4, aperture_size=0.2, focus_z=3.0)
        o = jnp.zeros((128, 3))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (128, 1))
        no, nd = dof(jnp.asarray([1.0, 0, 0]), jnp.asarray([0, 1.0, 0]),
                     o, d)
        t = 3.0 / np.asarray(nd)[:, 2]
        fp = np.asarray(no) + np.asarray(nd) * t[:, None]
        assert np.allclose(fp[:, :2], 0.0, atol=1e-5)
        # origins actually jittered
        assert np.abs(np.asarray(no)[:, :2]).max() > 1e-3


class TestMicrofacetBRDF:
    def _rand(self, n, seed=0):
        return jax.random.uniform(jax.random.PRNGKey(seed), (n, 3))

    def test_diffuse_scatters_into_hemisphere(self):
        n = 512
        normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        base = jnp.full((n, 3), 0.5)
        L, f = M.sample_microfacet_brdf(
            wo, normal, base, jnp.zeros((n, 1)), jnp.full((n, 1), 0.8),
            jnp.zeros((n, 1)), jnp.full((n, 1), 1.45), self._rand(n))
        L, f = np.asarray(L), np.asarray(f)
        assert np.isfinite(L).all() and np.isfinite(f).all()
        assert (f >= 0).all()
        # diffuse-lobe samples (p < 0.5) land in the upper hemisphere;
        # specular GGX reflections may dip below the horizon but carry
        # (near-)zero weight through the clamped geometry term — same
        # behavior as the reference's positive_dot clamps
        p = np.asarray(self._rand(n))[:, 2]
        assert (L[p < 0.5, 2] > -1e-6).all()
        below = L[:, 2] < -1e-3
        assert f[below].max(initial=0.0) < 0.2

    def test_smooth_metal_reflects_like_mirror(self):
        n = 256
        normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        d = jnp.asarray([0.6, 0.0, -0.8])
        wo = jnp.tile(-d[None], (n, 1))
        base = jnp.full((n, 3), 0.9)
        rand = self._rand(n).at[:, 2].set(0.9)  # force specular lobe
        L, f = M.sample_microfacet_brdf(
            wo, normal, base, jnp.ones((n, 1)), jnp.full((n, 1), 0.05),
            jnp.zeros((n, 1)), jnp.full((n, 1), 1.45), rand)
        L = np.asarray(L)
        mirror = np.asarray([0.6, 0.0, 0.8])
        cos = L @ mirror
        assert np.quantile(cos, 0.1) > 0.99  # tight lobe around mirror dir

    def test_energy_bounded(self):
        # mean throughput factor over many stochastic bounces stays
        # bounded (no energy explosion) for a mid-rough dielectric
        n = 4096
        normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        wo = jnp.tile(jnp.asarray([[0.3, 0.1, 0.95]]), (n, 1))
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        base = jnp.full((n, 3), 0.8)
        _, f = M.sample_microfacet_brdf(
            wo, normal, base, jnp.zeros((n, 1)), jnp.full((n, 1), 0.5),
            jnp.zeros((n, 1)), jnp.full((n, 1), 1.45), self._rand(n, 3))
        mean_f = float(np.asarray(f).mean())
        assert 0.0 < mean_f < 1.5

    def test_ggx_distribution_normalizes_roughly(self):
        # integrate D(h) cos(h) over the hemisphere by MC: should be ~1
        k = jax.random.PRNGKey(2)
        u = jax.random.uniform(k, (20000, 2))
        phi = 2 * jnp.pi * u[:, 0]
        cos_t = u[:, 1]
        sin_t = jnp.sqrt(1 - cos_t ** 2)
        h = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                      axis=-1)
        nrm = jnp.asarray([0.0, 0.0, 1.0])
        d = M.ggx_distribution(h, nrm[None], jnp.asarray(0.6))
        # hemisphere area 2*pi; E[D * cos] * 2pi ~ 1
        est = float((d[:, 0] * cos_t).mean() * 2 * jnp.pi)
        assert 0.7 < est < 1.3


class TestDenoise:
    @pytest.mark.slow
    def test_reduces_noise_preserves_edges(self):
        k = jax.random.PRNGKey(0)
        h = w = 64
        clean = jnp.where(jnp.arange(w)[None, :, None] < w // 2, 0.2, 0.8)
        clean = jnp.broadcast_to(clean, (h, w, 3)).astype(jnp.float32)
        noisy = clean + 0.1 * jax.random.normal(k, (h, w, 3))
        out = atrous_denoise(noisy, iterations=3)
        res_in = float(jnp.mean((noisy - clean) ** 2))
        res_out = float(jnp.mean((out - clean) ** 2))
        assert res_out < res_in * 0.5
        # edge magnitude at the boundary survives
        edge = float(jnp.abs(out[:, w // 2, 0] - out[:, w // 2 - 1, 0]
                             ).mean())
        assert edge > 0.3

    @pytest.mark.slow
    def test_guides_accepted(self):
        rgb = jnp.ones((16, 16, 3)) * 0.5
        normals = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (16, 16, 1))
        depth = jnp.ones((16, 16))
        out = atrous_denoise(rgb, normals=normals, depth=depth,
                             iterations=2)
        assert np.allclose(np.asarray(out), 0.5, atol=1e-5)
