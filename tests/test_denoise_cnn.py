"""Learned CNN denoiser (playground/denoise_cnn.py).

Oracle provenance: identity-at-init is a structural property (the
output conv is zero-initialized); the trained-weights check compares
against the committed training-set statistics only qualitatively (the
denoiser must not AMPLIFY noise on a synthetic noisy frame).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedgrut_tpu.playground import denoise_cnn


class TestDenoiseCNN:
    def test_identity_at_init(self):
        # zero-initialized output conv -> the untrained net is a no-op
        params = denoise_cnn.init_params(jax.random.PRNGKey(0),
                                         guides=False)
        rgb = jax.random.uniform(jax.random.PRNGKey(1), (24, 24, 3))
        out = denoise_cnn.apply_cnn(params, rgb)
        np.testing.assert_allclose(np.asarray(out),
                                   np.clip(np.asarray(rgb), 0, 1),
                                   atol=1e-6)

    def test_shapes_and_guides(self):
        params = denoise_cnn.init_params(jax.random.PRNGKey(0),
                                         guides=True)
        rgb = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
        nrm = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
        dep = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16)) * 9.0
        out = denoise_cnn.apply_cnn(params, rgb, normals=nrm, depth=dep)
        assert out.shape == (2, 16, 16, 3)
        assert bool(jnp.all(jnp.isfinite(out)))
        # guides absent -> zero-substituted, still works
        out2 = denoise_cnn.apply_cnn(params, rgb[0])
        assert out2.shape == (16, 16, 3)

    def test_fallback_without_weights(self, monkeypatch):
        monkeypatch.setattr(denoise_cnn, "WEIGHTS_PATH",
                            "/nonexistent/denoiser.npz")
        monkeypatch.setattr(denoise_cnn, "_cached", None)
        rgb = jax.random.uniform(jax.random.PRNGKey(1), (16, 16, 3))
        out = denoise_cnn.denoise_frame(rgb)  # a-trous fallback
        assert out.shape == (16, 16, 3)

    @pytest.mark.skipif(not os.path.exists(denoise_cnn.WEIGHTS_PATH),
                        reason="trained weights not committed yet")
    def test_trained_weights_reduce_noise(self):
        params = denoise_cnn.load_params()
        assert params is not None
        key = jax.random.PRNGKey(4)
        # piecewise-constant blocks + heavy speckle noise: any trained
        # denoiser must reduce MSE vs the clean frame, and must at the
        # very least not amplify it
        clean = jnp.repeat(jnp.repeat(
            jax.random.uniform(key, (6, 6, 3)), 8, axis=0), 8, axis=1)
        noise = 0.12 * jax.random.normal(jax.random.PRNGKey(5),
                                         clean.shape)
        noisy = jnp.clip(clean + noise, 0.0, 1.0)
        out = denoise_cnn.apply_cnn(params, noisy)
        mse_in = float(jnp.mean((noisy - clean) ** 2))
        mse_out = float(jnp.mean((out - clean) ** 2))
        assert mse_out < mse_in
