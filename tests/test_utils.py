"""Utils: color correction, sRGB, jet map, PPISP, timers, logger."""

import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.models.post_processing import (PPISPController,
                                                   apply_post_processing,
                                                   apply_ppisp,
                                                   init_ppisp_params)
from threedgrut_tpu.utils.color_correct import color_correct_affine
from threedgrut_tpu.utils.misc import (jet_map, linear_to_srgb,
                                       srgb_to_linear)
from threedgrut_tpu.utils.timer import DeviceTimer, ScopedTimer, timing_options


class TestColorCorrect:
    def test_recovers_affine_map(self):
        rng = np.random.default_rng(0)
        gt = rng.uniform(0.1, 0.9, (32, 32, 3)).astype(np.float32)
        m = np.asarray([[0.9, 0.05, 0.0], [0.0, 1.1, 0.0],
                        [0.02, 0.0, 0.8]], np.float32)
        off = np.asarray([0.02, -0.05, 0.01], np.float32)
        pred = np.clip(gt @ m.T + off, 0, 1)
        corrected = color_correct_affine(jnp.asarray(pred), jnp.asarray(gt))
        err0 = np.abs(pred - gt).mean()
        err1 = np.abs(np.asarray(corrected) - gt).mean()
        assert err1 < err0 * 0.1


class TestSRGB:
    def test_roundtrip(self):
        x = jnp.linspace(0.0, 1.0, 64)
        np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x,
                                   atol=1e-5)


class TestJetMap:
    def test_range_and_shape(self):
        v = jnp.linspace(0, 1, 16).reshape(4, 4, 1)
        out = jet_map(v, 1.0)
        assert out.shape == (4, 4, 3)
        assert float(out.min()) >= 0 and float(out.max()) <= 1


class TestPPISP:
    def test_init_is_neutral_tonemap(self):
        # SPG-chain init is the shader's neutral start (identity
        # homography / unit vignette / neutral CRF), NOT numerical
        # identity: a uniform input maps to a uniform, channel-equal,
        # frame-independent output (ppisp_usd_spg.cu:199 chain).
        params = init_ppisp_params(2, 4)
        rgb = jnp.full((8, 8, 3), 0.42)
        out = np.asarray(apply_ppisp(params, rgb, camera_idx=0,
                                     frame_idx=1))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out, out[0, 0, 0], atol=1e-5)
        out2 = np.asarray(apply_ppisp(params, rgb, 1, 3))
        np.testing.assert_allclose(out, out2, atol=1e-6)

    def test_init_monotone(self):
        params = init_ppisp_params(1, 1)
        levels = np.linspace(0.05, 0.95, 7, dtype=np.float32)
        outs = [float(np.asarray(apply_ppisp(
            params, jnp.full((4, 4, 3), float(v)), 0, 0))[0, 0, 0])
            for v in levels]
        assert all(b > a for a, b in zip(outs, outs[1:]))

    def test_exposure_brightens(self):
        params = init_ppisp_params(1, 2)
        rgb = jnp.full((4, 4, 3), 0.25)
        base = float(np.asarray(apply_ppisp(params, rgb, 0, 0)).mean())
        params["exposure"] = params["exposure"].at[0].set(1.0)  # +1 EV
        out = float(np.asarray(apply_ppisp(params, rgb, 0, 0)).mean())
        assert out > base * 1.2

    def test_trainable(self):
        params = init_ppisp_params(1, 1)
        target = jnp.full((8, 8, 3), 0.7)
        rgb = jnp.full((8, 8, 3), 0.35)

        def loss(p):
            return jnp.mean((apply_ppisp(p, rgb, 0, 0) - target) ** 2)

        g = jax.grad(loss)(params)
        assert abs(float(g["exposure"][0])) > 1e-4

    def test_dispatch(self):
        rgb = jnp.full((4, 4, 3), 0.3)
        assert apply_post_processing(None, rgb) is rgb
        out = apply_post_processing("linear-to-srgb", rgb)
        assert float(out[0, 0, 0]) > 0.3  # srgb brightens mid-tones

    def test_controller(self):
        ctrl = PPISPController(n_cameras=3)
        img = jnp.full((30, 30, 3), 0.3)
        exposure, latents = ctrl.predict(ctrl.params, img, 0.25)
        assert exposure.shape == ()
        assert latents.shape == (8,)
        assert bool(jnp.isfinite(exposure)) and bool(
            jnp.isfinite(latents).all())


class TestTimers:
    def test_device_timer(self):
        t = DeviceTimer()
        t.start()
        x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
        t.end(x)
        assert t.timing() > 0

    def test_scoped_timer_toggle(self):
        results = {}
        timing_options.active = False
        with ScopedTimer("off", results):
            pass
        assert "off" not in results
        timing_options.active = True
        with ScopedTimer("on", results):
            pass
        assert "on" in results
        timing_options.active = False


class TestSSIM:
    def test_matches_naive_windowed(self):
        from threedgrut_tpu.ops.ssim import _gaussian_window, ssim

        rng = np.random.default_rng(3)
        a = rng.uniform(0, 1, (1, 3, 24, 20)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

        g = np.asarray(_gaussian_window(11), np.float64)
        win = np.outer(g, g)

        def blur(x):  # [C,H,W] valid
            c, h, w = x.shape
            out = np.zeros((c, h - 10, w - 10))
            for i in range(h - 10):
                for j in range(w - 10):
                    out[:, i, j] = np.sum(
                        x[:, i:i + 11, j:j + 11] * win[None], axis=(1, 2))
            return out

        x, y = a[0].astype(np.float64), b[0].astype(np.float64)
        mu1, mu2 = blur(x), blur(y)
        s1 = blur(x * x) - mu1 ** 2
        s2 = blur(y * y) - mu2 ** 2
        s12 = blur(x * y) - mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        ref = np.mean(((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
                      / ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2)))

        got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_identical_is_one_and_differentiable(self):
        rng = np.random.default_rng(4)
        a = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32))
        from threedgrut_tpu.ops.ssim import ssim
        np.testing.assert_allclose(float(ssim(a, a)), 1.0, atol=1e-6)
        g = jax.grad(lambda x: ssim(x, a * 0.5))(a)
        assert np.isfinite(np.asarray(g)).all()
