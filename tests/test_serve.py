"""Batched serving renderer (render/serve.py) vs per-view render_gut."""

import jax.numpy as jnp
import numpy as np

from scene_utils import make_test_scene
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.gut import render_gut
from threedgrut_tpu.render.serve import (make_serving_renderer,
                                         serving_raster_config,
                                         stack_cameras)
from threedgrut_tpu.playground.web_gui import orbit_camera

RC = RasterConfig(max_pairs=1 << 14)


class TestServe:
    def test_batch_matches_per_view(self):
        _, model = make_test_scene(n=96, seed=0, res=(64, 48))
        pos = np.asarray(model.params.positions)
        center = pos.mean(axis=0)
        dist = 2.5 * float(np.linalg.norm(pos - center, axis=1).max())
        cams = [orbit_camera(az, 0.3, dist, center=center,
                             resolution=(64, 48))
                for az in (0.0, 1.5, 3.0, 4.5)]

        serve = make_serving_renderer(model, RC, sh_degree=2)
        imgs = np.asarray(serve(stack_cameras(cams)))
        assert imgs.shape == (4, 48, 64, 3)
        assert np.all(np.isfinite(imgs))

        rc = serving_raster_config(RC)
        for i, cam in enumerate(cams):
            ref = render_gut(cam, UTConfig(), rc, model, sh_degree=2,
                             interpret=True)
            # 1e-4: batched and per-view renders chunk the accumulation
            # differently, so dot_f32's dropped split tails differ
            np.testing.assert_allclose(imgs[i],
                                       np.asarray(ref["pred_features"]),
                                       atol=1e-4, rtol=1e-4)

    def test_background_blend(self):
        _, model = make_test_scene(n=16, seed=1, res=(32, 32))
        # aim at a point far from the particles so the whole scene falls
        # outside the frustum (at any distance the scene itself still
        # subtends a few pixels, so "far away" alone is not enough)
        cam = orbit_camera(0.0, 0.3, 5.0, center=np.array([500.0, 0, 0]),
                           resolution=(32, 32))
        bg = jnp.asarray([1.0, 0.5, 0.25])
        serve = make_serving_renderer(model, RC, sh_degree=0,
                                      background=bg)
        img = np.asarray(serve(stack_cameras([cam])))[0]
        # an empty frustum sees pure background
        np.testing.assert_allclose(img, np.broadcast_to(bg, img.shape),
                                   atol=1e-4)

    def test_grad_fold_dropped(self):
        rc = serving_raster_config(RasterConfig(max_pairs=1 << 14,
                                                grad_fold=True,
                                                enable_normals=True))
        assert not rc.grad_fold and not rc.enable_normals
