"""Hybrid playground engine: meshes, materials, env maps, path tracing."""

import jax.numpy as jnp
import numpy as np

from scene_utils import make_test_scene
from threedgrut_tpu.playground.engine import (Engine3DGRUT, EngineConfig,
                                              EnvironmentMap, PBRMaterial)
from threedgrut_tpu.playground.mesh import (TriangleSoup, make_box,
                                            make_icosphere)


class TestMesh:
    def test_box_closest_hit(self):
        soup = TriangleSoup([make_box((0, 0, 5), (2, 2, 2))])
        ro = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
        rd = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        t, tri, n, mat = soup.closest_hit(ro, rd)
        np.testing.assert_allclose(float(t[0]), 4.0, atol=1e-5)
        assert int(tri[1]) == -1  # second ray misses
        np.testing.assert_allclose(np.asarray(n[0]), [0, 0, -1], atol=1e-5)

    def test_icosphere_hit_distance(self):
        soup = TriangleSoup([make_icosphere((0, 0, 3), 1.0, 3)])
        t, tri, n, mat = soup.closest_hit(
            jnp.zeros((1, 3)), jnp.asarray([[0.0, 0.0, 1.0]]))
        np.testing.assert_allclose(float(t[0]), 2.0, atol=0.02)


class TestEngine:
    def _engine(self, **cfg):
        _, model = make_test_scene(n=32, seed=0)
        eng = Engine3DGRUT(model, EngineConfig(max_bounces=2, **cfg),
                           EnvironmentMap(constant=(0.2, 0.3, 0.4)))
        return eng

    def test_envmap_only(self):
        eng = self._engine()
        # ray pointing away from all particles -> pure envmap
        rgb = eng.render_rays(jnp.asarray([[0.0, 0.0, -50.0]]),
                              jnp.asarray([[0.0, 0.0, -1.0]]))
        np.testing.assert_allclose(np.asarray(rgb[0]), [0.2, 0.3, 0.4],
                                   atol=0.02)

    def test_mirror_bounce(self):
        eng = self._engine()
        # mirror plane box far from particles; ray hits it and reflects to env
        eng.add_primitive(make_box((0, 0, -20), (10, 10, 0.2)),
                          PBRMaterial(kind="mirror", base_color=(1, 1, 1)))
        rgb = eng.render_rays(jnp.asarray([[0.0, 0.0, -25.0]]),
                              jnp.asarray([[0.0, 0.0, 1.0]]))
        assert np.all(np.asarray(rgb[0]) > 0.05)

    def test_gaussians_contribute(self):
        eng = self._engine()
        rgb_through = eng.render_rays(jnp.asarray([[0.0, 0.0, 0.0]]),
                                      jnp.asarray([[0.0, 0.0, 1.0]]))
        rgb_away = eng.render_rays(jnp.asarray([[0.0, 0.0, 0.0]]),
                                   jnp.asarray([[0.0, 0.0, -1.0]]))
        # the ray through the particle cloud differs from the env-only ray
        assert np.abs(np.asarray(rgb_through) - np.asarray(rgb_away)).max() \
            > 0.01

    def test_full_frame_render_with_dof(self):
        cam, model = make_test_scene(n=24, seed=1, res=(32, 32))
        eng = Engine3DGRUT(model, EngineConfig(max_bounces=1, spp=2,
                                               aperture=0.02,
                                               gaussian_sh_degree=1))
        img = eng.render(cam)
        assert img.shape == (32, 32, 3)
        assert np.all(np.isfinite(img))
