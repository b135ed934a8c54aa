"""pred_normals output (reference enable_normals) vs pure-JAX oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from scene_utils import make_test_scene
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.grt import trace
from threedgrut_tpu.render.gut import render_gut
from threedgrut_tpu.render.oracle import render_oracle

UT = UTConfig()


class TestNormals:
    @pytest.mark.slow
    def test_gut_normals_match_oracle(self):
        cam, model = make_test_scene(n=96, seed=0, res=(64, 48))
        rc = RasterConfig(max_pairs=1 << 14, enable_normals=True)
        ref = render_oracle(cam, UT, rc, model, sh_degree=2)
        got = render_gut(cam, UT, rc, model, sh_degree=2, interpret=True)
        assert "pred_normals" in got
        np.testing.assert_allclose(got["pred_normals"],
                                   ref["pred_normals"],
                                   atol=2e-3, rtol=1e-3)
        # normals are blended unit vectors: magnitudes bounded by opacity
        mag = np.linalg.norm(np.asarray(got["pred_normals"]), axis=-1)
        assert (mag <= np.asarray(got["pred_opacity"])[..., 0] + 1e-3).all()

    def test_trace_normals_shape_finite(self):
        _, model = make_test_scene(n=64, seed=1, res=(32, 32))
        rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -6.0]]), (17, 1))
        d = np.zeros((17, 3), np.float32)
        d[:, 2] = 1.0
        d[:, 0] = np.linspace(-0.3, 0.3, 17)
        out = trace(model, rays_o, jnp.asarray(d), sh_degree=1,
                    raster_cfg=RasterConfig(max_pairs=1 << 12,
                                            enable_normals=True),
                    interpret=True)
        assert out["pred_normals"].shape == (17, 3)
        assert np.isfinite(np.asarray(out["pred_normals"])).all()
