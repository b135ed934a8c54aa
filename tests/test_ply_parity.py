"""Cross-implementation parity artifact (VERDICT r3 item 9).

One reference-format 3DGS PLY fixture (tests/fixtures/parity_cloud.ply,
regenerate with scripts/gen_parity_fixture.py) is imported through the
public interchange format — the same binary layout the reference's
importer consumes (/root/reference/threedgrut/export/importers/ply.py)
— and rendered through every in-repo path. Agreement between
independently-implemented paths on identical imported inputs is the
strongest in-environment proxy for the 0.3 dB cross-implementation gate
(no GPU / no reference datasets here).

Paths compared (PSNR >= 45 dB pairwise):
  oracle     pure-JAX direct canonical transform (render/oracle.py)
  pallas     production 3DGUT Pallas pipeline (interpret mode on CPU)
  grt-sorted 3DGRT ordering semantics, per-ray k=16 window re-sort
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from threedgrut_tpu.export.ply import export_ply, import_model, import_ply
from threedgrut_tpu.ops.cameras import make_pinhole
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.gut import render_gut
from threedgrut_tpu.render.oracle import render_oracle

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "parity_cloud.ply")
RES = 64
UT = UTConfig()
RC = RasterConfig(max_pairs=1 << 14)


def psnr_between(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


@pytest.fixture(scope="module")
def scene():
    model = import_model(FIXTURE)
    cam = make_pinhole(resolution=(RES, RES), focal=(1.1 * RES, 1.1 * RES),
                       principal=(RES / 2, RES / 2))
    return cam, model


class TestPlyImport:
    def test_fixture_imports(self, scene):
        _, model = scene
        assert int(model.n_active) == 512
        assert int(model.n_active_features) == 3
        pos = np.asarray(model.params.positions[:512])
        assert np.all(np.isfinite(pos))

    def test_roundtrip_bit_exact(self, scene, tmp_path):
        raw = import_ply(FIXTURE)
        out = str(tmp_path / "rt.ply")
        export_ply(out, raw["positions"], raw["rotation"], raw["scale"],
                   raw["density"], raw["features_albedo"],
                   raw["features_specular"])
        raw2 = import_ply(out)
        for k in raw:
            np.testing.assert_array_equal(raw[k], raw2[k])


class TestCrossPathParity:
    """All render paths agree on the imported fixture at >= 45 dB."""

    @pytest.fixture(scope="class")
    def renders(self, scene):
        cam, model = scene
        out = {}
        out["oracle"] = render_oracle(cam, UT, RC, model,
                                      sh_degree=3)["pred_features"]
        out["pallas"] = render_gut(cam, UT, RC, model,
                                   sh_degree=3)["pred_features"]
        rc_grt = RC.replace(sorted_compositing=True, sort_window=16)
        out["grt"] = render_gut(cam, UT, rc_grt, model,
                                sh_degree=3)["pred_features"]
        return {k: np.clip(np.asarray(v), 0.0, 1.0)
                for k, v in out.items()}

    @pytest.mark.parametrize("a,b", [("oracle", "pallas"),
                                     ("oracle", "grt"),
                                     ("pallas", "grt")])
    def test_pairwise_psnr(self, renders, a, b):
        p = psnr_between(renders[a], renders[b])
        assert p >= 45.0, f"{a} vs {b}: {p:.2f} dB < 45"

    def test_nontrivial_image(self, renders):
        # guard against vacuous agreement on an empty image
        img = renders["oracle"]
        assert float(img.max()) > 0.05
        assert float(img.std()) > 0.01
