"""NCore loader batch contract, exercised against a fake ncore SDK.

Mirrors the reference's monkeypatched optional-dependency pattern
(threedgrut/export/tests/test_export_import.py:189 installs a fake ppisp
module): the proprietary `ncore` package never ships, so a fake module
tree validates the loader's rolling-shutter batch contract end to end,
including CameraModel construction and a tiny render.
"""

import sys
import types

import numpy as np
import pytest


class FakeSequence:
    """Two sensors: a rolling-shutter pinhole and a global fisheye."""

    camera_ids = ["cam_front", "cam_fish"]
    lidar_ids = ["lidar_top"]

    W, H = 32, 24

    def num_frames(self, sensor_id):
        return 6 if sensor_id.startswith("cam") else 3

    def camera_pose(self, cam_id, fidx):
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 0.1 * fidx
        m[2, 3] = -4.0
        return m

    def camera_pose_shutter_end(self, cam_id, fidx):
        m = self.camera_pose(cam_id, fidx)
        if cam_id == "cam_front":       # rolling shutter: pose moves
            m = m.copy()
            m[0, 3] += 0.05
        return m

    def shutter_type(self, cam_id):
        return ("rolling_top_to_bottom" if cam_id == "cam_front"
                else "global")

    def camera_intrinsics(self, cam_id):
        if cam_id == "cam_fish":
            return dict(model="opencv_fisheye", fx=20.0, fy=20.0,
                        cx=self.W / 2, cy=self.H / 2,
                        radial=[0.02, -0.001, 0.0, 0.0],
                        max_angle=np.pi / 2)
        return dict(model="pinhole", fx=28.0, fy=28.0,
                    cx=self.W / 2, cy=self.H / 2)

    def camera_image(self, cam_id, fidx):
        rng = np.random.default_rng(hash(cam_id) % 1000 + fidx)
        return (rng.uniform(0, 255, (self.H, self.W, 3))).astype(np.uint8)

    def lidar_points_world(self, lid, fidx):
        rng = np.random.default_rng(fidx)
        return rng.normal(0, 1, (50, 3)).astype(np.float32)


@pytest.fixture()
def fake_ncore(monkeypatch):
    root = types.ModuleType("ncore")
    data = types.ModuleType("ncore.data")
    v4 = types.ModuleType("ncore.data.v4")
    v4.open_sequence = lambda path: FakeSequence()
    root.data = data
    data.v4 = v4
    monkeypatch.setitem(sys.modules, "ncore", root)
    monkeypatch.setitem(sys.modules, "ncore.data", data)
    monkeypatch.setitem(sys.modules, "ncore.data.v4", v4)
    # the module caches the import probe at import time; force it on
    import threedgrut_tpu.data.ncore as ncore_mod
    monkeypatch.setattr(ncore_mod, "_HAVE_NCORE", True)
    return ncore_mod


class TestNCoreDataset:
    def test_gated_without_sdk(self):
        import threedgrut_tpu.data.ncore as ncore_mod
        if not ncore_mod._HAVE_NCORE:
            with pytest.raises(ImportError):
                ncore_mod.NCoreDataset("/nonexistent")

    def test_split_and_geometry(self, fake_ncore):
        ds = fake_ncore.NCoreDataset("/fake/seq", split="train",
                                     val_frame_interval=3)
        val = fake_ncore.NCoreDataset("/fake/seq", split="val",
                                      val_frame_interval=3)
        # 2 cams x 6 frames; every 3rd frame (0,3) is val
        assert len(ds) == 8 and len(val) == 4
        assert ds.get_poses().shape == (8, 4, 4)
        assert ds.get_observer_points().shape == (8, 3)
        assert ds.get_scene_extent() > 0
        pts = ds.get_point_clouds()
        assert pts.shape == (150, 3)       # 3 lidar frames x 50
        lo, hi = ds.get_scene_bbox()
        assert np.all(hi >= lo)

    def test_rolling_shutter_batch_contract(self, fake_ncore):
        from threedgrut_tpu.ops.cameras import ShutterType
        from threedgrut_tpu.ops.ut import UTConfig
        from threedgrut_tpu.train.trainer import camera_from_batch

        ds = fake_ncore.NCoreDataset("/fake/seq", split="train",
                                     val_frame_interval=3)
        # find a cam_front (rolling pinhole) batch
        b = next(ds[i] for i in range(len(ds)) if ds[i].camera_idx == 0)
        assert b.T_to_world_end is not None
        assert not np.allclose(b.T_to_world, b.T_to_world_end)
        assert b.shutter_type == "rolling_top_to_bottom"
        assert b.rgb_gt.dtype == np.float32 and b.rgb_gt.max() <= 1.0

        cam = camera_from_batch(b, UTConfig())
        assert cam.shutter_type == int(ShutterType.ROLLING_TOP_TO_BOTTOM)
        assert not np.allclose(np.asarray(cam.t_start),
                               np.asarray(cam.t_end))

    @pytest.mark.slow
    def test_fisheye_batch_renders(self, fake_ncore):
        import jax.numpy as jnp

        from scene_utils import make_test_scene
        from threedgrut_tpu.ops.cameras import CameraModelType
        from threedgrut_tpu.ops.ut import UTConfig
        from threedgrut_tpu.render.common import RasterConfig
        from threedgrut_tpu.render.gut import render_gut
        from threedgrut_tpu.train.trainer import camera_from_batch

        ds = fake_ncore.NCoreDataset("/fake/seq", split="train",
                                     val_frame_interval=3)
        b = next(ds[i] for i in range(len(ds)) if ds[i].camera_idx == 1)
        assert b.intrinsics_OpenCVFisheyeCameraModelParameters is not None
        cam = camera_from_batch(b, UTConfig())
        assert cam.model_type == int(CameraModelType.OPENCV_FISHEYE)

        _, model = make_test_scene(n=32, seed=0, res=(32, 24))
        out = render_gut(cam, UTConfig(),
                         RasterConfig(max_pairs=1 << 12), model,
                         sh_degree=1)
        assert np.all(np.isfinite(np.asarray(out["pred_features"])))
