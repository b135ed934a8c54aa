"""NCore loader, exercised against a fake ncore SDK.

Mirrors the reference's monkeypatched optional-dependency pattern
(threedgrut/export/tests/test_export_import.py:189 installs a fake ppisp
module): the proprietary `ncore` package never ships, so a fake module
tree validates the loader end to end - multi-sensor selection with FOV
filtering, time windowing, encoded-JPEG decode through the native C++
loader, per-camera ray caches, dilated valid-pixel masks, windowed train
sampling, validation subsampling, multi-source point clouds with
dynamic-point filtering + colors, and lidar initialization - plus
CameraModel construction and a tiny render.
"""

import io
import sys
import types

import numpy as np
import pytest


class FakeSequence:
    """Three sensors: rolling-shutter pinhole, global fisheye, and a
    195-degree ftheta that the default FOV filter must drop; one lidar
    with per-point colors + dynamic flags; 10 Hz timestamps."""

    camera_ids = ["cam_front", "cam_fish", "cam_omni"]
    lidar_ids = ["lidar_top"]
    point_cloud_source_ids = ["lidar_top"]

    W, H = 32, 24

    def num_frames(self, sensor_id):
        return 6 if sensor_id.startswith("cam") else 3

    def frame_timestamps_us(self, sensor_id):
        n = self.num_frames(sensor_id)
        return (1_000_000 + np.arange(n, dtype=np.int64) * 100_000)

    def camera_fov_deg(self, cam_id):
        return {"cam_front": 60.0, "cam_fish": 120.0,
                "cam_omni": 195.0}[cam_id]

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
        if cam_id == "cam_omni":
            return dict(model="ftheta", cx=self.W / 2, cy=self.H / 2,
                        angle_to_pixeldist=[0, 10.0, 0, 0, 0, 0],
                        pixeldist_to_angle=[0, 0.1, 0, 0, 0, 0],
                        reference_poly=0, max_angle=1.8)
        return dict(model="pinhole", fx=28.0, fy=28.0,
                    cx=self.W / 2, cy=self.H / 2)

    def camera_image(self, cam_id, fidx):
        # smooth gradient + per-(sensor, frame) phase: structured like a
        # real photo (JPEG on white noise has ~45/255 mean error, which
        # would make the decode-accuracy assertion meaningless)
        ph = (abs(hash(cam_id)) % 7) + fidx
        y, x = np.mgrid[0:self.H, 0:self.W].astype(np.float32)
        img = np.stack([
            128 + 100 * np.sin(x / 7.0 + ph),
            128 + 100 * np.cos(y / 5.0 - ph),
            128 + 80 * np.sin((x + y) / 9.0 + ph),
        ], axis=-1)
        return np.clip(img, 0, 255).astype(np.uint8)

    def camera_frame_encoded(self, cam_id, fidx):
        from PIL import Image
        b = io.BytesIO()
        Image.fromarray(self.camera_image(cam_id, fidx)).save(
            b, "JPEG", quality=95)
        return b.getvalue()

    def camera_mask(self, cam_id):
        m = np.ones((self.H, self.W), bool)
        m[:2, :] = False                # hood / body occlusion band
        return m

    def lidar_points_world(self, lid, fidx):
        rng = np.random.default_rng(fidx)
        return rng.normal(0, 1, (50, 3)).astype(np.float32)

    def lidar_origin_world(self, lid, fidx):
        return np.array([0.1 * fidx, 0.0, -4.0], np.float32)

    def lidar_point_flags(self, lid, fidx):
        flags = np.zeros(50, np.int32)
        flags[:5] = 1                   # first 5 points dynamic
        return flags

    def lidar_point_colors(self, lid, fidx, name):
        if name != "rgb":
            return None
        rng = np.random.default_rng(100 + fidx)
        return rng.uniform(0, 255, (50, 3)).astype(np.float32)


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

    def test_split_geometry_and_fov_filter(self, fake_ncore):
        ds = fake_ncore.NCoreDataset("/fake/seq", split="train",
                                     val_frame_interval=3)
        val = fake_ncore.NCoreDataset("/fake/seq", split="val",
                                      val_frame_interval=3)
        # cam_omni (195 deg) dropped by the default 190-deg FOV filter;
        # 2 cams x 6 frames; every 3rd frame (0,3) is val
        assert ds.camera_ids == ["cam_front", "cam_fish"]
        assert len(ds) == 8 and len(val) == 4
        assert ds.get_poses().shape == (8, 4, 4)
        assert ds.get_observer_points().shape == (8, 3)
        assert ds.get_scene_extent() > 0
        lo, hi = ds.get_scene_bbox()
        assert np.all(hi >= lo)

    def test_explicit_sensor_selection(self, fake_ncore):
        ds = fake_ncore.NCoreDataset("/fake/seq", camera_ids=["cam_fish"],
                                     val_frame_interval=3)
        assert ds.camera_ids == ["cam_fish"] and len(ds) == 4
        with pytest.raises(ValueError):
            fake_ncore.NCoreDataset("/fake/seq", camera_ids=["nope"])
        # max-FOV override admits the omnidirectional sensor
        ds_omni = fake_ncore.NCoreDataset(
            "/fake/seq", camera_ids=["cam_omni"], camera_max_fov_deg=200.0)
        assert ds_omni.camera_ids == ["cam_omni"]

    def test_time_windowing(self, fake_ncore):
        # frames at 1.0s..1.5s in 0.1s steps; window [1.15, 1.35) keeps
        # frames 2,3 per camera (frame 3 of every 3 is val)
        ds = fake_ncore.NCoreDataset("/fake/seq", split="train",
                                     val_frame_interval=3,
                                     seek_offset_sec=0.15,
                                     duration_sec=0.2)
        kept = {f for _, f in ds.frames}
        assert kept == {2}  # frame 3 went to val
        assert all(f in (2, 3) for _, f in ds.frames)

    def test_point_clouds_dynamic_filter_and_colors(self, fake_ncore):
        ds = fake_ncore.NCoreDataset("/fake/seq", val_frame_interval=3)
        clouds = list(ds.get_point_clouds())
        assert len(clouds) == 3
        for pc in clouds:
            assert pc.xyz_end.shape == (45, 3)   # 5 dynamic points dropped
            assert pc.color is not None and pc.color.max() <= 1.0
            assert pc.xyz_start.shape == pc.xyz_end.shape
            # all start points = the sensor origin for that frame
            assert np.allclose(pc.xyz_start, pc.xyz_start[0])
        keep_dyn = list(ds.get_point_clouds(non_dynamic_points_only=False))
        assert keep_dyn[0].xyz_end.shape == (50, 3)

    def test_lidar_init(self, fake_ncore):
        ds = fake_ncore.NCoreDataset("/fake/seq", val_frame_interval=3)
        pts, cols, dists = ds.load_lidar_init(num_points=100)
        assert pts.shape == (100, 3) and cols.shape == (100, 3)
        assert dists.shape == (100,) and (dists > 0).all()

        from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                     initialize_from_points)
        model = initialize_from_points(
            GaussianModelConfig(), pts, cols,
            observer_scale=dists * 0.01, capacity=256)
        assert int(model.n_active) == 100

    def test_native_jpeg_decode_path(self, fake_ncore):
        ds = fake_ncore.NCoreDataset("/fake/seq", val_frame_interval=3,
                                     jpeg_backend_cpu="native")
        b = ds[0]
        ref = FakeSequence().camera_image(*ds.frames[0]).astype(np.float32)
        # JPEG-lossy but must correlate strongly with the source frame
        assert b.rgb_gt.shape == ref.shape
        err = np.abs(b.rgb_gt * 255.0 - ref).mean()
        assert err < 20.0
        # PIL fallback produces the same shape
        ds_pil = fake_ncore.NCoreDataset("/fake/seq", val_frame_interval=3,
                                         jpeg_backend_cpu="PIL")
        assert ds_pil[0].rgb_gt.shape == ref.shape

    def test_masks_and_ray_cache(self, fake_ncore):
        ds = fake_ncore.NCoreDataset("/fake/seq", val_frame_interval=3,
                                     n_camera_mask_dilation_iterations=0)
        b = ds[0]
        assert b.mask is not None and b.mask.shape == (24, 32, 1)
        assert b.mask[:2].sum() == 0 and b.mask[2:].min() == 1.0
        assert b.rays_ori.shape == (24, 32, 3)
        # dilation grows the invalid region's complement... dilation of
        # the VALID mask re-admits boundary rows
        ds2 = fake_ncore.NCoreDataset("/fake/seq", val_frame_interval=3,
                                      n_camera_mask_dilation_iterations=2)
        assert ds2[0].mask.sum() >= b.mask.sum()
        # ray cache: same object returned for repeated frames of a sensor
        r1 = ds.camera_rays("cam_front", (32, 24))
        r2 = ds.camera_rays("cam_front", (32, 24))
        assert r1[0] is r2[0]

    def test_windowed_train_sampling(self, fake_ncore):
        ds = fake_ncore.NCoreDataset("/fake/seq", split="train",
                                     val_frame_interval=3,
                                     sample_full_image=False,
                                     window_size=8,
                                     n_samples_per_epoch=11)
        assert len(ds) == 11
        b = ds[0]
        assert b.rgb_gt.shape == (8, 8, 3)
        assert b.rays_dir.shape == (8, 8, 3)

    def test_val_subsampling(self, fake_ncore):
        ds = fake_ncore.NCoreDataset("/fake/seq", split="val",
                                     val_frame_interval=3,
                                     n_val_image_subsample=2)
        b = ds[0]
        assert b.rgb_gt.shape == (12, 16, 3)
        assert b.rays_dir.shape == (12, 16, 3)

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
