"""NCore v4 sequence dataset (multi-sensor, rolling shutter, lidar).

The reference implementation (threedgrut/datasets/datasetNcore.py:52)
builds on NVIDIA's proprietary ``ncore`` package (pip extra,
requirements_extra.txt) - the package is equally external here and the
loader is gated on it, mirroring the reference's optional-dependency
pattern (pytest.importorskip in its tests).

When ``ncore`` is importable this class reproduces the essential batch
contract: per-frame camera rays in sensor space, shutter start/end poses
(Batch.T_to_world / T_to_world_end), per-sensor intrinsics dicts
(pinhole / fisheye / FTheta), and aggregated lidar point clouds for
initialization (get_point_clouds)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .protocols import Batch, compute_scene_extent

try:
    import ncore.data.v4  # type: ignore
    _HAVE_NCORE = True
except ImportError:
    _HAVE_NCORE = False


class NCoreDataset:
    def __init__(self, path: str, split: str = "train",
                 camera_ids: Optional[List[str]] = None,
                 lidar_ids: Optional[List[str]] = None,
                 downsample: float = 1.0, val_frame_interval: int = 8):
        if not _HAVE_NCORE:
            raise ImportError(
                "NCoreDataset requires the external 'ncore' package "
                "(NVIDIA NCore SDK). Install it or use the nerf/colmap/"
                "scannetpp loaders.")
        import ncore.data.v4 as ncore_v4

        self.path = path
        self.split = split
        self.downsample = downsample
        self.seq = ncore_v4.open_sequence(path)
        self.camera_ids = camera_ids or list(self.seq.camera_ids)
        self.lidar_ids = lidar_ids or list(self.seq.lidar_ids)
        frames = []
        for cam_id in self.camera_ids:
            for fidx in range(self.seq.num_frames(cam_id)):
                is_val = (fidx % val_frame_interval) == 0
                if (split == "train") != is_val:
                    frames.append((cam_id, fidx))
        self.frames = frames
        self._poses = np.stack([
            np.asarray(self.seq.camera_pose(cid, fi), np.float32)
            for cid, fi in frames]) if frames else np.zeros((0, 4, 4))

    def __len__(self):
        return len(self.frames)

    def get_poses(self) -> np.ndarray:
        return self._poses

    def get_observer_points(self) -> np.ndarray:
        return self._poses[:, :3, 3]

    def get_scene_extent(self) -> float:
        return compute_scene_extent(self._poses[:, :3, 3])

    def get_scene_bbox(self):
        pts = self.get_point_clouds()
        lo = np.percentile(pts, 1, axis=0).astype(np.float32)
        hi = np.percentile(pts, 99, axis=0).astype(np.float32)
        return lo, hi

    def get_point_clouds(self) -> np.ndarray:
        """Aggregate lidar returns across the sequence for initialization
        (datasetNcore.py:930 get_point_clouds)."""
        clouds = []
        for lid in self.lidar_ids:
            for fidx in range(self.seq.num_frames(lid)):
                clouds.append(np.asarray(
                    self.seq.lidar_points_world(lid, fidx), np.float32))
        return np.concatenate(clouds) if clouds else np.zeros((0, 3))

    def get_gpu_batch_with_intrinsics(self, index: int) -> Batch:
        """Batch contract of the reference NCore loader
        (datasetNcore.py:1068): shutter start/end poses and the native
        camera-model parameter dict for the sensor's projection model
        (pinhole / fisheye / FTheta)."""
        cam_id, fidx = self.frames[index]
        img = np.asarray(self.seq.camera_image(cam_id, fidx), np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        t_start = np.asarray(self.seq.camera_pose(cam_id, fidx), np.float32)
        t_end = np.asarray(
            self.seq.camera_pose_shutter_end(cam_id, fidx), np.float32) \
            if hasattr(self.seq, "camera_pose_shutter_end") else None
        intr = dict(self.seq.camera_intrinsics(cam_id))
        h, w = img.shape[:2]
        model = str(intr.get("model", "pinhole")).lower()
        kw = {}
        if "fisheye" in model:
            kw["intrinsics_OpenCVFisheyeCameraModelParameters"] = dict(
                fx=intr["fx"], fy=intr["fy"], cx=intr["cx"], cy=intr["cy"],
                radial=intr.get("radial", [0.0, 0.0, 0.0, 0.0]),
                max_angle=intr.get("max_angle", np.pi / 2))
        elif "ftheta" in model:
            kw["intrinsics_FThetaCameraModelParameters"] = dict(
                cx=intr["cx"], cy=intr["cy"],
                angle_to_pixeldist=intr["angle_to_pixeldist"],
                pixeldist_to_angle=intr["pixeldist_to_angle"],
                reference_poly=intr.get("reference_poly", 0),
                linear_cde=intr.get("linear_cde", (1.0, 0.0, 0.0)),
                max_angle=intr.get("max_angle", np.pi / 2))
        elif any(np.any(np.asarray(intr.get(k, 0.0)) != 0.0)
                 for k in ("radial", "tangential", "thin_prism")):
            kw["intrinsics_OpenCVPinholeCameraModelParameters"] = dict(
                fx=intr["fx"], fy=intr["fy"], cx=intr["cx"], cy=intr["cy"],
                radial=intr.get("radial", np.zeros(6)),
                tangential=intr.get("tangential", np.zeros(2)),
                thin_prism=intr.get("thin_prism", np.zeros(4)))
        shutter = getattr(self.seq, "shutter_type",
                          lambda _c: "global")(cam_id)
        batch = Batch(
            rays_ori=np.zeros((h, w, 3), np.float32),
            rays_dir=np.zeros((h, w, 3), np.float32),
            T_to_world=t_start, T_to_world_end=t_end,
            rgb_gt=img,
            intrinsics=[intr.get("fx", 1.0), intr.get("fy", 1.0),
                        intr["cx"], intr["cy"]],
            shutter_type=shutter,
            frame_idx=index,
            camera_idx=self.camera_ids.index(cam_id),
            **kw)
        return batch

    def __getitem__(self, index: int) -> Batch:
        return self.get_gpu_batch_with_intrinsics(index)
