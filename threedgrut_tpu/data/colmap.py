"""COLMAP dataset: sparse reconstruction parsing + multi-camera batches.

Behavioral contract from threedgrut/datasets/dataset_colmap.py:114-822:
- parses sparse/0/{cameras,images,points3D}.{bin,txt},
- supports PINHOLE / SIMPLE_PINHOLE / OPENCV / OPENCV_FISHEYE /
  SIMPLE_RADIAL camera models,
- images sorted by name; test split = every 8th frame (llffhold-style),
- optional downsampling via images_N directories or on-the-fly resize,
- poses returned camera-to-world in the right-down-front convention
  (COLMAP native), scene extent from camera spread.

Binary readers implement the public COLMAP format (struct layout per the
COLMAP docs), written fresh for numpy.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, Optional, Tuple

import numpy as np

from .protocols import Batch, compute_scene_extent

# COLMAP camera model ids -> (name, num_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}


def _read(fmt, f):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, f.read(size))


def read_cameras_bin(path: str) -> Dict[int, dict]:
    cams = {}
    with open(path, "rb") as f:
        (n,) = _read("<Q", f)
        for _ in range(n):
            cam_id, model_id, width, height = _read("<iiQQ", f)
            name, np_ = CAMERA_MODELS[model_id]
            params = np.array(_read(f"<{np_}d", f), np.float64)
            cams[cam_id] = dict(model=name, width=int(width),
                                height=int(height), params=params)
    return cams


def read_images_bin(path: str) -> Dict[int, dict]:
    images = {}
    with open(path, "rb") as f:
        (n,) = _read("<Q", f)
        for _ in range(n):
            image_id = _read("<i", f)[0]
            qvec = np.array(_read("<4d", f))
            tvec = np.array(_read("<3d", f))
            camera_id = _read("<i", f)[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = _read("<Q", f)
            f.seek(24 * n_pts, 1)  # skip 2D points (x, y, point3D_id)
            images[image_id] = dict(qvec=qvec, tvec=tvec,
                                    camera_id=camera_id,
                                    name=name.decode("utf-8"))
    return images


def read_points3d_bin(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        (n,) = _read("<Q", f)
        xyz = np.empty((n, 3), np.float64)
        rgb = np.empty((n, 3), np.uint8)
        err = np.empty((n,), np.float64)
        for i in range(n):
            data = _read("<Q3d3Bd", f)
            xyz[i] = data[1:4]
            rgb[i] = data[4:7]
            err[i] = data[7]
            (track_len,) = _read("<Q", f)
            f.seek(8 * track_len, 1)
    return xyz.astype(np.float32), rgb, err.astype(np.float32)


def read_points3d_txt(path: str):
    xyz, rgb = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            el = line.split()
            xyz.append([float(v) for v in el[1:4]])
            rgb.append([int(v) for v in el[4:7]])
    return (np.asarray(xyz, np.float32), np.asarray(rgb, np.uint8),
            np.zeros(len(xyz), np.float32))


def qvec_to_rotmat(q: np.ndarray) -> np.ndarray:
    """COLMAP (w,x,y,z) -> rotation matrix (world->camera)."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class ColmapDataset:
    """Loads a COLMAP capture directory (images/ + sparse/0/)."""

    def __init__(self, path: str, split: str = "train", downsample: int = 1,
                 test_split_interval: int = 8, fisheye: bool = False,
                 gsplat_normalize: bool = False,
                 gsplat_image_downscale: bool = False):
        self.path = path
        self.split = split
        self.downsample = max(int(downsample), 1)
        self.gsplat_normalize = gsplat_normalize
        self.gsplat_image_downscale = gsplat_image_downscale
        self.world_transform = np.eye(4, dtype=np.float32)
        sparse = os.path.join(path, "sparse", "0")
        if not os.path.isdir(sparse):
            sparse = os.path.join(path, "colmap", "sparse", "0")
        if os.path.exists(os.path.join(sparse, "cameras.bin")):
            self.cameras = read_cameras_bin(os.path.join(sparse, "cameras.bin"))
            self.images_meta = read_images_bin(os.path.join(sparse, "images.bin"))
        else:
            raise FileNotFoundError(f"no COLMAP sparse model under {path}")
        pts_bin = os.path.join(sparse, "points3D.bin")
        self._points_path = pts_bin

        items = sorted(self.images_meta.values(), key=lambda d: d["name"])
        idx = np.arange(len(items))
        if test_split_interval > 0:
            test_mask = (idx % test_split_interval) == 0
        else:
            test_mask = np.zeros(len(items), bool)
        sel = ~test_mask if split == "train" else test_mask
        self.items = [it for it, s in zip(items, sel) if s]

        # camera-to-world poses (COLMAP stores world->camera)
        poses = []
        for it in self.items:
            r = qvec_to_rotmat(it["qvec"])
            t = it["tvec"]
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, :3] = r.T
            c2w[:3, 3] = -r.T @ t
            poses.append(c2w)
        self._poses = np.stack(poses) if poses else np.zeros((0, 4, 4))

        if gsplat_normalize and len(self._poses):
            # gsplat world normalization (colmap_gsplat.py): poses, sparse
            # points and scene extent all move to the normalized frame
            from .colmap_gsplat import normalize_world_space, scene_scale
            pts, _, _ = read_points3d_bin(self._points_path) \
                if os.path.exists(self._points_path) else (None, None, None)
            if pts is not None and len(pts):
                cams, _, transform = normalize_world_space(
                    self._poses.astype(np.float64), pts.astype(np.float64))
                self._poses = cams.astype(np.float32)
                self.world_transform = transform.astype(np.float32)
                self._gsplat_extent = scene_scale(self._poses) * 1.1

        self._image_dir = self._find_image_dir()
        self._name_map = None
        if gsplat_image_downscale:
            from .colmap_gsplat import (build_downscale_cache,
                                        sorted_name_mapping)
            colmap_dir = os.path.join(self.path, "images")
            if self.downsample > 1 and self._image_dir == colmap_dir:
                self._image_dir = build_downscale_cache(
                    colmap_dir,
                    os.path.join(self.path,
                                 f"images_{self.downsample}_png"),
                    self.downsample)
            self._name_map = sorted_name_mapping(colmap_dir,
                                                 self._image_dir)
        self._image_cache = {}

    def _find_image_dir(self):
        if self.downsample > 1:
            cand = os.path.join(self.path, f"images_{self.downsample}")
            if os.path.isdir(cand):
                return cand
        return os.path.join(self.path, "images")

    # --- protocol -----------------------------------------------------

    def __len__(self):
        return len(self.items)

    def get_poses(self) -> np.ndarray:
        return self._poses

    def get_observer_points(self) -> np.ndarray:
        return self._poses[:, :3, 3]

    def get_scene_extent(self) -> float:
        if getattr(self, "_gsplat_extent", None) is not None:
            return self._gsplat_extent
        return compute_scene_extent(self._poses[:, :3, 3])

    def get_scene_bbox(self):
        pts, _, _ = self.load_points3d()
        lo = np.percentile(pts, 1, axis=0).astype(np.float32)
        hi = np.percentile(pts, 99, axis=0).astype(np.float32)
        pad = 0.1 * (hi - lo)
        return lo - pad, hi + pad

    def get_camera_idx(self, frame_idx: int) -> int:
        ids = sorted(self.cameras.keys())
        return ids.index(self.items[frame_idx]["camera_id"])

    def get_frames_per_camera(self):
        counts = {}
        for it in self.items:
            counts[it["camera_id"]] = counts.get(it["camera_id"], 0) + 1
        return [counts[k] for k in sorted(counts)]

    def load_points3d(self):
        pts, rgb, err = read_points3d_bin(self._points_path)
        if self.gsplat_normalize and len(pts):
            from .colmap_gsplat import transform_points
            pts = transform_points(
                self.world_transform.astype(np.float64),
                pts.astype(np.float64)).astype(np.float32)
        return pts, rgb, err

    # --- intrinsics ---------------------------------------------------

    def intrinsics_for(self, camera_id: int) -> dict:
        """Normalized intrinsics dict scaled by the downsample factor.

        Mirrors dataset_colmap.py:337-430 intrinsics builders.
        """
        cam = self.cameras[camera_id]
        p = cam["params"]
        s = 1.0 / self.downsample
        w = int(round(cam["width"] * s))
        h = int(round(cam["height"] * s))
        if self.gsplat_image_downscale and self.downsample > 1:
            # gsplat parity: intrinsics corrected by the ratio of the
            # rounded cache size to the floor-divided expected size
            # (dataset_colmap.py gsplat_image_downscale branches)
            sx = w / (cam["width"] // self.downsample)
            sy = h / (cam["height"] // self.downsample)
        else:
            sx = sy = 1.0
        model = cam["model"]
        out = dict(model=model, width=w, height=h)
        if model == "SIMPLE_PINHOLE":
            out.update(fx=p[0] * s, fy=p[0] * s, cx=p[1] * s, cy=p[2] * s,
                       radial=np.zeros(6), tangential=np.zeros(2),
                       thin_prism=np.zeros(4), kind="pinhole")
        elif model == "PINHOLE":
            out.update(fx=p[0] * s, fy=p[1] * s, cx=p[2] * s, cy=p[3] * s,
                       radial=np.zeros(6), tangential=np.zeros(2),
                       thin_prism=np.zeros(4), kind="pinhole")
        elif model == "SIMPLE_RADIAL":
            radial = np.zeros(6); radial[0] = p[3]
            out.update(fx=p[0] * s, fy=p[0] * s, cx=p[1] * s, cy=p[2] * s,
                       radial=radial, tangential=np.zeros(2),
                       thin_prism=np.zeros(4), kind="pinhole")
        elif model == "OPENCV":
            radial = np.zeros(6); radial[0] = p[4]; radial[1] = p[5]
            out.update(fx=p[0] * s, fy=p[1] * s, cx=p[2] * s, cy=p[3] * s,
                       radial=radial, tangential=np.array([p[6], p[7]]),
                       thin_prism=np.zeros(4), kind="pinhole")
        elif model == "OPENCV_FISHEYE":
            out.update(fx=p[0] * s, fy=p[1] * s, cx=p[2] * s, cy=p[3] * s,
                       radial=np.array([p[4], p[5], p[6], p[7]]),
                       max_angle=np.pi / 2, kind="fisheye")
        else:
            raise NotImplementedError(f"COLMAP camera model {model}")
        if sx != 1.0 or sy != 1.0:
            out["fx"] *= sx
            out["cx"] *= sx
            out["fy"] *= sy
            out["cy"] *= sy
        return out

    # --- batches --------------------------------------------------------

    def _load_image(self, index: int) -> np.ndarray:
        if index in self._image_cache:
            return self._image_cache[index]
        name = self.items[index]["name"]
        if self._name_map is not None:
            name = self._name_map.get(name, name)
        full = os.path.join(self._image_dir, name)
        cam = self.cameras[self.items[index]["camera_id"]]
        tw = int(round(cam["width"] / self.downsample))
        th = int(round(cam["height"] / self.downsample))
        rgb = None
        from . import native_loader
        if native_loader.native_available():
            raw = native_loader.decode_image(full)
            if raw is not None and raw.shape[:2] == (th, tw) \
                    and raw.shape[2] == 3:
                rgb = raw.astype(np.float32) / 255.0
        if rgb is None:
            from PIL import Image

            img = Image.open(full)
            if (img.width, img.height) != (tw, th):
                img = img.resize((tw, th), Image.LANCZOS)
            rgb = np.asarray(img.convert("RGB"), np.float32) / 255.0
        self._image_cache[index] = rgb
        return rgb

    def camera_rays(self, intr: dict):
        # memoized per camera (fisheye rays especially - the grid +
        # distortion solve costs 10s of ms per __getitem__ otherwise)
        ck = (intr["width"], intr["height"], intr["fx"], intr["fy"],
              intr["cx"], intr["cy"], intr["kind"])
        cache = getattr(self, "_rays_cache", None)
        if cache is None:
            cache = self._rays_cache = {}
        if ck in cache:
            return cache[ck]
        cache[ck] = self._camera_rays_uncached(intr)
        return cache[ck]

    def _camera_rays_uncached(self, intr: dict):
        h, w = intr["height"], intr["width"]
        y, x = np.meshgrid(np.arange(h, dtype=np.float32),
                           np.arange(w, dtype=np.float32), indexing="ij")
        if intr["kind"] == "fisheye":
            from ..ops.cameras import fisheye_camera_rays
            import jax.numpy as jnp
            o, d = fisheye_camera_rays(
                w, h, jnp.asarray([intr["fx"], intr["fy"]]),
                jnp.asarray([intr["cx"], intr["cy"]]),
                jnp.asarray(intr["radial"]), intr["max_angle"])
            return np.asarray(o), np.asarray(d)
        xs = (x + 0.5 - intr["cx"]) / intr["fx"]
        ys = (y + 0.5 - intr["cy"]) / intr["fy"]
        dirs = np.stack([xs, ys, np.ones_like(xs)], axis=-1)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        return np.zeros_like(dirs), dirs.astype(np.float32)

    def get_gpu_batch_with_intrinsics(self, index: int) -> Batch:
        it = self.items[index]
        intr = self.intrinsics_for(it["camera_id"])
        rgb = self._load_image(index)
        ray_o, ray_d = self.camera_rays(intr)
        batch = Batch(
            rays_ori=ray_o, rays_dir=ray_d,
            T_to_world=self._poses[index],
            rgb_gt=rgb,
            intrinsics=[intr["fx"], intr["fy"], intr["cx"], intr["cy"]],
            frame_idx=index, camera_idx=self.get_camera_idx(index))
        if intr["kind"] == "fisheye":
            batch.intrinsics_OpenCVFisheyeCameraModelParameters = intr
        else:
            batch.intrinsics_OpenCVPinholeCameraModelParameters = intr
        return batch

    def __getitem__(self, index: int) -> Batch:
        return self.get_gpu_batch_with_intrinsics(index)


class ScannetppDataset(ColmapDataset):
    """ScanNet++ fisheye variant (dataset_scannetpp.py:23): COLMAP layout
    with fisheye cameras and points3D.txt under colmap/."""

    def __init__(self, path: str, split: str = "train", downsample: int = 1):
        super().__init__(path, split, downsample, fisheye=True)

    def load_points3d(self):
        txt = os.path.join(self.path, "colmap", "points3D.txt")
        if os.path.exists(txt):
            return read_points3d_txt(txt)
        return super().load_points3d()
