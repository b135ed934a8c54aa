"""COLMAP dataset: binary format round-trip with synthetic files."""

import os
import struct

import numpy as np
import pytest
from PIL import Image

from threedgrut_tpu.data.colmap import (ColmapDataset, qvec_to_rotmat,
                                        read_cameras_bin, read_images_bin,
                                        read_points3d_bin)


def write_synthetic_colmap(root, n_images=10, w=64, h=48):
    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rng = np.random.default_rng(0)

    # cameras.bin: one OPENCV camera
    with open(os.path.join(root, "sparse", "0", "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 4, w, h))  # OPENCV
        f.write(struct.pack("<8d", 60.0, 60.0, w / 2, h / 2,
                            0.01, -0.002, 0.0001, 0.0002))

    # images.bin
    with open(os.path.join(root, "sparse", "0", "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))  # two 2D points
            f.write(struct.pack("<2d q", 1.0, 2.0, -1) * 2)
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "images", f"img_{i:03d}.png"))

    # points3D.bin
    with open(os.path.join(root, "sparse", "0", "points3D.bin"), "wb") as f:
        n_pts = 50
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", *rng.normal(size=3)))
            f.write(struct.pack("<3B", 10, 20, 30))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
    return root


@pytest.fixture(scope="module")
def colmap_dir(tmp_path_factory):
    return write_synthetic_colmap(str(tmp_path_factory.mktemp("colmap")))


class TestColmapParsers:
    def test_cameras(self, colmap_dir):
        cams = read_cameras_bin(os.path.join(colmap_dir, "sparse", "0",
                                             "cameras.bin"))
        assert cams[1]["model"] == "OPENCV"
        assert cams[1]["width"] == 64
        np.testing.assert_allclose(cams[1]["params"][0], 60.0)

    def test_images(self, colmap_dir):
        imgs = read_images_bin(os.path.join(colmap_dir, "sparse", "0",
                                            "images.bin"))
        assert len(imgs) == 10
        assert imgs[1]["name"] == "img_000.png"
        np.testing.assert_allclose(np.linalg.norm(imgs[1]["qvec"]), 1.0,
                                   atol=1e-6)

    def test_points(self, colmap_dir):
        xyz, rgb, err = read_points3d_bin(
            os.path.join(colmap_dir, "sparse", "0", "points3D.bin"))
        assert xyz.shape == (50, 3)
        assert (rgb[0] == [10, 20, 30]).all()

    def test_qvec_roundtrip(self):
        q = np.asarray([0.5, 0.5, 0.5, 0.5])
        r = qvec_to_rotmat(q)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-9)


class TestColmapDataset:
    def test_splits_and_batches(self, colmap_dir):
        train = ColmapDataset(colmap_dir, "train", test_split_interval=5)
        test = ColmapDataset(colmap_dir, "test", test_split_interval=5)
        assert len(train) + len(test) == 10
        assert len(test) == 2

        batch = train[0]
        assert batch.rgb_gt.shape == (48, 64, 3)
        intr = batch.intrinsics_OpenCVPinholeCameraModelParameters
        assert intr is not None and intr["fx"] == 60.0
        assert abs(intr["radial"][0] - 0.01) < 1e-9
        # c2w @ w2c == identity
        pose = train.get_poses()[0]
        assert np.isfinite(train.get_scene_extent())

    def test_points_init(self, colmap_dir):
        from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                     initialize_from_points)
        ds = ColmapDataset(colmap_dir, "train")
        pts, rgb, _ = ds.load_points3d()
        model = initialize_from_points(GaussianModelConfig(), pts,
                                       rgb.astype(np.float32))
        assert int(model.n_active) == 50
