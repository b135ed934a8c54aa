"""End-to-end integration: generated NeRF-synthetic dataset on disk ->
config composition -> train.py pipeline pieces -> checkpoint -> render."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def nerf_dataset_dir(tmp_path_factory):
    """Write a tiny valid NeRF-synthetic dataset (camera ring around a
    colored blob rendered analytically)."""
    root = tmp_path_factory.mktemp("lego_mini")
    rng = np.random.default_rng(0)
    w = h = 64
    for split, n_frames in [("train", 6), ("val", 2), ("test", 2)]:
        frames = []
        os.makedirs(root / split, exist_ok=True)
        for i in range(n_frames):
            theta = 2 * np.pi * i / n_frames + (0.1 if split != "train"
                                                else 0.0)
            # OpenGL c2w: camera on a ring at radius 4 looking at origin
            eye = np.array([4 * np.sin(theta), 0.5, 4 * np.cos(theta)])
            fwd = -eye / np.linalg.norm(eye)      # looking at origin
            right = np.cross(np.array([0, 1.0, 0]), -fwd)
            right /= np.linalg.norm(right)
            up = np.cross(-fwd, right)
            c2w = np.eye(4)
            c2w[:3, 0] = right
            c2w[:3, 1] = up
            c2w[:3, 2] = -fwd   # OpenGL: -z forward
            c2w[:3, 3] = eye
            # simple analytic image: radial gradient blob
            ys, xs = np.meshgrid(np.linspace(-1, 1, h),
                                 np.linspace(-1, 1, w), indexing="ij")
            r = np.sqrt(xs ** 2 + ys ** 2)
            img = np.zeros((h, w, 4), np.uint8)
            blob = np.clip(1.0 - r * 1.5, 0, 1)
            img[..., 0] = (blob * (128 + 100 * np.sin(theta))).astype(np.uint8)
            img[..., 1] = (blob * 180).astype(np.uint8)
            img[..., 2] = (blob * (128 + 100 * np.cos(theta))).astype(np.uint8)
            img[..., 3] = (blob > 0.05).astype(np.uint8) * 255
            name = f"{split}/r_{i}"
            Image.fromarray(img).save(root / f"{name}.png")
            frames.append({"file_path": f"./{name}",
                           "transform_matrix": c2w.tolist()})
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    return str(root)


class TestIntegration:
    def test_dataset_loads(self, nerf_dataset_dir):
        from threedgrut_tpu.data.nerf import NeRFDataset

        ds = NeRFDataset(nerf_dataset_dir, "train", bg_color="white")
        assert len(ds) == 6
        batch = ds[0]
        assert batch.rgb_gt.shape == (64, 64, 3)
        assert np.isfinite(ds.get_scene_extent())

    @pytest.mark.slow
    def test_config_to_training(self, nerf_dataset_dir, tmp_path):
        sys.path.insert(0, "/root/repo")
        from threedgrut_tpu.config.loader import load_config, to_trainer_config
        from threedgrut_tpu.render.common import RasterConfig
        from threedgrut_tpu.train.trainer import Trainer
        from train import make_dataset, make_model

        conf = load_config(
            "apps/nerf_synthetic_3dgut",
            overrides=[f"path={nerf_dataset_dir}", "n_iterations=8",
                       "initialization.num_gaussians=200"])
        dataset = make_dataset(conf, "train")
        val = make_dataset(conf, "val")
        model = make_model(conf, dataset)
        tconf = to_trainer_config(conf)
        tconf.raster = RasterConfig(max_pairs=1 << 13)
        tconf.init_n_features = 0
        trainer = Trainer(tconf, dataset, model, val_dataset=val)
        losses = []
        for step in range(8):
            m = trainer.train_iteration(dataset[step % len(dataset)])
            losses.append(m["total"])
        assert all(np.isfinite(l) for l in losses)

        ckpt = str(tmp_path / "ckpt.npz")
        trainer.save_checkpoint(ckpt)
        metrics = trainer.validate()
        assert np.isfinite(metrics["psnr"]) and metrics["n_views"] == 2

        # PLY export round-trips through the standalone exporter
        from threedgrut_tpu.export.ply import export_model, import_model
        ply = str(tmp_path / "model.ply")
        export_model(trainer.model, ply)
        back = import_model(ply)
        assert int(back.n_active) == int(trainer.model.n_active)
