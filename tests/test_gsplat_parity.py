"""gsplat-parity preprocessing (data/colmap_gsplat.py) + LPIPS module."""

import os

import numpy as np
import pytest

from threedgrut_tpu.data.colmap_gsplat import (align_principal_axes,
                                               build_downscale_cache,
                                               normalize_world_space,
                                               scene_scale,
                                               similarity_from_cameras,
                                               sorted_name_mapping,
                                               transform_cameras,
                                               transform_points)


def _ring_cameras(n=12, radius=4.0, seed=0):
    rng = np.random.default_rng(seed)
    c2w = []
    for i in range(n):
        th = 2 * np.pi * i / n
        eye = np.array([radius * np.sin(th), 0.4 + 0.05 * rng.normal(),
                        radius * np.cos(th)])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(np.array([0, -1.0, 0]), fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        m = np.eye(4)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, down, fwd, eye
        c2w.append(m)
    return np.stack(c2w)


class TestGsplatNormalization:
    def test_similarity_centers_and_scales(self):
        c2w = _ring_cameras()
        t = similarity_from_cameras(c2w)
        cams = transform_cameras(t, c2w)
        # rotations stay orthonormal
        r = cams[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3),
                                                        eye.shape),
                                   atol=1e-5)
        # median camera distance becomes 1
        d = np.linalg.norm(cams[:, :3, 3], axis=1)
        np.testing.assert_allclose(np.median(d), 1.0, atol=1e-6)

    def test_principal_axes_diagonalize(self):
        rng = np.random.default_rng(1)
        base = rng.normal(size=(500, 3)) * np.array([5.0, 2.0, 0.5])
        rot, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        pts = base @ rot.T + np.array([3.0, -1.0, 2.0])
        m = align_principal_axes(pts)
        out = transform_points(m, pts)
        cov = np.cov(out - np.median(out, axis=0), rowvar=False)
        off = cov - np.diag(np.diag(cov))
        assert np.abs(off).max() < 0.15 * np.diag(cov).max()
        # descending variances
        v = np.diag(cov)
        assert v[0] >= v[1] >= v[2]

    def test_normalize_world_space_consistency(self):
        c2w = _ring_cameras()
        rng = np.random.default_rng(2)
        pts = rng.normal(size=(300, 3)) * 1.5
        cams, npts, transform = normalize_world_space(c2w, pts)
        # transform maps original points onto returned points
        np.testing.assert_allclose(transform_points(transform, pts), npts,
                                   atol=1e-8)
        # z flip invariant: median(z) <= mean(z)
        assert np.median(npts[:, 2]) <= np.mean(npts[:, 2]) + 1e-9
        assert scene_scale(cams) > 0

    def test_image_cache_and_mapping(self, tmp_path):
        from PIL import Image
        src = tmp_path / "images"
        os.makedirs(src)
        rng = np.random.default_rng(0)
        for name in ["b.jpg", "a.jpg", "c.jpg"]:
            Image.fromarray(rng.integers(0, 255, (37, 51, 3),
                                         dtype=np.uint8)).save(src / name)
        dst = build_downscale_cache(str(src), str(tmp_path / "images_4"), 4)
        files = sorted(os.listdir(dst))
        assert files == ["a.png", "b.png", "c.png"]
        with Image.open(os.path.join(dst, "a.png")) as im:
            assert (im.width, im.height) == (int(round(51 / 4)),
                                             int(round(37 / 4)))
        mapping = sorted_name_mapping(str(src), dst)
        assert mapping == {"a.jpg": "a.png", "b.jpg": "b.png",
                           "c.jpg": "c.png"}


class TestLPIPS:
    def test_architecture_and_gating(self):
        import jax.numpy as jnp

        from threedgrut_tpu.utils import lpips as lm

        params = lm.random_params(0)
        a = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 3, 32, 32)).astype(np.float32))
        b = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (1, 3, 32, 32)).astype(np.float32))
        d_aa = float(lm.lpips(params, a, a))
        d_ab = float(lm.lpips(params, a, b))
        assert abs(d_aa) < 1e-6
        assert d_ab > 0
        # no weights on disk in this environment
        assert lm.load_weights("/nonexistent.npz") is None

    @pytest.mark.slow
    def test_torch_state_conversion(self, tmp_path):
        import torch

        from threedgrut_tpu.utils import lpips as lm

        # synthetic torchvision-layout vgg16 features + lpips lin heads
        vgg, layer, in_ch = {}, 0, 3
        for ch, n_convs in ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)):
            for _ in range(n_convs):
                vgg[f"features.{layer}.weight"] = torch.randn(ch, in_ch, 3, 3)
                vgg[f"features.{layer}.bias"] = torch.randn(ch)
                in_ch = ch
                layer += 2
            layer += 1
        lin = {f"lin{k}.model.1.weight": torch.rand(1, c, 1, 1)
               for k, c in enumerate((64, 128, 256, 512, 512))}
        path = str(tmp_path / "w.pth")
        torch.save({"vgg": vgg, "lin": lin}, path)
        params = lm.load_weights(path)
        assert params is not None
        assert params["conv0_w"].shape == (64, 3, 3, 3)
        assert params["lin4_w"].shape == (512,)
        a = np.random.default_rng(0).uniform(0, 1, (1, 3, 16, 16))
        d = float(lm.lpips(params, a.astype(np.float32),
                           a.astype(np.float32)))
        assert abs(d) < 1e-6
