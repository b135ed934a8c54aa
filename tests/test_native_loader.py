"""Native C++ data loader: decode parity with PIL, prefetch pipeline."""

import os

import numpy as np
import pytest
from PIL import Image

from threedgrut_tpu.data import native_loader


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        arr = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
        p = str(d / f"img_{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    jpg = str(d / "img_j.jpg")
    Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)).save(
        jpg, quality=95)
    return paths, jpg


@pytest.mark.skipif(not native_loader.native_available(),
                    reason="libdataio.so not built")
class TestNativeLoader:
    def test_png_decode_matches_pil(self, image_files):
        paths, _ = image_files
        got = native_loader.decode_image(paths[0])
        ref = np.asarray(Image.open(paths[0]))
        np.testing.assert_array_equal(got, ref)

    def test_jpeg_decode_close_to_pil(self, image_files):
        _, jpg = image_files
        got = native_loader.decode_image(jpg)
        ref = np.asarray(Image.open(jpg))
        assert got.shape == ref.shape
        assert np.abs(got.astype(int) - ref.astype(int)).mean() < 3

    def test_downsample(self, image_files):
        paths, _ = image_files
        got = native_loader.decode_image(paths[0], downsample=2)
        assert got.shape == (32, 24, 3)

    def test_prefetch_loader(self, image_files):
        paths, _ = image_files
        loader = native_loader.NativePrefetchLoader(paths, n_threads=3)
        loader.prefetch(list(range(len(paths))))
        for i in [3, 0, 5, 1]:
            img = loader.get(i)
            ref = np.asarray(Image.open(paths[i]))
            np.testing.assert_array_equal(img, ref)
