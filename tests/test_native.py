"""Native C++ data-path library (csrc/fastpng.cpp via ctypes)."""
import os

import numpy as np
import pytest

from gaussianprediction_tpu.data import image_io, native


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native library not built and no toolchain")
    return True


def write_png(tmp_path, name, arr):
    import imageio.v2 as imageio

    p = str(tmp_path / name)
    imageio.imwrite(p, arr)
    return p


class TestFastPNG:
    def test_rgb_matches_pil(self, built, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        p = write_png(tmp_path, "a.png", img)
        out = native.decode_png(p)
        np.testing.assert_allclose(out * 255, img, atol=1e-3)

    def test_rgba_and_channel_conversion(self, built, tmp_path):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (21, 33, 4), dtype=np.uint8)
        p = write_png(tmp_path, "b.png", img)
        out4 = native.decode_png(p)
        assert out4.shape == (21, 33, 4)
        out3 = native.decode_png(p, channels=3)
        np.testing.assert_allclose(out3 * 255, img[..., :3], atol=1e-3)

    def test_gray_expansion(self, built, tmp_path):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
        p = write_png(tmp_path, "c.png", img)
        out = native.decode_png(p, channels=3)
        np.testing.assert_allclose(out[..., 0] * 255, img, atol=1e-3)
        np.testing.assert_allclose(out[..., 1], out[..., 0])

    def test_gray_alpha(self, built, tmp_path):
        """Regression (ADVICE r1 #2): color_type 4 must expand to
        (g,g,g[,a]) — channel 1 was previously filled with the alpha byte
        and real alpha was dropped."""
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (18, 26, 2), dtype=np.uint8)
        from PIL import Image

        p = str(tmp_path / "ga.png")
        Image.fromarray(img, mode="LA").save(p)
        out3 = native.decode_png(p, channels=3)
        assert out3 is not None
        for ch in range(3):
            np.testing.assert_allclose(out3[..., ch] * 255, img[..., 0],
                                       atol=1e-3)
        out4 = native.decode_png(p, channels=4)
        assert out4 is not None
        np.testing.assert_allclose(out4[..., 3] * 255, img[..., 1],
                                   atol=1e-3)
        np.testing.assert_allclose(out4[..., 1] * 255, img[..., 0],
                                   atol=1e-3)

    def test_batch_threads(self, built, tmp_path):
        rng = np.random.default_rng(3)
        paths = []
        refs = []
        for i in range(6):
            img = rng.integers(0, 256, (32 + i, 40, 3), dtype=np.uint8)
            paths.append(write_png(tmp_path, f"d{i}.png", img))
            refs.append(img)
        outs = native.decode_png_batch(paths, channels=3, n_threads=3)
        assert outs is not None and len(outs) == 6
        for o, r in zip(outs, refs):
            np.testing.assert_allclose(o * 255, r, atol=1e-3)

    def test_missing_file_returns_none(self, built):
        assert native.decode_png("/nonexistent/x.png") is None

    def test_image_io_integration(self, built, tmp_path):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
        p = write_png(tmp_path, "e.png", img)
        out = image_io.load_image(p)
        np.testing.assert_allclose(out * 255, img, atol=1e-3)
        # resize path still works (PIL fallback)
        out2 = image_io.load_image(p, resize_wh=(15, 10))
        assert out2.shape == (10, 15, 3)
