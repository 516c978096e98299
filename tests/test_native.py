"""Native C++ loader tests: builds the .so, checks decode parity vs PIL."""
import os

import numpy as np
import pytest

from crossloc_tpu import native

pytestmark = pytest.mark.skipif(
    not native.ensure_built(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def sample_images(tmp_path_factory, ):
    from PIL import Image

    rng = np.random.default_rng(3)
    d = tmp_path_factory.mktemp("imgs")
    arr = (rng.uniform(0, 255, size=(60, 90, 3))).astype(np.uint8)
    png = str(d / "img.png")
    jpg = str(d / "img.jpg")
    gray_png = str(d / "gray.png")
    Image.fromarray(arr).save(png)
    Image.fromarray(arr).save(jpg, quality=95)
    Image.fromarray(arr[..., 0]).save(gray_png)
    return {"arr": arr, "png": png, "jpg": jpg, "gray_png": gray_png}


class TestNativeLoader:
    def test_dims(self, sample_images):
        assert native.image_dims(sample_images["png"]) == (60, 90)
        assert native.image_dims(sample_images["jpg"]) == (60, 90)

    def test_png_exact_decode(self, sample_images):
        out = native.load_image(sample_images["png"], 60, 90)
        np.testing.assert_allclose(out, sample_images["arr"] / 255.0, atol=1e-6)

    def test_jpeg_close_to_pil(self, sample_images):
        from PIL import Image

        out = native.load_image(sample_images["jpg"], 60, 90)
        pil = np.asarray(Image.open(sample_images["jpg"]).convert("RGB")) / 255.0
        # decoder IDCT variants differ by a few levels at most
        assert np.abs(out - pil).max() < 0.05

    def test_gray_to_rgb(self, sample_images):
        out = native.load_image(sample_images["gray_png"], 60, 90)
        assert out.shape == (60, 90, 3)
        np.testing.assert_allclose(out[..., 0], out[..., 1])

    def test_resize_matches_pil_bilinear(self, sample_images):
        # the reference host pipeline resizes via PIL (torchvision Resize,
        # `dataloader/dataloader.py:172-211`) — antialiased triangle filter
        from PIL import Image

        out = native.load_image(sample_images["png"], 30, 45)
        ref = (
            np.asarray(
                Image.fromarray(sample_images["arr"]).resize((45, 30), Image.BILINEAR)
            )
            / 255.0
        )
        assert np.abs(out - ref).max() < 1e-2

    def test_upscale_matches_pil(self, sample_images):
        from PIL import Image

        out = native.load_image(sample_images["png"], 120, 180)
        ref = (
            np.asarray(
                Image.fromarray(sample_images["arr"]).resize((180, 120), Image.BILINEAR)
            )
            / 255.0
        )
        assert np.abs(out - ref).max() < 1e-2

    def test_std_height(self, sample_images):
        out = native.load_image_std_height(sample_images["png"], 120)
        assert out.shape == (120, 180, 3)

    def test_missing_file(self):
        assert native.image_dims("/nonexistent/x.png") is None
        assert native.load_image("/nonexistent/x.png", 8, 8) is None

    def test_dataset_uses_native(self, tmp_path):
        from crossloc_tpu import data

        root = data.write_fake_dataset(str(tmp_path / "scene"), n=2, img_h=64, img_w=96)
        ds = data.CamLocDataset(root, coord=True, image_height=64)
        item = ds[0]
        assert item.image.shape == (64, 96, 3)
        assert np.isfinite(item.image).all()
