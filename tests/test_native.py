"""Native image-kernel tests: byte-exact parity with PIL LANCZOS."""

import numpy as np
import pytest
from PIL import Image

from footprints_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

RNG = np.random.RandomState(0)


@pytest.mark.parametrize("sh,sw,dh,dw", [
    (370, 1226, 192, 640),   # KITTI
    (512, 640, 256, 448),    # handheld downscale
    (100, 80, 192, 640),     # upscale
    (33, 47, 16, 24),        # odd sizes
])
def test_lanczos_byte_exact_vs_pil(sh, sw, dh, dw):
    img = RNG.randint(0, 256, (sh, sw, 3), np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((dw, dh), Image.LANCZOS))
    got = native.resize_lanczos(img, dh, dw)
    np.testing.assert_array_equal(got, ref)


def test_lanczos_fused_f32():
    img = RNG.randint(0, 256, (64, 96, 3), np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((48, 32), Image.LANCZOS),
                     np.float32) / 255.0
    got = native.resize_lanczos_f32(img, 32, 48)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_nearest_f32_matches_cv2():
    import cv2

    arr = RNG.rand(37, 53).astype(np.float32)
    ref = cv2.resize(arr, (24, 16), interpolation=cv2.INTER_NEAREST)
    got = native.resize_nearest_f32(arr, 16, 24)
    np.testing.assert_array_equal(got, ref)


def test_grayscale_channel():
    img = RNG.randint(0, 256, (50, 70), np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((32, 24), Image.LANCZOS))
    got = native.resize_lanczos(img, 24, 32)[..., 0]
    np.testing.assert_array_equal(got, ref)


def test_dataset_native_path(tmp_path, monkeypatch):
    """FOOTPRINTS_NATIVE_RESIZE=1 gives identical dataset samples."""
    from footprints_tpu.data.base import FootprintsDataset

    img = RNG.randint(0, 256, (90, 120, 3), np.uint8)
    p = tmp_path / "img.jpg"
    Image.fromarray(img).save(p, quality=95)

    ds = FootprintsDataset("", "", [], 32, 48)
    pil_img = ds.load_and_resize_image(str(p), do_flip=False)
    monkeypatch.setenv("FOOTPRINTS_NATIVE_RESIZE", "1")
    nat_img = ds.load_and_resize_image(str(p), do_flip=False)
    np.testing.assert_array_equal(np.asarray(nat_img), np.asarray(pil_img))
