"""Property tests for the photometric augmentation (data/augment.py).

torchvision (the reference's ColorJitter backend,
/root/reference/footprints/datasets/footprint_dataset.py:37-50) is not
installed in this image, so these pin the free invariants instead:
zero-jitter identity, hue wrap-around periodicity (mod-256 uint8 H
arithmetic, the wrap a %255 / scale-256 bug would break), degenerate
factors (saturation 0 -> grayscale, brightness 0 -> black), range
compliance and rng determinism.
"""

import numpy as np
from PIL import Image

from footprints_tpu.data.augment import _shift_hue, color_jitter


def _rand_image(seed=0, size=(21, 13)):
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 256, (size[1], size[0], 3),
                                       dtype=np.uint8), "RGB")


def test_zero_jitter_is_identity():
    im = _rand_image(1)
    out = color_jitter(im, np.random.default_rng(0),
                       brightness=(1, 1), contrast=(1, 1),
                       saturation=(1, 1), hue=(0, 0))
    np.testing.assert_array_equal(np.array(out), np.array(im))


def test_hue_shift_wraps_mod_256():
    """uint8 H arithmetic: a negative shift is the complementary positive
    shift mod 256.  26/255 and (26-256)/255 quantize to shifts 26 and
    256-230=26 — identical outputs iff the wrap uses the full uint8 ring
    (a %255 modulus or a 256 scale would split them)."""
    im = _rand_image(2)
    a = np.array(_shift_hue(im, 26 / 255))
    b = np.array(_shift_hue(im, -230 / 255))
    np.testing.assert_array_equal(a, b)


def test_hue_zero_is_exact_identity():
    im = _rand_image(3)
    np.testing.assert_array_equal(np.array(_shift_hue(im, 0.0)), np.array(im))
    # quantized-to-zero shifts too (|h*255| < 1)
    np.testing.assert_array_equal(np.array(_shift_hue(im, 0.003)), np.array(im))


def test_hue_shift_changes_colors_but_is_bounded():
    im = _rand_image(4)
    out = np.array(_shift_hue(im, 0.1))
    assert not np.array_equal(out, np.array(im))
    assert out.dtype == np.uint8 and out.shape == np.array(im).shape


def test_saturation_zero_gives_grayscale():
    im = _rand_image(5)
    out = np.array(color_jitter(im, np.random.default_rng(0),
                                brightness=(1, 1), contrast=(1, 1),
                                saturation=(0, 0), hue=(0, 0))).astype(int)
    # R == G == B everywhere (ImageEnhance.Color at 0 = L-mode blend)
    assert np.abs(out - out.mean(axis=-1, keepdims=True)).max() <= 1


def test_brightness_zero_gives_black():
    im = _rand_image(6)
    out = np.array(color_jitter(im, np.random.default_rng(0),
                                brightness=(0, 0), contrast=(1, 1),
                                saturation=(1, 1), hue=(0, 0)))
    assert out.max() == 0


def test_color_jitter_deterministic_per_seed():
    im = _rand_image(7)
    a = np.array(color_jitter(im, np.random.default_rng(11)))
    b = np.array(color_jitter(im, np.random.default_rng(11)))
    c = np.array(color_jitter(im, np.random.default_rng(12)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_color_jitter_default_ranges_stay_close_to_input():
    """With the reference's mild ranges the output stays a plausible image:
    same shape/dtype and mean within the brightness/contrast envelope."""
    im = _rand_image(8, size=(64, 48))
    src_mean = np.array(im).mean()
    for seed in range(5):
        out = np.array(color_jitter(im, np.random.default_rng(seed)))
        assert out.shape == np.array(im).shape and out.dtype == np.uint8
        assert 0.6 * src_mean < out.mean() < 1.5 * src_mean
