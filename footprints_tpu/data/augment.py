"""Photometric augmentation: color jitter with the reference's parameter
ranges (brightness/contrast/saturation in [0.8, 1.2], hue in [-0.1, 0.1];
/root/reference/footprints/datasets/footprint_dataset.py:37-50).

Implemented on PIL images with ImageEnhance (the same backend old torchvision
used), applied in a random order per sample, so augmented-image statistics
match the reference distribution.
"""

import numpy as np
from PIL import Image, ImageEnhance


def color_jitter(image: Image.Image, rng: np.random.Generator,
                 brightness=(0.8, 1.2), contrast=(0.8, 1.2),
                 saturation=(0.8, 1.2), hue=(-0.1, 0.1)) -> Image.Image:
    """Random-order brightness/contrast/saturation/hue jitter on a PIL image."""
    ops = []
    b = rng.uniform(*brightness)
    ops.append(lambda im: ImageEnhance.Brightness(im).enhance(b))
    c = rng.uniform(*contrast)
    ops.append(lambda im: ImageEnhance.Contrast(im).enhance(c))
    s = rng.uniform(*saturation)
    ops.append(lambda im: ImageEnhance.Color(im).enhance(s))
    h = rng.uniform(*hue)
    ops.append(lambda im: _shift_hue(im, h))
    for i in rng.permutation(4):
        image = ops[i](image)
    return image


def _shift_hue(image: Image.Image, hue_factor: float) -> Image.Image:
    """Shift hue by hue_factor (fraction of the full hue circle)."""
    if image.mode != "RGB":
        return image
    if int(hue_factor * 255) == 0:
        # skip the lossy RGB->HSV->RGB round-trip when the quantized shift
        # is a no-op (also makes zero-jitter an exact identity)
        return image
    hsv = np.array(image.convert("HSV"), dtype=np.uint8)
    shift = np.uint8(int(hue_factor * 255)) if hue_factor >= 0 else np.uint8(256 + int(hue_factor * 255))
    hsv[..., 0] = (hsv[..., 0].astype(np.int16) + np.int16(shift)) % 256
    return Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
