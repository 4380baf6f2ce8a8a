"""Base training dataset: per-sample loading and preprocessing (host-side,
pure numpy — no JAX in this module so it can run in prefetch threads).

Behavioral contract (reference:
/root/reference/footprints/datasets/footprint_dataset.py):
  * images loaded with PIL, resized with LANCZOS to (width, height)
  * npy targets resized with cv2 (INTER_NEAREST or INTER_AREA per-target),
    optional horizontal flip, optional disparity rescale by width ratio
  * train-time: 50% random h-flip + 50% color jitter per sample
  * `all_ground` is derived as (ground_depth + visible_ground) > 0
  * depth_masks drop connected components >= 1% of the image area
Samples come back as a dict of float32 numpy arrays; image is [H,W,3] in
[0,1] (ToTensor semantics, channels-last for the TPU NHWC path).
"""

import os

import cv2
import numpy as np
from PIL import Image

from ..core.labels import filter_small_components
from .augment import color_jitter

# Pillow >= 10 removed the ANTIALIAS alias; LANCZOS is the same filter.
LANCZOS = Image.LANCZOS


class FootprintsDataset:
    def __init__(self, raw_data_path, training_data_path, filenames, height, width,
                 is_train=False, seed=0):
        self.raw_data_path = raw_data_path
        self.training_data_path = training_data_path
        self.filenames = filenames
        self.height = height
        self.width = width
        self.is_train = is_train
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.filenames)

    def __getitem__(self, index):
        raise NotImplementedError

    # -- shared loading helpers ------------------------------------------------

    def load_and_resize_image(self, path, do_flip, method=LANCZOS):
        if method is LANCZOS and os.environ.get("FOOTPRINTS_NATIVE_RESIZE") == "1":
            # native/ fp_image resampler: byte-exact vs PIL LANCZOS
            # (tests/test_native.py); lets PIL-free hosts run the pipeline
            from .. import native

            if native.available():
                arr = np.asarray(Image.open(path).convert("RGB"))
                out = native.resize_lanczos(arr, self.height, self.width)
                image = Image.fromarray(out)
                if do_flip:
                    image = image.transpose(method=Image.FLIP_LEFT_RIGHT)
                return image
        image = Image.open(path).resize((self.width, self.height), resample=method)
        if do_flip:
            image = image.transpose(method=Image.FLIP_LEFT_RIGHT)
        return image

    def load_and_resize_npy(self, path, do_flip, rescale=False,
                            method=cv2.INTER_NEAREST):
        npy = np.load(path).astype(np.float64)
        if npy.ndim == 3:
            npy = npy[0]
        if do_flip:
            npy = np.fliplr(npy)
        multiplier = self.width / npy.shape[1] if rescale else 1.0
        return cv2.resize(npy, (self.width, self.height), interpolation=method) * multiplier

    def filter_depth_mask(self, depth_mask):
        return filter_small_components(depth_mask, self.width * self.height / 100)

    # -- preprocessing ---------------------------------------------------------

    def draw_augmentations(self):
        """(do_flip, do_color_aug) for this sample; train-time only."""
        if not self.is_train:
            return False, False
        return bool(self._rng.random() > 0.5), bool(self._rng.random() > 0.5)

    def preprocess(self, inputs, do_color_aug):
        """Jitter + to-float + derive all_ground.  inputs['image'] is PIL."""
        image = inputs["image"]
        if do_color_aug:
            image = color_jitter(image, self._rng)
        arr = np.asarray(image, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, axis=-1)
        out = {"image": np.ascontiguousarray(arr[..., :3])}
        for key, val in inputs.items():
            if key != "image":
                out[key] = np.asarray(val, dtype=np.float32)
        out["all_ground"] = (
            (out["ground_depth"] + out["visible_ground"]) > 0
        ).astype(np.float32)
        return out
