"""Connected-component labeling (replacement for skimage.measure.label).

skimage's default 2-D connectivity is 8-connected; scipy.ndimage.label
defaults to 4-connected, so pass the full 3x3 structure to match.
"""

import numpy as np
import scipy.ndimage


_EIGHT_CONNECTED = np.ones((3, 3), dtype=bool)


def label(mask):
    """8-connected component labels (ints starting at 1; 0 = background)."""
    labeled, _ = scipy.ndimage.label(np.asarray(mask) != 0, structure=_EIGHT_CONNECTED)
    return labeled


def filter_small_components(mask, max_area):
    """Keep only connected components with area < max_area, as a 0/1 mask.

    Reference behavior (drop components >= 1% of the image):
    /root/reference/footprints/datasets/footprint_dataset.py:96-105.
    """
    mask = np.asarray(mask)
    labeled, n = scipy.ndimage.label(mask != 0, structure=_EIGHT_CONNECTED)
    if n == 0:
        return np.zeros_like(mask)
    areas = scipy.ndimage.sum_labels(np.ones_like(labeled), labeled, range(1, n + 1))
    keep = np.concatenate([[False], areas < max_area])  # index 0 = background
    return keep[labeled].astype(mask.dtype)
