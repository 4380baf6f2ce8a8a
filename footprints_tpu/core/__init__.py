from .ops import (
    sigmoid_to_depth,
    depth_to_disp,
    pixel_disp_to_depth,
    normalise_image,
)
from .config import load_config, readlines

__all__ = [
    "sigmoid_to_depth",
    "depth_to_disp",
    "pixel_disp_to_depth",
    "normalise_image",
    "load_config",
    "readlines",
]
