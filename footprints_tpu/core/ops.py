"""Pure numeric primitives shared across the framework.

These are written against the ``jax.numpy`` API but accept plain numpy arrays
too (jnp promotes them), so the same function serves the jitted device path
and the host-side eval harness.

Behavioral contract follows the reference semantics
(/root/reference/footprints/utils.py:27-48): the network's depth channels are
"sigmoid disparities" in [0, 1] mapped affinely onto [1/max_depth, 1/min_depth]
and inverted to metric depth.
"""

import jax.numpy as jnp
import numpy as np


def sigmoid_to_depth(disp, min_depth: float = 0.1, max_depth: float = 100.0):
    """Convert a sigmoid-disparity map in [0, 1] to metric depth.

    depth = 1 / (1/max_depth + (1/min_depth - 1/max_depth) * disp)
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return 1.0 / scaled_disp


def depth_to_disp(depth):
    """Inverse depth with zero-depth pixels mapped to zero disparity."""
    mask = (depth > 0).astype(jnp.result_type(depth, jnp.float32))
    return mask / (depth + 1e-7)


def pixel_disp_to_depth(disp, focal_length: float, baseline: float):
    """Stereo pixel disparity -> metric depth, zero/negative-safe.

    Pixels with disparity 0 produce depth 0 (guard against division by zero);
    negative depths are clamped to 0.  Reference behavior:
    /root/reference/footprints/utils.py:27-33.
    """
    safe = disp - (disp == 0)  # 0-disparity -> -1 denominator -> negative depth
    depth = focal_length * baseline / safe
    return jnp.where(depth < 0, 0.0, depth)


def normalise_image(img):
    """Min-max normalize an image array to [0, 1] for visualization."""
    img = jnp.asarray(img)
    lo = img.min()
    hi = img.max()
    return (img - lo) / (hi - lo + 1e-7)


# Numpy twins for host-side code paths that must not touch JAX (e.g. the
# offline eval harness and data loaders running in prefetch threads).

def np_sigmoid_to_depth(disp, min_depth: float = 0.1, max_depth: float = 100.0):
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    return 1.0 / (min_disp + (max_disp - min_disp) * np.asarray(disp))


def np_pixel_disp_to_depth(disp, focal_length: float, baseline: float):
    disp = np.asarray(disp)
    safe = disp - (disp == 0)
    depth = focal_length * baseline / safe
    depth[depth < 0] = 0
    return depth
