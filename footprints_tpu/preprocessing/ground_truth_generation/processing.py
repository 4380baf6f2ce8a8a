"""Per-frame GT computations, compiled end-to-end on device.

Reference behavior:
  * compute_depth_mask (ground_truth_generator.py:70-122): RANSAC-fit the
    ground plane, flatten non-ground points onto it, splat each as an 8x8
    grid of points +-0.1 m on the plane, reproject, and keep pixels whose
    splat depth is within 10% of the visible depth and < 30 m;
  * moving objects (ground_truth_generator.py:283-318): induced flow from
    depth + relative pose vs observed optical flow; moving where the
    difference exceeds 3 px.

All static shapes: point subsets are expressed as validity flags through the
splat, never as gathers.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import (
    extract_depth_from_projections,
    pixel_grid,
    project_to_camera,
    project_to_world,
)
from .ransac import fit_plane_masked, plane_distance

# numpy on purpose: creating a jnp array at import time would initialize the
# default JAX backend before CLIs get a chance to select a platform
SPLAT_OFFSETS = np.arange(-0.1, 0.1, 0.025, dtype=np.float32)  # 8 per axis
MAX_MASK_DEPTH = 30.0
DEPTH_AGREEMENT = 0.10
FLOW_THRESHOLD = 3.0


@functools.partial(jax.jit, static_argnames=("height", "width"))
def compute_depth_mask(key, depth, ground_seg, K, invK, *, height, width,
                       footprint_threshold=0.75):
    """Untraversable-pixel ("definitely not ground") mask [H,W] (bool)."""
    ground_pix = (ground_seg > footprint_threshold).reshape(-1)

    world4 = project_to_world(depth[None], invK[None])[0]  # [4,P]
    world = world4[:3].T  # [P,3]
    valid_depth = world4[3] > 0

    fit_mask = ground_pix & valid_depth
    coeffs, _, _ = fit_plane_masked(key, world, fit_mask)
    normal = coeffs[:3] / (jnp.linalg.norm(coeffs[:3]) + 1e-12)
    dists = plane_distance(coeffs, world)
    flattened = world - normal[None, :] * dists[:, None]

    # two in-plane axes for the splat grid
    v1 = jnp.cross(normal, jnp.array([0.0, 0.0, 1.0]))
    v2 = jnp.cross(normal, v1)

    d1, d2 = jnp.meshgrid(SPLAT_OFFSETS, SPLAT_OFFSETS, indexing="ij")
    offsets = (d1.reshape(-1, 1) * v1[None] + d2.reshape(-1, 1) * v2[None])
    # [64, P, 3] -> [3, 64*P]
    pts = (flattened[None, :, :] + offsets[:, None, :]).reshape(-1, 3).T

    # only non-ground, valid-depth source pixels may splat
    src_valid = ((~ground_pix) & valid_depth).astype(pts.dtype)
    valid = jnp.tile(src_valid, offsets.shape[0])
    world_pts = jnp.concatenate([pts, valid[None, :]], axis=0)[None]  # [1,4,64P]

    eye = jnp.eye(4, dtype=pts.dtype)[None]
    cam = project_to_camera(world_pts, eye, K[None])
    projection = extract_depth_from_projections(cam, height, width)[0]

    mask = (
        (projection > 0)
        & (ground_seg < 0.5)
        & (jnp.abs(projection - depth) / (depth + 1e-7) < DEPTH_AGREEMENT)
        & (projection < MAX_MASK_DEPTH)
        & (depth > 0)
    )
    # under-determined plane (all ground pixels in depth holes): a garbage
    # fit flattens points onto themselves, projection==depth passes the
    # agreement test, and nearly every non-ground pixel would be flagged
    # untraversable — return the safe all-False mask instead (the reference
    # crashed loudly on this input; an empty mask matches its "skip frame"
    # convention for <100 ground px)
    return mask & (jnp.sum(fit_mask) >= 3)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def compute_moving_object_mask(depth, T, K, invK, flow, *, height, width):
    """Moving-object mask [H,W]: induced flow vs observed flow > 3 px."""
    world = project_to_world(depth[None], invK[None])
    cam = project_to_camera(world, T[None], K[None])
    grid = pixel_grid(height, width)
    induced = cam[0, :2] - grid[:2]  # [2, P]
    diff = induced.reshape(2, height, width) - flow
    moving = jnp.sqrt(diff[0] ** 2 + diff[1] ** 2) > FLOW_THRESHOLD
    # invalid depth (0) projects to garbage induced flow; the reference's
    # inf depth made the flow nan, which failed the >3px test -> not moving
    return moving & (depth > 0)
