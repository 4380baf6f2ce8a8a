"""Batched projective geometry for GT generation — jnp, fully batched.

Reference behavior (/root/reference/footprints/preprocessing/
ground_truth_generation/geometry.py:11-63):
  * project_to_world: backproject pixel grid by depth through invK; the 4th
    homogeneous coord carries the validity mask (depth > 0)
  * project_to_camera: K @ T @ X with xy normalized by z
  * extract_depth_from_projections: point-splat scatter of z into the image
    — the reference loops over frames in Python and uses last-write-wins
    with unspecified order (nondeterministic on duplicate targets)

TPU-first redesign:
  * all matmuls are einsums over the whole frame batch (MXU);
  * the splat is a vmapped scatter-MIN (z-buffer semantics): deterministic,
    and physically the right choice (closest surface wins).  The downstream
    median over >2-frame agreement makes results insensitive to the
    difference — documented deviation from the reference;
  * frame batches are static-shaped with a validity weight per frame
    (missing frames contribute nothing) so one compiled executable serves
    every target frame.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pixel_grid(height, width):
    """[3, H*W] homogeneous pixel coordinates (x, y, 1)."""
    x, y = np.meshgrid(np.arange(width), np.arange(height))
    return jnp.asarray(
        np.stack([x, y, np.ones_like(x)]).reshape(3, -1), jnp.float32)


def project_to_world(depth, invK, grid=None):
    """depth [N,H,W], invK [N,4,4] -> world points [N,4,H*W].

    4th row is the validity mask (depth > 0).
    """
    n, h, w = depth.shape
    if grid is None:
        grid = pixel_grid(h, w)
    rays = jnp.einsum("nij,jp->nip", invK[:, :3, :3], grid,
                      precision="highest")
    pts = rays * depth.reshape(n, 1, -1)
    valid = (depth.reshape(n, -1) > 0).astype(pts.dtype)
    return jnp.concatenate([pts, valid[:, None, :]], axis=1)


def project_to_camera(world_points, T, K):
    """world [N,4,P], T [N,4,4], K [N,4,4] -> cam pix [N,4,P].

    Row 0-1: pixel xy (z-normalized); row 2: depth z; row 3: validity.
    """
    cam = jnp.einsum("nij,njp->nip", K, jnp.einsum("nij,njp->nip", T,
                                                   world_points,
                                                   precision="highest"),
                     precision="highest")
    z = cam[:, 2:3]
    xy = cam[:, :2] / (z + 1e-7)
    return jnp.concatenate([xy, cam[:, 2:]], axis=1)


def _splat_keys(cam_pix, height, width):
    """[4,P] -> (flat pixel index [P] with invalid -> H*W, depth [P])."""
    x, y, z = cam_pix[0], cam_pix[1], cam_pix[2]
    valid = (
        (x > 0) & (x < width) & (y > 0) & (y < height)
        & (z > 0) & (cam_pix[3] > 0)
    )
    # truncation like the reference's .long(), with a 1e-3 snap guard so
    # projections within fp-noise of an exact pixel land on it
    xi = jnp.clip(jnp.floor(x + 1e-3).astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(jnp.floor(y + 1e-3).astype(jnp.int32), 0, height - 1)
    flat_idx = jnp.where(valid, yi * width + xi, height * width)
    return flat_idx, z


def _splat_one_scatter(cam_pix, height, width):
    """Reference formulation: scatter-min z-buffer.  Kept as the semantic
    spec; XLA serializes TPU scatters (~98 ms/frame at 76x192x640)."""
    n_pix = height * width
    flat_idx, z = _splat_keys(cam_pix, height, width)
    z_or_inf = jnp.where(flat_idx < n_pix, z, jnp.inf)
    out = jnp.full((n_pix + 1,), jnp.inf, z.dtype)
    out = out.at[flat_idx].min(z_or_inf, mode="drop")
    out = jnp.where(jnp.isinf(out), 0.0, out)
    return out[:n_pix].reshape(height, width)


def _splat_one(cam_pix, height, width):
    """[4,P] -> [H,W] min-depth image, sort-based (TPU-friendly).

    Sorting (pixel_key, z) ascending makes the first entry of each key run
    the per-pixel minimum; a unique-index scatter-set places it.  Identical
    output to _splat_one_scatter (tested) at ~1.3x the speed — TPU scatters
    with duplicate indices serialize, unique-index set is cheaper and the
    sort vectorizes.
    """
    n_pix = height * width
    flat_idx, z = _splat_keys(cam_pix, height, width)
    ks, zs = jax.lax.sort((flat_idx, z), num_keys=2)
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    tgt = jnp.where(first & (ks < n_pix), ks, n_pix)
    # out is sized n_pix so the n_pix sentinel (every non-first duplicate
    # and every invalid point) is genuinely out of bounds: mode="drop"
    # discards those writes and the REMAINING indices really are unique —
    # an (n_pix+1)-slot buffer would instead scatter many in-bounds
    # duplicates into the spare slot while promising unique_indices
    # (undefined behavior per the scatter contract)
    out = jnp.zeros((n_pix,), z.dtype)
    out = out.at[tgt].set(zs, mode="drop", unique_indices=True)
    return out.reshape(height, width)


def extract_depth_from_projections(cam_pix, height, width):
    """[N,4,P] -> [N,H,W] splatted depth images (deterministic min-z)."""
    return jax.vmap(_splat_one, in_axes=(0, None, None))(cam_pix, height, width)


def masked_median(projections, min_hits=0):
    """Median over frames of positive entries per pixel (np.ma.median
    equivalent); pixels hit by <= min_hits frames -> 0 when min_hits > 0.

    projections: [N,H,W].  Implemented as a sort with +inf padding and a
    gather at the per-pixel middle rank — static shapes, no host sync.
    """
    n = projections.shape[0]
    pos = projections > 0
    counts = pos.sum(axis=0)
    vals = jnp.where(pos, projections, jnp.inf)
    vals = jnp.sort(vals, axis=0)
    # per-pixel median of the first k entries
    k = counts
    lo_idx = jnp.maximum((k - 1) // 2, 0)
    hi_idx = jnp.maximum(k // 2, 0)
    lo = jnp.take_along_axis(vals, lo_idx[None], axis=0)[0]
    hi = jnp.take_along_axis(vals, hi_idx[None], axis=0)[0]
    med = 0.5 * (lo + hi)
    med = jnp.where(k > 0, med, 0.0)
    med = jnp.where(jnp.isinf(med), 0.0, med)
    if min_hits > 0:
        med = jnp.where(counts > min_hits, med, 0.0)
    return med


@functools.partial(jax.jit, static_argnames=("height", "width", "robust"))
def aggregate_hidden_depth(depths, poses, K, invK, *, height, width,
                           robust=True):
    """Full hidden-depth pipeline for one target frame, compiled end-to-end.

    depths [N,H,W] (already masked to ground pixels; invalid frames all-zero),
    poses [N,4,4] (relative to the target camera), K/invK [N,4,4].
    Returns the median-aggregated hidden ground depth [H,W].
    Reference flow: ground_truth_generator.py:124-142.
    """
    world = project_to_world(depths, invK)
    cam = project_to_camera(world, poses, K)
    projections = extract_depth_from_projections(cam, height, width)
    return masked_median(projections, min_hits=2 if robust else 0)
