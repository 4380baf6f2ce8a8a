"""RANSAC plane fitting — TPU formulation.

The reference loops 100 hypotheses in Python, estimating each plane with an
SVD (geometry.py:92-154, vendored py-ransac).  Here all hypotheses are drawn
and scored at once:

  * sample [n_iters, 3] point triplets with one PRNG call (valid points get
    uniform probability via Gumbel-top-k over the mask);
  * a plane through 3 points is the cross-product normal — no SVD needed
    (the reference's SVD nullspace of 3 augmented points is the same plane);
  * inlier scoring for all hypotheses x all points is one [I,3]x[3,P]
    matmul on the MXU;
  * argmax inlier count picks the winner.

A numpy twin (`np_fit_plane`) with identical semantics serves the CPU-side
baselines.  Degenerate samples (collinear triplets) get ~zero normals ->
inf-normalized distances -> zero inliers, matching the reference's behavior
of simply never winning.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_ITERS = 100
DEFAULT_THRESHOLD = 0.05


def _plane_from_triplet(p):
    """p [3,3] -> plane coeffs [4] (a,b,c,d) with ax+by+cz+d=0."""
    n = jnp.cross(p[1] - p[0], p[2] - p[0])
    d = -jnp.dot(n, p[0])
    return jnp.concatenate([n, d[None]])


@functools.partial(jax.jit, static_argnames=("n_iters",))
def fit_plane_masked(key, points, mask, n_iters=DEFAULT_ITERS,
                     threshold=DEFAULT_THRESHOLD):
    """Fit a plane to ``points[mask]``.

    points [P,3], mask [P] bool/float.  Returns (coeffs [4], inlier_count,
    inlier_mask [P]) like the reference fit_plane.  Static shapes: invalid
    points are excluded by weighting, not gathers.
    """
    p = points.shape[0]
    maskf = mask.astype(jnp.float32)
    # sample 3*n_iters valid indices: Gumbel trick over log-mask
    gumbel = jax.random.gumbel(key, (n_iters, 3, p))
    logits = jnp.where(maskf > 0, 0.0, -jnp.inf)
    idx = jnp.argmax(logits[None, None, :] + gumbel, axis=-1)  # [I,3]
    triplets = points[idx]  # [I,3,3]

    coeffs = jax.vmap(_plane_from_triplet)(triplets)  # [I,4]
    norms = jnp.linalg.norm(coeffs[:, :3], axis=-1, keepdims=True)
    # distances of every point to every hypothesis: one matmul
    dists = jnp.abs(
        jnp.einsum("ic,pc->ip", coeffs[:, :3], points, precision="highest")
        + coeffs[:, 3:4]
    ) / (norms + 1e-12)
    inliers = (dists < threshold) & (maskf[None, :] > 0)
    counts = inliers.sum(axis=1)
    # degenerate hypotheses (collinear/duplicate samples -> ~zero normal)
    # must never win — their "distances" are meaningless
    counts = jnp.where(norms[:, 0] > 1e-8, counts, 0)
    best = jnp.argmax(counts)
    return coeffs[best], counts[best], inliers[best]


def plane_distance(coeffs, points):
    """Signed distances of points [P,3] to plane coeffs [4]."""
    n = jnp.linalg.norm(coeffs[:3])
    return (points @ coeffs[:3] + coeffs[3]) / (n + 1e-12)


# ---------------------------------------------------------------------------
# numpy twin (host-side baselines; same hypothesis->score->argmax semantics)
# ---------------------------------------------------------------------------

def np_fit_plane(points, n_iters=DEFAULT_ITERS, threshold=DEFAULT_THRESHOLD,
                 seed=10):
    """points [P,3] -> (coeffs [4], inlier_count, inlier_mask [P])."""
    rng = np.random.RandomState(seed)
    idx = rng.randint(points.shape[0], size=(n_iters, 3))
    triplets = points[idx]
    n = np.cross(triplets[:, 1] - triplets[:, 0], triplets[:, 2] - triplets[:, 0])
    d = -np.einsum("ic,ic->i", n, triplets[:, 0])
    coeffs = np.concatenate([n, d[:, None]], axis=1)
    norms = np.linalg.norm(coeffs[:, :3], axis=-1, keepdims=True)
    dists = np.abs(coeffs[:, :3] @ points.T + coeffs[:, 3:4]) / (norms + 1e-12)
    inliers = dists < threshold
    counts = inliers.sum(axis=1)
    counts[norms[:, 0] <= 1e-8] = 0  # degenerate hypotheses never win
    best = int(np.argmax(counts))
    return coeffs[best], int(counts[best]), inliers[best]


def np_plane_distance(coeffs, points):
    n = np.linalg.norm(coeffs[:3])
    return (points @ coeffs[:3] + coeffs[3]) / (n + 1e-12)
