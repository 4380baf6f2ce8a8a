"""GT-generation geometry tests: projection roundtrips, deterministic
splatting, masked median vs np.ma.median, RANSAC plane recovery, depth-mask
and moving-object computations on synthetic scenes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from footprints_tpu.preprocessing.ground_truth_generation.geometry import (
    aggregate_hidden_depth,
    extract_depth_from_projections,
    masked_median,
    pixel_grid,
    project_to_camera,
    project_to_world,
)
from footprints_tpu.preprocessing.ground_truth_generation.processing import (
    compute_depth_mask,
    compute_moving_object_mask,
)
from footprints_tpu.preprocessing.ground_truth_generation.ransac import (
    fit_plane_masked,
    np_fit_plane,
    np_plane_distance,
    plane_distance,
)

H, W = 24, 32


def _camera():
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 20.0
    K[0, 2] = W / 2
    K[1, 2] = H / 2
    return K, np.linalg.pinv(K).astype(np.float32)


def test_project_world_roundtrip_identity():
    """Backproject then reproject with identity pose -> same pixels, depth."""
    K, invK = _camera()
    rng = np.random.RandomState(0)
    depth = (rng.rand(1, H, W).astype(np.float32) * 10 + 1)
    world = project_to_world(jnp.asarray(depth), jnp.asarray(invK[None]))
    assert world.shape == (1, 4, H * W)
    assert np.asarray(world[0, 3]).min() == 1  # all valid

    cam = project_to_camera(world, jnp.eye(4)[None], jnp.asarray(K[None]))
    grid = np.asarray(pixel_grid(H, W))
    np.testing.assert_allclose(np.asarray(cam[0, 0]), grid[0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(cam[0, 1]), grid[1], atol=1e-3)
    np.testing.assert_allclose(np.asarray(cam[0, 2]),
                               depth.reshape(-1), rtol=1e-5)


def test_splat_deterministic_min():
    """Duplicate targets resolve to the MINIMUM depth (z-buffer)."""
    cam_pix = np.zeros((1, 4, 3), np.float32)
    # two points landing on pixel (2,3) with depths 7 and 4; one at (5,6)
    cam_pix[0, :, 0] = [3.2, 2.7, 7.0, 1.0]
    cam_pix[0, :, 1] = [3.4, 2.1, 4.0, 1.0]
    cam_pix[0, :, 2] = [6.5, 5.5, 9.0, 1.0]
    out = np.asarray(extract_depth_from_projections(jnp.asarray(cam_pix), H, W))
    assert out[0, 2, 3] == 4.0
    assert out[0, 5, 6] == 9.0
    assert out.sum() == 13.0


def test_splat_sort_formulation_matches_scatter():
    """The sort-based splat == the scatter-min reference formulation on a
    dense random point cloud with many duplicate targets."""
    from footprints_tpu.preprocessing.ground_truth_generation.geometry import (
        _splat_one, _splat_one_scatter)

    rng = np.random.RandomState(0)
    cam = rng.rand(4, 5000).astype(np.float32)
    cam[0] *= W + 2   # include out-of-bounds
    cam[1] *= H + 2
    cam[2] = cam[2] * 30 - 1  # include negative depths
    cam[3] = (rng.rand(5000) > 0.1).astype(np.float32)
    a = np.asarray(_splat_one_scatter(jnp.asarray(cam), H, W))
    b = np.asarray(_splat_one(jnp.asarray(cam), H, W))
    np.testing.assert_array_equal(a, b)


def test_splat_ignores_invalid():
    cam_pix = np.zeros((1, 4, 4), np.float32)
    cam_pix[0, :, 0] = [-1.0, 2.0, 5.0, 1.0]   # x out of bounds
    cam_pix[0, :, 1] = [2.0, 2.0, -5.0, 1.0]   # negative depth
    cam_pix[0, :, 2] = [2.0, 2.0, 5.0, 0.0]    # invalid flag
    cam_pix[0, :, 3] = [W + 3, 2.0, 5.0, 1.0]  # x out of bounds high
    out = np.asarray(extract_depth_from_projections(jnp.asarray(cam_pix), H, W))
    assert out.sum() == 0


def test_masked_median_matches_numpy_ma():
    rng = np.random.RandomState(1)
    proj = rng.rand(7, 5, 6).astype(np.float32) * 10
    proj[proj < 4] = 0  # sparse hits
    ref = np.ma.median(np.ma.MaskedArray(proj, mask=proj == 0), axis=0).filled(0)
    got = np.asarray(masked_median(jnp.asarray(proj), min_hits=0))
    np.testing.assert_allclose(got, ref, atol=1e-6)

    # robust variant: <=2 hits -> 0
    mask = (proj > 0).sum(0) > 2
    ref_robust = np.ma.median(
        np.ma.MaskedArray(proj * mask, mask=(proj * mask) == 0), axis=0).filled(0)
    got_robust = np.asarray(masked_median(jnp.asarray(proj), min_hits=2))
    np.testing.assert_allclose(got_robust, ref_robust, atol=1e-6)


def test_aggregate_identity_reproduces_depth():
    """One frame, identity pose: aggregation returns the input depth map
    (strictly interior pixels; border pixels are dropped by the >0 check)."""
    K, invK = _camera()
    rng = np.random.RandomState(2)
    depth = (rng.rand(1, H, W).astype(np.float32) * 5 + 2)
    out = np.asarray(aggregate_hidden_depth(
        jnp.asarray(depth), jnp.eye(4)[None], jnp.asarray(K[None]),
        jnp.asarray(invK[None]), height=H, width=W, robust=False))
    np.testing.assert_allclose(out[1:, 1:], depth[0, 1:, 1:], rtol=1e-4)


def test_aggregate_translated_frame():
    """A frame shifted +1px in x (via pose) lands its depths one pixel over."""
    K, invK = _camera()
    depth = np.full((1, H, W), 10.0, np.float32)
    # translate camera so projection shifts: x' = fx*(X+dx)/Z = x + fx*dx/Z
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 10.0 / K[0, 0]  # fx*dx/Z = 20*(10/20)/10 = 1 px
    out = np.asarray(aggregate_hidden_depth(
        jnp.asarray(depth), jnp.asarray(T[None]), jnp.asarray(K[None]),
        jnp.asarray(invK[None]), height=H, width=W, robust=False))
    # interior: depth present (shifted by one pixel, value unchanged)
    assert out[5, 5] == pytest.approx(10.0, rel=1e-5)
    # first column never receives a projection (x' >= 1)
    assert out[:, 0].sum() == 0


def test_ransac_recovers_plane_jnp_and_numpy():
    rng = np.random.RandomState(3)
    n = 500
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.rand(n) * 10
    pts[:, 2] = rng.rand(n) * 10
    pts[:, 1] = 1.5 + rng.randn(n) * 0.01  # y = 1.5 plane
    outliers = rng.rand(100, 3).astype(np.float32) * 10
    data = np.concatenate([pts, outliers])

    coeffs, count, inl = np_fit_plane(data)
    normal = coeffs[:3] / np.linalg.norm(coeffs[:3])
    assert abs(abs(normal[1]) - 1) < 0.05
    assert count > 400

    mask = np.ones(len(data), bool)
    jc, jcount, jinl = fit_plane_masked(jax.random.PRNGKey(0),
                                        jnp.asarray(data), jnp.asarray(mask))
    jn = np.asarray(jc[:3]) / np.linalg.norm(np.asarray(jc[:3]))
    assert abs(abs(jn[1]) - 1) < 0.05
    assert int(jcount) > 400
    # plane distances consistent between twins
    d_np = np_plane_distance(np.asarray(jc), data[:5])
    d_j = np.asarray(plane_distance(jc, jnp.asarray(data[:5])))
    np.testing.assert_allclose(d_j, d_np, atol=1e-5)


def test_ransac_respects_mask():
    """Points excluded by the mask must not drive the fit."""
    rng = np.random.RandomState(4)
    plane_pts = np.stack([rng.rand(200) * 5, np.full(200, 2.0),
                          rng.rand(200) * 5], 1).astype(np.float32)
    decoy = np.stack([rng.rand(200) * 5, rng.rand(200) * 5,
                      np.full(200, 0.1)], 1).astype(np.float32)
    data = np.concatenate([plane_pts, decoy])
    mask = np.zeros(400, bool)
    mask[:200] = True
    coeffs, count, _ = fit_plane_masked(jax.random.PRNGKey(1),
                                        jnp.asarray(data), jnp.asarray(mask))
    normal = np.asarray(coeffs[:3]) / np.linalg.norm(np.asarray(coeffs[:3]))
    assert abs(abs(normal[1]) - 1) < 0.05  # fit the y=2 plane, not the decoy


def test_moving_object_mask():
    K, invK = _camera()
    depth = np.full((H, W), 8.0, np.float32)
    # static camera: induced flow zero; observed flow zero -> nothing moving
    flow = np.zeros((2, H, W), np.float32)
    mask = np.asarray(compute_moving_object_mask(
        jnp.asarray(depth), jnp.eye(4), jnp.asarray(K), jnp.asarray(invK),
        jnp.asarray(flow), height=H, width=W))
    assert mask.sum() == 0
    # a blob with 5px observed flow that geometry can't explain -> moving
    flow[0, 10:14, 10:14] = 5.0
    mask = np.asarray(compute_moving_object_mask(
        jnp.asarray(depth), jnp.eye(4), jnp.asarray(K), jnp.asarray(invK),
        jnp.asarray(flow), height=H, width=W))
    assert mask[11, 11]
    assert mask.sum() == 16


def test_compute_depth_mask_wall_scene():
    """Flat ground + frontal wall: wall base pixels (splat depth agrees with
    visible depth) are flagged untraversable; ground is not."""
    K, invK = _camera()
    fy, cy = K[1, 1], K[1, 2]
    cam_h = 1.5
    depth = np.zeros((H, W), np.float32)
    ground_seg = np.zeros((H, W), np.float32)
    wall_z = 6.0
    for y in range(H):
        if y > cy:
            z = fy * cam_h / (y - cy)  # ground plane depth
            if z > wall_z:
                depth[y, :] = wall_z
            else:
                depth[y, :] = z
                ground_seg[y, :] = 1.0
        else:
            depth[y, :] = wall_z  # wall above horizon
    mask = np.asarray(compute_depth_mask(
        jax.random.PRNGKey(0), jnp.asarray(depth), jnp.asarray(ground_seg),
        jnp.asarray(K), jnp.asarray(invK), height=H, width=W))
    # ground pixels never flagged (ground_seg >= 0.5 excluded)
    assert (mask * (ground_seg > 0.5)).sum() == 0
    # some wall pixels at the wall/ground junction are flagged
    assert mask.sum() > 0


def test_moving_object_mask_invalid_depth_never_moving():
    """Pixels with invalid (0) depth must not be flagged moving (reference:
    inf depth -> nan induced flow -> fails the >3px test)."""
    K, invK = _camera()
    depth = np.full((H, W), 8.0, np.float32)
    depth[5:9, 5:9] = 0.0  # stereo-matching dropout
    flow = np.zeros((2, H, W), np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.5  # moving camera: invalid pixels get garbage induced flow
    mask = np.asarray(compute_moving_object_mask(
        jnp.asarray(depth), jnp.asarray(T), jnp.asarray(K), jnp.asarray(invK),
        jnp.asarray(flow), height=H, width=W))
    assert mask[5:9, 5:9].sum() == 0


def test_compute_depth_mask_degenerate_plane_fit_empty():
    """All ground pixels in depth holes -> under-determined plane fit must
    yield the safe all-False mask, not flag every non-ground pixel."""
    K, invK = _camera()
    depth = np.full((H, W), 8.0, np.float32)
    ground_seg = np.zeros((H, W), np.float32)
    ground_seg[H // 2:, :] = 1.0
    depth[H // 2:, :] = 0.0  # every ground pixel invalid
    mask = np.asarray(compute_depth_mask(
        jax.random.PRNGKey(0), jnp.asarray(depth), jnp.asarray(ground_seg),
        jnp.asarray(K), jnp.asarray(invK), height=H, width=W))
    assert mask.sum() == 0
