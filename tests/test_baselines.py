"""Baseline tests: geometry twins, frame predictors on synthetic inputs, and
the RANSAC plane-inpainting depth path."""

import numpy as np
import pytest

from footprints_tpu.baselines.footprint_baseline import (
    ConvexHull,
    RansacPlane,
    VisibleGround,
)
from footprints_tpu.baselines.geometry import BackprojectDepth, Project3D, generate_camera_rays
from footprints_tpu.baselines.prepare_test_data import KittiTestLoader

H, W = 48, 64


def _camera():
    K = np.eye(3)
    K[0, 0] = K[1, 1] = 40.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    return K, np.linalg.pinv(K)


def _make_predictor(cls, **kwargs):
    """Instantiate a baseline with a stub loader (no disk access)."""
    loader = KittiTestLoader(download=False, gt_dir="/nonexistent")
    return cls.__new__(cls), loader


def _pad_K(K3):
    K4 = np.eye(4)
    K4[:3, :3] = K3
    return K4


def test_backproject_project_roundtrip():
    K, inv_K = _camera()
    rng = np.random.RandomState(0)
    depth = rng.rand(H, W) * 10 + 1
    xyz = BackprojectDepth(H, W)(depth, inv_K)
    assert xyz.shape == (H * W, 3)
    pix = Project3D(H, W)(np.concatenate([xyz.T, np.ones((1, H * W))]),
                          _pad_K(K), np.eye(4))
    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    np.testing.assert_allclose(pix[0].reshape(H, W), xs, atol=1e-4)
    np.testing.assert_allclose(pix[1].reshape(H, W), ys, atol=1e-4)


def test_camera_rays_unit_z():
    K, inv_K = _camera()
    rays = generate_camera_rays(H, W, inv_K)
    assert rays.shape == (3, H * W)
    np.testing.assert_allclose(rays[2], 1.0, atol=1e-9)


def test_visible_ground_predictor():
    vg = VisibleGround.__new__(VisibleGround)
    mask, depth = vg.frame_predict(
        {"visible_ground": np.array([[0.0, 0.5], [0.05, 0.9]])})
    np.testing.assert_array_equal(mask, [[False, True], [False, True]])
    assert depth is None


def test_convex_hull_predictor():
    ch = ConvexHull.__new__(ConvexHull)
    vis = np.zeros((20, 20))
    vis[5, 5] = vis[5, 15] = vis[15, 5] = vis[15, 15] = 1.0
    mask, _ = ch.frame_predict({"visible_ground": vis})
    assert mask[10, 10]  # interior of the hull filled
    assert not mask[1, 1]


def test_ransac_plane_inpaint_recovers_plane_depth():
    """Scene = ground plane at height 1.5 + a box; inpainted depth should
    equal the pure plane depth everywhere (box removed)."""
    K, inv_K = _camera()
    fy, cy = K[1, 1], K[1, 2]
    cam_h = 1.5
    depth = np.zeros((H, W))
    plane_depth = np.zeros((H, W))
    visible = np.zeros((H, W), bool)
    for y in range(H):
        z = fy * cam_h / (y - cy) if y > cy else 1e3
        z = min(z, 40.0)
        plane_depth[y, :] = z
        depth[y, :] = z
        if y > cy and z < 40:
            visible[y, :] = True
    # a box sticking out of the ground
    depth[20:35, 30:40] = 5.0
    visible[20:35, 30:40] = False

    rp = RansacPlane.__new__(RansacPlane)
    out, _ = rp.frame_predict(
        {"visible_ground": visible.astype(float), "depth": depth,
         "inv_K": inv_K})
    # on visible ground, inpainted == original
    err_ground = np.abs(out - plane_depth)[visible]
    assert np.median(err_ground) < 0.1
    # inside the box region, inpainted ~ plane depth, not box depth
    region = np.abs(out - plane_depth)[25:33, 32:38]
    assert np.median(region) < 1.0


def test_ransac_plane_too_few_ground_pixels_passthrough():
    rp = RansacPlane.__new__(RansacPlane)
    depth = np.ones((H, W))
    out, out_d = rp.frame_predict(
        {"visible_ground": np.zeros((H, W)), "depth": depth, "inv_K": np.eye(3)})
    np.testing.assert_array_equal(out, depth)


def test_matterport_loader_dataset_root_error_is_clear(tmp_path):
    """ransac baselines need intrinsics: unresolvable dataset_root must give
    a clear error, not TypeError on os.path.join(None, ...)."""
    import os

    import pytest

    from footprints_tpu.baselines.prepare_test_data import MatterportTestLoader

    loader = MatterportTestLoader(download=False)
    cwd = os.getcwd()
    os.chdir(tmp_path)  # no paths.yaml here
    try:
        with pytest.raises(ValueError, match="dataset_root"):
            loader._resolve_dataset_root()
    finally:
        os.chdir(cwd)


def test_loaders_do_not_download_gt_unless_accessed(monkeypatch):
    """Prediction-only baselines never touch GT: constructing a loader must
    not attempt the (egress-blocked) ground-truth download."""
    from footprints_tpu.baselines import prepare_test_data as ptd

    def boom(*a, **k):
        raise AssertionError("GT download triggered eagerly")

    monkeypatch.setattr(ptd, "download_ground_truths_if_dont_exist", boom)
    kl = ptd.KittiTestLoader()  # must not raise
    ml = ptd.MatterportTestLoader()
    # first gt_dir access triggers the (stubbed) download
    import pytest

    with pytest.raises(AssertionError):
        _ = kl.gt_dir
    with pytest.raises(AssertionError):
        _ = ml.gt_dir
    # explicit gt_dir bypasses downloads entirely
    assert ptd.KittiTestLoader(gt_dir="/x").gt_dir == "/x"
