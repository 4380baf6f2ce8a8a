"""Unit tests for the GT-generation host loaders (window/buffer/purge
semantics, disparity/flow rescaling, intrinsics handling) — behavior
parity with reference preprocessing/ground_truth_generation/data_loader.py
(KITTI window :79-80, buffer :59/:116-121/:176-179, matterport scan cache
:254-290).  Previously exercised only through the generator e2e tests.
"""

import os

import numpy as np
import pytest
from PIL import Image

from footprints_tpu.preprocessing.ground_truth_generation.data_loader import (
    KITTILoader,
    MatterportLoader,
)

H, W = 8, 12
SEQ = "seq0"


def _write_kitti_frame(td, frame, sides=("image_02", "image_03"),
                       disp_value=5.0, seg_value=1.0, flow=None):
    f = str(frame).zfill(10)
    rng_shape = (6, 20)  # raw shapes differ from loader target (H, W)
    for side in sides:
        d = os.path.join(td, "stereo_matching_disps", SEQ, side)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, f + ".npy"),
                np.full(rng_shape, disp_value, np.float32))
        g = os.path.join(td, "ground_seg", SEQ, side, "data")
        os.makedirs(g, exist_ok=True)
        np.save(os.path.join(g, f + ".npy"),
                np.full((1,) + rng_shape, seg_value, np.float32))
        if flow is not None:
            fl = os.path.join(td, "optical_flow", SEQ, side, "data")
            os.makedirs(fl, exist_ok=True)
            np.save(os.path.join(fl, f + ".npy"), flow)
    p = os.path.join(td, "poses", SEQ, "orbslam_poses")
    os.makedirs(p, exist_ok=True)
    pose = np.eye(4)[:3]
    pose[0, 3] = frame  # distinguishable translation
    np.save(os.path.join(p, f + ".npy"), pose.astype(np.float32))


@pytest.fixture
def kitti_tree(tmp_path):
    td = str(tmp_path / "training_data")
    for frame in (0, 2, 4):
        _write_kitti_frame(td, frame)
    return td


def test_kitti_window_skips_missing_frames(kitti_tree):
    loader = KITTILoader("", kitti_tree, H, W,
                         num_frames_bwd=2, num_frames_fwd=4)
    # window for frame 2: range(0, 6, 2) = frames {0, 2, 4} x both sides
    data = loader.load_data(SEQ, 2)
    assert data["depths"].shape == (6, H, W)
    assert data["sides"] == ["image_02", "image_03"] * 3
    assert loader.max_window_frames == 6

    # window for frame 4: frames {2, 4, 6(missing), ...} -> only 2 and 4
    loader.purge_buffer()
    data = loader.load_data(SEQ, 4)
    assert data["depths"].shape == (4, H, W)
    assert data["poses"][0, 0, 3] == 2  # pose of frame 2 first


def test_kitti_disparity_rescale_and_depth(kitti_tree):
    loader = KITTILoader("", kitti_tree, H, W,
                         num_frames_bwd=2, num_frames_fwd=4)
    data = loader.load_data(SEQ, 2)
    # disp 5.0 at raw width 20 -> x (W/20) after rescale; depth = fx*B/disp
    disp = 5.0 * (W / 20.0)
    want_depth = (0.58 * W) * 0.54 / disp
    np.testing.assert_allclose(data["depths"], want_depth, rtol=1e-5)
    # ground seg 1.0 > 0.75 -> 1.0 everywhere
    assert (data["ground_segs"] == 1.0).all()
    # intrinsics tiled per frame
    assert data["intrinsics"].shape == (6, 4, 4)
    np.testing.assert_allclose(data["intrinsics"][0, 0, 0], 0.58 * W)


def test_kitti_nonpositive_disparity_gives_zero_depth(tmp_path):
    td = str(tmp_path / "training_data")
    _write_kitti_frame(td, 0, disp_value=0.0)
    loader = KITTILoader("", td, H, W, num_frames_bwd=0, num_frames_fwd=2)
    data = loader.load_data(SEQ, 0)
    assert (data["depths"] == 0.0).all()


def test_kitti_buffer_caches_until_purged(kitti_tree):
    loader = KITTILoader("", kitti_tree, H, W,
                         num_frames_bwd=2, num_frames_fwd=4)
    first = loader.load_frame_data(SEQ, 2, "image_02")
    assert first is not None
    # rewrite the frame on disk with a different disparity
    _write_kitti_frame(kitti_tree, 2, disp_value=50.0)
    cached = loader.load_frame_data(SEQ, 2, "image_02")
    np.testing.assert_array_equal(cached["disparity"], first["disparity"])
    loader.purge_buffer()
    fresh = loader.load_frame_data(SEQ, 2, "image_02")
    assert fresh["disparity"].max() > first["disparity"].max() * 5


def test_kitti_flow_rescaled_by_axis_ratio(tmp_path):
    td = str(tmp_path / "training_data")
    flow = np.ones((2, 6, 20), np.float32)  # raw (2, h=6, w=20)
    _write_kitti_frame(td, 0, flow=flow)
    loader = KITTILoader("", td, H, W, num_frames_bwd=0, num_frames_fwd=2)
    data = loader.load_frame_data(SEQ, 0, "image_02", load_flow=True,
                                  use_buffer=False)
    np.testing.assert_allclose(data["flow"][0], W / 20.0, rtol=1e-6)
    np.testing.assert_allclose(data["flow"][1], H / 6.0, rtol=1e-6)


# --- matterport --------------------------------------------------------------

def _write_matterport_frame(raw, td, scan, pos, h, d, depth_value=4000,
                            fx=1000.0):
    scan_path = os.path.join(raw, scan, scan)
    g = os.path.join(td, "ground_seg", scan, "data")
    os.makedirs(g, exist_ok=True)
    np.save(os.path.join(g, f"{pos}_{h}_{d}.npy"),
            np.ones((1, 16, 24), np.float32))
    dd = os.path.join(scan_path, "matterport_depth_images")
    os.makedirs(dd, exist_ok=True)
    Image.fromarray(np.full((16, 24), depth_value, np.uint16)).save(
        os.path.join(dd, f"{pos}_d{h}_{d}.png"))
    pp = os.path.join(scan_path, "matterport_camera_poses")
    os.makedirs(pp, exist_ok=True)
    with open(os.path.join(pp, f"{pos}_pose_{h}_{d}.txt"), "w") as fh:
        fh.write(" ".join(str(v) for v in np.eye(4).ravel()))
    ii = os.path.join(scan_path, "matterport_camera_intrinsics")
    os.makedirs(ii, exist_ok=True)
    with open(os.path.join(ii, f"{pos}_intrinsics_{h}.txt"), "w") as fh:
        fh.write(f"1280 1024 {fx} 900.0 640.0 512.0")


def test_matterport_scan_cache_and_intrinsics(tmp_path):
    raw, td = str(tmp_path / "raw"), str(tmp_path / "td")
    _write_matterport_frame(raw, td, "scanA", "p0", 1, 0)
    _write_matterport_frame(raw, td, "scanA", "p1", 1, 0)
    _write_matterport_frame(raw, td, "scanB", "q0", 2, 3, depth_value=8000)

    loader = MatterportLoader(raw, td, H, W)
    data = loader.load_data("scanA", "p0", 1, 0)
    assert data["depths"].shape == (2, H, W)
    np.testing.assert_allclose(data["depths"], 4000 * 0.00025)
    # intrinsics rescaled from the 1280x1024 calibration resolution
    np.testing.assert_allclose(data["intrinsics"][0, 0, 0], 1000.0 * W / 1280.0)
    np.testing.assert_allclose(data["intrinsics"][0, 1, 1], 900.0 * H / 1024.0)
    assert set(loader.pose_tracker) == {("p0", "1", "0"), ("p1", "1", "0")}

    # same scan -> cached (disk mutation invisible)
    _write_matterport_frame(raw, td, "scanA", "p0", 1, 0, depth_value=1)
    again = loader.load_data("scanA", "p1", 1, 0)
    np.testing.assert_array_equal(again["depths"], data["depths"])

    # scan change -> reload + pose tracker reset
    other = loader.load_data("scanB", "q0", 2, 3)
    assert other["depths"].shape == (1, H, W)
    np.testing.assert_allclose(other["depths"], 8000 * 0.00025)
    assert set(loader.pose_tracker) == {("q0", "2", "3")}
