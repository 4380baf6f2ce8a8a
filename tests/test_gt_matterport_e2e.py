"""End-to-end Matterport GT generation over a synthetic scan tree:
hidden_depths (whole-scan loader, near-camera weight filter, non-robust
median) and depth_masks."""

import os

import numpy as np
import pytest
import yaml
from PIL import Image

H, W = 480, 640  # the Matterport generator's fixed working resolution
FULL_W, FULL_H = 1280, 1024


@pytest.fixture(scope="module")
def matterport_gt_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("mpgt")
    raw = root / "raw"
    td = root / "td"
    scan = "scanA"
    fy_full = 1000.0
    cam_h = 1.5
    # real Matterport positions are long hashes; the base save path
    # zfills to 10 chars (a no-op for real names) so keep names long
    frames = [("deadbeef00", "1", "0"), ("deadbeef00", "1", "1"),
              ("deadbeef01", "1", "0"), ("deadbeef02", "1", "0")]
    scan_dir = raw / scan / scan
    for sub in ["matterport_depth_images", "matterport_camera_poses",
                "matterport_camera_intrinsics"]:
        os.makedirs(scan_dir / sub, exist_ok=True)
    os.makedirs(td / "ground_seg" / scan / "data", exist_ok=True)

    for i, (pos, h, d) in enumerate(frames):
        # flat-ground depth image at full resolution (16-bit png, x0.00025)
        fy = fy_full
        cy = FULL_H / 2
        depth = np.full((FULL_H, FULL_W), 8.0, np.float64)
        ground = np.zeros((FULL_H, FULL_W), np.float32)
        ys = np.arange(FULL_H, dtype=np.float64)
        below = ys > cy
        z = fy * cam_h / np.maximum(ys - cy, 1e-3)
        for y in np.where(below)[0]:
            if z[y] < 8.0:
                depth[y, :] = z[y]
                ground[y, :] = 1.0
        depth16 = np.clip(depth / 0.00025, 0, 65535).astype(np.uint16)
        Image.fromarray(depth16).save(
            scan_dir / "matterport_depth_images" / f"{pos}_d{h}_{d}.png")
        np.save(td / "ground_seg" / scan / "data" / f"{pos}_{h}_{d}.npy",
                ground[None])

        pose = np.eye(4)
        pose[0, 3] = 0.3 * i  # nearby cameras (within the 10 m filter)
        np.savetxt(scan_dir / "matterport_camera_poses" / f"{pos}_pose_{h}_{d}.txt",
                   pose.reshape(1, -1))
        # width height fx fy cx cy ...
        np.savetxt(scan_dir / "matterport_camera_intrinsics" /
                   f"{pos}_intrinsics_{h}.txt",
                   np.array([[FULL_W, FULL_H, fy_full, fy_full,
                              FULL_W / 2, FULL_H / 2]]))

    split = root / "files.txt"
    split.write_text("\n".join(f"{scan} {p} {h} {d}" for p, h, d in frames[:2]))
    config = root / "paths.yaml"
    config.write_text(yaml.safe_dump({
        "matterport": {"dataset": str(raw), "training_data": str(td)}}))
    return td, str(split), str(config)


@pytest.mark.slow
def test_matterport_hidden_depths(matterport_gt_tree):
    from footprints_tpu.preprocessing.ground_truth_generation.generator import main

    td, split, config = matterport_gt_tree
    main(["--type", "hidden_depths", "--data_type", "matterport",
          "--textfile", split, "--config_path", config])
    out = td / "hidden_depths" / "scanA" / "data" / "deadbeef00_1_0.npy"
    assert out.exists()
    result = np.load(out)
    assert result.shape == (H, W)
    assert np.isfinite(result).all()
    assert (result > 0).sum() > 1000  # ground region reprojects
    assert result[:20].max() == 0     # nothing above the horizon


@pytest.mark.slow
def test_matterport_depth_masks(matterport_gt_tree):
    from footprints_tpu.preprocessing.ground_truth_generation.generator import main

    td, split, config = matterport_gt_tree
    main(["--type", "depth_masks", "--data_type", "matterport",
          "--textfile", split, "--config_path", config])
    out = td / "depth_masks" / "scanA" / "data" / "deadbeef00_1_0.npy"
    assert out.exists()
    result = np.load(out)
    assert result.shape == (H, W)
    # flat ground + wall scene: ground never flagged untraversable
    # (mask excludes ground_seg >= 0.5 pixels by construction)
    assert set(np.unique(result.astype(int))) <= {0, 1}
