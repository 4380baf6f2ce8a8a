"""End-to-end GT generation CLI over a synthetic KITTI tree: all three
--type modes write correctly-shaped npy trees."""

import os

import numpy as np
import pytest
import yaml

H, W = 192, 640  # the KITTI generator's fixed working resolution


@pytest.fixture(scope="module")
def kitti_gt_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("gt")
    td = root / "training_data"
    raw = root / "raw"
    rng = np.random.RandomState(0)
    seq, cam = "seq0", "image_02"
    n_frames = 8
    fy, cy, cam_h = 1.92 * H, 0.5 * H, 1.5
    for i in range(n_frames):
        f = str(i).zfill(10)
        os.makedirs(td / "stereo_matching_disps" / seq / cam, exist_ok=True)
        os.makedirs(td / "ground_seg" / seq / cam / "data", exist_ok=True)
        os.makedirs(td / "poses" / seq / "orbslam_poses", exist_ok=True)
        os.makedirs(td / "optical_flow" / seq / cam / "data", exist_ok=True)

        # synthetic flat-ground scene: disparity consistent with a ground
        # plane below the horizon, far wall above
        depth = np.full((H, W), 20.0, np.float32)
        ground = np.zeros((H, W), np.float32)
        ys = np.arange(H)
        below = ys > cy
        z = fy * cam_h / np.maximum(ys - cy, 1e-3)
        for y in np.where(below)[0]:
            if z[y] < 20.0:
                depth[y, :] = z[y]
                ground[y, :] = 1.0
        disp = 0.58 * W * 0.54 / depth
        np.save(td / "stereo_matching_disps" / seq / cam / f"{f}.npy",
                disp.astype(np.float32))
        np.save(td / "ground_seg" / seq / cam / "data" / f"{f}.npy",
                ground[None].astype(np.float32))
        pose = np.eye(4)
        pose[2, 3] = i * 0.5  # forward motion
        np.save(td / "poses" / seq / "orbslam_poses" / f"{f}.npy",
                pose[:3].astype(np.float32))
        np.save(td / "optical_flow" / seq / cam / "data" / f"{f}.npy",
                rng.randn(2, H, W).astype(np.float32) * 0.1)

    split = root / "files.txt"
    split.write_text("\n".join(f"{seq} {i} l" for i in range(2, 4)))
    config = root / "paths.yaml"
    config.write_text(yaml.safe_dump({
        "kitti": {"dataset": str(raw), "training_data": str(td)}}))
    return root, td, str(split), str(config)


@pytest.mark.slow
def test_hidden_depths_generator(kitti_gt_tree):
    from footprints_tpu.preprocessing.ground_truth_generation.generator import main

    root, td, split, config = kitti_gt_tree
    main(["--type", "hidden_depths", "--data_type", "kitti",
          "--textfile", split, "--config_path", config])
    out = td / "hidden_depths" / "seq0" / "image_02" / "data" / "0000000002.npy"
    assert out.exists()
    result = np.load(out)
    assert result.shape == (H, W)
    assert np.isfinite(result).all()
    # ground region should carry reprojected depth; sky rows none
    assert (result > 0).sum() > 1000
    assert result[:20].max() == 0


@pytest.mark.slow
def test_depth_masks_generator(kitti_gt_tree):
    from footprints_tpu.preprocessing.ground_truth_generation.generator import main

    root, td, split, config = kitti_gt_tree
    main(["--type", "depth_masks", "--data_type", "kitti",
          "--textfile", split, "--config_path", config])
    out = td / "depth_masks" / "seq0" / "image_02" / "data" / "0000000002.npy"
    assert out.exists()
    result = np.load(out)
    assert result.shape == (H, W)
    assert result.dtype == bool or set(np.unique(result)) <= {0, 1}


@pytest.mark.slow
def test_moving_objects_generator(kitti_gt_tree):
    from footprints_tpu.preprocessing.ground_truth_generation.generator import main

    root, td, split, config = kitti_gt_tree
    main(["--type", "moving_objects", "--data_type", "kitti",
          "--textfile", split, "--config_path", config,
          "--save_folder_name", "moving_objects"])
    out = td / "moving_objects" / "seq0" / "image_02" / "data" / "0000000002.npy"
    assert out.exists()
    assert np.load(out).shape == (H, W)


def test_idx_sharding(kitti_gt_tree, capsys):
    from footprints_tpu.preprocessing.ground_truth_generation.generator import (
        GroundTruthGenerator, get_options)

    root, td, split, config = kitti_gt_tree
    opts = get_options(["--textfile", split, "--idx_start", "1",
                        "--idx_end", "2"])
    gen = GroundTruthGenerator.__new__(GroundTruthGenerator)
    GroundTruthGenerator.__init__(gen, opts)
    assert len(gen.filenames) == 1
