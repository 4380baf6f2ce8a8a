"""End-to-end Matterport data-parallel training over the 8-device CPU mesh
(BASELINE config #5 shape, tiny dimensions)."""

import os

import numpy as np
import pytest
import yaml
from PIL import Image

H = W = 64


def _make_matterport_tree(root, n=8):
    raw = root / "raw"
    td = root / "td"
    rng = np.random.RandomState(0)
    scan = "scanA"
    lines = []
    os.makedirs(raw / scan / scan / "matterport_color_images", exist_ok=True)
    os.makedirs(raw / scan / scan / "matterport_depth_images", exist_ok=True)
    for sub in ["ground_seg", "hidden_depth", "depth_masks"]:
        os.makedirs(td / sub / scan / "data", exist_ok=True)
    for i in range(n):
        pos = f"pos{i:04d}xx"
        lines.append(f"{scan} {pos} 1 0")
        Image.fromarray(rng.randint(0, 255, (128, 160, 3), np.uint8)).save(
            raw / scan / scan / "matterport_color_images" / f"{pos}_i1_0.jpg")
        Image.fromarray((rng.rand(128, 160) * 20000).astype(np.uint16)).save(
            raw / scan / scan / "matterport_depth_images" / f"{pos}_d1_0.png")
        np.save(td / "ground_seg" / scan / "data" / f"{pos}_1_0.npy",
                rng.rand(128, 160).astype(np.float32))
        np.save(td / "hidden_depth" / scan / "data" / f"{pos}_1_0.npy",
                (rng.rand(128, 160) * 12).astype(np.float32))
        np.save(td / "depth_masks" / scan / "data" / f"{pos}_1_0.npy",
                (rng.rand(128, 160) > 0.9).astype(np.float32))
    splits = root / "splits" / "matterport"
    os.makedirs(splits)
    (splits / "train.txt").write_text("\n".join(lines))
    (splits / "val.txt").write_text("\n".join(lines))
    config = root / "paths.yaml"
    config.write_text(yaml.safe_dump({
        "matterport": {"dataset": str(raw), "training_data": str(td)}}))
    return config


@pytest.mark.slow
def test_matterport_dp_training(tmp_path):
    import jax

    from footprints_tpu.options import Options
    from footprints_tpu.train.trainer import TrainManager

    assert jax.device_count() >= 8
    config = _make_matterport_tree(tmp_path)
    argv = [
        "--mode", "train", "--training_dataset", "matterport",
        "--height", str(H), "--width", str(W),
        "--batch_size", "8", "--epochs", "1", "--num_workers", "2",
        "--val_batches", "1", "--log_freq", "1000000",
        "--config_path", str(config), "--log_path", str(tmp_path / "logs"),
        "--split_root", str(tmp_path / "splits"),
        "--encoder_depth", "18", "--model_name", "mp",
        "--compute_dtype", "bfloat16",
    ]
    tm = TrainManager(Options().parse(argv))
    # batch is sharded over all 8 devices
    assert len(tm.mesh.devices.flat) == 8
    tm.train()
    ckpt = tmp_path / "logs" / "mp" / "models" / "weights_0" / "checkpoint.npz"
    assert ckpt.exists()
    for leaf in jax.tree.leaves(tm.model_manager.params):
        assert np.isfinite(np.asarray(leaf)).all()
