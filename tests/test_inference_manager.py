"""End-to-end batch test-split inference (main.py --mode inference) over a
synthetic KITTI tree: padded tail batch, float16 channels-first artifacts,
reference naming, sigmoid applied to mask channels."""

import os

import numpy as np
import pytest
import yaml
from PIL import Image

H, W = 64, 96


@pytest.fixture
def inference_tree(tmp_path):
    raw = tmp_path / "raw"
    rng = np.random.RandomState(0)
    lines = []
    os.makedirs(raw / "seq0" / "image_02" / "data")
    for i in range(5):  # odd count -> exercises the padded tail batch
        f = str(i).zfill(10)
        Image.fromarray(rng.randint(0, 255, (96, 160, 3), np.uint8)).save(
            raw / "seq0" / "image_02" / "data" / f"{f}.jpg")
        lines.append(f"seq0 {i} l")
    splits = tmp_path / "splits" / "kitti"
    os.makedirs(splits)
    (splits / "test.txt").write_text("\n".join(lines))
    config = tmp_path / "paths.yaml"
    config.write_text(yaml.safe_dump({"kitti": {"dataset": str(raw)}}))
    return tmp_path, str(config)


def test_batch_inference_end_to_end(tmp_path, inference_tree):
    from footprints_tpu.model_manager import ModelManager
    from footprints_tpu.main import main

    root, config = inference_tree
    weights = tmp_path / "w"
    mm = ModelManager(save_folder=str(weights), is_inference=True)
    mm.opt_state = None
    mm.save_model("weights_0")

    save_path = str(tmp_path / "preds")
    main(["--mode", "inference", "--inference_data_type", "kitti",
          "--height", str(H), "--width", str(W), "--batch_size", "2",
          "--num_workers", "1", "--config_path", config,
          "--split_root", str(root / "splits"),
          "--load_path", str(weights / "weights_0"),
          "--inference_save_path", save_path,
          "--save_test_visualisations"])

    files = sorted(os.listdir(save_path))
    npys = [f for f in files if f.endswith(".npy")]
    assert npys == ["000.npy", "001.npy", "002.npy", "003.npy", "004.npy"]
    pred = np.load(os.path.join(save_path, "000.npy"))
    assert pred.shape == (4, H, W)
    assert pred.dtype == np.float16
    # mask channels sigmoided on this path (unlike predict_simple)
    assert 0.0 <= pred[0].min() and pred[1].max() <= 1.0
    assert np.isfinite(pred.astype(np.float32)).all()
    # visualisations saved next to npys
    assert any(f.endswith(".jpg") for f in files)


def test_overlapped_dump_matches_serial_bitwise(tmp_path, inference_tree):
    """run(overlap=True) pipelines forward/fetch/save; it must produce
    byte-identical artifacts to the serial order (run(overlap=False))."""
    from footprints_tpu.eval.inference import InferenceManager
    from footprints_tpu.model_manager import ModelManager
    from footprints_tpu.options import Options

    root, config = inference_tree
    weights = tmp_path / "w3"
    mm = ModelManager(save_folder=str(weights), is_inference=True)
    mm.opt_state = None
    mm.save_model("weights_0")

    opts = Options().parse([
        "--mode", "inference", "--inference_data_type", "kitti",
        "--height", str(H), "--width", str(W), "--batch_size", "2",
        "--num_workers", "1", "--config_path", config,
        "--split_root", str(root / "splits"),
        "--load_path", str(weights / "weights_0")])
    manager = InferenceManager(opts)

    outs = {}
    for overlap in (False, True):
        manager.savepath = str(tmp_path / f"preds_overlap_{overlap}")
        manager.run(overlap=overlap)
        outs[overlap] = {
            f: open(os.path.join(manager.savepath, f), "rb").read()
            for f in sorted(os.listdir(manager.savepath))
            if f.endswith(".npy")}
    assert sorted(outs[True]) == sorted(outs[False]) and len(outs[True]) == 5
    for f in outs[True]:
        assert outs[True][f] == outs[False][f], f"{f} differs under overlap"


def test_default_save_path_is_under_load_path(tmp_path, inference_tree):
    from footprints_tpu.eval.inference import InferenceManager
    from footprints_tpu.model_manager import ModelManager
    from footprints_tpu.options import Options

    root, config = inference_tree
    weights = tmp_path / "w2"
    mm = ModelManager(save_folder=str(weights), is_inference=True)
    mm.opt_state = None
    mm.save_model("weights_0")

    opts = Options().parse([
        "--mode", "inference", "--inference_data_type", "kitti",
        "--height", str(H), "--width", str(W), "--batch_size", "2",
        "--num_workers", "1", "--config_path", config,
        "--split_root", str(root / "splits"),
        "--load_path", str(weights / "weights_0")])
    manager = InferenceManager(opts)
    assert manager.savepath == os.path.join(str(weights / "weights_0"),
                                            "kitti_predictions")
