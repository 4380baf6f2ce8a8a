"""End-to-end CLI tests: predict_simple, batch inference, evaluate_model,
and a tiny full training run — the reference's user workflows, exercised on
the CPU backend with small shapes."""

import os
import shutil

import numpy as np
import pytest
from PIL import Image

from footprints_tpu.eval.evaluate_model import evaluate, evaluate_depth, evaluate_mask

TEST_IMG = os.path.join(os.path.dirname(__file__), "..", "test_data", "cyclist.jpg")
H, W = 64, 96  # small but /32-divisible for speed on the 1-core CI box


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """A saved native checkpoint with random weights."""
    from footprints_tpu.model_manager import ModelManager

    d = tmp_path_factory.mktemp("weights")
    mm = ModelManager(save_folder=str(d), is_inference=True)
    mm.opt_state = None
    mm.save_model("weights_0")
    return str(d / "weights_0")


def test_predict_simple_end_to_end(tmp_path, model_dir):
    from footprints_tpu.predict_simple import main

    save_dir = str(tmp_path / "preds")
    main(["--image", TEST_IMG, "--model_path", model_dir,
          "--height", str(H), "--width", str(W), "--save_dir", save_dir])

    npy = os.path.join(save_dir, "outputs", "cyclist.npy")
    jpg = os.path.join(save_dir, "visualisations", "cyclist.jpg")
    assert os.path.exists(npy)
    pred = np.load(npy)
    assert pred.shape == (4, H, W)  # channels-first reference artifact contract
    assert np.isfinite(pred).all()
    # depth channels are sigmoided in-network; mask channels raw logits
    assert pred[2:].min() >= 0 and pred[2:].max() <= 1
    assert os.path.exists(jpg)
    vis = np.asarray(Image.open(jpg))
    orig = Image.open(TEST_IMG)
    assert vis.shape[:2] == (orig.size[1], orig.size[0])


def test_predict_simple_model_path_without_model_name(tmp_path, model_dir):
    """--model_path with no --model must not crash on the resolution lookup
    (regression: KeyError None); it defaults to the KITTI 192x640."""
    from footprints_tpu.predict_simple import InferenceManager

    m = InferenceManager(model_name=None, save_dir=str(tmp_path / "p"),
                         model_load_folder=model_dir)
    assert (m.height, m.width) == (192, 640)


def test_predict_simple_folder_mode(tmp_path, model_dir):
    from footprints_tpu.predict_simple import main

    folder = tmp_path / "imgs"
    folder.mkdir()
    shutil.copy(TEST_IMG, folder / "a.jpg")
    shutil.copy(TEST_IMG, folder / "b.png")
    (folder / "not_an_image.txt").write_text("hi")
    save_dir = str(tmp_path / "preds")
    main(["--image", str(folder), "--model_path", model_dir,
          "--height", str(H), "--width", str(W), "--save_dir", save_dir,
          "--no_save_vis"])
    outs = sorted(os.listdir(os.path.join(save_dir, "outputs")))
    assert outs == ["a.npy", "b.npy"]
    assert not os.path.exists(os.path.join(save_dir, "visualisations"))


def test_predict_simple_missing_image_raises(tmp_path, model_dir):
    from footprints_tpu.predict_simple import main

    with pytest.raises(FileNotFoundError):
        main(["--image", str(tmp_path / "nope.jpg"), "--model_path", model_dir,
              "--height", str(H), "--width", str(W),
              "--save_dir", str(tmp_path / "p")])


# ---------------------------------------------------------------------------
# evaluate_model harness
# ---------------------------------------------------------------------------

def test_evaluate_mask_perfect_and_empty():
    gt = np.zeros((10, 10))
    gt[2:5, 2:5] = 1
    perfect = evaluate_mask(gt, gt.astype(float))
    assert perfect["iou"] == 1.0 and perfect["f1"] == 1.0
    empty = evaluate_mask(np.zeros((10, 10)), gt)
    assert np.isnan(empty["iou"])
    half = np.zeros((10, 10))
    half[2:5, 2:3] = 1  # 3 of 9 gt pixels
    scores = evaluate_mask(gt, half)
    assert scores["iou"] == pytest.approx(3 / 9)
    assert scores["recall"] == pytest.approx(3 / 9)
    assert scores["precision"] == 1.0


def test_evaluate_depth_values():
    gt = np.full(100, 10.0)
    pred = np.full(100, 10.0)
    perfect = evaluate_depth(gt, pred)
    assert perfect["a1"] == 1.0 and perfect["rmse"] == 0.0
    off = evaluate_depth(gt, pred * 2)  # clipped to 20 -> ratio 2 > 1.25
    assert off["a1"] == 0.0
    assert off["abs_rel"] == pytest.approx(1.0)


def test_evaluate_kitti_folder(tmp_path):
    """Full harness over a synthetic 3-image kitti GT + prediction tree."""
    import cv2

    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        gt = (rng.rand(32, 48) > 0.5).astype(np.uint8) * 255
        free = np.ones((32, 48), np.uint8) * 255
        cv2.imwrite(str(gt_dir / f"{i:05d}_combined.png"), gt)
        cv2.imwrite(str(gt_dir / f"{i:05d}_ground.png"), free)
        # perfect prediction in the 4-channel layout (mask channel sigmoided)
        pred = np.zeros((4, 32, 48), np.float16)
        pred[1] = (gt > 128).astype(np.float16)
        np.save(str(pred_dir / f"{i:03d}.npy"), pred)
    results = evaluate(str(pred_dir), "kitti", "iou", gt_dir=str(gt_dir),
                       n_kitti=3, download=False, verbose=False)
    assert results["freespace_iou"] == pytest.approx(1.0)
    assert results["footprint_iou"] == pytest.approx(1.0)


def test_evaluate_kitti_depth_rejected():
    with pytest.raises(ValueError):
        evaluate("anywhere", "kitti", "depth", download=False)
