"""Data pipeline tests over synthetic on-disk fixture trees."""

import os

import numpy as np
import pytest
from PIL import Image

from footprints_tpu.core.labels import filter_small_components, label
from footprints_tpu.data import (
    DataLoader,
    KITTIDataset,
    MatterportDataset,
    get_dataset_class,
    get_inference_dataset_class,
)
from footprints_tpu.data.loader import collate

H, W = 32, 64


def _save_img(path, h=370, w=1226, mode="RGB"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8)
    Image.fromarray(arr, "RGB").convert(mode).save(path)


def _save_npy(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.save(path, arr)


@pytest.fixture
def kitti_tree(tmp_path):
    raw = tmp_path / "raw"
    td = tmp_path / "training_data"
    rng = np.random.RandomState(1)
    frames = ["seq_a 1 l", "seq_a 2 r"]
    for line in frames:
        seq, frame, side = line.split()
        cam = "image_02" if side == "l" else "image_03"
        f = frame.zfill(10)
        _save_img(str(raw / seq / cam / "data" / f"{f}.jpg"))
        _save_npy(str(td / "ground_seg" / seq / cam / "data" / f"{f}.npy"),
                  rng.rand(93, 306).astype(np.float32))
        _save_npy(str(td / "hidden_depths" / seq / cam / "data" / f"{f}.npy"),
                  (rng.rand(93, 306) * 20).astype(np.float32))
        _save_npy(str(td / "depth_masks" / seq / cam / "data" / f"{f}.npy"),
                  (rng.rand(93, 306) > 0.9).astype(np.float32))
        _save_npy(str(td / "stereo_matching_disps" / seq / cam / f"{f}.npy"),
                  (rng.rand(93, 306) * 50 + 5).astype(np.float32))
        _save_npy(str(td / "moving_objects" / seq / cam / "data" / f"{f}.npy"),
                  (rng.rand(93, 306) > 0.95).astype(np.float32))
    return str(raw), str(td), frames


EXPECTED_KEYS = {"image", "visible_ground", "depth", "ground_depth",
                 "moving_object_mask", "depth_mask", "all_ground"}


def test_kitti_dataset_sample(kitti_tree):
    raw, td, frames = kitti_tree
    ds = KITTIDataset(raw, td, frames, H, W, is_train=False)
    s = ds[0]
    assert set(s) == EXPECTED_KEYS
    assert s["image"].shape == (H, W, 3)
    assert s["image"].dtype == np.float32
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0
    for k in EXPECTED_KEYS - {"image"}:
        assert s[k].shape == (H, W), k
        assert s[k].dtype == np.float32, k
    # all_ground derivation
    expected = ((s["ground_depth"] + s["visible_ground"]) > 0).astype(np.float32)
    np.testing.assert_array_equal(s["all_ground"], expected)
    # depth_mask zeroes ground_depth
    assert (s["ground_depth"][s["depth_mask"] > 0] == 0).all()
    # moving objects never overlap visible ground or depth mask
    assert (s["moving_object_mask"] * s["visible_ground"]).sum() == 0
    assert (s["moving_object_mask"] * s["depth_mask"]).sum() == 0


def test_kitti_missing_depth_mask_gives_zeros(kitti_tree, tmp_path):
    raw, td, frames = kitti_tree
    import shutil

    shutil.rmtree(os.path.join(td, "depth_masks"))
    ds = KITTIDataset(raw, td, frames, H, W)
    s = ds[0]
    assert (s["depth_mask"] == 0).all()


def test_kitti_project_down_baseline(kitti_tree):
    raw, td, frames = kitti_tree
    ds = KITTIDataset(raw, td, frames, H, W, moving_objects_method="none",
                      project_down_baseline=True)
    s = ds[0]
    # ground_depth = ones except where depth_mask
    assert set(np.unique(s["ground_depth"])) <= {0.0, 1.0}


@pytest.fixture
def matterport_tree(tmp_path):
    raw = tmp_path / "mp_raw"
    td = tmp_path / "mp_td"
    rng = np.random.RandomState(2)
    frames = ["scanA deadbeef 1 0", "scanA deadbeef 1 1"]
    for line in frames:
        scan, pos, h, d = line.split()
        _save_img(str(raw / scan / scan / "matterport_color_images" / f"{pos}_i{h}_{d}.jpg"),
                  256, 320)
        depth_path = raw / scan / scan / "matterport_depth_images" / f"{pos}_d{h}_{d}.png"
        os.makedirs(os.path.dirname(str(depth_path)), exist_ok=True)
        depth16 = (rng.rand(256, 320) * 20000).astype(np.uint16)
        Image.fromarray(depth16).save(str(depth_path))  # uint16 -> I;16
        _save_npy(str(td / "ground_seg" / scan / "data" / f"{pos}_{h}_{d}.npy"),
                  rng.rand(256, 320).astype(np.float32))
        hidden = (rng.rand(256, 320) * 12).astype(np.float32)
        hidden[0:8, 0:8] = 0.1  # missing sentinel
        _save_npy(str(td / "hidden_depth" / scan / "data" / f"{pos}_{h}_{d}.npy"), hidden)
        _save_npy(str(td / "depth_masks" / scan / "data" / f"{pos}_{h}_{d}.npy"),
                  (rng.rand(256, 320) > 0.9).astype(np.float32))
    return str(raw), str(td), frames


def test_matterport_dataset_sample(matterport_tree):
    raw, td, frames = matterport_tree
    ds = MatterportDataset(raw, td, frames, H, W)
    s = ds[0]
    assert set(s) == EXPECTED_KEYS
    assert s["image"].shape == (H, W, 3)
    # hidden depth clipped below 10m and sentinel removed
    assert s["ground_depth"].max() < 10.0
    assert (s["moving_object_mask"] == 0).all()
    # 16-bit png scaling: depths in plausible metric range
    assert s["depth"].max() <= 20000 * 0.00025 + 1e-6


def test_dataset_registry():
    assert get_dataset_class("kitti") is KITTIDataset
    assert get_dataset_class("matterport") is MatterportDataset
    with pytest.raises(KeyError):
        get_dataset_class("nope")
    assert get_inference_dataset_class("kitti").__name__ == "KITTIInferenceDataset"


def test_dataloader_batches(kitti_tree):
    raw, td, frames = kitti_tree
    ds = KITTIDataset(raw, td, frames * 3, H, W)  # 6 samples
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (2, H, W, 3)
        assert b["depth"].shape == (2, H, W)


def test_dataloader_drop_last_and_shuffle(kitti_tree):
    raw, td, frames = kitti_tree
    ds = KITTIDataset(raw, td, frames * 2 + frames[:1], H, W)  # 5 samples
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=1, seed=0)
    assert len(loader) == 2  # drop_last defaults on when shuffling
    assert len(list(loader)) == 2


def test_collate_scalars():
    out = collate([{"idx": 1, "x": np.zeros((2, 2))}, {"idx": 5, "x": np.ones((2, 2))}])
    assert out["idx"].tolist() == [1, 5]
    assert out["x"].shape == (2, 2, 2)


def test_filter_small_components():
    mask = np.zeros((100, 100), np.float32)
    mask[0:50, 0:50] = 1       # 2500 px — large, dropped (>= 1% of 10000)
    mask[90:92, 90:92] = 1     # 4 px — kept
    out = filter_small_components(mask, 100 * 100 / 100)
    assert out[91, 91] == 1
    assert out[10, 10] == 0


def test_label_eight_connectivity():
    # two diagonal pixels are ONE component under 8-connectivity (skimage default)
    mask = np.zeros((4, 4))
    mask[0, 0] = 1
    mask[1, 1] = 1
    lab = label(mask)
    assert lab.max() == 1


class _ListDataset:
    def __init__(self, items, fail_at=None):
        self.items = items
        self.fail_at = fail_at

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise ValueError(f"boom at {i}")
        return {"x": np.full((2, 3), self.items[i], np.float32), "idx": i}


def test_dataloader_order_and_values():
    ds = _ListDataset(list(range(20)))
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=3,
                        prefetch_batches=2)
    for _ in range(2):  # re-iterable across epochs
        batches = list(loader)
        assert len(batches) == 5
        got = np.concatenate([b["idx"] for b in batches])
        np.testing.assert_array_equal(got, np.arange(20))


def test_dataloader_worker_exception_surfaces():
    ds = _ListDataset(list(range(20)), fail_at=13)
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2,
                        prefetch_batches=2)
    with pytest.raises(ValueError, match="boom at 13"):
        list(loader)


def test_dataloader_early_break_shuts_down():
    ds = _ListDataset(list(range(40)))
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=3)
    it = iter(loader)
    next(it)
    it.close()  # generator close must not hang on worker threads


def test_background_writer_runs_thunks_in_order():
    from footprints_tpu.data.loader import BackgroundWriter

    got = []
    with BackgroundWriter(max_pending=4) as w:
        for i in range(32):
            w.submit(got.append, i)
    assert got == list(range(32))  # close() flushed everything


def test_background_writer_surfaces_thunk_errors():
    from footprints_tpu.data.loader import BackgroundWriter

    def boom():
        raise ValueError("disk full")

    w = BackgroundWriter()
    w.submit(boom)
    with pytest.raises(ValueError, match="disk full"):
        # error surfaces on a later submit or on close, whichever first
        for _ in range(100):
            w.submit(lambda: None)
        w.close()
