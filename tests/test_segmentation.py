"""Segmentation pipeline tests: datasets over synthetic trees, loss goldens
vs torch formulas, and a tiny end-to-end train + inference run."""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import yaml
from PIL import Image

import jax.numpy as jnp

from footprints_tpu.preprocessing.segmentation.datasets import (
    ADE20KDataset,
    CityscapesDataset,
    ConcatDataset,
    KITTISegInferenceDataset,
    get_dataset_class,
    prepare_size,
)
from footprints_tpu.preprocessing.segmentation.losses import compute_seg_losses

H, W = 32, 64


def test_seg_loss_matches_torch_formula():
    rng = np.random.RandomState(0)
    n, h, w = 2, 16, 24
    outputs = [rng.randn(n, h // s, w // s, 1).astype(np.float32)
               for s in (8, 4, 2, 1)]
    gt = (rng.rand(n, h, w) > 0.5).astype(np.float32)
    labelled = (rng.rand(n, h, w) > 0.3).astype(np.float32)

    losses = compute_seg_losses([jnp.asarray(o) for o in outputs],
                                jnp.asarray(gt), jnp.asarray(labelled))

    # torch reference: upsample each scale, masked-normalized BCE, /4
    total = 0.0
    for out in outputs:
        t = torch.from_numpy(np.transpose(out, (0, 3, 1, 2)))
        up = F.interpolate(t, size=(h, w), mode="bilinear",
                           align_corners=False)[:, 0]
        loss = F.binary_cross_entropy_with_logits(
            up, torch.from_numpy(gt), reduction="none")
        lp = torch.from_numpy(labelled)
        per_image = (loss * lp).sum(dim=[1, 2]) / (lp.sum(dim=[1, 2]) + 1e-7)
        total += per_image
    expected = float((total / 4).mean())
    assert abs(float(losses["loss"]) - expected) < 1e-5


@pytest.fixture
def ade20k_tree(tmp_path):
    root = tmp_path / "ade"
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    files = []
    for i in range(4):
        name = f"img_{i}"
        Image.fromarray(rng.randint(0, 255, (64, 96, 3), np.uint8)).save(
            root / f"{name}.jpg")
        # label ID 976 (floor) = R//10*256+G -> R=30, G=208: 3*256+208 = 976
        seg = np.zeros((64, 96, 3), np.uint8)
        seg[32:, :, 0] = 30
        seg[32:, :, 1] = 208
        Image.fromarray(seg).save(root / f"{name}_seg.png")
        files.append(f"{name}.jpg")
    return str(root), files


def test_ade20k_dataset(ade20k_tree):
    root, files = ade20k_tree
    ds = ADE20KDataset(root, files, H, W, is_train=False)
    s = ds[0]
    assert s["image"].shape == (H, W, 3)
    assert s["ground_mask"].shape == (H, W)
    assert (s["labelled_pix"] == 1).all()
    # bottom half is floor (ID 976 in our ground list)
    assert s["ground_mask"][H - 2:].mean() > 0.9
    assert s["ground_mask"][:2].mean() < 0.1


@pytest.fixture
def cityscapes_tree(tmp_path):
    root = tmp_path / "cs"
    rng = np.random.RandomState(1)
    files = []
    for split, city, frame in [("train", "cityA", "000001")]:
        img_dir = root / "leftImg8bit" / split / city
        gt_dir = root / "gtFine" / split / city
        os.makedirs(img_dir), os.makedirs(gt_dir)
        Image.fromarray(rng.randint(0, 255, (1024, 2048, 3), np.uint8)).save(
            img_dir / f"{frame}_leftImg8bit.png")
        # crop-invariant pattern: alternate unlabeled(0)/road(7) rows so any
        # random crop contains both
        ids = np.zeros((1024, 2048, 3), np.uint8)
        ids[1::2] = 7  # road
        Image.fromarray(ids).save(gt_dir / f"{frame}_gtFine_labelIds.png")
        files.append(f"{split} {city} {frame}")
    return str(root), files


def test_cityscapes_dataset(cityscapes_tree):
    root, files = cityscapes_tree
    ds = CityscapesDataset(root, files, H, W, is_train=False)
    s = ds[0]
    assert s["image"].shape == (H, W, 3)
    # unlabeled region masked out
    assert s["labelled_pix"].min() == 0
    assert s["ground_mask"].max() == 1


def test_concat_dataset(ade20k_tree):
    root, files = ade20k_tree
    a = ADE20KDataset(root, files, H, W)
    b = ADE20KDataset(root, files[:2], H, W)
    cat = ConcatDataset([a, b])
    assert len(cat) == 6
    s = cat[5]  # second dataset, index 1
    assert s["image"].shape == (H, W, 3)


def test_prepare_size_aspect_and_crop():
    rng = np.random.default_rng(0)
    img = Image.fromarray(np.zeros((100, 300, 3), np.uint8))
    lab = Image.fromarray(np.zeros((100, 300), np.uint8))
    out_img, out_lab = prepare_size(img, lab, 64, 96, rng)
    assert out_img.size == (96, 64)
    assert out_lab.size == (96, 64)
    # image smaller than feed: resized up to fit then cropped
    img2 = Image.fromarray(np.zeros((20, 40, 3), np.uint8))
    lab2 = Image.fromarray(np.zeros((20, 40), np.uint8))
    out_img2, _ = prepare_size(img2, lab2, 64, 96, rng)
    assert out_img2.size == (96, 64)


@pytest.mark.slow
@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_seg_train_and_infer_end_to_end(tmp_path, ade20k_tree, compute_dtype):
    """Tiny Trainer run (PSP on, resnet18) + Tester over a kitti tree.

    The bfloat16 leg exercises the seg trainer's mixed-precision path
    (bf16 compute copies, f32 masters — mirrors train/step.py) and skips
    the inference half (dtype-independent, covered by the f32 leg)."""
    from footprints_tpu.preprocessing.segmentation.inference import Tester
    from footprints_tpu.preprocessing.segmentation.options import Options
    from footprints_tpu.preprocessing.segmentation.trainer import Trainer

    ade_root, ade_files = ade20k_tree

    # splits + config
    splits = tmp_path / "splits" / "ADE20K"
    os.makedirs(splits)
    (splits / "train.txt").write_text("\n".join(ade_files * 2))  # 8 samples
    (splits / "val.txt").write_text("\n".join(ade_files * 2))

    kitti_raw = tmp_path / "kitti_raw"
    ksplits = tmp_path / "splits" / "kitti"
    os.makedirs(ksplits)
    rng = np.random.RandomState(0)
    klines = []
    for i in range(2):
        os.makedirs(kitti_raw / "seq0" / "image_02" / "data", exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (96, 160, 3), np.uint8)).save(
            kitti_raw / "seq0" / "image_02" / "data" / f"{str(i).zfill(10)}.jpg")
        klines.append(f"seq0 {i} l")
    (ksplits / "train.txt").write_text(klines[0])
    (ksplits / "val.txt").write_text(klines[1])

    td = tmp_path / "kitti_td"
    config = tmp_path / "paths.yaml"
    config.write_text(yaml.safe_dump({
        "ADE20K": {"dataset": ade_root},
        "kitti": {"dataset": str(kitti_raw), "training_data": str(td)},
    }))

    argv = ["--mode", "train", "--training_datasets", "ADE20K",
            "--height", str(H), "--width", str(W), "--batch_size", "8",
            "--epochs", "1", "--num_workers", "2", "--val_batches", "1",
            "--log_freq", "1000000", "--config_path", str(config),
            "--log_path", str(tmp_path / "logs"),
            "--split_root", str(tmp_path / "splits"),
            "--encoder_depth", "18", "--model_name", "seg",
            "--compute_dtype", compute_dtype]
    opts = Options().parse(argv)
    trainer = Trainer(opts)
    trainer.train()
    ckpt = tmp_path / "logs" / "seg" / "models" / "epoch_0" / "checkpoint.npz"
    assert ckpt.exists()
    if compute_dtype == "bfloat16":
        # masters must stay f32 through the mixed step
        import jax
        from footprints_tpu.train.checkpoint import load_checkpoint
        loaded = load_checkpoint(str(ckpt))
        leaves = jax.tree.leaves(loaded["params"])
        assert all(l.dtype == np.float32 for l in leaves)
        return

    # inference over the kitti split using the trained checkpoint
    argv_inf = ["--mode", "inference", "--test_data_type", "kitti",
                "--height", str(H), "--width", str(W), "--batch_size", "2",
                "--num_workers", "1", "--config_path", str(config),
                "--split_root", str(tmp_path / "splits"),
                "--encoder_depth", "18",
                "--load_path", str(ckpt.parent)]
    opts_inf = Options().parse(argv_inf)
    tester = Tester(opts_inf)
    tester.test()  # default overlap=True (pipelined dump)
    out0 = td / "ground_seg" / "seq0" / "image_02" / "data" / "0000000000.npy"
    assert out0.exists()
    pred = np.load(out0)
    assert pred.shape == (1, H, W)
    assert pred.dtype == np.float16
    assert 0 <= pred.min() and pred.max() <= 1

    # the pipelined dump must be byte-identical to the serial order
    dump_dir = td / "ground_seg"
    overlapped = {p.relative_to(dump_dir): p.read_bytes()
                  for p in sorted(dump_dir.rglob("*.npy"))}
    tester.test(overlap=False)
    serial = {p.relative_to(dump_dir): p.read_bytes()
              for p in sorted(dump_dir.rglob("*.npy"))}
    assert overlapped and overlapped == serial


@pytest.mark.slow
def test_seg_trainer_preemption_checkpoint(tmp_path, ade20k_tree):
    """SIGTERM mid-training -> epoch_interrupt checkpoint, no further epochs
    (same contract as the main TrainManager)."""
    import signal

    from footprints_tpu.preprocessing.segmentation.options import Options
    from footprints_tpu.preprocessing.segmentation.trainer import Trainer

    ade_root, ade_files = ade20k_tree
    splits = tmp_path / "splits" / "ADE20K"
    os.makedirs(splits)
    (splits / "train.txt").write_text("\n".join(ade_files * 2))
    (splits / "val.txt").write_text("\n".join(ade_files * 2))
    config = tmp_path / "paths.yaml"
    config.write_text(yaml.safe_dump({"ADE20K": {"dataset": ade_root}}))

    argv = ["--mode", "train", "--training_datasets", "ADE20K",
            "--height", str(H), "--width", str(W), "--batch_size", "8",
            "--epochs", "2", "--num_workers", "2", "--val_batches", "1",
            "--log_freq", "1000000", "--config_path", str(config),
            "--log_path", str(tmp_path / "logs"),
            "--split_root", str(tmp_path / "splits"),
            "--encoder_depth", "18", "--model_name", "seg"]
    trainer = Trainer(Options().parse(argv))

    orig_step, fired = trainer._train_step, []

    def step_then_sigterm(ts, batch):
        out = orig_step(ts, batch)
        if not fired:
            fired.append(1)
            os.kill(os.getpid(), signal.SIGTERM)
        return out

    trainer._train_step = step_then_sigterm
    trainer.train()

    models = tmp_path / "logs" / "seg" / "models"
    assert (models / "epoch_interrupt" / "checkpoint.npz").exists()
    assert not (models / "epoch_0").exists()
    assert not (models / "epoch_1").exists()
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL
