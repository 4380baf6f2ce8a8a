"""End-to-end training: TrainManager over a synthetic KITTI tree on the
8-device CPU mesh — epochs run, losses are finite, checkpoints appear, and
resume restores the step counter."""

import os

import numpy as np
import pytest
import yaml
from PIL import Image

H = W = 64


def _make_kitti_tree(root, n_train=8, n_val=8):
    raw = root / "raw"
    td = root / "training_data"
    rng = np.random.RandomState(0)
    lines = []
    for i in range(max(n_train, n_val)):
        seq, frame, side = "seq0", str(i), "l"
        lines.append(f"{seq} {frame} {side}")
        cam = "image_02"
        f = frame.zfill(10)
        os.makedirs(raw / seq / cam / "data", exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (96, 160, 3), dtype=np.uint8)).save(
            raw / seq / cam / "data" / f"{f}.jpg")
        for sub, val in [
            ("ground_seg", rng.rand(96, 160)),
            ("hidden_depths", rng.rand(96, 160) * 20),
            ("depth_masks", (rng.rand(96, 160) > 0.9).astype(float)),
            ("moving_objects", np.zeros((96, 160))),
        ]:
            os.makedirs(td / sub / seq / cam / "data", exist_ok=True)
            np.save(td / sub / seq / cam / "data" / f"{f}.npy",
                    val.astype(np.float32))
        os.makedirs(td / "stereo_matching_disps" / seq / cam, exist_ok=True)
        np.save(td / "stereo_matching_disps" / seq / cam / f"{f}.npy",
                (rng.rand(96, 160) * 50 + 5).astype(np.float32))

    splits = root / "splits" / "kitti"
    os.makedirs(splits, exist_ok=True)
    (splits / "train.txt").write_text("\n".join(lines[:n_train]))
    (splits / "val.txt").write_text("\n".join(lines[:n_val]))

    config = root / "paths.yaml"
    config.write_text(yaml.safe_dump({
        "kitti": {"dataset": str(raw), "training_data": str(td)}}))
    return config


@pytest.mark.slow
def test_train_manager_end_to_end(tmp_path):
    from footprints_tpu.options import Options
    from footprints_tpu.train.trainer import TrainManager

    config = _make_kitti_tree(tmp_path)
    log_path = str(tmp_path / "logs")
    argv = [
        "--mode", "train", "--training_dataset", "kitti",
        "--height", str(H), "--width", str(W),
        "--batch_size", "8", "--epochs", "1", "--num_workers", "2",
        "--val_batches", "1", "--log_freq", "1000000",
        "--config_path", str(config), "--log_path", log_path,
        "--split_root", str(tmp_path / "splits"),
        "--encoder_depth", "18", "--model_name", "tiny",
    ]
    opts = Options().parse(argv)
    tm = TrainManager(opts)
    tm.train()

    # checkpoint written
    ckpt = os.path.join(log_path, "tiny", "models", "weights_0", "checkpoint.npz")
    assert os.path.exists(ckpt)
    # step advanced (8 train / batch 8 = 1 step per epoch)
    assert tm.step == 1
    # step 0 hits the log cadence (0 % log_freq == 0, reference semantics), so
    # train losses were reset; the val tracker would also be drained by val().
    # Verify final model state is finite instead.
    import jax

    for leaf in jax.tree.leaves(tm.model_manager.params):
        assert np.isfinite(np.asarray(leaf)).all()

    # resume: step counter restored from checkpoint
    argv_resume = argv + ["--load_path",
                          os.path.join(log_path, "tiny", "models", "weights_0")]
    opts2 = Options().parse(argv_resume)
    tm2 = TrainManager(opts2)
    assert tm2.step == 1


@pytest.mark.slow
def test_train_manager_s2d_head_mixed_precision(tmp_path):
    """bfloat16 compute enables the s2d-basis '1/1' head (s2d_head='auto')
    and the period-4 '1/2' head (p4_head='auto'): the put path must emit
    '@s2d'/'@s2d2' packed targets, the step must consume them, and
    training must stay finite on the 8-device mesh."""
    from footprints_tpu.options import Options
    from footprints_tpu.train.trainer import TrainManager

    config = _make_kitti_tree(tmp_path)
    log_path = str(tmp_path / "logs")
    opts = Options().parse([
        "--mode", "train", "--training_dataset", "kitti",
        "--height", str(H), "--width", str(W),
        "--batch_size", "8", "--epochs", "1", "--num_workers", "2",
        "--val_batches", "1", "--log_freq", "1000000",
        "--config_path", str(config), "--log_path", log_path,
        "--split_root", str(tmp_path / "splits"),
        "--encoder_depth", "18", "--model_name", "tiny_s2d",
        "--compute_dtype", "bfloat16",
    ])
    tm = TrainManager(opts)
    assert tm._s2d_head and tm.step_config.s2d_head
    assert tm._p4_head and tm.step_config.p4_head
    # the put path attaches packed targets for every loss target key
    batch = tm._put(next(iter(tm.train_loader)))
    for k in tm._S2D_TARGET_KEYS:
        assert batch[k + "@s2d"].shape == (8, H // 2, W // 2, 4)
        assert batch[k + "@s2d2"].shape == (8, H // 4, W // 4, 16)
    tm.train()
    # the log fetch must skip BOTH packed-target families ('@s2d' and
    # '@s2d2') — they are loss-only device tensors, not logger panels
    import footprints_tpu.train.trainer as trainer_mod
    captured = {}
    orig_log = trainer_mod.log
    trainer_mod.log = (lambda writer, inputs, *a, **kw:
                       captured.setdefault("keys", set(inputs)))
    try:
        tm.opt.log_images = True
        tm._log(object(), batch, {"loss": np.float32(0.0)})
    finally:
        trainer_mod.log = orig_log
    assert captured["keys"] and not any("@s2d" in k for k in captured["keys"])
    assert tm.step == 1

    import jax

    for leaf in jax.tree.leaves(tm.model_manager.params):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_train_manager_preemption_checkpoint(tmp_path):
    """SIGTERM mid-training -> resumable checkpoint at the end of the
    in-flight step, no further epochs run."""
    import signal

    from footprints_tpu.options import Options
    from footprints_tpu.train.trainer import TrainManager

    config = _make_kitti_tree(tmp_path)
    log_path = str(tmp_path / "logs")
    argv = [
        "--mode", "train", "--training_dataset", "kitti",
        "--height", str(H), "--width", str(W),
        "--batch_size", "8", "--epochs", "2", "--num_workers", "2",
        "--val_batches", "1", "--log_freq", "1000000",
        "--config_path", str(config), "--log_path", log_path,
        "--split_root", str(tmp_path / "splits"),
        "--encoder_depth", "18", "--model_name", "tiny",
    ]
    tm = TrainManager(Options().parse(argv))

    orig_step, fired = tm.train_step, []

    def step_then_sigterm(ts, batch):
        out = orig_step(ts, batch)
        if not fired:
            fired.append(1)
            # delivered synchronously in the main thread: the handler
            # installed by train() runs inside this call
            os.kill(os.getpid(), signal.SIGTERM)
        return out

    tm.train_step = step_then_sigterm
    tm.train()

    models = os.path.join(log_path, "tiny", "models")
    ckpt = os.path.join(models, "weights_interrupt", "checkpoint.npz")
    assert os.path.exists(ckpt)
    # preempted during epoch 0's only step: neither epoch checkpoint exists
    assert not os.path.exists(os.path.join(models, "weights_0"))
    assert not os.path.exists(os.path.join(models, "weights_1"))
    assert tm._preempt_requested

    # resume from the interrupt checkpoint: step counter continues
    argv_resume = argv + ["--load_path",
                          os.path.join(models, "weights_interrupt")]
    tm2 = TrainManager(Options().parse(argv_resume))
    assert tm2.step == 1
    # the handler was uninstalled on exit from train()
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL
