"""Unit tests for train/evaluator.py and train/logger.py.

Both were previously exercised only through the trainer-e2e step-0 logging
event; these pin the accumulate/reset semantics (the device-resident
replacement for the reference's per-step ``.detach().cpu()`` sync,
reference training/evaluation.py:38-43) and the tensorboard panel contract
(reference training/logger.py:13-67).
"""

import numpy as np

from footprints_tpu.train.evaluator import Evaluator
from footprints_tpu.train.logger import TimeLogger, Timer, log


class FakeWriter:
    def __init__(self):
        self.scalars = {}
        self.images = {}

    def add_scalar(self, tag, value, step):
        self.scalars[tag] = (value, step)

    def add_image(self, tag, img, step):
        self.images[tag] = (np.asarray(img), step)


def test_evaluator_means_and_reset():
    ev = Evaluator()
    ev.accumulate({"loss": 1.0, "bce": 4.0})
    ev.accumulate({"loss": 3.0, "bce": 0.0})
    out = ev.get_averaged_losses("train")
    assert out == {"loss": 2.0, "bce": 2.0}
    # reset-on-read (reference Evaluator semantics)
    again = ev.get_averaged_losses("train")
    assert again == {}


def test_evaluator_modes_are_independent_and_accept_device_scalars():
    import jax.numpy as jnp

    ev = Evaluator()
    ev.accumulate({"loss": jnp.asarray(2.0)}, mode="train")
    ev.accumulate({"loss": jnp.asarray(6.0)}, mode="val")
    assert ev.get_averaged_losses("val", reset=False) == {"loss": 6.0}
    assert ev.get_averaged_losses("train") == {"loss": 2.0}
    # reset=False left val tracked
    assert ev.get_averaged_losses("val") == {"loss": 6.0}


def test_log_writes_scalars_and_reference_panels():
    rng = np.random.RandomState(0)
    n, h, w = 3, 8, 10
    inputs = {
        "image": rng.rand(n, h, w, 3).astype(np.float32),
        "visible_ground": (rng.rand(n, h, w) > 0.5).astype(np.float32),
        "all_ground": (rng.rand(n, h, w) > 0.5).astype(np.float32),
        "depth": (rng.rand(n, h, w) * 10 + 0.5).astype(np.float32),
    }
    outputs = rng.randn(n, h, w, 4).astype(np.float32)
    outputs[..., 2:] = rng.rand(n, h, w, 2)  # depth channels are sigmoids

    writer = FakeWriter()
    log(writer, inputs, outputs, {"loss": 1.5}, lr=1e-4, step=7, max_images=2)

    assert writer.scalars["lr"] == (1e-4, 7)
    assert writer.scalars["loss"] == (1.5, 7)
    # max_images=2 < batch 3: exactly items 0 and 1
    for i in range(2):
        img, step = writer.images[f"image/{i}"]
        assert step == 7 and img.shape == (3, h, w)  # CHW
        for tag in ("target_visible_ground", "target_all_ground",
                    "pred_visible_ground", "pred_all_ground"):
            panel, _ = writer.images[f"{tag}/{i}"]
            assert panel.shape == (1, h, w)
            assert panel.min() >= 0.0 and panel.max() <= 1.0
        for tag in ("target_disp", "pred_disp", "pred_hidden_disp"):
            panel, _ = writer.images[f"{tag}/{i}"]
            assert panel.shape == (3, h, w)  # plasma RGB
            assert np.isfinite(panel).all()
            assert panel.min() >= 0.0 and panel.max() <= 1.0
    assert "image/2" not in writer.images

    # sigmoid applied to mask logits before panel write
    want = 1.0 / (1.0 + np.exp(-outputs[0, ..., 0]))
    np.testing.assert_allclose(
        writer.images["pred_visible_ground/0"][0][0], want, rtol=1e-6)


def test_log_scalars_only_when_no_images():
    writer = FakeWriter()
    log(writer, None, None, {"loss": 0.5}, lr=1e-3, step=1)
    assert writer.scalars["loss"] == (0.5, 1)
    assert writer.images == {}


def test_time_logger_accumulates():
    tl = TimeLogger()
    tl.add_time("train", 1.5)
    with Timer(tl, "train"):
        pass
    tl.add_time("val", 2.0)
    assert tl.timings["train"] >= 1.5
    assert tl.timings["val"] == 2.0
    lines = []
    tl.print_time(printer=lines.append)
    assert len(lines) == 2 and lines[0].strip().startswith("train:")
