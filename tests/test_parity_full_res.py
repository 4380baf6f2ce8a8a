"""Parity at the three published models' NATIVE resolutions, plus a
network-gated test against the real md5-pinned checkpoints.

The reference's parity oracles are its published model zips
(reference utils.py:105-141; resolutions from predict_simple.py:21-25:
kitti 192x640, matterport 512x640, handheld 256x448).  The build box has no
egress (DNS for storage.googleapis.com does not resolve — see PARITY.md), so:

  * full-native-resolution forward parity is proven here against a torch
    oracle carrying the SAME state_dict through the torch-free converter —
    the identical code path a real checkpoint takes;
  * `test_published_checkpoint_parity` performs the real-artifact check and
    skips itself cleanly when the download is unreachable, so it activates
    automatically in any environment with network access.
"""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from footprints_tpu.convert import (
    footprint_params_from_state_dict,
    load_torch_state_dict,
)
from footprints_tpu.models import FootprintNetwork

from . import torch_oracle

# (model_name, height, width) — reference predict_simple.py:21-25
NATIVE_RESOLUTIONS = [
    ("kitti", 192, 640),
    ("handheld", 256, 448),
    ("matterport", 512, 640),
]


def _run_torch(net, x_nhwc):
    with torch.no_grad():
        out = net(torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))))
    return {k: np.transpose(v.numpy(), (0, 2, 3, 1)) for k, v in out.items()}


@pytest.fixture(scope="module")
def torch_footprint():
    torch.manual_seed(10)
    return torch_oracle.FootprintNetwork().eval()


@pytest.fixture(scope="module")
def converted(tmp_path_factory, torch_footprint):
    path = tmp_path_factory.mktemp("ckpt") / "model.pth"
    # legacy (pre-1.6 default) serialization — the format torch 1.3.1 wrote
    torch.save(torch_footprint.state_dict(), str(path),
               _use_new_zipfile_serialization=False)
    sd = load_torch_state_dict(str(path))
    return footprint_params_from_state_dict(sd)


@pytest.mark.parametrize("name,h,w", NATIVE_RESOLUTIONS)
def test_full_native_resolution_parity(torch_footprint, converted, name, h, w):
    params, state = converted
    x = np.random.RandomState(7).rand(1, h, w, 3).astype(np.float32)
    ref = _run_torch(torch_footprint, x)

    net = FootprintNetwork(depth=34)
    out, _ = net.apply(params, state, jnp.asarray(x), train=False)
    for k in ref:
        got = np.asarray(out[k])
        assert got.shape == ref[k].shape
        mae = np.abs(got - ref[k]).mean()
        # BASELINE north-star is <1e-3; we hold an order tighter.
        assert mae < 1e-4, f"{name} {h}x{w} scale {k}: MAE {mae}"


def _try_download(model_name, model_dir):
    """Attempt the md5-pinned GCS download; return model dir or None."""
    from footprints_tpu.utils import download_model_if_doesnt_exist

    try:
        download_model_if_doesnt_exist(model_name, model_dir=model_dir)
    except Exception as exc:  # no egress / DNS failure / md5 mismatch
        return None, str(exc)
    return os.path.join(model_dir, model_name), None


@pytest.mark.parametrize("name,h,w", NATIVE_RESOLUTIONS)
def test_published_checkpoint_parity(tmp_path, name, h, w):
    """Real-artifact parity: download the published checkpoint, load it both
    through torch AND through the torch-free converter, and compare the full
    forward on a real test image at native resolution (<1e-3 MAE)."""
    model_dir, err = _try_download(name, str(tmp_path / "models"))
    if model_dir is None:
        pytest.skip(f"published checkpoint unreachable (no egress): {err}")

    from PIL import Image

    ckpt = os.path.join(model_dir, "model.pth")
    sd_torch = torch.load(ckpt, map_location="cpu")
    tnet = torch_oracle.FootprintNetwork().eval()
    tnet.load_state_dict(sd_torch)

    sd = load_torch_state_dict(ckpt)
    params, state = footprint_params_from_state_dict(sd)

    img = Image.open(os.path.join(os.path.dirname(__file__), "..", "test_data", "cyclist.jpg")).convert("RGB")
    img = img.resize((w, h), Image.LANCZOS)
    x = (np.asarray(img, np.float32) / 255.0)[None]

    ref = _run_torch(tnet, x)
    net = FootprintNetwork(depth=34)
    out, _ = net.apply(params, state, jnp.asarray(x), train=False)
    for k in ref:
        mae = np.abs(np.asarray(out[k]) - ref[k]).mean()
        assert mae < 1e-3, f"{name} published ckpt scale {k}: MAE {mae}"
