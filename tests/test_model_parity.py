"""End-to-end numerics parity: JAX models vs the torch oracle, weights carried
across via the torch-free checkpoint converter (so this also integration-tests
the converter on real torch.save output in both serialization formats)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from footprints_tpu.convert import (
    footprint_params_from_state_dict,
    load_torch_state_dict,
    segmentor_params_from_state_dict,
)
from footprints_tpu.models import FootprintNetwork, Segmentor

from . import torch_oracle


@pytest.fixture(scope="module")
def torch_footprint():
    torch.manual_seed(10)
    net = torch_oracle.FootprintNetwork().eval()
    return net


def _run_torch(net, x_nhwc):
    with torch.no_grad():
        out = net(torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))))
    if isinstance(out, dict):
        return {k: np.transpose(v.numpy(), (0, 2, 3, 1)) for k, v in out.items()}
    return [np.transpose(v.numpy(), (0, 2, 3, 1)) for v in out]


@pytest.mark.parametrize("zip_format", [True, False])
def test_footprint_network_parity(tmp_path, torch_footprint, zip_format):
    path = tmp_path / "model.pth"
    torch.save(torch_footprint.state_dict(), str(path),
               _use_new_zipfile_serialization=zip_format)

    sd = load_torch_state_dict(str(path))
    params, state = footprint_params_from_state_dict(sd)

    x = np.random.RandomState(0).rand(1, 64, 96, 3).astype(np.float32)
    ref = _run_torch(torch_footprint, x)

    net = FootprintNetwork(depth=34)
    out, _ = net.apply(params, state, jnp.asarray(x), train=False)
    for k in ref:
        got = np.asarray(out[k])
        assert got.shape == ref[k].shape
        mae = np.abs(got - ref[k]).mean()
        assert mae < 1e-5, f"scale {k}: MAE {mae}"


def test_segmentor_parity(tmp_path):
    torch.manual_seed(3)
    tnet = torch_oracle.Segmentor(use_psp=True).eval()
    path = tmp_path / "seg.pth"
    torch.save(tnet.state_dict(), str(path))

    sd = load_torch_state_dict(str(path))
    params, state = segmentor_params_from_state_dict(sd, use_psp=True)

    x = np.random.RandomState(1).rand(1, 64, 96, 3).astype(np.float32)
    ref = _run_torch(tnet, x)

    seg = Segmentor(depth=34, use_psp=True)
    out, _ = seg.apply(params, state, jnp.asarray(x), train=False)
    assert len(out) == 4
    for i, (r, g) in enumerate(zip(ref, out)):
        g = np.asarray(g)
        assert g.shape == r.shape
        mae = np.abs(g - r).mean()
        assert mae < 1e-5, f"scale {i}: MAE {mae}"


def test_converter_roundtrip_values(tmp_path):
    """Converter preserves exact weight values (spot check on raw tensors)."""
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 8, 3)
    sd = {"w": conv.weight.detach(), "b": conv.bias.detach()}
    p = tmp_path / "t.pth"
    torch.save(sd, str(p))
    loaded = load_torch_state_dict(str(p))
    np.testing.assert_array_equal(loaded["w"], conv.weight.detach().numpy())
    np.testing.assert_array_equal(loaded["b"], conv.bias.detach().numpy())
