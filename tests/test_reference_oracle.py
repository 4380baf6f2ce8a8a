"""Parity tests whose torch side is the REFERENCE'S OWN network code.

tests/torch_oracle.py re-implements the reference architecture; a
mis-replication shared between that oracle and the JAX build would pass
every other parity test.  Here we close the loop: stub
``torchvision.models.resnet34`` in ``sys.modules`` (torchvision is not
installed; the stub assembles a torchvision-shaped resnet34 from plain
torch modules) and import ``/root/reference/footprints/network.py`` and
``.../preprocessing/segmentation/network.py`` **themselves** — pure torch
module definitions — as the second oracle for decoder wiring, pad and
upsample modes, and sigmoid placement.

The reference tree is read-only PUBLIC content; it is imported and
executed as a numeric oracle only.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from footprints_tpu.convert import (
    footprint_params_from_state_dict,
    segmentor_params_from_state_dict,
)
from footprints_tpu.models import FootprintNetwork, Segmentor

from . import torch_oracle

REF = "/root/reference/footprints"


class _TorchvisionResnet34(nn.Module):
    """torchvision.models.resnet34 surface: the attributes the reference's
    ResnetEncoder plucks (conv1, bn1, relu, maxpool, layer1..4), with
    torchvision's BasicBlock arithmetic (tests/torch_oracle.py)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = torch_oracle._stage(64, 64, 3, 1)
        self.layer2 = torch_oracle._stage(64, 128, 4, 2)
        self.layer3 = torch_oracle._stage(128, 256, 6, 2)
        self.layer4 = torch_oracle._stage(256, 512, 3, 2)


def _stub_resnet34(pretrained=True, **kwargs):
    return _TorchvisionResnet34()


def _import_reference_module(name, path):
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_models.resnet34 = _stub_resnet34
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_network():
    return _import_reference_module("ref_network", f"{REF}/network.py")


@pytest.fixture(scope="module")
def ref_seg_network():
    return _import_reference_module(
        "ref_seg_network", f"{REF}/preprocessing/segmentation/network.py")


def _to_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_footprint_network_parity_vs_reference_code(ref_network):
    torch.manual_seed(21)
    tnet = ref_network.FootprintNetwork(pretrained=False).eval()

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, state = footprint_params_from_state_dict(sd)

    x = np.random.RandomState(5).rand(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref = {k: _to_nhwc(v) for k, v in tnet(_to_nchw(x)).items()}

    net = FootprintNetwork(depth=34)
    out, _ = net.apply(params, state, jnp.asarray(x), train=False)

    assert set(out) == set(ref) == {"1/8", "1/4", "1/2", "1/1"}
    for k in ref:
        got = np.asarray(out[k])
        assert got.shape == ref[k].shape, k
        mae = np.abs(got - ref[k]).mean()
        assert mae < 1e-5, f"scale {k}: MAE {mae}"


@pytest.mark.parametrize("use_psp", [True, False])
def test_segmentor_parity_vs_reference_code(ref_seg_network, use_psp):
    torch.manual_seed(22)
    tnet = ref_seg_network.Segmentor(pretrained=False, use_PSP=use_psp).eval()

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, state = segmentor_params_from_state_dict(sd, use_psp=use_psp)

    x = np.random.RandomState(6).rand(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref = [_to_nhwc(v) for v in tnet(_to_nchw(x))]

    seg = Segmentor(depth=34, use_psp=use_psp)
    out, _ = seg.apply(params, state, jnp.asarray(x), train=False)

    assert len(out) == len(ref) == 4
    for i, (r, g) in enumerate(zip(ref, out)):
        g = np.asarray(g)
        assert g.shape == r.shape, i
        mae = np.abs(g - r).mean()
        assert mae < 1e-5, f"scale {i}: MAE {mae}"


def test_oracle_state_dict_matches_reference_layout(ref_network):
    """tests/torch_oracle.py promises reference-identical state_dict keys —
    check that promise against the reference's own module tree."""
    torch.manual_seed(0)
    ref_keys = set(ref_network.FootprintNetwork(pretrained=False)
                   .state_dict().keys())
    oracle_keys = set(torch_oracle.FootprintNetwork().state_dict().keys())
    assert ref_keys == oracle_keys


def test_oracle_forward_matches_reference_code(ref_network):
    """The hand-written oracle and the reference code, given the SAME
    weights, must be numerically identical (they share torch kernels, so
    any difference is a wiring mis-replication)."""
    torch.manual_seed(23)
    tref = ref_network.FootprintNetwork(pretrained=False).eval()
    oracle = torch_oracle.FootprintNetwork().eval()
    oracle.load_state_dict(tref.state_dict())

    x = _to_nchw(np.random.RandomState(7).rand(1, 64, 96, 3).astype(np.float32))
    with torch.no_grad():
        a, b = tref(x), oracle(x)
    for k in a:
        assert torch.equal(a[k], b[k]), k
