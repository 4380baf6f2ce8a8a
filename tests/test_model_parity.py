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


def _rewrite_rebuild_v1(data: bytes) -> bytes:
    """Rewrite a pickle stream's _rebuild_tensor_v2 globals to the pre-0.4
    _rebuild_tensor form the 2017 torchvision model-zoo files use (the
    emulation tolerates v2's two extra args, so only the name matters)."""
    # GLOBAL text form (protocol <=3) and STACK_GLOBAL short-unicode form
    data = data.replace(b"_rebuild_tensor_v2\n", b"_rebuild_tensor\n")
    return data.replace(b"\x12_rebuild_tensor_v2", b"\x0f_rebuild_tensor")


@pytest.mark.parametrize("zip_format", [True, False])
def test_legacy_rebuild_tensor_v1(tmp_path, zip_format):
    """The restricted unpickler must accept torch._utils._rebuild_tensor —
    the rebuild call written by pre-torch-0.4 serialization, which is what
    the md5/sha-pinned ImageNet zoo files convert/torchvision_resnet.py
    downloads actually contain."""
    import io
    import zipfile

    torch.manual_seed(1)
    conv = torch.nn.Conv2d(3, 4, 3)
    sd = {"w": conv.weight.detach(), "b": conv.bias.detach()}
    p = tmp_path / "v1.pth"
    torch.save(sd, str(p), _use_new_zipfile_serialization=zip_format)
    raw = p.read_bytes()
    if zip_format:
        out = io.BytesIO()
        with zipfile.ZipFile(io.BytesIO(raw)) as zin, \
                zipfile.ZipFile(out, "w") as zout:
            for n in zin.namelist():
                body = zin.read(n)
                if n.endswith("data.pkl"):
                    body = _rewrite_rebuild_v1(body)
                zout.writestr(n, body)
        p.write_bytes(out.getvalue())
    else:
        rewritten = _rewrite_rebuild_v1(raw)
        assert rewritten != raw, "expected a _rebuild_tensor_v2 global"
        p.write_bytes(rewritten)

    loaded = load_torch_state_dict(str(p))
    np.testing.assert_array_equal(loaded["w"], conv.weight.detach().numpy())
    np.testing.assert_array_equal(loaded["b"], conv.bias.detach().numpy())


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
