"""ImageNet-pretrained encoder initialization path.

The reference builds both networks from torchvision's pretrained resnet34
(/root/reference/footprints/network.py:38, seg network.py:32).  These tests
pin the torch-free torchvision-state_dict -> encoder-pytree conversion with
a randomly initialized torchvision-shaped ResNet as oracle, wire it through
ModelManager / the seg Trainer entry, and arm a download test for the real
md5/sha-pinned weights (self-skips without network egress, like the
published-checkpoint parity tests).
"""

import os
import urllib.error
import urllib.request

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from footprints_tpu.convert import load_pretrained_encoder
from footprints_tpu.convert.torchvision_resnet import (
    TORCHVISION_WEIGHT_URLS,
    download_imagenet_encoder_if_doesnt_exist,
)
from footprints_tpu.model_manager import ModelManager
from footprints_tpu.nn import resnet

from .test_reference_oracle import _TorchvisionResnet34


def _encoder_features_from_tv(tvnet, x_nchw):
    """Run the 5-stage feature extraction the reference encoder performs."""
    with torch.no_grad():
        x = (x_nchw - 0.45) / 0.225
        f0 = tvnet.relu(tvnet.bn1(tvnet.conv1(x)))
        f1 = tvnet.layer1(tvnet.maxpool(f0))
        f2 = tvnet.layer2(f1)
        f3 = tvnet.layer3(f2)
        f4 = tvnet.layer4(f3)
    return [np.transpose(f.numpy(), (0, 2, 3, 1)) for f in (f0, f1, f2, f3, f4)]


@pytest.fixture(scope="module")
def tv_checkpoint(tmp_path_factory):
    torch.manual_seed(42)
    tvnet = _TorchvisionResnet34().eval()
    path = tmp_path_factory.mktemp("tv") / "resnet34-random.pth"
    # torchvision checkpoints include the classifier head; fake it to prove
    # the converter drops fc.* like the reference's encoder wrapper does
    sd = dict(tvnet.state_dict())
    sd["fc.weight"] = torch.zeros(1000, 512)
    sd["fc.bias"] = torch.zeros(1000)
    torch.save(sd, str(path))
    return tvnet, str(path)


def test_torchvision_encoder_feature_parity(tv_checkpoint):
    tvnet, path = tv_checkpoint
    params, state = load_pretrained_encoder(path, depth=34)

    x = np.random.RandomState(3).rand(1, 64, 96, 3).astype(np.float32)
    ref = _encoder_features_from_tv(tvnet, torch.from_numpy(
        np.transpose(x, (0, 3, 1, 2))))

    feats, _ = resnet.encoder_apply(params, state, jnp.asarray(x),
                                    depth=34, train=False)
    assert len(feats) == 5
    for i, (r, g) in enumerate(zip(ref, feats)):
        g = np.asarray(g)
        assert g.shape == r.shape, f"stage {i}"
        mae = np.abs(g - r).mean()
        assert mae < 1e-5, f"stage {i}: MAE {mae}"


def test_model_manager_pretrained_encoder_init(tv_checkpoint):
    """--pretrained_encoder through ModelManager: encoder leaves replaced,
    decoders untouched, optimizer builds on the combined tree."""
    tvnet, path = tv_checkpoint
    mm_plain = ModelManager(seed=10)
    mm = ModelManager(seed=10, pretrained_encoder=path)

    # encoder stem now equals the converted torchvision stem (HWIO)
    want = np.transpose(tvnet.conv1.weight.detach().numpy(), (2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(mm.params["encoder"]["stem_conv"]["w"]), want)
    # BN running stats came across too
    np.testing.assert_array_equal(
        np.asarray(mm.state["encoder"]["stem_bn"]["var"]),
        tvnet.bn1.running_var.numpy())
    # decoders keep the seeded random init
    for dec in ("mask_decoder", "depth_decoder"):
        a = jax.tree.leaves(mm.params[dec])
        b = jax.tree.leaves(mm_plain.params[dec])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert mm.opt_state is not None


def test_pretrained_encoder_depth_mismatch_raises(tv_checkpoint):
    _, path = tv_checkpoint
    with pytest.raises((ValueError, KeyError)):
        ModelManager(seed=10, pretrained_encoder=path, depth=50)


def test_deeper_file_with_shallower_depth_raises(tv_checkpoint):
    """A resnet34 file read at --encoder_depth 18 must NOT silently truncate
    into a plausible-looking resnet18 (every key the shallower arch reads
    exists with the right shape — only the leftover-key check catches it)."""
    _, path = tv_checkpoint
    with pytest.raises(ValueError, match="not consumed"):
        load_pretrained_encoder(path, depth=18)


def test_resolve_expected_layout_mismatch_raises(tv_checkpoint):
    """The shared `expected` layout check (used by ModelManager AND the seg
    Trainer) rejects shape drift with a clear error."""
    from footprints_tpu.convert import resolve_pretrained_encoder

    _, path = tv_checkpoint
    good_p, good_s = load_pretrained_encoder(path, depth=34)
    bad_p = jax.tree.map(lambda a: a, good_p)
    bad_p["stem_conv"]["w"] = np.zeros((3, 3, 3, 64), np.float32)  # not 7x7
    with pytest.raises(ValueError, match="layout mismatch"):
        resolve_pretrained_encoder(path, depth=34, expected=(bad_p, good_s))
    # and the happy path still returns the trees
    p, s = resolve_pretrained_encoder(path, depth=34,
                                      expected=(good_p, good_s))
    np.testing.assert_array_equal(np.asarray(p["stem_conv"]["w"]),
                                  np.asarray(good_p["stem_conv"]["w"]))


def test_pretrained_encoder_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        ModelManager(seed=10, pretrained_encoder="/nonexistent/resnet34.pth")


def _has_egress(url):
    try:
        urllib.request.urlopen(url, timeout=5).close()
        return True
    except (urllib.error.URLError, OSError):
        return False


@pytest.mark.skipif(
    not _has_egress(TORCHVISION_WEIGHT_URLS[34]),
    reason="no network egress to download.pytorch.org in this environment",
)
def test_real_imagenet_resnet34_downloads_and_converts(tmp_path):
    """Armed for when egress exists: fetch torchvision's real ImageNet
    resnet34 (sha256-prefix-verified) and convert it; spot-check the stem
    against torch.load of the same file."""
    path = download_imagenet_encoder_if_doesnt_exist(34, str(tmp_path))
    params, state = load_pretrained_encoder(path, depth=34)
    sd = torch.load(path, map_location="cpu")
    want = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(params["stem_conv"]["w"]), want, atol=0)
    assert np.asarray(state["stem_bn"]["mean"]).shape == (64,)
