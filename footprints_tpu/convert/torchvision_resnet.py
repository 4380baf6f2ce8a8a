"""ImageNet-pretrained encoder initialization (torch-free).

The reference constructs both networks from ImageNet-pretrained torchvision
weights — ``resnet34(pretrained)`` at /root/reference/footprints/network.py:38
and preprocessing/segmentation/network.py:32 — so every training run it ever
did starts from that initialization.  This module maps a *torchvision*
ResNet state_dict (keys ``conv1.weight``, ``bn1.*``, ``layer1.0.conv1.weight``,
...) onto this framework's encoder pytree so ``--pretrained_encoder`` can
reproduce that starting point.

Implementation: torchvision keys are renamed into the reference's
*wrapped-encoder* layout (``encoder.layer0.0`` = stem conv,
``encoder.layer1.1`` = maxpool-wrapped stage 1, ... — the layout
torch_checkpoint._encoder_from_sd already understands from the published
footprint checkpoints) and fed through that same battle-tested mapper.

Download: torchvision's published weight files, sha256-prefix-pinned the
same way torch.hub validates them (the hex fragment in the filename is the
leading 8 chars of the file's sha256).
"""

import hashlib
import os
import urllib.request

from .torch_checkpoint import _encoder_from_sd, load_torch_state_dict

# depth -> torchvision weight URL (torch.hub naming: -<sha256[:8]>.pth).
# These are the files torchvision 0.4.2 (the reference's pin,
# /root/reference/environment.yml) downloads for pretrained=True.
TORCHVISION_WEIGHT_URLS = {
    18: "https://download.pytorch.org/models/resnet18-5c106cde.pth",
    34: "https://download.pytorch.org/models/resnet34-333f7ec4.pth",
    50: "https://download.pytorch.org/models/resnet50-19c8e357.pth",
}

ENCODER_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "pretrained_encoders")


def _rename_torchvision_keys(sd):
    """torchvision ResNet state_dict -> the reference's wrapped-encoder
    naming (network.py:40-44: layer0=Sequential(conv1,bn1,relu),
    layer1=Sequential(maxpool, layer1), layer2..4 passed through)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("fc."):
            continue  # classifier head — the encoder never had one
        if k.startswith("conv1."):
            out["encoder.layer0.0." + k[len("conv1."):]] = v
        elif k.startswith("bn1."):
            out["encoder.layer0.1." + k[len("bn1."):]] = v
        elif k.startswith("layer1."):
            out["encoder.layer1.1." + k[len("layer1."):]] = v
        elif k.startswith(("layer2.", "layer3.", "layer4.")):
            out["encoder." + k] = v
        else:
            raise KeyError(f"unrecognized torchvision ResNet key: {k}")
    return out


def encoder_from_torchvision_state_dict(sd, depth=34):
    """torchvision ResNet state_dict -> encoder (params, state) pytrees."""
    import numpy as np

    sd = {k: np.asarray(v) for k, v in sd.items()}
    return _encoder_from_sd(_rename_torchvision_keys(sd), depth=depth)


def load_pretrained_encoder(path, depth=34):
    """Load encoder (params, state) from a ``.pth`` weight file.

    Accepts either a raw torchvision ResNet state_dict (``conv1.weight``,
    the pretrained=True download) or one already in the reference's wrapped
    layout (``encoder.layer0.0.weight``).
    """
    sd = load_torch_state_dict(path)
    if any(k.startswith("encoder.layer0.0.") for k in sd):
        import numpy as np

        sd = {k: np.asarray(v) for k, v in sd.items()
              if k.startswith("encoder.")}
        return _encoder_from_sd(sd, depth=depth)
    return encoder_from_torchvision_state_dict(sd, depth=depth)


def _sha256_prefix_ok(path, url):
    expected = url.rsplit("-", 1)[1].split(".")[0]
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest().startswith(expected)


def download_imagenet_encoder_if_doesnt_exist(depth=34, weights_dir=ENCODER_DIR):
    """Fetch torchvision's ImageNet ResNet weights (sha256-prefix-verified,
    torch.hub's own integrity scheme).  Returns the local ``.pth`` path."""
    url = TORCHVISION_WEIGHT_URLS[depth]
    path = os.path.join(weights_dir, url.rsplit("/", 1)[1])
    if os.path.exists(path) and _sha256_prefix_ok(path, url):
        return path
    os.makedirs(weights_dir, exist_ok=True)
    print(f"downloading ImageNet resnet{depth} weights from {url}...")
    urllib.request.urlretrieve(url, path)
    if not _sha256_prefix_ok(path, url):
        raise RuntimeError(f"sha256 mismatch for {path} — aborting")
    return path


def resolve_pretrained_encoder(spec, depth=34):
    """Resolve a ``--pretrained_encoder`` value to (params, state).

    ``spec`` is a local ``.pth`` path, or the literal ``"download"`` to
    fetch torchvision's ImageNet weights (needs network egress).
    """
    if spec == "download":
        spec = download_imagenet_encoder_if_doesnt_exist(depth)
    if not os.path.exists(spec):
        raise FileNotFoundError(f"pretrained encoder weights not found: {spec}")
    return load_pretrained_encoder(spec, depth=depth)
