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


class _KeyTracker(dict):
    """Dict that records which keys the mapper actually consumed, so a
    deeper-than-requested state_dict (e.g. resnet34 file + --encoder_depth
    18: every key the shallower arch reads exists with the right shape)
    cannot silently truncate into a valid-looking shallower encoder."""

    def __init__(self, base):
        super().__init__(base)
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)


def _check_all_consumed(tracker, what):
    leftover = {k for k in tracker if k not in tracker.used
                and not k.endswith("num_batches_tracked")}
    if leftover:
        raise ValueError(
            f"{what}: {len(leftover)} weight tensors were not consumed by "
            f"the requested encoder depth (wrong --encoder_depth for this "
            f"file?): e.g. {sorted(leftover)[:4]}")


def encoder_from_torchvision_state_dict(sd, depth=34):
    """torchvision ResNet state_dict -> encoder (params, state) pytrees."""
    import numpy as np

    sd = _KeyTracker({k: np.asarray(v)
                      for k, v in _rename_torchvision_keys(sd).items()})
    out = _encoder_from_sd(sd, depth=depth)
    _check_all_consumed(sd, "torchvision state_dict")
    return out


def load_pretrained_encoder(path, depth=34):
    """Load encoder (params, state) from a ``.pth`` weight file.

    Accepts either a raw torchvision ResNet state_dict (``conv1.weight``,
    the pretrained=True download) or one already in the reference's wrapped
    layout (``encoder.layer0.0.weight``).
    """
    sd = load_torch_state_dict(path)
    if any(k.startswith("encoder.layer0.0.") for k in sd):
        import numpy as np

        sd = _KeyTracker({k: np.asarray(v) for k, v in sd.items()
                          if k.startswith("encoder.")})
        out = _encoder_from_sd(sd, depth=depth)
        _check_all_consumed(sd, "wrapped-encoder state_dict")
        return out
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


def resolve_pretrained_encoder(spec, depth=34, expected=None):
    """Resolve a ``--pretrained_encoder`` value to (params, state).

    ``spec`` is a local ``.pth`` path, or the literal ``"download"`` to
    fetch torchvision's ImageNet weights (needs network egress).

    ``expected``, when given, is the target model's ``(params["encoder"],
    state["encoder"])`` pytrees; the loaded trees must match their structure
    and leaf shapes exactly, so a wrong-depth or wrong-arch file fails here
    with a clear message instead of as an XLA shape error inside the first
    jitted train step.
    """
    if spec == "download":
        spec = download_imagenet_encoder_if_doesnt_exist(depth)
    if not os.path.exists(spec):
        raise FileNotFoundError(f"pretrained encoder weights not found: {spec}")
    out = load_pretrained_encoder(spec, depth=depth)
    if expected is not None:
        import jax

        for got, want in zip(out, expected):
            gs = [(jax.tree_util.keystr(p), v.shape) for p, v in
                  jax.tree_util.tree_flatten_with_path(got)[0]]
            ws = [(jax.tree_util.keystr(p), v.shape) for p, v in
                  jax.tree_util.tree_flatten_with_path(want)[0]]
            if gs != ws:
                raise ValueError(
                    f"pretrained encoder layout mismatch (is it a "
                    f"resnet{depth}?): {set(ws) ^ set(gs)}")
    return out
