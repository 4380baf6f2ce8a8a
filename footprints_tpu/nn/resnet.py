"""ResNet encoder family (18/34/50), functional, NHWC.

The reference uses torchvision resnet34 split into 5 feature stages
(/root/reference/footprints/network.py:33-59): stem conv+BN+ReLU (stride 2),
then maxpool+layer1, layer2..layer4.  Returned features have strides
(2, 4, 8, 16, 32) and channels (64, 64, 128, 256, 512) for resnet18/34.

Depth is configurable; the checkpoint contract targets resnet34.
Input normalization ``(x - 0.45) / 0.225`` is part of the encoder.
"""

import jax
import jax.numpy as jnp

from . import init as nn_init
from .layers import batch_norm, conv2d, max_pool_3x3_s2, relu

# NOTE (r3, measured-and-removed): a space-to-depth stem (7x7/stride-2 RGB
# conv re-expressed as an exact 4x4/stride-1 conv over the 2x2-packed
# 12-channel input — the MLPerf-style trick) was built, golden-verified,
# and A/B'd on chip: train 179.5 vs 180.0 imgs/s, serving 982 vs 1011.
# The input relayout costs more than the shallow conv saves on this
# backend.  Don't re-add without new numbers (PERF.md).

# depth -> (block kind, blocks per stage)
ARCHS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
}
STAGE_WIDTHS = (64, 128, 256, 512)
EXPANSION = {"basic": 1, "bottleneck": 4}


def _init_basic_block(key, c_in, c_out, stride):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": nn_init.conv_kaiming_normal_fanout(k1, 3, 3, c_in, c_out),
        "conv2": nn_init.conv_kaiming_normal_fanout(k2, 3, 3, c_out, c_out),
    }
    s = {}
    p["bn1"], s["bn1"] = nn_init.batchnorm(c_out)
    p["bn2"], s["bn2"] = nn_init.batchnorm(c_out)
    if stride != 1 or c_in != c_out:
        p["down_conv"] = nn_init.conv_kaiming_normal_fanout(k3, 1, 1, c_in, c_out)
        p["down_bn"], s["down_bn"] = nn_init.batchnorm(c_out)
    return p, s


def _basic_block(p, s, x, *, stride, train):
    ns = {}
    identity = x
    y = conv2d(x, p["conv1"]["w"], stride=stride, padding=1)
    y, ns["bn1"] = batch_norm(y, p["bn1"], s["bn1"], train=train)
    y = relu(y)
    y = conv2d(y, p["conv2"]["w"], stride=1, padding=1)
    y, ns["bn2"] = batch_norm(y, p["bn2"], s["bn2"], train=train)
    if "down_conv" in p:
        identity = conv2d(x, p["down_conv"]["w"], stride=stride, padding=0)
        identity, ns["down_bn"] = batch_norm(identity, p["down_bn"], s["down_bn"], train=train)
    return relu(y + identity), ns


def _init_bottleneck_block(key, c_in, c_mid, stride):
    c_out = c_mid * 4
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "conv1": nn_init.conv_kaiming_normal_fanout(k1, 1, 1, c_in, c_mid),
        "conv2": nn_init.conv_kaiming_normal_fanout(k2, 3, 3, c_mid, c_mid),
        "conv3": nn_init.conv_kaiming_normal_fanout(k3, 1, 1, c_mid, c_out),
    }
    s = {}
    p["bn1"], s["bn1"] = nn_init.batchnorm(c_mid)
    p["bn2"], s["bn2"] = nn_init.batchnorm(c_mid)
    p["bn3"], s["bn3"] = nn_init.batchnorm(c_out)
    if stride != 1 or c_in != c_out:
        p["down_conv"] = nn_init.conv_kaiming_normal_fanout(k4, 1, 1, c_in, c_out)
        p["down_bn"], s["down_bn"] = nn_init.batchnorm(c_out)
    return p, s


def _bottleneck_block(p, s, x, *, stride, train):
    ns = {}
    identity = x
    y = conv2d(x, p["conv1"]["w"], stride=1, padding=0)
    y, ns["bn1"] = batch_norm(y, p["bn1"], s["bn1"], train=train)
    y = relu(y)
    y = conv2d(y, p["conv2"]["w"], stride=stride, padding=1)
    y, ns["bn2"] = batch_norm(y, p["bn2"], s["bn2"], train=train)
    y = relu(y)
    y = conv2d(y, p["conv3"]["w"], stride=1, padding=0)
    y, ns["bn3"] = batch_norm(y, p["bn3"], s["bn3"], train=train)
    if "down_conv" in p:
        identity = conv2d(x, p["down_conv"]["w"], stride=stride, padding=0)
        identity, ns["down_bn"] = batch_norm(identity, p["down_bn"], s["down_bn"], train=train)
    return relu(y + identity), ns


def feature_channels(depth: int):
    """Channels of the 5 returned feature maps."""
    kind, _ = ARCHS[depth]
    e = EXPANSION[kind]
    return (64,) + tuple(w * e for w in STAGE_WIDTHS)


def init_encoder(key, depth: int = 34):
    """Build encoder (params, state) for the given depth."""
    kind, stage_blocks = ARCHS[depth]
    init_block = _init_basic_block if kind == "basic" else _init_bottleneck_block
    e = EXPANSION[kind]

    keys = jax.random.split(key, 1 + len(stage_blocks))
    params = {"stem_conv": nn_init.conv_kaiming_normal_fanout(keys[0], 7, 7, 3, 64)}
    state = {}
    params["stem_bn"], state["stem_bn"] = nn_init.batchnorm(64)

    c_in = 64
    for si, (n_blocks, width) in enumerate(zip(stage_blocks, STAGE_WIDTHS)):
        bkeys = jax.random.split(keys[1 + si], n_blocks)
        stage_p, stage_s = [], []
        for bi in range(n_blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            bp, bs = init_block(bkeys[bi], c_in, width, stride)
            stage_p.append(bp)
            stage_s.append(bs)
            c_in = width * e
        params[f"layer{si + 1}"] = stage_p
        state[f"layer{si + 1}"] = stage_s
    return params, state


def encoder_apply(params, state, x, *, depth: int = 34, train: bool = False):
    """Run the encoder.  x: [N,H,W,3] in [0,1].  Returns (features, new_state).

    features is a list of 5 NHWC maps at strides (2, 4, 8, 16, 32).
    """
    kind, stage_blocks = ARCHS[depth]
    block = _basic_block if kind == "basic" else _bottleneck_block
    ns = {}

    x = (x - 0.45) / 0.225
    x = conv2d(x, params["stem_conv"]["w"], stride=2, padding=3)
    x, ns["stem_bn"] = batch_norm(x, params["stem_bn"], state["stem_bn"], train=train)
    x = relu(x)
    features = [x]

    x = max_pool_3x3_s2(x)
    for si in range(len(stage_blocks)):
        stage_p = params[f"layer{si + 1}"]
        stage_s = state[f"layer{si + 1}"]
        new_stage_s = []
        for bi, (bp, bs) in enumerate(zip(stage_p, stage_s)):
            stride = 2 if (si > 0 and bi == 0) else 1
            x, nbs = block(bp, bs, x, stride=stride, train=train)
            new_stage_s.append(nbs)
        ns[f"layer{si + 1}"] = new_stage_s
        features.append(x)
    return features, ns
