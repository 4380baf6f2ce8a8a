"""Fused inference forward for FootprintNetwork.

TPU rationale: the two skip decoders (mask + depth) have identical
structure and consume the same encoder features, but only 32-64 channels
each — half the TPU's 128-wide vector lanes sit idle and every op/pad runs
twice.  For inference we run BOTH decoders as ONE tower of grouped convs
(feature_group_count=2): effective width 128, op and pad count halved.
Numerics are identical to running the decoders separately (grouped convs
don't mix groups).

Also folds encoder BatchNorms into the preceding convs (standard inference
folding): conv'(w) = w * scale/sqrt(var+eps), bias' = bias - mean*scale/...

Usage:
    fused = FusedFootprintPredictor(net, params, state)   # packs weights
    out = fused(images)        # [N,H,W,4] '1/1' output, or all scales
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import resnet
from ..nn.layers import reflect_pad, upsample_bilinear, upsample_nearest


def _fold_bn_into_conv(conv_w, conv_b, bn_params, bn_state, eps=1e-5):
    """Return (w', b') such that conv(w') + b' == BN(conv(w) + b)."""
    scale = bn_params["scale"] / np.sqrt(bn_state["var"] + eps)
    w = conv_w * scale[None, None, None, :]
    b = (conv_b if conv_b is not None else 0.0) - bn_state["mean"]
    b = b * scale + bn_params["bias"]
    return w, b


def fold_encoder_bn(enc_params, enc_state, depth=34):
    """Encoder params with all BNs folded away (inference only)."""
    p = jax.tree.map(np.asarray, enc_params)
    s = jax.tree.map(np.asarray, enc_state)
    folded = {"stem_conv": dict(zip(("w", "b"), _fold_bn_into_conv(
        p["stem_conv"]["w"], p["stem_conv"]["b"], p["stem_bn"], s["stem_bn"])))}
    kind, stage_blocks = resnet.ARCHS[depth]
    n_convs = 2 if kind == "basic" else 3
    for si in range(len(stage_blocks)):
        stage = []
        for bp, bs in zip(p[f"layer{si + 1}"], s[f"layer{si + 1}"]):
            nb = {}
            for ci in range(1, n_convs + 1):
                w, b = _fold_bn_into_conv(bp[f"conv{ci}"]["w"],
                                          bp[f"conv{ci}"]["b"],
                                          bp[f"bn{ci}"], bs[f"bn{ci}"])
                nb[f"conv{ci}"] = {"w": w, "b": b}
            if "down_conv" in bp:
                w, b = _fold_bn_into_conv(bp["down_conv"]["w"],
                                          bp["down_conv"]["b"],
                                          bp["down_bn"], bs["down_bn"])
                nb["down_conv"] = {"w": w, "b": b}
            stage.append(nb)
        folded[f"layer{si + 1}"] = stage
    return folded


def _folded_encoder_apply(params, x, depth, precision):
    """encoder_apply with BN already folded into the convs."""
    from ..nn.layers import conv2d, max_pool_3x3_s2, relu

    kind, stage_blocks = resnet.ARCHS[depth]
    x = (x - 0.45) / 0.225
    x = relu(conv2d(x, params["stem_conv"]["w"], params["stem_conv"]["b"],
                    stride=2, padding=3, precision=precision))
    features = [x]
    x = max_pool_3x3_s2(x)
    for si in range(len(stage_blocks)):
        for bi, bp in enumerate(params[f"layer{si + 1}"]):
            stride = 2 if (si > 0 and bi == 0) else 1
            identity = x
            y = relu(conv2d(x, bp["conv1"]["w"], bp["conv1"]["b"],
                            stride=stride, padding=1, precision=precision))
            y = conv2d(y, bp["conv2"]["w"], bp["conv2"]["b"], stride=1,
                       padding=1, precision=precision)
            if "down_conv" in bp:
                identity = conv2d(x, bp["down_conv"]["w"], bp["down_conv"]["b"],
                                  stride=stride, padding=0, precision=precision)
            x = relu(y + identity)
        features.append(x)
    return features


def _stack_conv(mask_conv, depth_conv):
    """Two [kh,kw,ci,co] convs -> grouped kernel [kh,kw,ci,2co]."""
    w = np.concatenate([np.asarray(mask_conv["w"]),
                        np.asarray(depth_conv["w"])], axis=-1)
    b = None
    if mask_conv["b"] is not None:
        b = np.concatenate([np.asarray(mask_conv["b"]),
                            np.asarray(depth_conv["b"])])
    return {"w": w, "b": b}


def pack_fused_decoders(mask_p, depth_p):
    """Pack the two decoders' params into grouped-conv kernels."""
    fused = {}
    for blk in ("block1", "block2", "block3", "block4"):
        fused[blk] = {
            sub: {
                f"conv{i}": _stack_conv(mask_p[blk][sub][f"conv{i}"],
                                        depth_p[blk][sub][f"conv{i}"])
                for i in (1, 2)
            }
            for sub in ("pre", "post")
        }
    for oc in ("outconv1", "outconv2", "outconv3", "outconv4_out"):
        fused[oc] = {"conv1": _stack_conv(mask_p[oc]["conv1"],
                                          depth_p[oc]["conv1"])}
    fused["outconv4_conv"] = {
        f"conv{i}": _stack_conv(mask_p["outconv4_conv"][f"conv{i}"],
                                depth_p["outconv4_conv"][f"conv{i}"])
        for i in (1, 2)
    }
    return fused


def _gconv(x, w, b, *, precision):
    """Grouped conv, 2 groups, reflect-pad 1 (the fused ConvBlock conv)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        reflect_pad(x, 1), w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=dn, feature_group_count=2,
        preferred_element_type=jnp.float32, precision=precision)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def _fused_conv_block(p, x, precision):
    x = jax.nn.elu(_gconv(x, p["conv1"]["w"], p["conv1"]["b"], precision=precision))
    x = jax.nn.elu(_gconv(x, p["conv2"]["w"], p["conv2"]["b"], precision=precision))
    return x


def _dup_skip(skip):
    """Skip features duplicated for both groups: [.., C] -> [.., 2C]."""
    return jnp.concatenate([skip, skip], axis=-1)


def _interleave_concat(x2, skip):
    """x2 carries [mask_x | depth_x]; produce [mask_x, skip, depth_x, skip]
    so each group of the following grouped conv sees (its x, skip)."""
    c = x2.shape[-1] // 2
    return jnp.concatenate([x2[..., :c], skip, x2[..., c:], skip], axis=-1)


def fused_decoders_apply(fused, features, *, precision=None, scales=("1/1",)):
    """Run both decoders as one grouped tower.

    Returns {scale: [N,H,W,4]} with channel order [vis_logit, hid_logit,
    depth_sig, hid_depth_sig] — depth half sigmoided, mask half raw, i.e.
    exactly FootprintNetwork.apply's contract.
    """
    outputs = {}

    def out_conv(name, x2, scale):
        y = _gconv(x2, fused[name]["conv1"]["w"], fused[name]["conv1"]["b"],
                   precision=precision)
        c = y.shape[-1] // 2
        y = jnp.concatenate([y[..., :c], jax.nn.sigmoid(y[..., c:])], axis=-1)
        if scale != 1:
            y = upsample_bilinear(y, scale)
        return y

    x = _dup_skip(features[-1])
    skips = [features[-2], features[-3], features[-4], features[-5]]
    for i, (blk, skip) in enumerate(zip(("block1", "block2", "block3", "block4"),
                                        skips), start=1):
        x = _fused_conv_block(fused[blk]["pre"], x, precision)
        x = upsample_nearest(x, 2)
        x = _interleave_concat(x, skip)
        x = _fused_conv_block(fused[blk]["post"], x, precision)
        if i == 2 and "1/8" in scales:
            outputs["1/8"] = out_conv("outconv1", x, 8)
        if i == 3 and "1/4" in scales:
            outputs["1/4"] = out_conv("outconv2", x, 4)
        if i == 4 and "1/2" in scales:
            outputs["1/2"] = out_conv("outconv3", x, 2)
    x = upsample_nearest(x, 2)
    x = _fused_conv_block(fused["outconv4_conv"], x, precision)
    outputs["1/1"] = out_conv("outconv4_out", x, 1)
    return outputs


class FusedFootprintPredictor:
    """Inference-optimized forward: BN-folded encoder + grouped dual decoder.

    ~identical numerics to FootprintNetwork.apply(train=False) (BN folding
    reassociates a multiply; grouped convs don't mix groups).
    """

    def __init__(self, net, params, state, *, precision=None,
                 scales=("1/1",)):
        self.depth = net.depth
        self.enc_params = fold_encoder_bn(params["encoder"], state["encoder"],
                                          net.depth)
        self.fused = pack_fused_decoders(params["mask_decoder"],
                                         params["depth_decoder"])
        self.precision = precision
        self.scales = scales

    def __call__(self, images):
        feats = _folded_encoder_apply(self.enc_params, images, self.depth,
                                      self.precision)
        return fused_decoders_apply(self.fused, feats,
                                    precision=self.precision,
                                    scales=self.scales)
