"""Decoder building blocks (functional).

Behavioral spec from the reference decoder
(/root/reference/footprints/network.py:104-183):

  ConvBlock:        [reflect-pad(1) -> 3x3 conv -> (BN) -> ELU] x 2
  ConvUpsampleAndConcatBlock: pre-conv -> nearest x2 -> concat(skip) -> post-conv
  OutConvBlock:     reflect-pad(1) -> 3x3 conv -> (sigmoid) -> bilinear x scale

Each block is a pair of functions: ``init_<block>(key, ...) -> (params, state)``
and ``<block>(params, state, x, ..., train) -> (y, new_state)``.  ``state`` is
non-empty only when BN is enabled (the reference trains the decoders with BN
off; BN support is kept because the constructor exposes it).
"""

import jax
import jax.numpy as jnp

from . import init as nn_init
from .layers import (batch_norm, conv2d, elu, reflect_pad, relu, sigmoid,
                     upsample_bilinear, upsample_nearest)


def init_conv_block(key, c_in, c_out, *, use_bn=False):
    k1, k2 = jax.random.split(key)
    params = {
        "conv1": nn_init.conv_kaiming_uniform(k1, 3, 3, c_in, c_out),
        "conv2": nn_init.conv_kaiming_uniform(k2, 3, 3, c_out, c_out),
    }
    state = {}
    if use_bn:
        params["bn1"], state["bn1"] = nn_init.batchnorm(c_out)
        params["bn2"], state["bn2"] = nn_init.batchnorm(c_out)
    return params, state


def conv_block(params, state, x, *, use_bn=False, use_elu=True, train=False):
    act = elu if use_elu else relu
    new_state = dict(state)
    for i in (1, 2):
        conv = params[f"conv{i}"]
        x = conv2d(reflect_pad(x, 1), conv["w"], conv["b"])
        if use_bn:
            x, new_state[f"bn{i}"] = batch_norm(
                x, params[f"bn{i}"], state[f"bn{i}"], train=train
            )
        x = act(x)
    return x, new_state


def init_up_concat_block(key, c_in, c_out, *, use_bn=False):
    k1, k2 = jax.random.split(key)
    pre_p, pre_s = init_conv_block(k1, c_in, c_out, use_bn=use_bn)
    post_p, post_s = init_conv_block(k2, 2 * c_out, c_out, use_bn=use_bn)
    params = {"pre": pre_p, "post": post_p}
    state = {"pre": pre_s, "post": post_s}
    return params, state


def init_up_concat_block_asym(key, c_in, c_out, skip_ch, *, use_bn=False):
    """Like init_up_concat_block but the post-concat conv consumes
    ``c_out + skip_ch`` channels (reference hardcodes skip_ch == c_out, which
    only holds for ResNet-18/34 encoders; this generalizes to ResNet-50)."""
    k1, k2 = jax.random.split(key)
    pre_p, pre_s = init_conv_block(k1, c_in, c_out, use_bn=use_bn)
    post_p, post_s = init_conv_block(k2, c_out + skip_ch, c_out, use_bn=use_bn)
    return {"pre": pre_p, "post": post_p}, {"pre": pre_s, "post": post_s}


# spatial size (pixels of the upsampled map) above which the s2d fast path
# wins over the naive composition; below it the s2d relayouts dominate
_S2D_MIN_PIXELS = 96 * 320


def _pallas_ok(x, x_s2d_next, conv1, conv2):
    """Gate for the fused Pallas serving path (opt-in via
    FOOTPRINTS_PALLAS_CONV=1): TPU backend and shapes the kernel tiles
    cleanly.  Default off — the XLA composition with the fixed reflect pad
    measures faster at every model shape (ops/pallas_conv.py header)."""
    from ..ops.pallas_conv import pallas_supported
    co4 = 4 * conv1["w"].shape[-1]
    co4_2 = 4 * conv2["w"].shape[-1]
    return (pallas_supported(x, co4)
            and (x_s2d_next is None or pallas_supported(x_s2d_next, co4))
            and co4_2 % 128 == 0 and co4 * co4_2 <= 512 * 512)


def up_concat_block(params, state, x, skip, *, use_bn=False, use_elu=True,
                    train=False, fast=None, s2d_output=False):
    """pre-conv -> nearest x2 upsample -> channel-concat skip -> post-conv.

    fast=True (default) runs the post-block in space-to-depth layout
    (see ops/s2d.py): the first conv decomposes linearly as
    conv(concat(up(x), skip), w) = up_conv_to_s2d(x, w[:c]) +
    s2d_conv(s2d(skip), w[c:]), the second conv stays in s2d, and the
    result is unpacked once.  No upsampled/concatenated tensor is ever
    materialized, and the convs run at full 4x channel width.
    Numerically identical up to fp summation order (golden-tested).

    s2d_output=True returns the result still in s2d layout [N,H,W,4C]
    so the p4 '1/2' head (out_conv_block_p4) can consume it before the
    caller's depth_to_space (PERF.md r5).
    """
    from ..ops.s2d import (depth_to_space, s2d_conv3x3_reflect,
                           space_to_depth, up_conv_to_s2d)

    act = elu if use_elu else relu
    x, pre_s = conv_block(params["pre"], state["pre"], x, use_bn=use_bn,
                          use_elu=use_elu, train=train)
    post_s = dict(state["post"])
    if fast is None:
        fast = skip.shape[1] * skip.shape[2] >= _S2D_MIN_PIXELS
    if fast and not use_bn:
        c_up = x.shape[-1]
        conv1 = params["post"]["conv1"]
        conv2 = params["post"]["conv2"]
        skip_s2d = space_to_depth(skip)
        if use_elu and not train and _pallas_ok(x, skip_s2d, conv1, conv2):
            # fused Pallas path (serving): pad+conv+bias+ELU in one kernel
            # per conv, no HBM pad materialization (ops/pallas_conv.py)
            from ..ops.pallas_conv import (s2d_conv_fused, s2d_conv_res_fused,
                                           up_conv_s2d_fused)
            r = up_conv_s2d_fused(x, conv1["w"][:, :, :c_up, :],
                                  jnp.zeros_like(conv1["b"]), "none")
            y = s2d_conv_res_fused(skip_s2d, conv1["w"][:, :, c_up:, :],
                                   conv1["b"], r, "elu")
            y = s2d_conv_fused(y, conv2["w"], conv2["b"], "elu")
        else:
            y = up_conv_to_s2d(x, conv1["w"][:, :, :c_up, :]) \
                + s2d_conv3x3_reflect(skip_s2d, conv1["w"][:, :, c_up:, :])
            y = act(y + jnp.tile(conv1["b"], 4))
            y = act(s2d_conv3x3_reflect(y, conv2["w"], conv2["b"]))
        x = y if s2d_output else depth_to_space(y)
    else:
        x = upsample_nearest(x, 2)
        x = jnp.concatenate([x, skip], axis=-1)
        x, post_s = conv_block(params["post"], state["post"], x, use_bn=use_bn,
                               use_elu=use_elu, train=train)
        if s2d_output:  # tiny-shape fallback keeps the layout contract
            x = space_to_depth(x)
    return x, {"pre": pre_s, "post": post_s}


def decoder_tail(conv_params, conv_state, out_params, x, *, apply_sigmoid,
                 out_scale=1, use_elu=True, train=False, s2d_output=False):
    """The decoder tail — nearest_up_2x -> ConvBlock -> OutConvBlock — run
    entirely in space-to-depth layout (full 128-lane channel widths at half
    spatial resolution; see ops/s2d.py).  Only the final 1-2 channel output
    is unpacked to full resolution.  Numerically identical to the naive
    composition up to fp order.

    s2d_output=True leaves the head output IN s2d layout, channel-major
    ([N,H/2,W/2,4*out_ch], channel o's 4 phases contiguous at lanes
    o*4..o*4+3) and skips the depth_to_space — the one 58 GB/s tiny-channel
    relayout of the train step (PERF.md r4 HLO audit).  Pixelwise losses
    are permutation-invariant, so the s2d-basis loss (train/losses.py)
    scores this head against s2d-packed targets instead.

    BN is NOT supported here (the reference trains decoders with BN off);
    guard against silently skipping normalization if a BN-enabled ConvBlock
    ever reaches this tail."""
    assert not conv_state, (
        "decoder_tail does not support BatchNorm ConvBlocks (state must be "
        "empty); use the naive conv_block composition for use_bn=True"
    )
    assert not (s2d_output and out_scale != 1), \
        "s2d_output only makes sense for the native-resolution head"
    from ..ops.s2d import (depth_to_space, s2d_conv3x3_reflect,
                           up_conv_to_s2d)

    act = elu if use_elu else relu
    c1, c2 = conv_params["conv1"], conv_params["conv2"]
    if use_elu and not train and _pallas_ok(x, None, c1, c2):
        from ..ops.pallas_conv import s2d_conv_fused, up_conv_s2d_fused
        y = up_conv_s2d_fused(x, c1["w"], c1["b"], "elu")
        y = s2d_conv_fused(y, c2["w"], c2["b"], "elu")
    else:
        y = act(up_conv_to_s2d(x, c1["w"], c1["b"]))
        y = act(s2d_conv3x3_reflect(y, c2["w"], c2["b"]))
    oc = out_params["conv1"]
    y = s2d_conv3x3_reflect(y, oc["w"], oc["b"],
                            channel_major_out=s2d_output)
    if apply_sigmoid:
        y = sigmoid(y)
    if s2d_output:
        return y, dict(conv_state)
    y = depth_to_space(y)
    if out_scale != 1:
        y = upsample_bilinear(y, out_scale)
    return y, dict(conv_state)


def init_out_conv_block(key, c_in, c_out):
    return {"conv1": nn_init.conv_kaiming_uniform(key, 3, 3, c_in, c_out)}


def out_conv_block_p4(params, x_s2d, *, apply_sigmoid):
    """OutConvBlock (reflect-pad -> conv3x3 -> sigmoid -> bilinear x2) with
    the input in s2d layout and the output in PERIOD-4 layout
    [N,h,w,16*co] (lanes ch*16 + (2a+b)*4 + (2alpha+beta); see
    ops/s2d.py:bilinear_up2_p4) — the p4 '1/2' head (2.7x faster than the
    full-res head on chip, PERF.md r5: the full-res reflect pad + conv +
    bilinear all run at half resolution with full lanes).  Scored against
    p4-packed targets (train/losses.py); numerically equal to
    out_conv_block(scale=2) up to fp order (golden-tested)."""
    from ..ops.s2d import bilinear_up2_p4, s2d_conv3x3_reflect

    conv = params["conv1"]
    y = s2d_conv3x3_reflect(x_s2d, conv["w"], conv["b"])
    if apply_sigmoid:
        y = sigmoid(y)
    return bilinear_up2_p4(y, conv["w"].shape[-1])


def out_conv_block(params, x, *, scale, apply_sigmoid):
    from ..ops.wgrad import conv3x3_valid_small_co

    conv = params["conv1"]
    # custom-wgrad conv: with 1-2 output channels XLA's default weight-grad
    # lowers to a slow VPU reduction loop (see ops/wgrad.py)
    x = conv3x3_valid_small_co(reflect_pad(x, 1), conv["w"], conv["b"])
    if apply_sigmoid:
        x = sigmoid(x)
    if scale != 1:
        x = upsample_bilinear(x, scale)
    return x
