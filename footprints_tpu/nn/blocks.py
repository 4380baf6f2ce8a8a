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
from .layers import batch_norm, conv2d, elu, reflect_pad, relu, sigmoid, upsample_bilinear, upsample_nearest


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


def up_concat_block(params, state, x, skip, *, use_bn=False, use_elu=True, train=False):
    """pre-conv -> nearest x2 upsample -> channel-concat skip -> post-conv."""
    x, pre_s = conv_block(params["pre"], state["pre"], x, use_bn=use_bn, use_elu=use_elu, train=train)
    x = upsample_nearest(x, 2)
    x = jnp.concatenate([x, skip], axis=-1)
    x, post_s = conv_block(params["post"], state["post"], x, use_bn=use_bn, use_elu=use_elu, train=train)
    return x, {"pre": pre_s, "post": post_s}


def init_out_conv_block(key, c_in, c_out):
    return {"conv1": nn_init.conv_kaiming_uniform(key, 3, 3, c_in, c_out)}


def out_conv_block(params, x, *, scale, apply_sigmoid):
    conv = params["conv1"]
    x = conv2d(reflect_pad(x, 1), conv["w"], conv["b"])
    if apply_sigmoid:
        x = sigmoid(x)
    if scale != 1:
        x = upsample_bilinear(x, scale)
    return x
