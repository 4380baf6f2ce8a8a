"""FootprintNetwork — shared ResNet encoder + two skip decoders.

Behavioral contract (reference: /root/reference/footprints/network.py:13-101):
  * encoder: ResNet (depth configurable, checkpoint contract = 34), 5 features
  * mask decoder:  SkipDecoder with apply_sigmoid=False (BCE-with-logits)
  * depth decoder: SkipDecoder with apply_sigmoid=True (sigmoid-disparity)
  * per scale ('1/8','1/4','1/2','1/1'), output = concat(mask 2ch, depth 2ch)
    -> channel contract ch0=visible-ground logit, ch1=hidden-ground logit,
       ch2=visible sigmoid-disp, ch3=hidden-ground sigmoid-disp
    (constants in /root/reference/footprints/evaluation/evaluate_model.py:17-21)
  * every scale output is bilinearly upsampled (align_corners=False) to the
    full input resolution.

All tensors NHWC.  ``apply`` is pure: (params, state, image, train) ->
(outputs dict, new_state); wrap in jax.jit / shard_map at the call site.
"""

import jax
import jax.numpy as jnp

from ..nn import blocks, resnet
from ..nn.layers import upsample_nearest

SCALES = ("1/8", "1/4", "1/2", "1/1")

# Output channel contract
VISIBLE_GROUND = 0
HIDDEN_GROUND = 1
DEPTH = 2
HIDDEN_DEPTH = 3


def init_skip_decoder(key, enc_channels, out_ch=2):
    """Monodepth2-style U-Net decoder over 5 encoder features."""
    c0, c1, c2, c3, c4 = enc_channels
    dec_ch = (256, 128, 64, 64)
    keys = jax.random.split(key, 9)
    params, state = {}, {}
    skip_ch = (c3, c2, c1, c0)
    c_in = c4
    for i, (c_out, sk) in enumerate(zip(dec_ch, skip_ch), start=1):
        p, s = blocks.init_up_concat_block_asym(keys[i - 1], c_in, c_out, sk)
        params[f"block{i}"] = p
        state[f"block{i}"] = s
        c_in = c_out
    params["outconv1"] = blocks.init_out_conv_block(keys[4], 128, out_ch)
    params["outconv2"] = blocks.init_out_conv_block(keys[5], 64, out_ch)
    params["outconv3"] = blocks.init_out_conv_block(keys[6], 64, out_ch)
    p_final_conv, s_final_conv = blocks.init_conv_block(keys[7], 64, 32)
    params["outconv4_conv"] = p_final_conv
    state["outconv4_conv"] = s_final_conv
    params["outconv4_out"] = blocks.init_out_conv_block(keys[8], 32, out_ch)
    return params, state


def skip_decoder_apply(params, state, features, *, apply_sigmoid, train=False,
                       s2d_head=False, p4_head=False):
    """Returns ({'1/8','1/4','1/2','1/1'}: full-res NHWC maps, new_state).

    s2d_head=True replaces the '1/1' key with '1/1_s2d': the native-scale
    head left in channel-major s2d layout [N,H/2,W/2,4*out_ch] (see
    nn/blocks.py:decoder_tail) — the training-only fast path scored against
    s2d-packed targets (train/losses.py).

    p4_head=True additionally computes the '1/2' head from block4's s2d
    output BEFORE its depth_to_space (the tail still consumes the standard
    layout): the '1/2' key becomes '1/2_s2d2' — the half-scale head in
    PERIOD-4 layout [N,H/4,W/4,16*out_ch]
    (nn/blocks.py:out_conv_block_p4), scored against p4-packed targets.
    Eliminates the full-res 1/2 reflect pad + conv + bilinear from the
    train graph (2.7x faster head, PERF.md r5).  The full period-4 SEAM
    (tail up-conv on the s2d tensor too) was built and measured-refuted:
    deferring the d2s past the seam conv doubles the relayout bytes
    (PERF.md r5 results)."""
    ns = {}
    outputs = {}
    x = features[-1]
    x, ns["block1"] = blocks.up_concat_block(params["block1"], state["block1"], x, features[-2], train=train)
    x, ns["block2"] = blocks.up_concat_block(params["block2"], state["block2"], x, features[-3], train=train)
    outputs["1/8"] = blocks.out_conv_block(params["outconv1"], x, scale=8, apply_sigmoid=apply_sigmoid)
    x, ns["block3"] = blocks.up_concat_block(params["block3"], state["block3"], x, features[-4], train=train)
    outputs["1/4"] = blocks.out_conv_block(params["outconv2"], x, scale=4, apply_sigmoid=apply_sigmoid)
    x, ns["block4"] = blocks.up_concat_block(params["block4"], state["block4"], x, features[-5], train=train,
                                             s2d_output=p4_head)
    if p4_head:
        from ..ops.s2d import depth_to_space
        outputs["1/2_s2d2"] = blocks.out_conv_block_p4(
            params["outconv3"], x, apply_sigmoid=apply_sigmoid)
        x = depth_to_space(x)  # tail consumes the standard layout
    else:
        outputs["1/2"] = blocks.out_conv_block(params["outconv3"], x, scale=2, apply_sigmoid=apply_sigmoid)
    key11 = "1/1_s2d" if s2d_head else "1/1"
    outputs[key11], ns["outconv4_conv"] = blocks.decoder_tail(
        params["outconv4_conv"], state["outconv4_conv"],
        params["outconv4_out"], x, apply_sigmoid=apply_sigmoid, train=train,
        s2d_output=s2d_head,
    )
    return outputs, ns


class FootprintNetwork:
    """Functional model bundle: ``init(key)`` and ``apply(params, state, x)``.

    Not an object-with-weights — params/state live in pytrees owned by the
    caller so they can be sharded, donated, and checkpointed freely.
    """

    def __init__(self, depth: int = 34):
        self.depth = depth
        self.enc_channels = resnet.feature_channels(depth)

    def init(self, key):
        k_enc, k_mask, k_depth = jax.random.split(key, 3)
        enc_p, enc_s = resnet.init_encoder(k_enc, self.depth)
        mask_p, mask_s = init_skip_decoder(k_mask, self.enc_channels)
        depth_p, depth_s = init_skip_decoder(k_depth, self.enc_channels)
        params = {"encoder": enc_p, "mask_decoder": mask_p, "depth_decoder": depth_p}
        state = {"encoder": enc_s, "mask_decoder": mask_s, "depth_decoder": depth_s}
        return params, state

    def apply(self, params, state, image, *, train: bool = False,
              s2d_head: bool = False, p4_head: bool = False):
        """image: [N,H,W,3] float in [0,1].  Returns (outputs, new_state).

        outputs[scale]: [N,H,W,4] with the ch0..ch3 contract above.
        With s2d_head=True (training fast path) the '1/1' key becomes
        '1/1_s2d': [N,H/2,W/2,16], channel-major s2d — lanes 4c..4c+3 hold
        the 4 spatial phases (row-major (2a+b)) of contract channel c.
        With p4_head=True the '1/2' key becomes '1/2_s2d2':
        [N,H/4,W/4,16*4] period-4 layout, lanes c*16+phase16 (see
        nn/blocks.py:out_conv_block_p4).
        """
        ns = {}
        features, ns["encoder"] = resnet.encoder_apply(
            params["encoder"], state["encoder"], image, depth=self.depth, train=train
        )
        mask_out, ns["mask_decoder"] = skip_decoder_apply(
            params["mask_decoder"], state["mask_decoder"], features,
            apply_sigmoid=False, train=train, s2d_head=s2d_head,
            p4_head=p4_head,
        )
        depth_out, ns["depth_decoder"] = skip_decoder_apply(
            params["depth_decoder"], state["depth_decoder"], features,
            apply_sigmoid=True, train=train, s2d_head=s2d_head,
            p4_head=p4_head,
        )
        outputs = {
            k: jnp.concatenate([mask_out[k], depth_out[k]], axis=-1) for k in mask_out
        }
        return outputs, ns
