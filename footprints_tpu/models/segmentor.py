"""Segmentor — binary ground-segmentation network (preprocessing pipeline A).

Behavioral contract (reference:
/root/reference/footprints/preprocessing/segmentation/network.py:13-207):
  * same ResNet encoder as FootprintNetwork (5 features, (x-0.45)/0.225)
  * optional PSP bottleneck: adaptive-avg-pool to (1,2,4,6), 1x1 bias-free
    reduce conv 512->128 each, bilinear align_corners=True resize back, concat
    [x, p6, p4, p2, p1] -> 1024 channels
  * same up-concat decoder; 4 single-channel *logit* outputs returned as a
    list at their native scales (1/8, 1/4, 1/2, 1/1 of input) — unlike
    FootprintNetwork, the segmentor does NOT upsample outputs; the training
    loop resizes per-scale before the loss.

All tensors NHWC.
"""

import jax
import jax.numpy as jnp

from ..nn import blocks, init as nn_init, resnet
from ..nn.layers import conv2d, upsample_nearest

PSP_POOL_SIZES = (1, 2, 4, 6)


def adaptive_avg_pool(x, out_h, out_w):
    """torch.nn.AdaptiveAvgPool2d semantics on NHWC (static shapes).

    Cell (i, j) averages rows [floor(i*H/oh), ceil((i+1)*H/oh)) and the
    analogous column range.  Pool sizes here are tiny (<=6) so the cells are
    unrolled at trace time.
    """
    n, h, w, c = x.shape
    rows = []
    for i in range(out_h):
        r0, r1 = (i * h) // out_h, -((-(i + 1) * h) // out_h)
        cols = []
        for j in range(out_w):
            c0, c1 = (j * w) // out_w, -((-(j + 1) * w) // out_w)
            cols.append(jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # [N, out_h, out_w, C]


def _align_corners_weights(src, dst, dtype):
    """Linear-interpolation matrix [dst, src] with align_corners=True."""
    import numpy as np

    wm = np.zeros((dst, src), dtype=np.float32)
    if src == 1:
        wm[:, 0] = 1.0
        return jnp.asarray(wm, dtype=dtype)
    coords = np.arange(dst) * (src - 1) / (dst - 1) if dst > 1 else np.zeros(1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, src - 1)
    frac = coords - lo
    wm[np.arange(dst), lo] += 1.0 - frac
    wm[np.arange(dst), hi] += frac
    return jnp.asarray(wm, dtype=dtype)


def resize_bilinear_align_corners(x, out_h, out_w):
    """Bilinear resize with align_corners=True, expressed as two matmuls so it
    rides the MXU instead of a gather pipeline."""
    n, h, w, c = x.shape
    wh = _align_corners_weights(h, out_h, x.dtype)  # [out_h, h]
    ww = _align_corners_weights(w, out_w, x.dtype)  # [out_w, w]
    y = jnp.einsum("oh,nhwc->nowc", wh, x, precision="highest")
    return jnp.einsum("pw,nowc->nopc", ww, y, precision="highest")


def init_psp(key, feats=512, reduce_factor=4):
    keys = jax.random.split(key, len(PSP_POOL_SIZES))
    return {
        f"reduce{s}": nn_init.conv_kaiming_uniform(
            k, 1, 1, feats, feats // reduce_factor, with_bias=False
        )
        for s, k in zip(PSP_POOL_SIZES, keys)
    }


def psp_apply(params, x):
    n, h, w, c = x.shape
    pooled = []
    for s in PSP_POOL_SIZES:
        p = adaptive_avg_pool(x, s, s)
        p = conv2d(p, params[f"reduce{s}"]["w"])
        pooled.append(resize_bilinear_align_corners(p, h, w))
    p1, p2, p4, p6 = pooled
    return jnp.concatenate([x, p6, p4, p2, p1], axis=-1)


def init_seg_decoder(key, enc_channels, *, use_psp):
    c0, c1, c2, c3, c4 = enc_channels
    bottleneck_ch = c4 * 2 if use_psp else c4
    keys = jax.random.split(key, 10)
    params, state = {}, {}
    if use_psp:
        params["psp"] = init_psp(keys[9], c4)
    dec_ch = (256, 128, 64, 64)
    skip_ch = (c3, c2, c1, c0)
    c_in = bottleneck_ch
    for i, (c_out, sk) in enumerate(zip(dec_ch, skip_ch), start=1):
        p, s = blocks.init_up_concat_block_asym(keys[i - 1], c_in, c_out, sk)
        params[f"block{i}"] = p
        state[f"block{i}"] = s
        c_in = c_out
    params["outconv1"] = blocks.init_out_conv_block(keys[4], 128, 1)
    params["outconv2"] = blocks.init_out_conv_block(keys[5], 64, 1)
    params["outconv3"] = blocks.init_out_conv_block(keys[6], 64, 1)
    p_fc, s_fc = blocks.init_conv_block(keys[7], 64, 32)
    params["outconv4_conv"] = p_fc
    state["outconv4_conv"] = s_fc
    params["outconv4_out"] = blocks.init_out_conv_block(keys[8], 32, 1)
    return params, state


def seg_decoder_apply(params, state, features, *, use_psp, train=False):
    ns = {}
    outputs = []
    x = features[-1]
    if use_psp:
        x = psp_apply(params["psp"], x)
    x, ns["block1"] = blocks.up_concat_block(params["block1"], state["block1"], x, features[-2], train=train)
    x, ns["block2"] = blocks.up_concat_block(params["block2"], state["block2"], x, features[-3], train=train)
    outputs.append(blocks.out_conv_block(params["outconv1"], x, scale=1, apply_sigmoid=False))
    x, ns["block3"] = blocks.up_concat_block(params["block3"], state["block3"], x, features[-4], train=train)
    outputs.append(blocks.out_conv_block(params["outconv2"], x, scale=1, apply_sigmoid=False))
    x, ns["block4"] = blocks.up_concat_block(params["block4"], state["block4"], x, features[-5], train=train)
    outputs.append(blocks.out_conv_block(params["outconv3"], x, scale=1, apply_sigmoid=False))
    out_full, ns["outconv4_conv"] = blocks.decoder_tail(
        params["outconv4_conv"], state["outconv4_conv"],
        params["outconv4_out"], x, apply_sigmoid=False, train=train
    )
    outputs.append(out_full)
    return outputs, ns


class Segmentor:
    """Functional ground segmentor: ``init(key)``, ``apply(params, state, x)``.

    apply returns (list of 4 single-channel logit maps at scales
    1/8, 1/4, 1/2, 1/1 of the input resolution, new_state).
    """

    def __init__(self, depth: int = 34, use_psp: bool = True):
        self.depth = depth
        self.use_psp = use_psp
        self.enc_channels = resnet.feature_channels(depth)

    def init(self, key):
        k_enc, k_dec = jax.random.split(key)
        enc_p, enc_s = resnet.init_encoder(k_enc, self.depth)
        dec_p, dec_s = init_seg_decoder(k_dec, self.enc_channels, use_psp=self.use_psp)
        return {"encoder": enc_p, "decoder": dec_p}, {"encoder": enc_s, "decoder": dec_s}

    def apply(self, params, state, image, *, train: bool = False):
        ns = {}
        features, ns["encoder"] = resnet.encoder_apply(
            params["encoder"], state["encoder"], image, depth=self.depth, train=train
        )
        outputs, ns["decoder"] = seg_decoder_apply(
            params["decoder"], state["decoder"], features,
            use_psp=self.use_psp, train=train,
        )
        return outputs, ns
