"""Space-to-depth (s2d) execution of the decoder tail.

Problem: the decoder tail runs 3x3 convs over [N,192,640,32] tensors.  With
32 channels in the minor (lane) dimension, 75% of every 128-wide vector
transaction is padding — measured ~5% of MXU peak.

Fix: represent the full-resolution tensor as its 2x2 space-to-depth packing
[N,H/2,W/2,4C] (channel layout phase-major: (a,b) in row-major order, i.e.
channels [(0,0)C | (0,1)C | (1,0)C | (1,1)C], where full[2i+a, 2j+b, c] =
s2d[i, j, (2a+b)*C+c]).  Then:

  * `up_conv_to_s2d`   — conv3x3(reflect_pad(nearest_up_2x(x))) with the
    output LEFT IN s2d layout: a single 3x3 VALID conv over edge-padded x
    with a kernel whose 4 co-groups hold the phase-summed 2x2 kernels at
    offset (a, b) (see ops/upconv.py for the phase identity);
  * `s2d_conv3x3_reflect` — a full-res 3x3 stride-1 conv with reflect(1)
    padding, computed entirely in s2d layout: one 3x3 conv with a
    [3,3,4C,4Co] kernel assembled from w (tap (dy,dx) of output phase (a,b)
    reads input phase ((a+dy-1)%2,(b+dx-1)%2) at s2d offset
    (floor((a+dy-1)/2), ...)); borders are constructed explicitly so they
    match full-res reflect padding exactly;
  * `depth_to_space` — unpack [N,H,W,4C] -> [N,2H,2W,C] (only applied to the
    tiny final output).

All transforms are numerically identical to the naive full-res ops up to fp
summation order (tests/test_fast_ops.py).
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..nn.layers import conv2d, get_default_precision

# Gate for the hand-written fused conv backward (see _dxp_presliced).
# Read ONCE at module import — to flip it afterwards assign
# `s2d.FUSED_DGRAD = False` directly (as tools/diag_dxrows.py does) before
# building the train step; setting the env var post-import has no effect.
FUSED_DGRAD = os.environ.get("FOOTPRINTS_FUSED_DGRAD", "1") == "1"


def _conv(x, w, b=None, *, precision=None, padding=((0, 0), (0, 0))):
    """Stride-1 alias of nn.layers.conv2d so the subtle
    preferred_element_type rule (layers.py: f32 output only for f32 inputs,
    or the conv transpose rule breaks under autodiff) lives in ONE place."""
    return conv2d(x, w, b, padding=padding, precision=precision)


def space_to_depth(x):
    """[N,2H,2W,C] -> [N,H,W,4C], phase-major layout."""
    n, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    x = x.reshape(n, h, 2, w, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # [N,H,W,2,2,C]
    return x.reshape(n, h, w, 4 * c)


def depth_to_space(x):
    """[N,H,W,4C] phase-major -> [N,2H,2W,C]."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # [N,H,2,W,2,C]
    return x.reshape(n, 2 * h, 2 * w, c)


# The kernel transforms below are LINEAR in w, so each is one contraction of
# w with a small constant 0/1 selection tensor.  This matters inside the
# training step: a concat/scatter formulation re-executes as dozens of tiny
# serialized device ops per step (measured ~6 ms/step of the r1 train step),
# while the einsum form is a single fused op forward and one more backward.

def _phase_selector():
    """Constant T[3,3,2,2,3,3]: T[r,s,a,b,dy,dx] such that the phase-(a,b)
    embedded kernel is out[r,s,:,(2a+b)co+o] = sum_{dy,dx} T * w[dy,dx,:,o].

    Row/col mixing per axis: phase 0 taps [w0, w1+w2, 0], phase 1 taps
    [0, w0+w1, w2] (the nearest-up 2x phase identity, ops/upconv.py)."""
    m = np.zeros((2, 3, 3), np.float32)  # [phase, out_tap, in_tap]
    m[0, 0, 0] = m[0, 1, 1] = m[0, 1, 2] = 1.0
    m[1, 1, 0] = m[1, 1, 1] = m[1, 2, 2] = 1.0
    return np.einsum("ary,bsx->rsabyx", m, m)  # [3,3,2,2,3,3]


_PHASE_T = _phase_selector()


def _phase_embedded_kernel(w):
    """[3,3,ci,co] -> [3,3,ci,4co]: phase (a,b)'s 2x2 summed kernel embedded
    at kernel offset (a,b).  (See ops/upconv.py for the summing identity.)"""
    ci, co = w.shape[2], w.shape[3]
    t = jnp.asarray(_PHASE_T.reshape(3, 3, 4, 3, 3), w.dtype)
    k = jnp.einsum("rsgyx,yxio->rsigo", t, w,
                   precision=jax.lax.Precision.HIGHEST)
    return k.reshape(3, 3, ci, 4 * co)


@jax.custom_vjp
def _edge_pad1(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")


def _edge_pad1_fwd(x):
    return _edge_pad1(x), None


def _edge_pad1_bwd(_, g):
    """Transpose of 1-px edge pad: border cotangents fold onto the edge
    rows/cols themselves.  One interior slice + 4 row/col updates + 4
    corner taps instead of XLA's per-side full-tensor slice+add passes
    (~1.9 ms/step in the r2 train profile)."""
    gi = g[:, 1:-1, 1:-1]
    gi = gi.at[:, 0].add(g[:, 0, 1:-1]).at[:, -1].add(g[:, -1, 1:-1])
    gi = gi.at[:, :, 0].add(g[:, 1:-1, 0]).at[:, :, -1].add(g[:, 1:-1, -1])
    gi = (gi.at[:, 0, 0].add(g[:, 0, 0]).at[:, 0, -1].add(g[:, 0, -1])
            .at[:, -1, 0].add(g[:, -1, 0]).at[:, -1, -1].add(g[:, -1, -1]))
    return (gi,)


_edge_pad1.defvjp(_edge_pad1_fwd, _edge_pad1_bwd)


def up_conv_to_s2d(x, w, b=None, *, precision=None):
    """conv3x3(reflect_pad(nearest_up_2x(x))), output in s2d layout.

    x [N,H,W,C], w [3,3,C,Co] -> [N,H,W,4Co].
    """
    if FUSED_DGRAD:
        y = _edge_conv_phase(x, w, precision)
    else:
        y = _conv(_edge_pad1(x), _phase_embedded_kernel(w),
                  precision=precision)
    if b is not None:
        y = y + jnp.tile(b, 4)
    return y


def _s2d_selector():
    """Constant T[3,3,2,2,2,2,3,3]: T[di,dj,alpha,beta,a,b,dy,dx] = 1 where
    s2d-kernel tap (di,dj), input phase (alpha,beta), output phase (a,b)
    reads full-res kernel tap (dy,dx).  Each output element has at most one
    contributing w element (a pure gather), so the contraction is exact in
    any dtype."""
    t = np.zeros((3, 3, 2, 2, 2, 2, 3, 3), np.float32)
    for a in range(2):
        for dy in range(3):
            p = a + dy - 1
            di, alpha = (p - (p % 2)) // 2, p % 2
            for b_ in range(2):
                for dx in range(3):
                    q = b_ + dx - 1
                    dj, beta = (q - (q % 2)) // 2, q % 2
                    t[di + 1, dj + 1, alpha, beta, a, b_, dy, dx] = 1.0
    return t


_S2D_T = _s2d_selector()


def _s2d_kernel(w, channel_major_out=False):
    """[3,3,ci,co] -> [3,3,4ci,4co] s2d conv kernel: tap (dy,dx) of output
    phase (a,b) reads input phase ((a+dy-1)%2,(b+dx-1)%2) at s2d offset
    (floor((a+dy-1)/2), floor((b+dx-1)/2)).

    Output-channel grouping is phase-major ((2a+b)*co + o) by default;
    channel_major_out=True emits o*4 + (2a+b) instead — a constant
    permutation of the assembled kernel's output lanes, so it is FREE at
    conv time.  Channel-major lets a consumer slice "all 4 phases of
    channel o" as one contiguous lane slice (the s2d-basis 1/1 loss)."""
    ci, co = w.shape[2], w.shape[3]
    t = jnp.asarray(_S2D_T.reshape(3, 3, 4, 4, 3, 3), w.dtype)
    out_spec = "pqgioh" if channel_major_out else "pqgiho"
    k = jnp.einsum(f"pqghyx,yxio->{out_spec}", t, w,
                   precision=jax.lax.Precision.HIGHEST)
    return k.reshape(3, 3, 4 * ci, 4 * co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _s2d_reflect_pad(x, c):
    """Pad an s2d tensor [N,H,W,4C] by one s2d row/col on each side such
    that it corresponds to a 2-pixel reflect pad of the full-res image
    (of which only the outermost-tapped pixels are ever read).

    WARNING (r2): the pad rows/cols mix channel GROUPS — group (a,b) of a
    pad row comes from row 1 for a=0 and row 0 for a=1.  The obvious
    expression — a lane-dim concat of row slices taken at DIFFERENT row
    offsets — is miscompiled by the XLA:TPU build behind the axon tunnel
    (wrong pad rows ON CHIP ONLY; CPU runs of the same jaxpr are correct,
    so every CPU-mesh golden test passed while serving was wrong at the
    image borders).  `jnp.where` on a channel-index mask compiles
    correctly (bisected on-chip; `lax.optimization_barrier` does NOT
    help).  Do not rewrite this back to concats of channel-group slices —
    verify any change with `python tools/chip_parity.py --ops`.
    """
    # channel groups: g0=(0,0), g1=(0,1), g2=(1,0), g3=(1,1)
    ch = jnp.arange(x.shape[-1])
    # phase rows: a=0 -> groups g0,g1 (ch < 2c), a=1 -> groups g2,g3
    row_a0 = (ch < 2 * c)[None, None, None, :]
    # top s2d pad row: full rows (-2,-1) = reflect -> (2,1)
    top = jnp.where(row_a0, x[:, 1:2], x[:, 0:1])
    # bottom s2d pad row: full rows (2H, 2H+1) -> reflect (2H-2, 2H-3)
    bottom = jnp.where(row_a0, x[:, -1:], x[:, -2:-1])
    x = jnp.concatenate([top, x, bottom], axis=1)

    # columns: groups by b: b0 = (g0, g2) even groups, b1 = (g1, g3) odd
    col_b0 = ((ch // c) % 2 == 0)[None, None, None, :]
    # left s2d pad col: full cols (-2,-1) -> (2,1): b0 parts from col 1,
    # b1 parts from col 0
    left = jnp.where(col_b0, x[:, :, 1:2], x[:, :, 0:1])
    right = jnp.where(col_b0, x[:, :, -1:], x[:, :, -2:-1])
    return jnp.concatenate([left, x, right], axis=2)


def _s2d_reflect_pad_fwd(x, c):
    return _s2d_reflect_pad(x, c), None


def _s2d_reflect_pad_bwd(c, _, g):
    """Exact transpose of the where/concat construction above, in a single
    interior slice plus row/column-sized updates (XLA's autodiff of the
    forward ran four full-tensor add passes per tail conv, ~6.3 ms/step in
    the r2 profile; a two-stage hand VJP still cost two full slices).

    Column cotangents g[:,:,0]/g[:,:,-1] land on interior cols {0,1} /
    {-2,-1} (by b-group); their halo-row elements then flow with the row
    transpose.  Building the adjusted top/bottom rows as [N,W,4C]-sized
    temporaries keeps every op after the one big slice border-sized."""
    ch = jnp.arange(g.shape[-1])
    row_a0 = (ch < 2 * c)[None, None, :]
    col_b0 = ((ch // c) % 2 == 0)[None, None, :]
    zero = jnp.zeros((), g.dtype)

    def fold_cols(rows2d, row_b0):
        # transpose of the column pad for a [N, W+2, 4C] row: interior
        # cols + left/right cotangents folded onto cols {0,1}/{-2,-1}
        r = rows2d[:, 1:-1]
        lcol, rcol = rows2d[:, 0], rows2d[:, -1]
        r = r.at[:, 1].add(jnp.where(row_b0, lcol, zero))
        r = r.at[:, 0].add(jnp.where(row_b0, zero, lcol))
        r = r.at[:, -1].add(jnp.where(row_b0, rcol, zero))
        r = r.at[:, -2].add(jnp.where(row_b0, zero, rcol))
        return r

    # rows of the padded cotangent with their column transpose applied
    trow = fold_cols(g[:, 0], col_b0[0])      # [N, W, 4C]
    brow = fold_cols(g[:, -1], col_b0[0])
    gi = g[:, 1:-1, 1:-1]                     # the single big copy
    # column borders over interior rows (W-slice-sized updates)
    lcol, rcol = g[:, 1:-1, 0], g[:, 1:-1, -1]
    gi = gi.at[:, :, 1].add(jnp.where(col_b0, lcol, zero))
    gi = gi.at[:, :, 0].add(jnp.where(col_b0, zero, lcol))
    gi = gi.at[:, :, -1].add(jnp.where(col_b0, rcol, zero))
    gi = gi.at[:, :, -2].add(jnp.where(col_b0, zero, rcol))
    # row borders (row-sized updates)
    gi = gi.at[:, 1].add(jnp.where(row_a0, trow, zero))
    gi = gi.at[:, 0].add(jnp.where(row_a0, zero, trow))
    gi = gi.at[:, -1].add(jnp.where(row_a0, brow, zero))
    gi = gi.at[:, -2].add(jnp.where(row_a0, zero, brow))
    return (gi,)


_s2d_reflect_pad.defvjp(_s2d_reflect_pad_fwd, _s2d_reflect_pad_bwd)


# ---------------------------------------------------------------------------
# Fused backward (r3): XLA's autodiff of conv(pad(x)) lowers the input
# gradient to a conv-transpose over padded-cotangent shapes ([12,98,322,C],
# [12,50,162,C]) that the TPU backend schedules at 34-105 TF/s (r2 train
# profile).  The hand VJP below re-expresses d(xp) as ONE clean VALID conv
# producing the interior [N,H,W,Ci] (cotangent padded by 1, not 2) plus four
# single-row/col strip convs for the halo, reassembled with plain spatial
# concats (NOT channel-group concats — see the _s2d_reflect_pad warning),
# then folds through the same tested pad transposes.  dW routes through
# jax.vjp of the conv w.r.t. w only (XLA's native wgrad, fine at these
# channel counts).  Golden-tested values+grads in tests/test_fast_ops.py /
# test_pad_vjps.py; on-chip guard: tools/chip_parity.py --grads.
# ---------------------------------------------------------------------------

def _dxp_presliced(cot, kernel, precision):
    """d(xp) of y = conv_VALID(xp, kernel): full-correlation of the
    cotangent with the flipped kernel, built from pre-sliced pieces.
    All zero pads ride the convs' native `padding` (never materialized).

    cot [N,H,W,Co], kernel [3,3,Ci,Co] -> dxp [N,H+2,W+2,Ci].
    """
    wt = jnp.flip(kernel, axis=(0, 1)).swapaxes(2, 3)  # [3,3,Co,Ci]
    # interior rows/cols: dxp[1:H+1, 1:W+1]
    main = _conv(cot, wt, precision=precision,
                 padding=((1, 1), (1, 1)))  # [N,H,W,Ci]
    # top/bottom rows of dxp (r=0 / r=H+1): only the outermost kernel tap
    # reaches past the cotangent, so each is a 1x3 conv over one cot row,
    # cols padded by 2 to cover the dxp corners
    top = _conv(cot[:, :1], wt[2:3], precision=precision,
                padding=((0, 0), (2, 2)))
    bottom = _conv(cot[:, -1:], wt[0:1], precision=precision,
                   padding=((0, 0), (2, 2)))
    # left/right interior cols of dxp (c=0 / c=W+1, rows 1..H): 3x1 convs
    left = _conv(cot[:, :, :1], wt[:, 2:3], precision=precision,
                 padding=((1, 1), (0, 0)))
    right = _conv(cot[:, :, -1:], wt[:, 0:1], precision=precision,
                  padding=((1, 1), (0, 0)))
    mid = jnp.concatenate([left, main, right], axis=2)  # [N,H,W+2,Ci]
    return jnp.concatenate([top, mid, bottom], axis=1)  # [N,H+2,W+2,Ci]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _s2d_reflect_conv(x, w, c, precision, channel_major_out=False):
    return _conv(_s2d_reflect_pad(x, c), _s2d_kernel(w, channel_major_out),
                 precision=precision)


def _s2d_reflect_conv_fwd(x, w, c, precision, channel_major_out=False):
    return _s2d_reflect_conv(x, w, c, precision, channel_major_out), (x, w)


def _s2d_reflect_conv_bwd(c, precision, channel_major_out, res, cot):
    x, w = res
    kernel = _s2d_kernel(w, channel_major_out)
    dxp = _dxp_presliced(cot, kernel, precision)
    (dx,) = _s2d_reflect_pad_bwd(c, None, dxp)
    # dW: XLA's native wgrad w.r.t. w only (selector transpose included via
    # autodiff of the linear _s2d_kernel embedding).  The vjp through the
    # dense [3,3,4C,4Co] embedding does 4x the useful FLOPs (15/16 of the
    # dense kernel is structural zeros), but the measured alternative — dW
    # in the compact full-res basis via the s2d identity (two d2s relayouts
    # + a 4x-smaller contraction) — LOST 17% end-to-end on the chip
    # (157.3 vs 189.0 imgs/s @b12, r4): the d2s relayouts of x and cot cost
    # ~5 ms/step in layout copies and the smaller wgrad runs no faster.
    # See PERF.md r4 results; don't re-try without new numbers.
    _, vjp_w = jax.vjp(
        lambda w: _conv(_s2d_reflect_pad(x, c),
                        _s2d_kernel(w, channel_major_out),
                        precision=precision), w)
    (dw,) = vjp_w(cot)
    return dx, dw


_s2d_reflect_conv.defvjp(_s2d_reflect_conv_fwd, _s2d_reflect_conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _edge_conv_phase(x, w, precision):
    return _conv(_edge_pad1(x), _phase_embedded_kernel(w), precision=precision)


def _edge_conv_phase_fwd(x, w, precision):
    return _edge_conv_phase(x, w, precision), (x, w)


def _edge_conv_phase_bwd(precision, res, cot):
    x, w = res
    kernel = _phase_embedded_kernel(w)
    dxp = _dxp_presliced(cot, kernel, precision)
    (dx,) = _edge_pad1_bwd(None, dxp)
    _, vjp_w = jax.vjp(
        lambda w: _conv(_edge_pad1(x), _phase_embedded_kernel(w),
                        precision=precision), w)
    (dw,) = vjp_w(cot)
    return dx, dw


_edge_conv_phase.defvjp(_edge_conv_phase_fwd, _edge_conv_phase_bwd)


# ---------------------------------------------------------------------------
# Period-4 '1/2' head (r5): execute the half-scale output head directly on
# block4's s2d output, eliminating its full-res reflect pad + conv +
# bilinear (2.7x faster head on chip, PERF.md r5).  The full period-4 SEAM
# — running the tail's up-conv on the s2d tensor too (_up_conv_p4) — was
# built, golden-tested, and measured-REFUTED: deferring the d2s past the
# seam conv doubles the relayout bytes (the seam output has 2x the
# channels of its input), 5.61 vs 4.11 ms fwd+bwd at the model shape, and
# autodiff vs hand-VJP made no difference (5.53 ms).  Removed; numbers and
# the byte-count analysis live in PERF.md r5 results + tools/ab_p4_seam.py.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _edge_perm_np(c, axis, side):
    """[4C,4C] 0/1 permutation filling an s2d EDGE-pad border row/col.

    A 1-px edge pad of the underlying full-res image clamps full row -1 to
    row 0 — which lives in the OTHER phase group of s2d row 0, so the pad
    row needs a channel-GROUP shuffle.  A lane-dim concat of group slices
    is the r2 miscompile pattern; a permutation matmul is a different
    lowering entirely (MXU) and exact in any dtype (one 1*v product per
    output).  Only the groups the downstream s2d kernel actually reads are
    shuffled; unread groups keep identity lanes (harmless junk).
    """
    P = np.zeros((4 * c, 4 * c), np.float32)
    for d in range(4 * c):
        g, i = divmod(d, c)
        a, b = divmod(g, 2)
        src_g = g
        if axis == "row":
            # top pad row: only phase a=1 is read = full row -1 -> clamp 0
            # = s2d row 0 phase a=0; bottom: only a=0 read = full row 2H
            # -> clamp 2H-1 = s2d row H-1 phase a=1
            if side == "top" and a == 1:
                src_g = 0 * 2 + b
            elif side == "bottom" and a == 0:
                src_g = 1 * 2 + b
        else:
            if side == "left" and b == 1:
                src_g = a * 2 + 0
            elif side == "right" and b == 0:
                src_g = a * 2 + 1
        P[src_g * c + i, d] = 1.0
    return P


def _perm_mm(rows, P, dtype):
    """rows [..., 4C] x P [4C,4C] -> [..., 4C]; exact (one product/output)."""
    return jnp.einsum("...c,cd->...d", rows, jnp.asarray(P, dtype),
                      precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _s2d_edge_pad(x, c):
    """Pad an s2d tensor [N,H,W,4C] by one s2d row/col such that the
    positions the s2d conv kernel reads correspond to a 1-px EDGE pad of
    the full-res image (the up-conv identity pads the pre-upsample image
    with edge clamping — see _edge_pad1 / ops/upconv.py)."""
    dt = x.dtype
    top = _perm_mm(x[:, :1], _edge_perm_np(c, "row", "top"), dt)
    bottom = _perm_mm(x[:, -1:], _edge_perm_np(c, "row", "bottom"), dt)
    x = jnp.concatenate([top, x, bottom], axis=1)  # spatial concat: safe
    left = _perm_mm(x[:, :, :1], _edge_perm_np(c, "col", "left"), dt)
    right = _perm_mm(x[:, :, -1:], _edge_perm_np(c, "col", "right"), dt)
    return jnp.concatenate([left, x, right], axis=2)


def _s2d_edge_pad_fwd(x, c):
    return _s2d_edge_pad(x, c), None


def _s2d_edge_pad_bwd(c, _, g):
    """Transpose: border cotangents fold through the permutations' inverses
    onto the border rows/cols; one big interior slice (same shape economy
    as _s2d_reflect_pad_bwd)."""
    dt = g.dtype
    # undo the column pad (applied last): cols 0 / -1 -> col 0 / -1 via P^T
    g1 = g[:, :, 1:-1]
    g1 = g1.at[:, :, 0].add(_perm_mm(
        g[:, :, 0], _edge_perm_np(c, "col", "left").T, dt))
    g1 = g1.at[:, :, -1].add(_perm_mm(
        g[:, :, -1], _edge_perm_np(c, "col", "right").T, dt))
    # undo the row pad
    gi = g1[:, 1:-1]
    gi = gi.at[:, 0].add(_perm_mm(
        g1[:, 0], _edge_perm_np(c, "row", "top").T, dt))
    gi = gi.at[:, -1].add(_perm_mm(
        g1[:, -1], _edge_perm_np(c, "row", "bottom").T, dt))
    return (gi,)


_s2d_edge_pad.defvjp(_s2d_edge_pad_fwd, _s2d_edge_pad_bwd)


@functools.lru_cache(maxsize=None)
def _bilinear_up2_kernel_np(c):
    """[3,3,c,4c] phase-embedded bilinear x2 (align_corners=False),
    channel-major output lanes (ch*4 + 2a+b): f[2p+a] = 0.25 g[p-1+2a] +
    0.75 g[p]; border clamping = the edge pad."""
    k = np.zeros((3, 3, c, 4 * c), np.float32)
    taps = {0: ((0, 0.25), (1, 0.75)), 1: ((1, 0.75), (2, 0.25))}
    for a in (0, 1):
        for b_ in (0, 1):
            for dy, wy in taps[a]:
                for dx, wx in taps[b_]:
                    for ch in range(c):
                        k[dy, dx, ch, ch * 4 + 2 * a + b_] = wy * wx
    return k


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def bilinear_up2_p4(x, c, precision=None):
    """Bilinear x2 upsample (align_corners=False) of a map given in s2d
    layout, output in period-4 layout: x = s2d(g) [N,h,w,4c] ->
    [N,h,w,16c], lanes ch*16 + (2a+b)*4 + (2alpha+beta) where the full-res
    row is 4i + 2*alpha + a (matches train/losses.py:p4_map).  Constant
    kernel (no weight grads)."""
    k = _s2d_kernel(jnp.asarray(_bilinear_up2_kernel_np(c), x.dtype),
                    channel_major_out=True)
    return _conv(_s2d_edge_pad(x, c), k, precision=precision)


def _bilinear_up2_p4_fwd(x, c, precision):
    return bilinear_up2_p4(x, c, precision), None


def _bilinear_up2_p4_bwd(c, precision, _, cot):
    k = _s2d_kernel(jnp.asarray(_bilinear_up2_kernel_np(c), cot.dtype),
                    channel_major_out=True)
    dxp = _dxp_presliced(cot, k, precision)
    (dx,) = _s2d_edge_pad_bwd(c, None, dxp)
    return (dx,)


bilinear_up2_p4.defvjp(_bilinear_up2_p4_fwd, _bilinear_up2_p4_bwd)


def _nested_phase_lane(s, ry, rx):
    """Lane index of full-res phase (ry, rx) in the nested period-2 pack
    order shared by s2d_map (s=2), p4_map (s=4), and p8_map (s=8) in
    train/losses.py: lane = sum_k (2*bit_k(ry) + bit_k(rx)) * 4^(m-1-k),
    m = log2(s) — LSB phase bits form the outermost lane group."""
    m = s.bit_length() - 1
    lane = 0
    for kb in range(m):
        lane += (2 * ((ry >> kb) & 1) + ((rx >> kb) & 1)) * 4 ** (m - 1 - kb)
    return lane


def _bilin_taps(s, r):
    """(tap index in {0,1,2}, weight) pairs for output phase r of a
    bilinear xS upsample (align_corners=False): f[s*p + r] interpolates
    g[p + lo] and g[p + lo + 1] with a = (r+0.5)/s - 0.5, lo = floor(a);
    tap index = lo+1 / lo+2 into a 1-px-padded axis.  All weights are
    exact binary fractions (denominator 2s)."""
    a = (r + 0.5) / s - 0.5
    lo = int(np.floor(a))
    w_hi = a - lo
    taps = []
    if w_hi < 1.0:
        taps.append((lo + 1, 1.0 - w_hi))
    if w_hi > 0.0:
        taps.append((lo + 2, w_hi))
    return tuple(taps)


@functools.lru_cache(maxsize=None)
def _bilinear_up_packed_kernel_np(c, s):
    """[3,3,c,s*s*c] constant kernel: bilinear xS (align_corners=False) of
    a STANDARD-layout map with the output left packed period-S, lanes
    ch*s^2 + _nested_phase_lane(s, ry, rx).  Border clamping is supplied
    by a 1-px edge pad of the input."""
    assert s & (s - 1) == 0 and s >= 2, f"s={s} must be a power of two"
    k = np.zeros((3, 3, c, s * s * c), np.float32)
    for ry in range(s):
        for rx in range(s):
            lane = _nested_phase_lane(s, ry, rx)
            for dy, wy in _bilin_taps(s, ry):
                for dx, wx in _bilin_taps(s, rx):
                    for ch in range(c):
                        k[dy, dx, ch, ch * s * s + lane] = wy * wx
    return k


def bilinear_up_packed(y, s, *, precision=None):
    """Bilinear xS upsample (align_corners=False) of a standard-layout map
    with the output left in period-S packed layout: [N,h,w,c] ->
    [N,h,w,s^2*c], lanes ch*s^2 + nested phase lane — the '1/4'/'1/8'
    output-head analog of bilinear_up2_p4 (reference semantics:
    /root/reference/footprints/network.py SkipDecoder's F.interpolate to
    full res; here the xS interpolation is a constant 3x3 conv emitting
    all s^2 phases as lanes, and the [N,s*h,s*w,c] tensor is never
    materialized).  The input is standard layout, so the border clamp is
    a plain 1-px edge pad.  Lane order matches train/losses.py p4_map
    (s=4) so packed targets could score such a head directly.
    Constant kernel => no weight grads; autodiff supplies the VJP (the
    pad transpose is two slice-adds, the conv dgrad is a mirrored conv).

    MEASURED-REFUTED as a model head (PERF.md r5,
    tools/ab_packed_heads.py): 0.71x/0.68x vs the full-res bilinear at
    the '1/4'/'1/8' sites on chip — XLA's separable resize lowering is
    already efficient there.  Kept, golden-tested, as the executable
    spec behind the refutation numbers; not wired into the model.
    """
    c = y.shape[-1]
    k = jnp.asarray(_bilinear_up_packed_kernel_np(c, s), y.dtype)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return _conv(yp, k, precision=precision or jax.lax.Precision.HIGHEST)


def s2d_conv3x3_reflect(x, w, b=None, *, precision=None,
                        channel_major_out=False):
    """Full-res conv3x3(reflect_pad(X)) computed in s2d layout.

    x [N,H,W,4C] (s2d of [N,2H,2W,C]), w [3,3,C,Co] -> [N,H,W,4Co].
    Output channel grouping: phase-major by default (matches the s2d input
    convention); channel_major_out=True groups all 4 phases of each output
    channel contiguously (see _s2d_kernel) — used by the s2d-basis 1/1 head
    so loss-term slices are contiguous in lanes.
    """
    if FUSED_DGRAD:
        y = _s2d_reflect_conv(x, w, w.shape[2], precision, channel_major_out)
    else:
        y = _conv(_s2d_reflect_pad(x, w.shape[2]),
                  _s2d_kernel(w, channel_major_out), precision=precision)
    if b is not None:
        y = y + (jnp.repeat(b, 4) if channel_major_out else jnp.tile(b, 4))
    return y
