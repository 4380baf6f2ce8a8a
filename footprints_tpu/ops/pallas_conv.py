"""Pallas TPU kernel: fused pad -> 3x3 conv -> bias -> activation in s2d layout.

The decoder tail runs its 3x3 convs in space-to-depth layout (ops/s2d.py).
This kernel fuses the whole pad+conv+bias+act chain in VMEM:

  * the 1-ring halo (s2d-reflect or edge padding) is assembled in a VMEM
    scratch — the padded tensor never exists in HBM;
  * the conv is nine MXU contractions (one per tap) accumulated in f32;
  * bias and activation apply to the accumulator before the single
    bf16 write-back.

Grid: (N, H/th).  The one-row halos come from passing x three times with
shifted block index maps (prev/cur/next row-blocks); at the image border
the halo row is built from the reflect/edge rule instead (matching
ops/s2d.py:_s2d_reflect_pad and jnp.pad(mode='edge') exactly —
golden-tested in tests/test_pallas_conv.py).  The s2d reflect rule mixes
channel GROUPS, which Mosaic cannot express as lane-dim concats — it is
implemented as full-lane selects against constant channel masks instead.

History (r2): this kernel's independent implementation EXPOSED a real
XLA:TPU miscompile — the lane-concat-of-row-slices form of the s2d reflect
pad produced wrong border rows ON CHIP (see ops/s2d.py:_s2d_reflect_pad's
warning).  The kernel matched the pure-numpy reference while the XLA
composition did not.  Against the *fixed* where-select composition the
kernel is slower at every model shape (see ENABLE_MODEL_PATH below), so
the model path is opt-in; the kernel remains golden-tested and cross-
checked on chip by `python tools/chip_parity.py --ops` (the default
model-level run only exercises Pallas when FOOTPRINTS_PALLAS_CONV=1) as
an independent second opinion on the XLA path.

Wired into the decoder tail/up-concat fast paths (nn/blocks.py) behind a
custom_vjp whose backward falls back to the XLA composition.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(th, w_, c4, co4, pad_mode, act, out_dtype, precision,
                 with_residual):
    c = c4 // 4

    def kernel(x_prev_ref, x_cur_ref, x_next_ref, k_ref, b_ref, *rest):
        if with_residual:
            res_ref, o_ref, xp_ref = rest
        else:
            o_ref, xp_ref = rest
        i = pl.program_id(1)
        n_i = pl.num_programs(1)
        cur = x_cur_ref[0]                      # [th, W, C4]

        ch = jax.lax.broadcasted_iota(jnp.int32, (1, w_, c4), 2)
        if pad_mode == "s2d_reflect":
            # row halo: phase-row a=0 groups (g0,g1) reflect to row 1,
            # a=1 groups (g2,g3) to row 0 (ops/s2d.py:_s2d_reflect_pad)
            mask_a = ch < 2 * c
            refl_top = jnp.where(mask_a, cur[1:2], cur[0:1])
            refl_bot = jnp.where(mask_a, cur[-1:], cur[-2:-1])
        else:  # edge
            refl_top, refl_bot = cur[0:1], cur[-1:]
        top = jnp.where(i == 0, refl_top, x_prev_ref[0, th - 1:th])
        bot = jnp.where(i == n_i - 1, refl_bot, x_next_ref[0, 0:1])

        # assemble the padded block in VMEM scratch: rows 1..th at col 1..W
        xp_ref[0:1, 1:w_ + 1] = top
        xp_ref[1:th + 1, 1:w_ + 1] = cur
        xp_ref[th + 1:th + 2, 1:w_ + 1] = bot

        # column halo from the just-written interior columns
        chc = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, c4), 2)
        if pad_mode == "s2d_reflect":
            # phase-col b=0 groups (g0,g2) reflect to col 1, b=1 to col 0
            mask_b = (chc // c) % 2 == 0
            left = jnp.where(mask_b, xp_ref[:, 2:3], xp_ref[:, 1:2])
            right = jnp.where(mask_b, xp_ref[:, w_:w_ + 1],
                              xp_ref[:, w_ - 1:w_])
        else:
            left = xp_ref[:, 1:2]
            right = xp_ref[:, w_:w_ + 1]
        xp_ref[:, 0:1] = left
        xp_ref[:, w_ + 1:w_ + 2] = right

        acc = jnp.zeros((th, w_, co4), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc += jax.lax.dot_general(
                    xp_ref[dy:dy + th, dx:dx + w_, :], k_ref[dy, dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
        acc = acc + b_ref[0].astype(jnp.float32)
        if with_residual:
            acc = acc + res_ref[0].astype(jnp.float32)
        if act == "elu":
            # jax.nn.elu uses expm1, which Mosaic doesn't lower; exp on the
            # negative branch is exact enough in f32 (|err| < 6e-8)
            acc = jnp.where(acc > 0, acc, jnp.exp(jnp.minimum(acc, 0.0)) - 1.0)
        o_ref[0] = acc.astype(out_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("pad_mode", "act", "th",
                                             "precision", "interpret"))
def fused_conv3x3(x, k, b, residual=None, *, pad_mode="s2d_reflect",
                  act="elu", th=8, precision=None, interpret=False):
    """Fused pad+conv3x3+bias[+residual]+act.  x: [N,H,W,C4] (s2d layout for
    pad_mode='s2d_reflect', plain NHWC for 'edge'), k: [3,3,C4,Co4]
    (pre-transformed, e.g. ops/s2d.py:_s2d_kernel), b: [Co4];
    residual: optional [N,H,W,Co4] added before the activation.

    Returns [N,H,W,Co4] in x.dtype.  H must be divisible by th.
    """
    n, h, w_, c4 = x.shape
    co4 = k.shape[-1]
    assert h % th == 0, (h, th)
    nh = h // th
    if precision is None:
        precision = (jax.lax.Precision.DEFAULT if x.dtype == jnp.bfloat16
                     else jax.lax.Precision.HIGHEST)

    kernel = _make_kernel(th, w_, c4, co4, pad_mode, act, x.dtype, precision,
                          residual is not None)
    block = pl.BlockSpec((1, th, w_, c4),
                         lambda ni, hi: (ni, hi, 0, 0))
    block_prev = pl.BlockSpec((1, th, w_, c4),
                              lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0))
    block_next = pl.BlockSpec((1, th, w_, c4),
                              lambda ni, hi: (ni, jnp.minimum(hi + 1, nh - 1), 0, 0))
    in_specs = [
        block_prev,
        block,
        block_next,
        pl.BlockSpec((3, 3, c4, co4), lambda ni, hi: (0, 0, 0, 0)),
        pl.BlockSpec((1, co4), lambda ni, hi: (0, 0)),
    ]
    args = [x, x, x, k, b.reshape(1, co4)]
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, th, w_, co4),
                                     lambda ni, hi: (ni, hi, 0, 0)))
        args.append(residual)
    return pl.pallas_call(
        kernel,
        grid=(n, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w_, co4), lambda ni, hi: (ni, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w_, co4), x.dtype),
        scratch_shapes=[pltpu.VMEM((th + 2, w_ + 2, c4), x.dtype)],
        interpret=interpret,
    )(*args)


# set True (tests/conftest or a debug session) to run the kernels through
# the Pallas interpreter — lets the golden tests run on the CPU mesh
INTERPRET = False

# escape hatch: force pallas_supported() -> False so every call site takes
# the XLA composition.  Used by tools/chip_parity.py when tracing the
# CPU-backend reference from a TPU-default process (the kernels only lower
# for TPU), and available for A/B perf comparisons.
DISABLE = False

# Model-path opt-in (FOOTPRINTS_PALLAS_CONV=1).  Default OFF: against the
# FIXED where-select reflect pad (ops/s2d.py), the XLA composition is
# faster at every model shape (per-op slope A/B, r2: tail 1.11 vs 1.47 ms,
# up 1.17 vs 1.47, blk1 0.74 vs 0.86 at 192x640 b16; same ordering at
# 512x640).  The kernel's earlier 2.5x "win" was measured against the
# MISCOMPILED concat-pad composition.  The kernel stays: it is the
# independent implementation that exposed that miscompile, it is golden-
# tested in interpret mode, and `tools/chip_parity.py --ops` cross-checks it
# on the chip (the default model-level run only exercises Pallas when
# FOOTPRINTS_PALLAS_CONV=1) — a second opinion to diff the XLA path against.
import os as _os

ENABLE_MODEL_PATH = _os.environ.get("FOOTPRINTS_PALLAS_CONV") == "1"


def _apply_act(y, act):
    return jax.nn.elu(y) if act == "elu" else y


def _tile_rows(x):
    """Row-tile height: f32 doubles every VMEM buffer, so halve the tile
    (th=8 at f32 exceeds the 16 MB scoped-VMEM limit at W=320, C4=128)."""
    return 8 if x.dtype == jnp.bfloat16 else 4


def _xla_up_conv_act(x, w, b, act):
    from .s2d import up_conv_to_s2d
    return _apply_act(up_conv_to_s2d(x, w, b), act)


def _xla_s2d_conv_act(x, w, b, act):
    from .s2d import s2d_conv3x3_reflect
    return _apply_act(s2d_conv3x3_reflect(x, w, b), act)


# custom-VJP wrappers: Pallas forward, XLA-composition backward.  The
# decoder fast paths call these only on the no-grad serving path (train
# steps keep the XLA composition), but the VJP keeps them differentiable
# if someone takes grads through an eval-mode apply.

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def up_conv_s2d_fused(x, w, b, act="elu"):
    """act(conv3x3(reflect_pad(nearest_up_2x(x)))) in s2d layout — fused."""
    from .s2d import _phase_embedded_kernel
    return fused_conv3x3(x, _phase_embedded_kernel(w), jnp.tile(b, 4),
                         pad_mode="edge", act=act, th=_tile_rows(x),
                         interpret=INTERPRET)


def _up_fwd(x, w, b, act):
    return up_conv_s2d_fused(x, w, b, act), (x, w, b)


def _up_bwd(act, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x, w, b: _xla_up_conv_act(x, w, b, act), x, w, b)
    return vjp(g)


up_conv_s2d_fused.defvjp(_up_fwd, _up_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def s2d_conv_fused(x, w, b, act="elu"):
    """act(full-res conv3x3(reflect_pad(.)) computed in s2d layout) — fused."""
    from .s2d import _s2d_kernel
    return fused_conv3x3(x, _s2d_kernel(w), jnp.tile(b, 4),
                         pad_mode="s2d_reflect", act=act, th=_tile_rows(x),
                         interpret=INTERPRET)


def _s2d_fwd(x, w, b, act):
    return s2d_conv_fused(x, w, b, act), (x, w, b)


def _s2d_bwd(act, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x, w, b: _xla_s2d_conv_act(x, w, b, act), x, w, b)
    return vjp(g)


s2d_conv_fused.defvjp(_s2d_fwd, _s2d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def s2d_conv_res_fused(x, w, b, residual, act="elu"):
    """act(s2d_conv(x) + bias + residual) — fused (block4-post conv1)."""
    from .s2d import _s2d_kernel
    return fused_conv3x3(x, _s2d_kernel(w), jnp.tile(b, 4), residual,
                         pad_mode="s2d_reflect", act=act, th=_tile_rows(x),
                         interpret=INTERPRET)


def _s2d_res_fwd(x, w, b, residual, act):
    return s2d_conv_res_fused(x, w, b, residual, act), (x, w, b, residual)


def _s2d_res_bwd(act, res, g):
    x, w, b, residual = res
    from .s2d import s2d_conv3x3_reflect

    def ref(x, w, b, r):
        return _apply_act(s2d_conv3x3_reflect(x, w, b) + r, act)

    _, vjp = jax.vjp(ref, x, w, b, residual)
    return vjp(g)


s2d_conv_res_fused.defvjp(_s2d_res_fwd, _s2d_res_bwd)


def pallas_supported(x, co4: int) -> bool:
    """Static gate for the fused kernel: TPU backend, tiling-friendly shapes.

    Called at trace time with concrete shapes; the CPU test mesh and the
    FOOTPRINTS_PLATFORM=cpu knob both fall back to the XLA composition.
    """
    if DISABLE or not ENABLE_MODEL_PATH:
        return False
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    if backend not in ("tpu", "axon"):
        return False
    # bf16 only: at f32 the halved tile (VMEM) loses to the XLA composition
    # (185 vs 205 imgs/s at 192x640 batch 16, measured r2)
    if x.dtype != jnp.bfloat16:
        return False
    th = _tile_rows(x)
    n, h, w_, c4 = x.shape
    # c4*co4 cap: the whole [3,3,c4,co4] kernel sits in VMEM; past 512x512
    # groups (4.7 MB bf16) the kernel loses to XLA's channel-tiled convs
    # (512x640 model: 257 imgs/s gated-in vs 296 gated-out, measured r2)
    return (h % th == 0 and h >= th and w_ >= 64 and c4 >= 64
            and co4 % 128 == 0 and c4 * co4 <= 512 * 512)
