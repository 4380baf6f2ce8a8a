"""Custom-VJP 3x3 VALID conv for tiny output-channel heads.

The out-conv heads (64->2, reference network.py:161-183) backpropagate
through a weight-gradient whose natural conv formulation has N=2 output
channels.  XLA's TPU backend lowers that wgrad to a fused vector-unit
reduction loop instead of an MXU op — measured 3.0 ms per head at
[12,96,320,64] (≈16 GB/s effective) in the r2 train-step profile, ~7.5
ms/step across the four heads.

This wrapper keeps the forward exactly as before and overrides the VJP:

  * dW: nine shifted ``nhwi,nhwo->io`` contractions (one per kernel tap) —
    pure streaming reads of the activation at full HBM bandwidth;
  * dX: the standard transposed conv, written explicitly (spatially flipped
    kernel, in/out channels swapped) so it stays an MXU conv;
  * db: a plain sum over the cotangent.

Numerically identical to the autodiff gradients up to fp summation order
(golden-tested in tests/test_fast_ops.py).
"""

import functools

import jax
import jax.numpy as jnp

from ..nn.layers import conv2d, get_default_precision


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_valid_small_co(xp, w, b, precision=None):
    """VALID 3x3 conv over a pre-padded input.  xp: [N,H+2,W+2,C],
    w: [3,3,C,co], b: [co] -> [N,H,W,co]."""
    _check_3x3(w)
    return conv2d(xp, w, b, precision=precision)


def _check_3x3(w):
    # the hand-written _bwd hard-codes three taps and a pad-2 transpose:
    # any other kernel would get a correct forward and silently wrong grads
    if w.shape[:2] != (3, 3):
        raise ValueError(
            f"conv3x3_valid_small_co requires a 3x3 kernel, got {w.shape}")


def _fwd(xp, w, b, precision):
    _check_3x3(w)
    return conv2d(xp, w, b, precision=precision), (xp, w, b)


def _bwd(precision, res, cot):
    xp, w, b = res
    precision = precision or get_default_precision()
    n, hp, wp, ci = xp.shape
    h, w_ = hp - 2, wp - 2
    # dW[dy,dx,ci,co] = sum_{n,h,w} xp[n,h+dy,w+dx,ci] * cot[n,h,w,co]
    taps = []
    for dy in range(3):
        row = []
        for dx in range(3):
            sl = jax.lax.slice(xp, (0, dy, dx, 0), (n, dy + h, dx + w_, ci))
            row.append(jnp.einsum("nhwi,nhwo->io", sl, cot,
                                  precision=precision,
                                  preferred_element_type=jnp.float32))
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps).astype(w.dtype)  # [3,3,ci,co]
    # db must carry b's dtype (not cot's): a partially-cast tree (bf16
    # weights, f32 biases) would otherwise crash custom_vjp's aval check
    db = (None if b is None else
          jnp.sum(cot, axis=(0, 1, 2), dtype=jnp.float32).astype(b.dtype))
    # dX: transposed conv — flip taps, swap in/out channels, full zero pad
    wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)  # [3,3,co,ci]
    cot_p = jnp.pad(cot, ((0, 0), (2, 2), (2, 2), (0, 0)))
    dxp = conv2d(cot_p, wt, precision=precision)
    return dxp.astype(xp.dtype), dw, db


conv3x3_valid_small_co.defvjp(_fwd, _bwd)
