"""Custom-VJP 3x3 VALID conv for tiny output-channel heads.

The out-conv heads (64->2, reference network.py:161-183) backpropagate
through a weight-gradient whose natural conv formulation has N=2 output
channels.  XLA's TPU backend lowers that wgrad to a fused vector-unit
reduction loop instead of an MXU op — measured 3.0 ms per head at
[12,96,320,64] (≈16 GB/s effective) in the r2 train-step profile, ~7.5
ms/step across the four heads.

This wrapper keeps the forward exactly as before and overrides the VJP:

  * dW: one ``npqi,npqc->ic`` contraction of the activation against a
    zero-embedded stack of the nine tap-shifted cotangents — the big
    activation is streamed from HBM exactly once;
  * dX: the standard transposed conv, written explicitly (spatially flipped
    kernel, in/out channels swapped) so it stays an MXU conv;
  * db: a plain sum over the cotangent.

Numerically identical to the autodiff gradients up to fp summation order
(golden-tested in tests/test_fast_ops.py).
"""

import functools
import os

import jax
import jax.numpy as jnp

from ..nn.layers import conv2d, get_default_precision

# Default-on with an env off-switch for A/B (like ops/s2d.FUSED_DGRAD):
# stack the nine shifted cotangents as [9co, N, Hp, Wp] — contracted dims
# minor — instead of [N, Hp, Wp, 9co].  The r4 trace showed the dot emitter
# relayouting the [N,Hp,Wp,9co] stack (copy.1028, ~0.3 ms/step at the
# 1/2-scale heads); leading-k stacking lets the producer write the layout
# the dot reads.  Measured on chip (2x each, tools/ablate_train.py full 12):
# 63.59/63.56 ms/step without -> 63.24/62.96 with (~190 imgs/s @b12).
WGRAD_KSTACK = os.environ.get("FOOTPRINTS_WGRAD_KSTACK", "1") == "1"


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
    co = cot.shape[-1]
    # dW[dy,dx,ci,co] = sum_{n,h,w} xp[n,h+dy,w+dx,ci] * cot[n,h,w,co]
    #                 = sum_{n,p,q} xp[n,p,q,ci] * shift(cot, dy, dx)[n,p,q,co]
    # Nine per-tap ``nhwi,nhwo->io`` contractions each re-stream the big
    # activation (9x its HBM bytes — 1.5 ms/step across the six heads in the
    # r4 trace).  Since co is tiny, zero-embed the nine SHIFTED COTANGENTS
    # onto xp's grid instead ([n,hp,wp,9co], 9x the *small* tensor) and
    # contract once: xp is read a single time at full bandwidth.
    # NOTE: the stack axis is the second-minor dim, NOT a lane-dim concat of
    # differently-offset row slices (the r2 chip-miscompile pattern); covered
    # on-chip by tools/chip_parity.py --grads.
    if WGRAD_KSTACK:
        # contracted dims (n,p,q) minor in the stacked tensor: the producer
        # writes the layout the dot reads, no relayout copy
        cot_t = jnp.transpose(cot, (3, 0, 1, 2))  # [co,N,H,W]
        cot9 = jnp.stack(
            [jax.lax.pad(cot_t, jnp.zeros((), cot.dtype),
                         ((0, 0, 0), (0, 0, 0), (dy, 2 - dy, 0),
                          (dx, 2 - dx, 0)))
             for dy in range(3) for dx in range(3)],
            axis=0,
        ).reshape(9 * co, n, hp, wp)
        dw = jnp.einsum("npqi,knpq->ik", xp, cot9,
                        precision=precision,
                        preferred_element_type=jnp.float32)
    else:
        cot9 = jnp.stack(
            [jax.lax.pad(cot, jnp.zeros((), cot.dtype),
                         ((0, 0, 0), (dy, 2 - dy, 0), (dx, 2 - dx, 0),
                          (0, 0, 0)))
             for dy in range(3) for dx in range(3)],
            axis=3,
        ).reshape(n, hp, wp, 9 * co)
        dw = jnp.einsum("npqi,npqc->ic", xp, cot9,
                        precision=precision,
                        preferred_element_type=jnp.float32)
    dw = dw.reshape(ci, 3, 3, co).transpose(1, 2, 0, 3).astype(w.dtype)
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
