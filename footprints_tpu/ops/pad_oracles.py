"""Executable oracle twins of the hand-VJP pads — NO custom_vjp anywhere.

The production pads (nn/layers.py:_reflect_pad1, ops/s2d.py:_edge_pad1 /
_s2d_reflect_pad) carry hand-written backwards on the training gradient
path.  These re-expressions let jnp autodiff derive the transposes
independently, so tests (tests/test_pad_vjps.py) and on-chip diagnostics
(tools/diag_dxrows.py) can golden-check values AND grads against a single
maintained spec instead of drifting copies.  Never import these from model
code: their whole value is staying independent of the fast paths.

The s2d construction mirrors ops/s2d.py's where-select form (the r2
miscompile fix) — if that form ever changes, change it HERE too and re-run
`python tools/chip_parity.py --grads` on the real chip.
"""

import jax.numpy as jnp


def raw_reflect_pad1(x):
    """1-px reflect pad over H/W of an NHWC tensor (plain jnp.pad)."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


def raw_edge_pad1(x):
    """1-px edge (replicate) pad over H/W of an NHWC tensor (plain jnp.pad)."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")


def raw_s2d_reflect_pad(x, c):
    """The space-to-depth reflect pad on a 2x2-packed [N,H,W,4c] tensor:
    per-phase-group border selects, re-expressed with where/concat so jnp
    traces and differentiates this copy itself."""
    ch = jnp.arange(x.shape[-1])
    row_a0 = (ch < 2 * c)[None, None, None, :]
    top = jnp.where(row_a0, x[:, 1:2], x[:, 0:1])
    bottom = jnp.where(row_a0, x[:, -1:], x[:, -2:-1])
    x = jnp.concatenate([top, x, bottom], axis=1)
    col_b0 = ((ch // c) % 2 == 0)[None, None, None, :]
    left = jnp.where(col_b0, x[:, :, 1:2], x[:, :, 0:1])
    right = jnp.where(col_b0, x[:, :, -1:], x[:, :, -2:-1])
    return jnp.concatenate([left, x, right], axis=2)
