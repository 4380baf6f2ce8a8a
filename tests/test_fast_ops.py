"""Golden tests for the TPU fast ops (phase convs, space-to-depth tail):
each must be numerically identical (fp tolerance) to the naive composition
it replaces, including reflect-border semantics and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from footprints_tpu.nn.layers import conv2d, reflect_pad, upsample_nearest
from footprints_tpu.ops.s2d import (
    depth_to_space,
    s2d_conv3x3_reflect,
    space_to_depth,
    up_conv_to_s2d,
)
from footprints_tpu.ops.upconv import conv3x3_on_nearest_up

RNG = np.random.RandomState(0)


def _naive_upconv(x, w, b):
    return conv2d(reflect_pad(upsample_nearest(x, 2), 1), w, b,
                  precision="highest")


@pytest.mark.parametrize("h,w_,ci,co", [(4, 6, 5, 7), (6, 20, 16, 8), (1, 1, 3, 2)])
def test_conv3x3_on_nearest_up_matches_naive(h, w_, ci, co):
    x = jnp.asarray(RNG.randn(2, h, w_, ci).astype(np.float32))
    w = jnp.asarray((RNG.randn(3, 3, ci, co) * 0.1).astype(np.float32))
    b = jnp.asarray(RNG.randn(co).astype(np.float32))
    ref = _naive_upconv(x, w, b)
    got = conv3x3_on_nearest_up(x, w, b, precision="highest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_s2d_roundtrip():
    x = RNG.randn(2, 8, 12, 5).astype(np.float32)
    out = np.asarray(depth_to_space(space_to_depth(jnp.asarray(x))))
    np.testing.assert_array_equal(out, x)


@pytest.mark.parametrize("h,w_,ci,co", [(4, 6, 5, 7), (6, 20, 16, 8)])
def test_up_conv_to_s2d_matches_naive(h, w_, ci, co):
    x = jnp.asarray(RNG.randn(2, h, w_, ci).astype(np.float32))
    w = jnp.asarray((RNG.randn(3, 3, ci, co) * 0.1).astype(np.float32))
    b = jnp.asarray(RNG.randn(co).astype(np.float32))
    ref = _naive_upconv(x, w, b)
    got = depth_to_space(up_conv_to_s2d(x, w, b, precision="highest"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("h,w_,ci,co", [(8, 12, 4, 6), (4, 4, 3, 3), (16, 20, 8, 8)])
def test_s2d_conv3x3_reflect_matches_naive(h, w_, ci, co):
    X = jnp.asarray(RNG.randn(2, h, w_, ci).astype(np.float32))
    w = jnp.asarray((RNG.randn(3, 3, ci, co) * 0.1).astype(np.float32))
    b = jnp.asarray(RNG.randn(co).astype(np.float32))
    ref = conv2d(reflect_pad(X, 1), w, b, precision="highest")
    got = depth_to_space(s2d_conv3x3_reflect(space_to_depth(X), w, b,
                                             precision="highest"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fast_up_concat_matches_naive_block():
    """The decoder's gated fast path == naive path on the same params."""
    from footprints_tpu.nn import blocks

    key = jax.random.PRNGKey(0)
    p, s = blocks.init_up_concat_block_asym(key, 16, 8, 8)
    x = jnp.asarray(RNG.randn(2, 4, 6, 16).astype(np.float32))
    skip = jnp.asarray(RNG.randn(2, 8, 12, 8).astype(np.float32))
    ref, _ = blocks.up_concat_block(p, s, x, skip, fast=False)
    got, _ = blocks.up_concat_block(p, s, x, skip, fast=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fast_ops_gradients_match():
    """Gradients through the fast tail equal gradients through the naive
    composition (training correctness)."""
    ci, co = 6, 4
    x = jnp.asarray(RNG.randn(1, 4, 6, ci).astype(np.float32))
    w = jnp.asarray((RNG.randn(3, 3, ci, co) * 0.1).astype(np.float32))
    b = jnp.asarray(RNG.randn(co).astype(np.float32))

    def loss_naive(w, b):
        return jnp.sum(_naive_upconv(x, w, b) ** 2)

    def loss_fast(w, b):
        return jnp.sum(depth_to_space(up_conv_to_s2d(x, w, b,
                                                     precision="highest")) ** 2)

    g_ref = jax.grad(loss_naive, argnums=(0, 1))(w, b)
    g_fast = jax.grad(loss_fast, argnums=(0, 1))(w, b)
    for a, bb in zip(g_ref, g_fast):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)


def test_conv3x3_valid_small_co_matches_conv2d_values_and_grads():
    """ops/wgrad.py custom-VJP conv: values AND all three grads must match
    the plain conv2d autodiff composition."""
    from footprints_tpu.ops.wgrad import conv3x3_valid_small_co

    x = jnp.asarray(RNG.randn(2, 10, 14, 16).astype(np.float32))
    w = jnp.asarray((RNG.randn(3, 3, 16, 2) * 0.1).astype(np.float32))
    b = jnp.asarray(RNG.randn(2).astype(np.float32))

    def naive(x, w, b):
        return jnp.sum(jnp.sin(conv2d(reflect_pad(x, 1), w, b,
                                      precision="highest")))

    def fast(x, w, b):
        return jnp.sum(jnp.sin(conv3x3_valid_small_co(
            reflect_pad(x, 1), w, b, "highest")))

    np.testing.assert_allclose(np.asarray(fast(x, w, b)),
                               np.asarray(naive(x, w, b)), rtol=1e-6)
    g_ref = jax.grad(naive, argnums=(0, 1, 2))(x, w, b)
    from footprints_tpu.ops import wgrad as wgrad_mod
    saved = wgrad_mod.WGRAD_KSTACK
    try:
        for kstack in (True, False):  # both dW stacking layouts
            wgrad_mod.WGRAD_KSTACK = kstack
            g_fast = jax.grad(fast, argnums=(0, 1, 2))(x, w, b)
            for a, r in zip(g_fast, g_ref):
                # rtol covers fp summation-order drift on O(10) dW entries
                # (the KSTACK contraction order differs from autodiff's;
                # rel err ~6e-7)
                np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                           rtol=2e-5, atol=2e-5)
    finally:
        wgrad_mod.WGRAD_KSTACK = saved
