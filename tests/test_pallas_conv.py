"""Golden tests for the Pallas fused decoder convs (ops/pallas_conv.py).

Run through the Pallas interpreter on the CPU mesh; the same kernels are
verified on the real chip against the CPU backend by tools/chip_parity.py
(on the axon TPU the kernels were RIGHT while the XLA slice+concat form of
the s2d reflect pad miscompiled — see ops/s2d.py:_s2d_reflect_pad).
Every fused op must match the naive XLA composition it replaces — values
and (via the custom-VJP fallback) gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from footprints_tpu.nn import blocks
from footprints_tpu.ops import pallas_conv
from footprints_tpu.ops.s2d import (_phase_embedded_kernel, _s2d_kernel,
                                    s2d_conv3x3_reflect, space_to_depth,
                                    up_conv_to_s2d)

RNG = np.random.RandomState(7)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_conv, "INTERPRET", True)


@pytest.mark.parametrize("h,w_,ci,co,th", [(8, 12, 4, 6, 4), (16, 20, 8, 8, 8),
                                           (4, 6, 3, 5, 2)])
def test_fused_s2d_reflect_matches_naive(h, w_, ci, co, th):
    x = jnp.asarray(RNG.randn(2, h, w_, ci).astype(np.float32))
    w = jnp.asarray((RNG.randn(3, 3, ci, co) * 0.1).astype(np.float32))
    b = jnp.asarray(RNG.randn(co).astype(np.float32))
    xs = space_to_depth(x)
    ref = jax.nn.elu(s2d_conv3x3_reflect(xs, w, b, precision="highest"))
    got = pallas_conv.fused_conv3x3(xs, _s2d_kernel(w), jnp.tile(b, 4),
                                    pad_mode="s2d_reflect", act="elu", th=th,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("h,w_,ci,co,th", [(8, 12, 5, 7, 4), (6, 20, 16, 8, 3)])
def test_fused_edge_upconv_matches_naive(h, w_, ci, co, th):
    x = jnp.asarray(RNG.randn(2, h, w_, ci).astype(np.float32))
    w = jnp.asarray((RNG.randn(3, 3, ci, co) * 0.1).astype(np.float32))
    b = jnp.asarray(RNG.randn(co).astype(np.float32))
    ref = jax.nn.elu(up_conv_to_s2d(x, w, b, precision="highest"))
    got = pallas_conv.fused_conv3x3(x, _phase_embedded_kernel(w),
                                    jnp.tile(b, 4), pad_mode="edge",
                                    act="elu", th=th, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_residual_matches_naive():
    h, w_, ci, co = 8, 12, 4, 6
    x = jnp.asarray(RNG.randn(2, h, w_, ci).astype(np.float32))
    w = jnp.asarray((RNG.randn(3, 3, ci, co) * 0.1).astype(np.float32))
    b = jnp.asarray(RNG.randn(co).astype(np.float32))
    xs = space_to_depth(x)
    r = jnp.asarray(RNG.randn(2, h // 2, w_ // 2, 4 * co).astype(np.float32))
    ref = jax.nn.elu(s2d_conv3x3_reflect(xs, w, b, precision="highest") + r)
    got = pallas_conv.fused_conv3x3(xs, _s2d_kernel(w), jnp.tile(b, 4), r,
                                    pad_mode="s2d_reflect", act="elu", th=4,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_custom_vjp_wrappers_match_xla_grads():
    """The wrappers' backward (XLA-composition fallback) must agree with
    differentiating the naive composition directly."""
    h, w_, ci, co = 8, 12, 4, 8
    x = jnp.asarray(RNG.randn(2, h, w_, ci).astype(np.float32))
    w = jnp.asarray((RNG.randn(3, 3, ci, co) * 0.1).astype(np.float32))
    b = jnp.asarray(RNG.randn(co).astype(np.float32))

    def fast(x, w, b):
        return jnp.sum(jnp.sin(pallas_conv.up_conv_s2d_fused(x, w, b, "elu")))

    def naive(x, w, b):
        return jnp.sum(jnp.sin(jax.nn.elu(up_conv_to_s2d(x, w, b))))

    g_fast = jax.grad(fast, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(naive, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-5)


def test_up_concat_block_pallas_path_matches_naive(monkeypatch):
    """Block-level: the gated Pallas serving path of up_concat_block must
    reproduce the XLA fast path (and hence, transitively, the naive
    composition golden-tested in test_fast_ops.py)."""
    monkeypatch.setattr(pallas_conv, "pallas_supported", lambda *a, **k: True)
    key = jax.random.PRNGKey(0)
    params, state = blocks.init_up_concat_block_asym(key, 24, 32, 32)
    x = jnp.asarray(RNG.randn(2, 4, 8, 24).astype(np.float32))
    skip = jnp.asarray(RNG.randn(2, 8, 16, 32).astype(np.float32))
    got, _ = blocks.up_concat_block(params, state, x, skip, train=False,
                                    fast=True)
    monkeypatch.setattr(pallas_conv, "pallas_supported", lambda *a, **k: False)
    ref, _ = blocks.up_concat_block(params, state, x, skip, train=False,
                                    fast=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_decoder_tail_pallas_path_matches_naive(monkeypatch):
    monkeypatch.setattr(pallas_conv, "pallas_supported", lambda *a, **k: True)
    key = jax.random.PRNGKey(1)
    conv_p, conv_s = blocks.init_conv_block(key, 24, 32)
    out_p = blocks.init_out_conv_block(jax.random.PRNGKey(2), 32, 2)
    x = jnp.asarray(RNG.randn(2, 4, 8, 24).astype(np.float32))
    got, _ = blocks.decoder_tail(conv_p, conv_s, out_p, x,
                                 apply_sigmoid=True, train=False)
    monkeypatch.setattr(pallas_conv, "pallas_supported", lambda *a, **k: False)
    ref, _ = blocks.decoder_tail(conv_p, conv_s, out_p, x,
                                 apply_sigmoid=True, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
