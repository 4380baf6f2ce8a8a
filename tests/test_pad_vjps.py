"""Independent-oracle golden tests for every hand-written pad VJP.

The custom backwards in nn/layers.py (_reflect_pad1), ops/s2d.py
(_edge_pad1, _s2d_reflect_pad) and ops/wgrad.py sit on the training
gradient path.  Other gradient tests compose fast-vs-naive paths that can
share the same custom VJP (a backward bug cancels on both sides); here each
backward is checked against an oracle that contains NO custom_vjp at all:

  * raw ``jnp.pad`` autodiff for the 1-px reflect / edge pads;
  * a plain re-expression of the s2d pad construction (jnp autodiff derives
    its transpose independently of the hand-written one);
  * the linear-operator adjoint identity <f(x), g> == <x, f^T(g)> on random
    probes, which any transpose bug violates.

Per the repo convention ("values AND grads"), a deliberate sign flip or
off-by-one in any _bwd must turn this file red.  Shapes include the minimum
legal H=W=2 (reflect pad needs >=2) where corner folding is densest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from footprints_tpu.nn.layers import _reflect_pad1, conv2d, upsample_nearest
from footprints_tpu.ops.s2d import (
    _edge_pad1,
    _s2d_reflect_pad,
    depth_to_space,
    s2d_conv3x3_reflect,
    space_to_depth,
    up_conv_to_s2d,
)

RNG = np.random.RandomState(7)

SHAPES = [(1, 2, 2, 3), (2, 2, 5, 4), (2, 5, 2, 4), (2, 6, 9, 8)]


def _rand(shape):
    return jnp.asarray(RNG.randn(*shape).astype(np.float32))


def _dx(fn, x, cot):
    _, vjp = jax.vjp(fn, x)
    (dx,) = vjp(cot)
    return np.asarray(dx)


@pytest.mark.parametrize("shape", SHAPES)
def test_reflect_pad1_bwd_matches_jnp_pad_autodiff(shape):
    x = _rand(shape)
    cot = _rand((shape[0], shape[1] + 2, shape[2] + 2, shape[3]))
    oracle = lambda x: jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    np.testing.assert_allclose(_dx(_reflect_pad1, x, cot), _dx(oracle, x, cot),
                               atol=1e-6)


@pytest.mark.parametrize("shape", SHAPES + [(1, 1, 1, 2)])
def test_edge_pad1_bwd_matches_jnp_pad_autodiff(shape):
    x = _rand(shape)
    cot = _rand((shape[0], shape[1] + 2, shape[2] + 2, shape[3]))
    oracle = lambda x: jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    np.testing.assert_allclose(_dx(_edge_pad1, x, cot), _dx(oracle, x, cot),
                               atol=1e-6)


# single-source oracle twin (shared with tools/diag_dxrows.py): the s2d pad
# construction with no custom_vjp — jnp traces and differentiates that copy
# itself, independent of _s2d_reflect_pad_bwd
from footprints_tpu.ops.pad_oracles import (  # noqa: E402
    raw_s2d_reflect_pad as _plain_s2d_reflect_pad,
)


@pytest.mark.parametrize("n,h,w,c", [(1, 2, 2, 3), (2, 3, 5, 2), (1, 6, 4, 8)])
def test_s2d_reflect_pad_bwd_matches_plain_autodiff(n, h, w, c):
    x = _rand((n, h, w, 4 * c))
    # forwards must agree exactly before comparing transposes
    np.testing.assert_array_equal(
        np.asarray(_s2d_reflect_pad(x, c)), np.asarray(_plain_s2d_reflect_pad(x, c)))
    cot = _rand((n, h + 2, w + 2, 4 * c))
    got = _dx(lambda x: _s2d_reflect_pad(x, c), x, cot)
    ref = _dx(lambda x: _plain_s2d_reflect_pad(x, c), x, cot)
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("fn,pad_h", [
    (lambda x: _reflect_pad1(x), 1),
    (lambda x: _edge_pad1(x), 1),
])
def test_pad_adjoint_identity(fn, pad_h):
    """<f(x), g> == <x, f^T(g)> for the linear pad operators."""
    x = _rand((2, 4, 6, 5))
    y, vjp = jax.vjp(fn, x)
    g = _rand(y.shape)
    (dx,) = vjp(g)
    lhs = float(jnp.vdot(y, g))
    rhs = float(jnp.vdot(x, dx))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_s2d_reflect_pad_adjoint_identity():
    c = 3
    x = _rand((2, 4, 5, 4 * c))
    y, vjp = jax.vjp(lambda x: _s2d_reflect_pad(x, c), x)
    g = _rand(y.shape)
    (dx,) = vjp(g)
    np.testing.assert_allclose(float(jnp.vdot(y, g)), float(jnp.vdot(x, dx)),
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# dx through the fused fast ops vs naive compositions built ONLY from raw
# jnp.pad (bypassing every custom VJP in the repo).
# ---------------------------------------------------------------------------

from footprints_tpu.ops.pad_oracles import (  # noqa: E402
    raw_reflect_pad1 as _raw_reflect_pad,
)


@pytest.mark.parametrize("h,w_,ci,co", [(2, 2, 3, 2), (4, 6, 5, 7), (6, 10, 8, 4)])
def test_up_conv_to_s2d_grads_match_raw_pad_autodiff(h, w_, ci, co):
    x = _rand((2, h, w_, ci))
    w = jnp.asarray((RNG.randn(3, 3, ci, co) * 0.1).astype(np.float32))
    b = jnp.asarray(RNG.randn(co).astype(np.float32))

    def naive(x, w, b):
        y = conv2d(_raw_reflect_pad(upsample_nearest(x, 2)), w, b,
                   precision="highest")
        return jnp.sum(jnp.sin(y))

    def fast(x, w, b):
        y = depth_to_space(up_conv_to_s2d(x, w, b, precision="highest"))
        return jnp.sum(jnp.sin(y))

    g_fast = jax.grad(fast, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(naive, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("h,w_,ci,co", [(4, 4, 3, 3), (8, 12, 4, 6)])
def test_s2d_conv_grads_match_raw_pad_autodiff(h, w_, ci, co):
    X = _rand((2, h, w_, ci))
    w = jnp.asarray((RNG.randn(3, 3, ci, co) * 0.1).astype(np.float32))
    b = jnp.asarray(RNG.randn(co).astype(np.float32))

    def naive(X, w, b):
        return jnp.sum(jnp.sin(conv2d(_raw_reflect_pad(X), w, b,
                                      precision="highest")))

    def fast(X, w, b):
        y = depth_to_space(s2d_conv3x3_reflect(space_to_depth(X), w, b,
                                               precision="highest"))
        return jnp.sum(jnp.sin(y))

    # all of dX, dW, db: the fused backward routes dW/db through its own
    # jax.vjp lambda, which no other test guards (values-only elsewhere)
    g_fast = jax.grad(fast, argnums=(0, 1, 2))(X, w, b)
    g_ref = jax.grad(naive, argnums=(0, 1, 2))(X, w, b)
    for a, r in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_wgrad_conv_grads_match_raw_pad_autodiff():
    """ops/wgrad.py dX/dW/db checked with the pad oracle outside every custom VJP."""
    from footprints_tpu.ops.wgrad import conv3x3_valid_small_co

    x = _rand((2, 6, 8, 16))
    w = jnp.asarray((RNG.randn(3, 3, 16, 2) * 0.1).astype(np.float32))
    b = jnp.asarray(RNG.randn(2).astype(np.float32))

    def naive(x, w, b):
        return jnp.sum(jnp.sin(conv2d(_raw_reflect_pad(x), w, b,
                                      precision="highest")))

    def fast(x, w, b):
        return jnp.sum(jnp.sin(conv3x3_valid_small_co(
            _raw_reflect_pad(x), w, b, "highest")))

    g_ref = jax.grad(naive, argnums=(0, 1, 2))(x, w, b)
    g_fast = jax.grad(fast, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=2e-5)


def test_wgrad_conv_mixed_dtype_bias_grads():
    """db must carry the bias's own dtype: bf16 weights + f32 bias (a
    partially-cast tree) previously hit custom_vjp's aval dtype check."""
    from footprints_tpu.ops.wgrad import conv3x3_valid_small_co

    x = _rand((1, 5, 6, 4)).astype(jnp.bfloat16)
    w = (_rand((3, 3, 4, 2)) * 0.1).astype(jnp.bfloat16)
    b = _rand((2,))  # f32

    def f(x, w, b):
        return jnp.sum(conv3x3_valid_small_co(x, w, b, None)
                       .astype(jnp.float32))

    dx, dw, db = jax.grad(f, argnums=(0, 1, 2))(x, w, b)
    assert dx.dtype == jnp.bfloat16 and dw.dtype == jnp.bfloat16
    assert db.dtype == jnp.float32
    assert np.isfinite(np.asarray(db)).all()


def test_wgrad_conv_rejects_non_3x3():
    from footprints_tpu.ops.wgrad import conv3x3_valid_small_co

    x = _rand((1, 6, 6, 4))
    w5 = _rand((5, 5, 4, 2))
    b = _rand((2,))
    with pytest.raises(ValueError, match="3x3"):
        conv3x3_valid_small_co(x, w5, b, None)
    with pytest.raises(ValueError, match="3x3"):
        jax.grad(lambda x: jnp.sum(conv3x3_valid_small_co(x, w5, b, None)))(x)
