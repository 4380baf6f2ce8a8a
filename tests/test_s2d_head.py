"""s2d-basis '1/1' head (PERF.md r5 roadmap #2).

The training fast path leaves the native-scale head in channel-major s2d
layout and scores it against s2d-packed targets; pixelwise losses are
permutation-invariant, so everything must match the standard full-res form
up to fp summation order — values AND grads, per the fast-op policy
(CLAUDE.md).  Layout contract: out_s2d[n,i,j,4c+2a+b] == out[n,2i+a,2j+b,c].
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from footprints_tpu.models.footprint import FootprintNetwork
from footprints_tpu.ops.s2d import s2d_conv3x3_reflect, space_to_depth
from footprints_tpu.train.losses import LossConfig, compute_losses, s2d_map

H, W = 32, 64


def test_channel_major_s2d_conv_is_lane_permutation():
    """channel_major_out permutes output lanes (4c+p <- p*co+c) and must be
    exact (the kernel permutation is constant); grads too."""
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 8, 12, 16))  # s2d of [2,16,24,4]
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 3)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(2), (3,))
    co = 3

    y_pm = s2d_conv3x3_reflect(x, w, b)
    y_cm = s2d_conv3x3_reflect(x, w, b, channel_major_out=True)
    # phase-major lane p*co+c  <->  channel-major lane c*4+p
    perm = np.array([p * co + c for c in range(co) for p in range(4)])
    np.testing.assert_array_equal(np.asarray(y_cm), np.asarray(y_pm)[..., perm])

    g_pm = jax.grad(lambda w: jnp.sum(jnp.sin(
        s2d_conv3x3_reflect(x, w, b))))(w)
    g_cm = jax.grad(lambda w: jnp.sum(jnp.sin(
        s2d_conv3x3_reflect(x, w, b, channel_major_out=True))))(w)
    np.testing.assert_allclose(np.asarray(g_cm), np.asarray(g_pm),
                               rtol=1e-6, atol=1e-6)


@pytest.fixture(scope="module")
def net_and_inputs():
    net = FootprintNetwork(depth=18)
    params, state = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, H, W, 3))
    return net, params, state, x


def test_s2d_head_is_exact_repack_of_standard_head(net_and_inputs):
    net, params, state, x = net_and_inputs
    out_std, _ = jax.jit(lambda p, s, x: net.apply(p, s, x, train=True))(
        params, state, x)
    out_s2d, _ = jax.jit(lambda p, s, x: net.apply(p, s, x, train=True,
                                                   s2d_head=True))(
        params, state, x)
    assert set(out_s2d) == {"1/8", "1/4", "1/2", "1/1_s2d"}
    for k in ("1/8", "1/4", "1/2"):
        np.testing.assert_array_equal(np.asarray(out_s2d[k]),
                                      np.asarray(out_std[k]))
    y, f = np.asarray(out_s2d["1/1_s2d"]), np.asarray(out_std["1/1"])
    assert y.shape == (2, H // 2, W // 2, 16)
    # channel-major repack: lanes 4c+2a+b hold full[2i+a, 2j+b, c].  The
    # head conv emits the same fp values in either lane order (constant
    # kernel permutation), so this is exact, not just close.
    repack = f.reshape(2, H // 2, 2, W // 2, 2, 4).transpose(0, 1, 3, 5, 2, 4
                                                             ).reshape(y.shape)
    np.testing.assert_array_equal(y, repack)


def _targets(n=2, h=H, w=W, seed=3):
    rng = np.random.RandomState(seed)
    return {
        "depth": jnp.asarray((rng.rand(n, h, w) * 20
                              * (rng.rand(n, h, w) > 0.3)), jnp.float32),
        "visible_ground": jnp.asarray(rng.rand(n, h, w) > 0.5, jnp.float32),
        "all_ground": jnp.asarray(rng.rand(n, h, w) > 0.4, jnp.float32),
        "ground_depth": jnp.asarray(rng.rand(n, h, w) * 15, jnp.float32),
        "depth_mask": jnp.asarray(rng.rand(n, h, w) > 0.6, jnp.float32),
        "moving_object_mask": jnp.asarray(rng.rand(n, h, w) > 0.8,
                                          jnp.float32),
    }


def test_s2d_losses_match_standard_values_and_grads(net_and_inputs):
    net, params, state, x = net_and_inputs
    targets = _targets()

    def loss(params, s2d):
        out, _ = net.apply(params, state, x, train=True, s2d_head=s2d)
        return compute_losses(out, targets, LossConfig())

    l_std = jax.jit(lambda p: loss(p, False))(params)
    l_s2d = jax.jit(lambda p: loss(p, True))(params)
    assert set(l_std) == set(l_s2d)  # loss keys stay '<term>/1/1'
    for k in l_std:
        np.testing.assert_allclose(np.asarray(l_s2d[k]), np.asarray(l_std[k]),
                                   rtol=2e-6, atol=2e-7), k

    g_std = jax.jit(jax.grad(lambda p: loss(p, False)["loss"]))(params)
    g_s2d = jax.jit(jax.grad(lambda p: loss(p, True)["loss"]))(params)
    scale = max(float(np.max(np.abs(np.asarray(g)))) for g in
                jax.tree.leaves(g_std))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5 * scale),
        g_s2d, g_std)


def test_s2d_losses_consume_put_path_packed_targets(net_and_inputs):
    """The '<k>@s2d' keys from the put-path decode must yield the SAME loss
    as the in-step fallback packing (they are the same values)."""
    from footprints_tpu.data.compact import decompact_batch

    net, params, state, x = net_and_inputs
    targets = _targets()
    keys = tuple(targets)
    packed = decompact_batch(targets, None, keys)
    for k in keys:
        np.testing.assert_array_equal(np.asarray(packed[k + "@s2d"]),
                                      np.asarray(s2d_map(targets[k])))
        # and against the ops-level space_to_depth convention
        np.testing.assert_array_equal(
            np.asarray(packed[k + "@s2d"]),
            np.asarray(space_to_depth(targets[k][..., None])))

    out, _ = net.apply(params, state, x, train=True, s2d_head=True)
    l_inline = compute_losses(out, targets, LossConfig())
    l_packed = compute_losses(out, packed, LossConfig())
    for k in l_inline:
        np.testing.assert_array_equal(np.asarray(l_inline[k]),
                                      np.asarray(l_packed[k])), k


# ---------------------------------------------------------------------------
# period-4 '1/2' head (PERF.md r5; the full p4 SEAM was measured-refuted,
# see ops/s2d.py section comment)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("s", [2, 4, 8])
def test_bilinear_up_packed_matches_naive_values_and_grads(s):
    """bilinear_up_packed(y, s) must hold the same values as
    upsample_bilinear(y, s) in the documented nested lane order (which for
    s=2/4 equals s2d_map/p4_map of the full-res result), including the
    edge-clamped borders, and its autodiff VJP must match the naive
    composition's."""
    from footprints_tpu.nn.layers import upsample_bilinear
    from footprints_tpu.ops.s2d import _nested_phase_lane, bilinear_up_packed

    c = 2
    y = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 16, c))
    out = np.asarray(bilinear_up_packed(y, s))
    ref = np.asarray(upsample_bilinear(y, s))  # [2,8s,16s,c]
    for ch in range(c):
        for ry in range(s):
            for rx in range(s):
                lane = ch * s * s + _nested_phase_lane(s, ry, rx)
                np.testing.assert_allclose(
                    out[..., lane], ref[:, ry::s, rx::s, ch],
                    rtol=1e-6, atol=1e-6)

    g1 = jax.grad(lambda y: jnp.sum(jnp.sin(bilinear_up_packed(y, s))))(y)
    g2 = jax.grad(lambda y: jnp.sum(jnp.sin(upsample_bilinear(y, s))))(y)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_bilinear_up_packed_lane_order_matches_loss_pack_maps():
    """The s=4 lane order must equal p4_map's (so the '1/4' head can reuse
    '@s2d2' put-path targets) and s=2's must equal s2d_map's."""
    from footprints_tpu.ops.s2d import _nested_phase_lane
    from footprints_tpu.train.losses import p4_map

    t = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 32))
    packed4 = np.asarray(p4_map(t))
    tn = np.asarray(t)
    for ry in range(4):
        for rx in range(4):
            np.testing.assert_array_equal(
                packed4[..., _nested_phase_lane(4, ry, rx)],
                tn[:, ry::4, rx::4])
    packed2 = np.asarray(s2d_map(t))
    for ry in range(2):
        for rx in range(2):
            np.testing.assert_array_equal(
                packed2[..., _nested_phase_lane(2, ry, rx)],
                tn[:, ry::2, rx::2])


def test_bilinear_up2_p4_matches_naive_values_and_grads():
    """bilinear_up2_p4(s2d(g)) must hold the same values as
    upsample_bilinear(g, 2) in the documented p4 lane order, for every
    channel — including the edge-clamped borders — and its VJP must match
    autodiff of the naive composition."""
    from footprints_tpu.nn.layers import upsample_bilinear
    from footprints_tpu.ops.s2d import bilinear_up2_p4, space_to_depth

    c = 2
    g = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16, c))
    y = space_to_depth(g)  # [2,6,8,4c]

    out = bilinear_up2_p4(y, c)  # [2,6,8,16c]
    ref = upsample_bilinear(g, 2)  # [2,24,32,c]

    def unpack(out):
        n, h, w, _ = out.shape
        o = np.asarray(out).reshape(n, h, w, c, 2, 2, 2, 2)  # (a,b,al,be)
        f = np.zeros((n, 4 * h, 4 * w, c), np.float32)
        for a in (0, 1):
            for b_ in (0, 1):
                for al in (0, 1):
                    for be in (0, 1):
                        f[:, 2 * al + a::4, 2 * be + b_::4] \
                            = o[:, :, :, :, a, b_, al, be]
        return f

    np.testing.assert_allclose(unpack(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    g1 = jax.grad(lambda g: jnp.sum(jnp.sin(
        bilinear_up2_p4(space_to_depth(g), c))))(g)
    g2 = jax.grad(lambda g: jnp.sum(jnp.sin(upsample_bilinear(g, 2))))(g)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_p4_head_model_outputs_match_standard(net_and_inputs):
    """p4_head=True: '1/2_s2d2' must be the exact p4 repack of the
    standard '1/2' output (up to fp order through the different pad/conv
    compositions) and '1/1' must be unchanged up to fp order."""
    from footprints_tpu.train.losses import p4_map

    net, params, state, x = net_and_inputs
    out_std, _ = jax.jit(lambda p, s, x: net.apply(p, s, x, train=True))(
        params, state, x)
    out_p4, _ = jax.jit(lambda p, s, x: net.apply(p, s, x, train=True,
                                                  p4_head=True))(
        params, state, x)
    assert set(out_p4) == {"1/8", "1/4", "1/2_s2d2", "1/1"}
    for k in ("1/8", "1/4"):
        np.testing.assert_array_equal(np.asarray(out_p4[k]),
                                      np.asarray(out_std[k]))
    np.testing.assert_allclose(np.asarray(out_p4["1/1"]),
                               np.asarray(out_std["1/1"]),
                               rtol=1e-4, atol=1e-5)
    got = np.asarray(out_p4["1/2_s2d2"])  # [N,H/4,W/4,64]
    ref = np.asarray(out_std["1/2"])      # [N,H,W,4]
    ref_p4 = np.stack([np.asarray(p4_map(jnp.asarray(ref[..., ch])))
                       for ch in range(4)], axis=-2)  # [N,h,w,4,16]
    np.testing.assert_allclose(got.reshape(ref_p4.shape), ref_p4,
                               rtol=1e-4, atol=1e-5)


def test_p4_head_losses_match_standard_values_and_grads(net_and_inputs):
    net, params, state, x = net_and_inputs
    targets = _targets()

    def loss(params, p4):
        out, _ = net.apply(params, state, x, train=True, s2d_head=p4,
                           p4_head=p4)
        return compute_losses(out, targets, LossConfig())

    l_std = jax.jit(lambda p: loss(p, False))(params)
    l_p4 = jax.jit(lambda p: loss(p, True))(params)
    assert set(l_std) == set(l_p4)
    for k in l_std:
        np.testing.assert_allclose(np.asarray(l_p4[k]), np.asarray(l_std[k]),
                                   rtol=5e-6, atol=5e-7), k

    g_std = jax.jit(jax.grad(lambda p: loss(p, False)["loss"]))(params)
    g_p4 = jax.jit(jax.grad(lambda p: loss(p, True)["loss"]))(params)
    scale = max(float(np.max(np.abs(np.asarray(g)))) for g in
                jax.tree.leaves(g_std))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5 * scale),
        g_p4, g_std)


def test_p4_packed_targets_match_inline(net_and_inputs):
    from footprints_tpu.data.compact import decompact_batch
    from footprints_tpu.train.losses import p4_map

    targets = _targets()
    keys = tuple(targets)
    packed = decompact_batch(targets, None, keys, keys)
    for k in keys:
        np.testing.assert_array_equal(np.asarray(packed[k + "@s2d2"]),
                                      np.asarray(p4_map(targets[k])))

    net, params, state, x = net_and_inputs
    out, _ = net.apply(params, state, x, train=True, s2d_head=True,
                       p4_head=True)
    l_inline = compute_losses(out, targets, LossConfig())
    l_packed = compute_losses(out, packed, LossConfig())
    for k in l_inline:
        np.testing.assert_array_equal(np.asarray(l_inline[k]),
                                      np.asarray(l_packed[k])), k


def test_train_step_s2d_head_end_to_end():
    """One jitted train step with s2d_head + packed targets runs and moves
    params; metrics keys match the standard step's."""
    from footprints_tpu.data.compact import decompact_batch
    from footprints_tpu.train.step import (TrainStepConfig, build_train_step,
                                           init_train_state)

    net = FootprintNetwork(depth=18)
    targets = _targets()
    batch = dict(targets, image=jax.random.uniform(
        jax.random.PRNGKey(5), (2, H, W, 3)))
    batch_s2d = decompact_batch(batch, None, tuple(targets))

    cfg = TrainStepConfig(steps_per_epoch=10, compute_dtype="bfloat16",
                          s2d_head=True)
    state = init_train_state(net, jax.random.PRNGKey(0), cfg)
    step = build_train_step(net, cfg, mesh=None)
    new_state, metrics = step(jax.tree.map(jnp.copy, state), batch_s2d)
    assert "loss/1/1" in metrics and np.isfinite(np.asarray(metrics["loss"]))
    assert int(np.asarray(new_state["step"])) == 1

    cfg_std = TrainStepConfig(steps_per_epoch=10, compute_dtype="bfloat16")
    step_std = build_train_step(net, cfg_std, mesh=None)
    _, m_std = step_std(jax.tree.map(jnp.copy, state), batch)
    assert set(m_std) == set(metrics)
    # same data, fp-reassociated loss: close but not bitwise
    np.testing.assert_allclose(np.asarray(metrics["loss"]),
                               np.asarray(m_std["loss"]), rtol=2e-2)
