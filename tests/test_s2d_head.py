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
