"""Golden tests: every NN primitive vs the torch CPU oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from footprints_tpu.nn import layers

RNG = np.random.RandomState(42)


def nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_conv2d_matches_torch():
    x = RNG.randn(2, 7, 9, 5).astype(np.float32)
    conv = torch.nn.Conv2d(5, 4, 3, stride=2, padding=1)
    w = np.transpose(conv.weight.detach().numpy(), (2, 3, 1, 0))  # OIHW->HWIO
    b = conv.bias.detach().numpy()
    ref = nhwc(conv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))))
    got = np.asarray(layers.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                   stride=2, padding=1))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_batch_norm_eval_and_train_match_torch():
    x = RNG.randn(4, 5, 6, 3).astype(np.float32)
    bn = torch.nn.BatchNorm2d(3)
    with torch.no_grad():
        bn.weight.copy_(torch.rand(3) + 0.5)
        bn.bias.copy_(torch.rand(3))
        bn.running_mean.copy_(torch.randn(3) * 0.1)
        bn.running_var.copy_(torch.rand(3) + 0.5)
    # .copy(): jax CPU arrays may zero-copy-alias numpy views of torch
    # buffers, and torch's train-mode forward mutates running stats in place
    params = {"scale": jnp.asarray(bn.weight.detach().numpy().copy()),
              "bias": jnp.asarray(bn.bias.detach().numpy().copy())}
    state = {"mean": jnp.asarray(bn.running_mean.numpy().copy()),
             "var": jnp.asarray(bn.running_var.numpy().copy())}
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    # eval mode
    bn.eval()
    ref = nhwc(bn(xt))
    got, new_state = layers.batch_norm(jnp.asarray(x), params, state, train=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    # train mode: output uses batch stats; running stats get momentum update
    bn.train()
    ref = nhwc(bn(xt))
    got, new_state = layers.batch_norm(jnp.asarray(x), params, state, train=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               bn.running_var.numpy(), atol=1e-5)


def test_reflect_pad_matches_torch():
    x = RNG.randn(1, 4, 5, 2).astype(np.float32)
    ref = nhwc(torch.nn.ReflectionPad2d(1)(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))))
    got = np.asarray(layers.reflect_pad(jnp.asarray(x), 1))
    np.testing.assert_allclose(got, ref)


def test_max_pool_matches_torch():
    x = RNG.randn(2, 9, 11, 3).astype(np.float32)
    ref = nhwc(torch.nn.MaxPool2d(3, 2, padding=1)(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))))
    got = np.asarray(layers.max_pool_3x3_s2(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref)


@pytest.mark.parametrize("scale", [2, 4])
def test_upsample_nearest_matches_torch(scale):
    x = RNG.randn(1, 3, 5, 2).astype(np.float32)
    ref = nhwc(F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                             scale_factor=scale, mode="nearest"))
    got = np.asarray(layers.upsample_nearest(jnp.asarray(x), scale))
    np.testing.assert_allclose(got, ref)


@pytest.mark.parametrize("scale", [2, 8])
def test_upsample_bilinear_matches_torch(scale):
    x = RNG.randn(1, 4, 6, 2).astype(np.float32)
    ref = nhwc(F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                             scale_factor=scale, mode="bilinear", align_corners=False))
    got = np.asarray(layers.upsample_bilinear(jnp.asarray(x), scale))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_elu_matches_torch():
    x = RNG.randn(100).astype(np.float32)
    ref = F.elu(torch.from_numpy(x)).numpy()
    got = np.asarray(layers.elu(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-5)


def test_adaptive_avg_pool_matches_torch():
    from footprints_tpu.models.segmentor import adaptive_avg_pool

    for h, w, oh, ow in [(7, 9, 4, 4), (2, 3, 6, 6), (6, 20, 6, 6), (1, 3, 2, 2)]:
        x = RNG.randn(2, h, w, 3).astype(np.float32)
        ref = nhwc(F.adaptive_avg_pool2d(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), (oh, ow)))
        got = np.asarray(adaptive_avg_pool(jnp.asarray(x), oh, ow))
        np.testing.assert_allclose(got, ref, atol=1e-5, err_msg=f"{h}x{w}->{oh}x{ow}")


def test_bilinear_align_corners_matches_torch():
    from footprints_tpu.models.segmentor import resize_bilinear_align_corners

    for h, w, oh, ow in [(1, 1, 5, 7), (2, 2, 6, 10), (4, 6, 9, 13), (6, 6, 2, 3)]:
        x = RNG.randn(1, h, w, 2).astype(np.float32)
        ref = nhwc(F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                                 size=(oh, ow), mode="bilinear", align_corners=True))
        got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), oh, ow))
        np.testing.assert_allclose(got, ref, atol=1e-5, err_msg=f"{h}x{w}->{oh}x{ow}")
