"""Functional NN primitives, NHWC activations / HWIO weights (XLA-native).

Every layer is a pure function: ``y = layer(x, params, ...)``.  Stateful
normalization threads an explicit ``state`` pytree (running statistics) and
returns the updated copy — nothing is mutated, so the whole model composes
under ``jax.jit`` / ``jax.grad`` / ``shard_map`` without ceremony.

Numerics contract (golden-tested against torch CPU in tests/test_nn_layers.py):
  * conv2d           == torch.nn.Conv2d (same stride/padding)
  * batch_norm       == torch.nn.BatchNorm2d (train & eval modes, running stats)
  * reflect_pad      == torch.nn.ReflectionPad2d
  * max_pool_3x3_s2  == torch.nn.MaxPool2d(3, 2, padding=1)
  * upsample_nearest == F.interpolate(mode='nearest', scale_factor=k)
  * upsample_bilinear== F.interpolate(mode='bilinear', align_corners=False)
  * elu              == torch.nn.ELU (alpha=1)

Reference model behavior: /root/reference/footprints/network.py:104-183.
"""

import jax
import jax.numpy as jnp

# MXU precision for convolutions.  "highest" reproduces torch-f32 numerics
# (<1e-4 feature error — required for checkpoint parity); "default" lets the
# MXU run bf16-multiply/f32-accumulate for ~3-6x more throughput.  Flip with
# `set_default_precision` for benchmark runs; parity tests pin "highest".
_DEFAULT_PRECISION = "highest"


def set_default_precision(precision: str):
    global _DEFAULT_PRECISION
    assert precision in ("default", "high", "highest")
    _DEFAULT_PRECISION = precision


def get_default_precision() -> str:
    return _DEFAULT_PRECISION


def conv2d(x, w, b=None, *, stride=1, padding=0, precision=None):
    """2-D convolution.  x: [N,H,W,C_in], w: [kh,kw,C_in,C_out], b: [C_out]."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    # MXU accumulation is f32 either way; only request an f32 *output* for
    # f32 inputs (a f32 preferred type on bf16 inputs breaks the conv
    # transpose rule under autodiff, and we cast back to x.dtype anyway)
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding, dimension_numbers=dn,
        preferred_element_type=pet,
        precision=precision or _DEFAULT_PRECISION,
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def batch_norm(x, params, state, *, train, momentum=0.1, eps=1e-5):
    """BatchNorm over N,H,W.  Returns (y, new_state).

    Matches torch semantics: normalization uses the biased batch variance in
    train mode, while running_var accumulates the *unbiased* variance.
    ``state`` = {'mean': [C], 'var': [C]}; ``params`` = {'scale': [C], 'bias': [C]}.
    """
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    y = (x - mean) * inv + params["bias"]
    return y.astype(x.dtype), new_state


# NOTE: custom_vjp supports reverse-mode AD only — jax.jvp/jacfwd/hessian
# through any decoder conv (and through ops/s2d.py's pads) raises.  The
# training stack is reverse-mode-only by design; if forward-mode is ever
# needed, re-express these as jax.custom_gradient or gate on a flag.
@jax.custom_vjp
def _reflect_pad1(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


def _reflect_pad1_fwd(x):
    return _reflect_pad1(x), None


def _reflect_pad1_bwd(_, g):
    """Transpose of 1-px reflect pad: fold border cotangents onto the rows
    and columns they reflected from.

    XLA's autodiff of the concat-based pad materializes a full-tensor
    slice+add pass PER PAD SIDE (~3.8 ms/step across the decoder in the r2
    train profile); this hand VJP is one interior slice plus four
    single-row/col updates and four corner taps (~0.2 ms/step)."""
    gi = g[:, 1:-1, 1:-1]
    gi = gi.at[:, 1].add(g[:, 0, 1:-1]).at[:, -2].add(g[:, -1, 1:-1])
    gi = gi.at[:, :, 1].add(g[:, 1:-1, 0]).at[:, :, -2].add(g[:, 1:-1, -1])
    gi = (gi.at[:, 1, 1].add(g[:, 0, 0]).at[:, 1, -2].add(g[:, 0, -1])
            .at[:, -2, 1].add(g[:, -1, 0]).at[:, -2, -2].add(g[:, -1, -1]))
    return (gi,)


_reflect_pad1.defvjp(_reflect_pad1_fwd, _reflect_pad1_bwd)


def reflect_pad(x, pad=1):
    """Reflection padding on the spatial dims of an NHWC tensor."""
    if pad == 1:
        return _reflect_pad1(x)
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")




def max_pool_3x3_s2(x):
    """3x3/stride-2/pad-1 max pool (the ResNet stem pool)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def upsample_nearest(x, scale=2):
    """Integer-factor nearest-neighbor upsample (pixel replication)."""
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    return x


def upsample_bilinear(x, scale):
    """Bilinear upsample with half-pixel centers (align_corners=False)."""
    n, h, w, c = x.shape
    out_shape = (n, h * scale, w * scale, c)
    return jax.image.resize(x, out_shape, method="bilinear", antialias=False).astype(
        x.dtype
    )


elu = jax.nn.elu
relu = jax.nn.relu
sigmoid = jax.nn.sigmoid
