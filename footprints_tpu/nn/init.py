"""Parameter initializers matching torch defaults, so a fresh training run of
the TPU build starts from the same distribution family as the reference.

  * decoder convs: torch.nn.Conv2d default = kaiming_uniform(a=sqrt(5))
    -> U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weights,
       U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for bias
  * resnet convs: kaiming_normal(fan_out, relu) (torchvision convention)
  * batchnorm: scale=1, bias=0, running mean=0, var=1
"""

import math

import jax
import jax.numpy as jnp


def conv_kaiming_uniform(key, kh, kw, c_in, c_out, *, with_bias=True):
    """torch.nn.Conv2d default init.  Returns {'w': HWIO, 'b': [c_out] | None}."""
    fan_in = kh * kw * c_in
    bound = 1.0 / math.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(
        wkey, (kh, kw, c_in, c_out), minval=-bound, maxval=bound, dtype=jnp.float32
    )
    b = (
        jax.random.uniform(bkey, (c_out,), minval=-bound, maxval=bound, dtype=jnp.float32)
        if with_bias
        else None
    )
    return {"w": w, "b": b}


def conv_kaiming_normal_fanout(key, kh, kw, c_in, c_out, *, with_bias=False):
    """torchvision ResNet conv init: N(0, sqrt(2/fan_out))."""
    fan_out = kh * kw * c_out
    std = math.sqrt(2.0 / fan_out)
    w = jax.random.normal(key, (kh, kw, c_in, c_out), dtype=jnp.float32) * std
    b = jnp.zeros((c_out,), jnp.float32) if with_bias else None
    return {"w": w, "b": b}


def batchnorm(c):
    """BN params + state at identity."""
    params = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    state = {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}
    return params, state
