"""Isolated A/B: the '1/4' and '1/8' output heads, full-res bilinear vs
period-S packed output (ops/s2d.py:bilinear_up_packed).

A (current, nn/blocks.py:out_conv_block): reflect pad -> conv3x3 (tiny co)
   -> sigmoid -> upsample_bilinear xS, materializing [N,192,640,2] fwd+bwd.
B (packed): same conv -> sigmoid -> bilinear_up_packed: a constant 3x3
   conv emitting all S^2 phases as lanes, [N,H/S,W/S,S^2*co] — the same
   elements, never laid out at full res; scored against period-S packed
   targets built on the put path (train/losses.py p4_map/p8_map).

Sites (per decoder, x2 decoders in the model, KITTI 192x640 batch 12):
  1/4 head: x [12,48,160,64]  -> co=2, S=4
  1/8 head: x [12,24,80,128]  -> co=2, S=8

fwd+bwd fori-slope per variant (same methodology as tools/ab_p4_seam.py).
Prints one JSON line.  Numbers land in PERF.md before any model wiring.

OUTCOME (2026-08-19, PERF.md r5 results): B LOSES at both sites —
h14 0.331 -> 0.465 ms (0.71x), h18 0.082 -> 0.120 ms (0.68x).  XLA's
separable resize lowering is already efficient at these shapes and the
sites bound any win under ~1% of the step; the model wiring was reverted
unlanded.  Don't re-try without new numbers.
"""

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np

N = 12
SITES = {
    "h14": ((N, 48, 160, 64), 4),
    "h18": ((N, 24, 80, 128), 8),
}


def _time_loop(chain, args, n_lo, n_hi):
    import jax.numpy as jnp

    def run(n):
        t0 = time.perf_counter()
        np.asarray(chain(*args, jnp.int32(n)))
        return time.perf_counter() - t0

    run(1)
    run(n_lo)
    return max(statistics.median(
        (run(n_hi) - run(n_lo)) / (n_hi - n_lo) for _ in range(3)), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/fp_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from footprints_tpu.nn.layers import (reflect_pad, sigmoid,
                                          upsample_bilinear)
    from footprints_tpu.ops.s2d import bilinear_up_packed
    from footprints_tpu.ops.wgrad import conv3x3_valid_small_co

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    results = {}
    for site, (shape, s) in SITES.items():
        x = jnp.asarray(rng.rand(*shape) - 0.5, dt)
        w = jnp.asarray(rng.rand(3, 3, shape[-1], 2) * 0.1, dt)
        b = jnp.asarray(rng.rand(2) * 0.1, dt)

        def head_a(x, w, b, s=s):
            y = sigmoid(conv3x3_valid_small_co(reflect_pad(x, 1), w, b))
            f = upsample_bilinear(y, s)
            return jnp.mean(jnp.asarray(f, jnp.float32) ** 2)

        def head_b(x, w, b, s=s):
            y = sigmoid(conv3x3_valid_small_co(reflect_pad(x, 1), w, b))
            f = bilinear_up_packed(y, s)
            return jnp.mean(jnp.asarray(f, jnp.float32) ** 2)

        for name, fn in (("a_fullres", head_a), ("b_packed", head_b)):
            grad = jax.grad(fn, argnums=(0, 1))

            @jax.jit
            def chain(x, n, grad=grad):
                def body(_, c):
                    gx, gw = grad(c, w, b)
                    return c + 1e-6 * gx + 1e-12 * jnp.mean(gw)

                c = jax.lax.fori_loop(0, n, body, x)
                return jnp.sum(jnp.asarray(c[0, 0, 0, :2], jnp.float32))

            ms = _time_loop(chain, (x,), 8, 208) * 1e3
            results[f"{site}_{name}_ms"] = round(ms, 4)
        results[f"{site}_speedup"] = round(
            results[f"{site}_a_fullres_ms"] / results[f"{site}_b_packed_ms"],
            3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
