"""Isolated A/B of the block4->tail seam: current basis changes vs the
period-4 phase formulation (PERF.md r5 roadmap #1).

Variant A (current model seam):
    x   = depth_to_space(y_b4)                  # [N,96,320,64]
    h12 = conv3x3(reflect_pad(x), w12)          # the 1/2 head conv
    t   = up_conv_to_s2d(x, w1)                 # edge pad + phase conv
Variant B (period-4 seam — roadmap item 1):
    h12 = s2d_conv3x3_reflect(y_b4, w12)        # 1/2 head in s2d basis
    t4  = conv(s2d_pad(y_b4), s2d_kernel(phase_kernel(w1)))  # [N,48,160,512]
    t   = depth_to_space(t4)                    # -> [N,96,320,128]

Both produce the tail input t in the SAME s2d basis the rest of the tail
consumes, so the A/B isolates exactly the seam the roadmap item targets.
B's pad uses the (tested) s2d reflect pad as a byte-identical stand-in for
the edge-pad variant (same structure/cost; building the edge twin is only
worth it if B wins).  Byte-count preview of why B should LOSE: A moves
~{d2s 63 + edge-pad 60 + reflect-pad 60} = 183 MB fwd at batch 12, while B
moves ~{s2d-pad 63 + s2d-pad 63 + d2s-at-128ch 126} = 252 MB — the seam
output has 2x the channels of its input, so deferring the d2s until after
the seam conv doubles the relayout bytes.

Prints one JSON line with fwd+bwd ms/step for each variant (fori slope).

OUTCOME (2026-08-19, PERF.md r5 results): B reads −6.6% here (5.74 vs
6.15 ms) but that win is entirely the h12 leg (full-res head conv in A vs
s2d-basis head in B) — isolating the up-conv seam alone shows B's
formulation 1.34-1.37× SLOWER, matching the byte-count preview above, and
the integrated train step regressed −5.7%.  The landed form keeps
variant A's seam and takes only B's head leg (p4 '1/2' head, +6.2%
integrated).
"""

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np

N, H2, W2, C = 12, 48, 160, 64  # y_b4: s2d of [N,96,320,64]


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

    from footprints_tpu.nn.layers import reflect_pad, conv2d
    from footprints_tpu.ops import s2d as s2d_mod
    from footprints_tpu.ops.s2d import (_phase_embedded_kernel, _s2d_kernel,
                                        _s2d_reflect_pad, depth_to_space,
                                        s2d_conv3x3_reflect, up_conv_to_s2d)
    from footprints_tpu.ops.wgrad import conv3x3_valid_small_co

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.rand(N, H2, W2, 4 * C) - 0.5, dt)
    w1 = jnp.asarray(rng.rand(3, 3, C, 32) * 0.1, dt)      # tail c1
    b1 = jnp.asarray(rng.rand(32) * 0.1, dt)
    w12 = jnp.asarray(rng.rand(3, 3, C, 2) * 0.1, dt)      # 1/2 head conv
    b12 = jnp.asarray(rng.rand(2) * 0.1, dt)

    def seam_a(y, w1, b1, w12, b12):
        x = depth_to_space(y)
        h12 = conv3x3_valid_small_co(reflect_pad(x, 1), w12, b12)
        t = up_conv_to_s2d(x, w1, b1)
        return (jnp.mean(jnp.asarray(t, jnp.float32) ** 2)
                + jnp.mean(jnp.asarray(h12, jnp.float32) ** 2))

    def seam_b(y, w1, b1, w12, b12):
        h12 = s2d_conv3x3_reflect(y, w12, b12)
        k4 = _s2d_kernel(_phase_embedded_kernel(w1))  # [3,3,4C, 4*(4*32)]
        t4 = conv2d(_s2d_reflect_pad(y, C), k4) + jnp.tile(jnp.tile(b1, 4), 4)
        t = depth_to_space(t4)  # [N,96,320,128] — the tail's s2d basis
        return (jnp.mean(jnp.asarray(t, jnp.float32) ** 2)
                + jnp.mean(jnp.asarray(h12, jnp.float32) ** 2))

    results = {}
    for name, fn in (("a_current", seam_a), ("b_period4", seam_b)):
        grad = jax.grad(fn, argnums=(0, 1, 3))

        @jax.jit
        def chain(y, n, grad=grad):
            def body(_, c):
                gy, gw1, gw12 = grad(c, w1, b1, w12, b12)
                # every grad must feed the carry or XLA DCEs its backward
                return (c + 1e-6 * gy
                        + 1e-12 * jnp.mean(gw1) + 1e-12 * jnp.mean(gw12))

            c = jax.lax.fori_loop(0, n, body, y)
            return jnp.sum(jnp.asarray(c[0, 0, 0], jnp.float32))

        sec = _time_loop(chain, (y,), 2, 42)
        results[name + "_ms"] = round(sec * 1e3, 3)
    results["b_vs_a"] = round(results["b_period4_ms"] / results["a_current_ms"],
                              3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
