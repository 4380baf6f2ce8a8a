"""On-chip numerics guard: compare the real-TPU forward against the CPU
backend executing the SAME traced program.

Motivation (r2): the XLA:TPU build behind the axon tunnel miscompiled the
slice+concat construction in ops/s2d.py:_s2d_reflect_pad — the top/bottom
s2d pad rows came out wrong ON CHIP ONLY (CPU and interpret-mode execution
of the identical jaxpr were correct), so every CPU-mesh golden test passed
while serving produced wrong image borders.  Nothing in the r1 test
strategy could catch a backend-specific miscompile; this tool is that
guard.  Run it on the real chip after touching any op in the compute path:

    python tools/chip_parity.py            # model-level, all resolutions
    python tools/chip_parity.py --ops      # per-op checks at model shapes

Probes are tiny (border rows + on-device checksums) because device->host
fetches through the tunnel run at ~KB-MB/s (.claude/skills/verify/SKILL.md).

Exit code 0 iff every check passes.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

TOL_F32 = 3e-5     # chip f32 vs CPU f32, precision=highest conv stack
TOL_BF16 = 0.05    # bf16 chip path vs f32 CPU reference (rounding)


def _probe(out):
    """Border rows + interior row + global checksums of an NHWC tensor.

    Shaped to catch exactly the failure class we saw: wrong first/last
    spatial rows with a correct interior.  All reductions happen on the
    executing device; only ~100 KB crosses the tunnel.
    """
    rows = jnp.concatenate(
        [out[:, :3], out[:, out.shape[1] // 2:out.shape[1] // 2 + 1],
         out[:, -3:]], axis=1)
    return {
        "rows": rows,
        "mean_abs": jnp.mean(jnp.abs(out)),
        "max_abs": jnp.max(jnp.abs(out)),
        "cols": jnp.concatenate([out[:, :, :2], out[:, :, -2:]], axis=2),
    }


def _compare(name, p_dev, p_cpu, tol):
    ok = True
    for k in p_dev:
        a = np.asarray(p_dev[k], np.float32)
        b = np.asarray(p_cpu[k], np.float32)
        err = np.max(np.abs(a - b))
        scale = max(1.0, np.max(np.abs(b)))
        if err > tol * scale:
            print(f"  FAIL {name}/{k}: max_err={err:.6f} (tol {tol * scale:.6f})")
            ok = False
    if ok:
        print(f"  ok   {name}")
    return ok


def check_model(height, width, dtype, cpu):
    from footprints_tpu.models.footprint import FootprintNetwork

    net = FootprintNetwork()
    params, state = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, height, width, 3),
                           jnp.float32)

    def fwd(params, state, x):
        if dtype == jnp.bfloat16:
            params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
            x = x.astype(jnp.bfloat16)
        out, _ = net.apply(params, state, x, train=False)
        # probe ALL scales: the '1/2'..'1/8' heads run different pad/conv
        # code paths than '1/1' and are equally exposed to backend
        # miscompiles (the r2 reflect-pad bug corrupted borders only)
        return {f"{k.replace('/', '_')}.{pk}": pv
                for k, o in out.items()
                for pk, pv in _probe(o.astype(jnp.float32)).items()}

    from footprints_tpu.ops import pallas_conv

    def fwd_ref(params, state, x):
        # distinct function object: jax.jit caches the TRACE by function
        # identity + avals, so reusing `fwd` here would replay the TPU
        # trace (Pallas ops included) without ever consulting DISABLE
        return fwd(params, state, x)

    p_dev = jax.jit(fwd)(params, state, x)
    # the CPU reference traces from a TPU-default process; the Pallas
    # kernels only lower for TPU, so force the XLA composition
    pallas_conv.DISABLE = True
    try:
        p_cpu = jax.jit(fwd_ref, device=cpu)(
            *jax.device_put((params, state, x), cpu))
    finally:
        pallas_conv.DISABLE = False
    tol = TOL_F32 if dtype == jnp.float32 else TOL_BF16
    tag = "f32" if dtype == jnp.float32 else "bf16"
    return _compare(f"model {height}x{width} {tag}", p_dev, p_cpu, tol)


def check_ops(cpu):
    """Each fast op at its real model shapes, chip vs CPU."""
    from footprints_tpu.ops.s2d import (s2d_conv3x3_reflect, up_conv_to_s2d,
                                        space_to_depth)

    ok = True
    # (name, fn-builder, input shape, weight shape)
    shapes = [
        ("s2d_conv tail", (2, 96, 320, 128), (3, 3, 32, 32)),
        ("s2d_conv b4", (2, 24, 80, 512), (3, 3, 128, 128)),
        ("s2d_conv mp-tail", (2, 256, 320, 128), (3, 3, 32, 32)),
    ]
    for name, xs, ws in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), xs, jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), ws, jnp.float32) * 0.1
        b = jax.random.normal(jax.random.PRNGKey(2), (ws[-1],), jnp.float32)
        fn = lambda x, w, b: _probe(s2d_conv3x3_reflect(x, w, b))
        p_dev = jax.jit(fn)(x, w, b)
        p_cpu = jax.jit(fn, device=cpu)(*jax.device_put((x, w, b), cpu))
        ok &= _compare(name, p_dev, p_cpu, TOL_F32)

    # up-conv (phase-embedded kernel, edge pad) at the tail shape
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 48, 160, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 32), jnp.float32) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (32,), jnp.float32)
    fn = lambda x, w, b: _probe(up_conv_to_s2d(x, w, b))
    p_dev = jax.jit(fn)(x, w, b)
    p_cpu = jax.jit(fn, device=cpu)(*jax.device_put((x, w, b), cpu))
    ok &= _compare("up_conv tail", p_dev, p_cpu, TOL_F32)

    # Pallas fused kernels (bf16 — the only gated-on dtype) vs the CPU XLA
    # composition run in f32
    from footprints_tpu.ops.pallas_conv import (s2d_conv_fused,
                                                up_conv_s2d_fused)
    xs2d = jax.random.normal(jax.random.PRNGKey(0), (2, 96, 320, 128),
                             jnp.bfloat16)
    w1 = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 32, 32)) * 0.1
          ).astype(jnp.bfloat16)
    b1 = jax.random.normal(jax.random.PRNGKey(2), (32,)).astype(jnp.bfloat16)
    if True:  # kernels are checked unconditionally (model gate is opt-in)
        p_dev = jax.jit(lambda x, w, b: _probe(
            s2d_conv_fused(x, w, b, "elu").astype(jnp.float32)))(xs2d, w1, b1)
        p_cpu = jax.jit(
            lambda x, w, b: _probe(jax.nn.elu(s2d_conv3x3_reflect(
                x.astype(jnp.float32), w.astype(jnp.float32),
                b.astype(jnp.float32)))),
            device=cpu)(*jax.device_put((xs2d, w1, b1), cpu))
        ok &= _compare("pallas s2d_conv_fused", p_dev, p_cpu, TOL_BF16)

    xup = jax.random.normal(jax.random.PRNGKey(0), (2, 48, 160, 64),
                            jnp.bfloat16)
    w2 = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 32)) * 0.1
          ).astype(jnp.bfloat16)
    if True:
        p_dev = jax.jit(lambda x, w, b: _probe(
            up_conv_s2d_fused(x, w, b, "elu").astype(jnp.float32)))(xup, w2, b1)
        p_cpu = jax.jit(
            lambda x, w, b: _probe(jax.nn.elu(up_conv_to_s2d(
                x.astype(jnp.float32), w.astype(jnp.float32),
                b.astype(jnp.float32)))),
            device=cpu)(*jax.device_put((xup, w2, b1), cpu))
        ok &= _compare("pallas up_conv_s2d_fused", p_dev, p_cpu, TOL_BF16)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", action="store_true", help="per-op checks only")
    ap.add_argument("--resolutions", default="192x640",
                    help="comma list, e.g. 192x640,512x640,256x448")
    args = ap.parse_args()

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    print(f"device under test: {dev} (reference: {cpu})")
    if dev.platform == "cpu":
        print("WARNING: default device is CPU — this run checks nothing.")

    ok = True
    if args.ops:
        ok &= check_ops(cpu)
    else:
        for res in args.resolutions.split(","):
            h, w = (int(v) for v in res.split("x"))
            ok &= check_model(h, w, jnp.float32, cpu)
            ok &= check_model(h, w, jnp.bfloat16, cpu)
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
