"""Diagnose the full-model dx-border chip-vs-CPU divergence (r3).

chip_parity --grads found d(loss)/d(image) border rows/cols diverging
between the chip and the CPU backend on the SAME traced program
(f32/highest rel 2.4e-2 at 96x160), while every d(loss)/d(param) stat and
the isolated fused ops match to ~3e-7.  This script bisects by running the
same full-model grad probe under a configuration matrix:

  fused   : ops/s2d.py FUSED_DGRAD on/off (hand dxp vs XLA conv dgrad)
  rawpads : custom pad VJPs on, or monkeypatched to raw jnp.pad /
            plain-select constructions (XLA autodiff derives the
            transposes)

Usage: python tools/diag_dxrows.py [--dtype bf16|f32] [--res 96x160]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# single-source oracle twins (shared with tests/test_pad_vjps.py so the
# diagnostic can never bisect against a stale copy)
from footprints_tpu.ops.pad_oracles import (  # noqa: E402
    raw_edge_pad1,
    raw_reflect_pad1,
    raw_s2d_reflect_pad,
)


def run_config(fused, rawpads, h, w, dtype, cpu):
    from footprints_tpu.nn import layers
    from footprints_tpu.ops import s2d
    from footprints_tpu.models.footprint import FootprintNetwork
    from footprints_tpu.train.losses import LossConfig, compute_losses

    saved = (s2d.FUSED_DGRAD, layers._reflect_pad1, s2d._edge_pad1,
             s2d._s2d_reflect_pad)
    s2d.FUSED_DGRAD = fused
    if rawpads:
        layers._reflect_pad1 = raw_reflect_pad1
        s2d._edge_pad1 = raw_edge_pad1
        s2d._s2d_reflect_pad = raw_s2d_reflect_pad

    try:
        net = FootprintNetwork()
        params, state = net.init(jax.random.PRNGKey(0))
        keys = jax.random.split(jax.random.PRNGKey(7), 8)
        x = jax.random.uniform(keys[0], (2, h, w, 3), jnp.float32)
        shp = (2, h, w)
        targets = {
            "depth": jax.random.uniform(keys[1], shp) * 20,
            "visible_ground": (jax.random.uniform(keys[3], shp) > 0.5).astype(jnp.float32),
            "all_ground": (jax.random.uniform(keys[4], shp) > 0.4).astype(jnp.float32),
            "ground_depth": jax.random.uniform(keys[5], shp) * 15,
            "depth_mask": (jax.random.uniform(keys[6], shp) > 0.6).astype(jnp.float32),
            "moving_object_mask": (jax.random.uniform(keys[7], shp) > 0.8).astype(jnp.float32),
        }

        def loss_fn(params, x):
            p, xx = params, x
            if dtype is not None:
                p = jax.tree.map(lambda a: a.astype(dtype), p)
                xx = xx.astype(dtype)
            out, _ = net.apply(p, state, xx, train=True)
            return compute_losses(out, targets, LossConfig())["loss"]

        def probes(params, x):
            dx = jax.grad(loss_fn, argnums=1)(params, x)
            m = dx.shape[1] // 2
            return {"rows": jnp.concatenate([dx[:, :3], dx[:, -3:]], 1)
                    .astype(jnp.float32),
                    "cols": jnp.concatenate([dx[:, :, :2], dx[:, :, -2:]], 2)
                    .astype(jnp.float32),
                    "mid": dx[:, m:m + 3].astype(jnp.float32)}

        def probes_ref(params, x):
            return probes(params, x)

        t0 = time.time()
        pd = jax.jit(probes)(params, x)
        pd = {k: np.asarray(v) for k, v in pd.items()}
        from footprints_tpu.ops import pallas_conv
        pallas_conv.DISABLE = True
        try:
            pc = jax.jit(probes_ref, device=cpu)(
                *jax.device_put((params, x), cpu))
        finally:
            pallas_conv.DISABLE = False
        errs = {}
        for k in pd:
            a, b = pd[k], np.asarray(pc[k])
            errs[k] = float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-12))
        print(f"fused={int(fused)} rawpads={int(rawpads)}: "
              + " ".join(f"{k}={v:.2e}" for k, v in sorted(errs.items()))
              + f"  ({time.time()-t0:.0f}s)", flush=True)
        return errs
    finally:
        (s2d.FUSED_DGRAD, layers._reflect_pad1, s2d._edge_pad1,
         s2d._s2d_reflect_pad) = saved


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--res", default="96x160")
    ap.add_argument("--configs", default="10,00,01,11",
                    help="comma list of <fused><rawpads> bits")
    args = ap.parse_args()
    h, w = (int(v) for v in args.res.split("x"))
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None

    cpu = jax.devices("cpu")[0]
    print(f"device under test: {jax.devices()[0]} {args.dtype} {h}x{w}")
    for cfg in args.configs.split(","):
        run_config(cfg[0] == "1", cfg[1] == "1", h, w, dtype, cpu)


if __name__ == "__main__":
    main()
