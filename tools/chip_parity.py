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
    python tools/chip_parity.py --grads    # train backwards (footprint+seg)
    python tools/chip_parity.py --seg --grads   # seg backward only
    python tools/chip_parity.py --gt      # GT-generation graphs (pipeline B)

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


def check_seg(height, width, dtype, cpu):
    """Segmentor (preprocessing pipeline A) forward, chip vs CPU.

    The seg net shares the encoder/decoder conv stack with FootprintNetwork
    but adds code paths the footprint model never runs: the PSP bottleneck
    (adaptive-avg-pool to 1/2/4/6 + align_corners=True bilinear resize,
    models/segmentor.py) and native-scale logit heads.  Same probe scheme
    as check_model, one probe per output scale.
    """
    from footprints_tpu.models.segmentor import Segmentor

    net = Segmentor(depth=34, use_psp=True)
    params, state = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, height, width, 3),
                           jnp.float32)

    def fwd(params, state, x):
        if dtype == jnp.bfloat16:
            params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
            x = x.astype(jnp.bfloat16)
        outs = net.apply(params, state, x, train=False)[0]
        return {f"s{i}.{pk}": pv
                for i, o in enumerate(outs)
                for pk, pv in _probe(o.astype(jnp.float32)).items()}

    from footprints_tpu.ops import pallas_conv

    def fwd_ref(params, state, x):
        return fwd(params, state, x)

    p_dev = jax.jit(fwd)(params, state, x)
    pallas_conv.DISABLE = True
    try:
        p_cpu = jax.jit(fwd_ref, device=cpu)(
            *jax.device_put((params, state, x), cpu))
    finally:
        pallas_conv.DISABLE = False
    tol = TOL_F32 if dtype == jnp.float32 else TOL_BF16
    tag = "f32" if dtype == jnp.float32 else "bf16"
    return _compare(f"seg {height}x{width} {tag}", p_dev, p_cpu, tol)


def check_ops(cpu):
    """Each fast op at its real model shapes, chip vs CPU."""
    from footprints_tpu.ops.s2d import (s2d_conv3x3_reflect, up_conv_to_s2d,
                                        space_to_depth)

    ok = True

    # uint8 image decode (data/compact.py): the LUT gather must return the
    # host-computed f32(u8)/255 values BITWISE for all 256 codes.  The
    # domain is tiny, so this check is exhaustive.
    from footprints_tpu.data.compact import decompact_batch
    codes = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    img = np.broadcast_to(codes, (1, 16, 16, 3)).copy()
    dec = jax.jit(lambda b: decompact_batch(b)["image"])
    got = np.asarray(dec({"image": jnp.asarray(img)}))
    want = img.astype(np.float32) / np.float32(255.0)
    exact = np.array_equal(got, want)
    print(f"  {'ok  ' if exact else 'FAIL'} u8_decode 256-code LUT "
          f"({'bitwise' if exact else 'MISMATCH'})")
    ok &= exact

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


def check_grads(cpu, height=192, width=640, compute_dtype=None,
                precision=None, s2d_head=False, p4_head=False):
    """Backward-pass parity: jax.grad of the real training loss on chip vs
    the CPU backend.

    The r2 miscompile class (border-only, chip-only, fusion-dependent) is
    exactly what the hand-written pad VJPs would produce if the backend
    mishandles their border-sized ``.at[].add`` scatter patterns
    (ops/s2d.py:_s2d_reflect_pad_bwd, nn/layers.py:_reflect_pad1_bwd) — and
    the train-step backward graph is otherwise unguarded by any on-chip
    check.  Probes: border rows of d(loss)/d(image) (where a pad-transpose
    bug lands), mean/max of EVERY d(loss)/d(param) leaf, and a global grad
    L2 — all reduced on the executing device.

    Precision note: the primary config is bf16 + precision "default" — the
    graph the real mixed-precision train step compiles (bench.py/step.py).
    f32 + "highest" dgrads are pathologically slow for the tunnel backend
    to compile (~100 s for ONE conv dgrad at the tail shape, measured —
    the full model never finished); keep f32 probes at small resolutions.

    Tolerance calibration (measured 2026-08-17, diag_dxrows.py):
      * dp (param grads — the ONLY thing training consumes): chip-vs-CPU
        matches to <3e-4 in f32/highest; gate strictly.
      * dx (image grad — probe-only, never used): its elements are ~4e-5
        sums of ~1e-3 cancelling terms, so reordering noise alone measures
        ~1e-6 absolute == ~2e-2 relative at the (10x smaller) border rows,
        IDENTICAL across all four {fused dgrad, raw pads} formulations —
        i.e. depth-of-graph rounding, not a miscompile (the r2 class is
        O(1) wrong).  In bf16 the whole dx differs ~0.5 between backends.
        Gate dx at 0.1 relative-to-global-max in f32 (catches O(1) border
        corruption), and skip dx entirely in bf16.
      * dp per-leaf stats in bf16: the worst leaves are bias grads of the
        sigmoid-head convs (outconv*_out.conv1.b, block*.post.conv2.b) —
        near-cancelling sums of ~2.5e5 bf16 cotangents whose rounding
        points differ between backend fusion schedules.  Measured
        divergence at 192x640: up to 0.13 relative-to-global-max (0.16-1.3
        relative to the tiny leaf itself), while the SAME graph with f32
        storage ("default" precision, 192x640) passes every dp stat at
        0.05 — so this is precision noise, not a backend bug.  Gate bf16
        per-leaf stats at 0.25 rel-to-global (2x margin over measured
        noise; an r2-class O(1) corruption still reads >=1.0).
        r5 re-calibration: with the p4 '1/2' head, outconv3.conv1.b became
        the global-max leaf, so its 0.16-1.3 rel-to-leaf noise band reads
        directly in rel-to-global units (measured 0.54 on chip, while CPU
        bf16-vs-f32 moves the same leaf 0.001, and the identical graph at
        f32/highest 96x160 passes every leaf at 0.15x tol).  Bias leaves
        are therefore gated gross-only (0.75) in bf16 — the f32/highest
        s2d+p4 leg in the --grads suite is their exactness guard.
    """
    from footprints_tpu.models.footprint import FootprintNetwork
    from footprints_tpu.nn import layers
    from footprints_tpu.train.losses import LossConfig, compute_losses

    old_precision = layers.get_default_precision()
    if precision is not None:
        layers.set_default_precision(precision)

    net = FootprintNetwork()
    params, state = net.init(jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(7), 8)
    x = jax.random.uniform(keys[0], (2, height, width, 3), jnp.float32)
    targets = {
        "depth": jax.random.uniform(keys[1], (2, height, width)) * 20
        * (jax.random.uniform(keys[2], (2, height, width)) > 0.3),
        "visible_ground": (jax.random.uniform(keys[3], (2, height, width)) > 0.5)
        .astype(jnp.float32),
        "all_ground": (jax.random.uniform(keys[4], (2, height, width)) > 0.4)
        .astype(jnp.float32),
        "ground_depth": jax.random.uniform(keys[5], (2, height, width)) * 15,
        "depth_mask": (jax.random.uniform(keys[6], (2, height, width)) > 0.6)
        .astype(jnp.float32),
        "moving_object_mask": (jax.random.uniform(keys[7], (2, height, width))
                               > 0.8).astype(jnp.float32),
    }

    if s2d_head or p4_head:
        # the production mixed-precision graph packs targets on the put
        # path (data/compact.py); build them here the same way
        from footprints_tpu.data.compact import decompact_batch
        targets = decompact_batch(targets, None,
                                  tuple(targets) if s2d_head else (),
                                  tuple(targets) if p4_head else ())

    def loss_fn(params, x):
        p, xx = params, x
        if compute_dtype is not None:
            p = jax.tree.map(lambda a: a.astype(compute_dtype), p)
            xx = xx.astype(compute_dtype)
        out, _ = net.apply(p, state, xx, train=True, s2d_head=s2d_head,
                           p4_head=p4_head)
        return compute_losses(out, targets, LossConfig())["loss"]

    tag = ("f32" if compute_dtype is None else str(compute_dtype.__name__)
           ) + f"/{precision or 'highest'}" + ("/s2d_head" if s2d_head else ""
           ) + ("/p4_head" if p4_head else "")
    try:
        return _grad_parity(f"grads {height}x{width} {tag}", loss_fn, params,
                            x, cpu, compute_dtype, precision)
    finally:
        layers.set_default_precision(old_precision)


def _grad_parity(label, loss_fn, params, x, cpu, compute_dtype, precision):
    """Shared backward-parity core: probe jax.grad(loss_fn) w.r.t. (params,
    x) on chip and on the CPU backend from the same trace, compare with the
    calibrated dp/dx tolerances (see check_grads's docstring)."""
    leaf_names = [jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(params)[0]]

    def probes(params, x):
        loss, (dp, dx) = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, x)
        leaves = [g.astype(jnp.float32) for g in jax.tree.leaves(dp)]
        # stacked per-leaf stats: a handful of outputs total (an early
        # version returned ~660 separate scalars, which hung the tunnel's
        # TPU compile), indexable host-side via leaf_names
        mid = dx.shape[1] // 2
        out = {
            "loss": loss,
            "dp.mean": jnp.stack([jnp.mean(jnp.abs(g)) for g in leaves]),
            "dp.max": jnp.stack([jnp.max(jnp.abs(g)) for g in leaves]),
            "dp.l2": jnp.sqrt(sum(jnp.sum(g * g) for g in leaves)),
        }
        if compute_dtype is None:  # dx is pure noise in bf16 (see docstring)
            out.update({
                "dx.rows": jnp.concatenate(
                    [dx[:, :3], dx[:, -3:]], axis=1).astype(jnp.float32),
                # interior rows discriminate a border-localized miscompile
                # (err at rows/cols >> err here) from plain accumulated
                # rounding (comparable err everywhere)
                "dx.interior": dx[:, mid:mid + 3].astype(jnp.float32),
                "dx.cols": jnp.concatenate(
                    [dx[:, :, :2], dx[:, :, -2:]], axis=2).astype(jnp.float32),
                "dx.absmax": jnp.max(jnp.abs(dx)).astype(jnp.float32),
            })
        return out

    def probes_ref(params, x):
        # distinct function object — jit caches the trace by identity
        return probes(params, x)

    from footprints_tpu.ops import pallas_conv

    p_dev = jax.jit(probes)(params, x)
    pallas_conv.DISABLE = True
    try:
        p_cpu = jax.jit(probes_ref, device=cpu)(
            *jax.device_put((params, x), cpu))
    finally:
        pallas_conv.DISABLE = False
    full_f32 = compute_dtype is None and (precision or "highest") == "highest"
    tol = TOL_F32 * 10 if full_f32 else TOL_BF16
    # grads accumulate over the whole graph: wider relative scale per probe
    ok = True
    worst = (0.0, "", 0.0)
    dx_scale = float(np.asarray(p_cpu.get("dx.absmax", 0.0)))
    for k in p_dev:
        a = np.asarray(p_dev[k], np.float32)
        b = np.asarray(p_cpu[k], np.float32)
        if k.startswith("dx."):
            # relative to the GLOBAL |dx| max: border values run ~10x
            # smaller than interior, and per-probe normalization turns
            # uniform noise into a fake border signal (see docstring)
            scale, k_tol = max(dx_scale, 1e-12), 0.1
        else:
            scale = max(float(np.max(np.abs(b))), float(np.asarray(
                p_cpu["dp.l2"])) * 1e-6, 1e-12)
            k_tol = tol
            if compute_dtype is not None and k in ("dp.mean", "dp.max"):
                # bf16 per-leaf stats: sigmoid-head bias grads measure up
                # to 0.13 rel-to-global of pure rounding noise (docstring)
                k_tol = 0.25
        diff = np.abs(a - b)
        if (compute_dtype is not None and k in ("dp.mean", "dp.max")
                and diff.shape == (len(leaf_names),)):
            # bias ('b') leaves are near-cancelling sums whose backend
            # reassociation noise measures 0.16-1.3 rel-to-LEAF (r4
            # calibration; re-measured r5 when the p4 head made
            # outconv3.conv1.b the global-max leaf: 0.54 rel-to-global on
            # chip while CPU bf16-vs-f32 moves the same leaf only 0.001).
            # Gate them gross-only at 0.75 in bf16; their exactness guard
            # is the f32/highest s2d+p4 leg, which gates EVERY leaf
            # strictly (r5: PASS at 0.15x tol).  Weight leaves stay 0.25.
            is_bias = np.array([n.endswith("['b']") for n in leaf_names])
            diff = np.where(is_bias & (diff <= 0.75 * scale), 0.0, diff)
        err = float(np.max(diff)) / scale
        if err / k_tol > worst[0]:
            worst = (err / k_tol, k, err)
        if err > k_tol:
            detail = ""
            if k in ("dp.mean", "dp.max"):
                i = int(np.argmax(diff))
                detail = f" (worst leaf: {leaf_names[i]})"
            print(f"  FAIL {label}/{k}: rel_err={err:.6f} (tol {k_tol}){detail}")
            ok = False
    # rel_err and the tolerance ratio are different units — print both so
    # PARITY.md's calibration ledger records true divergences
    print(f"  {'ok  ' if ok else 'FAIL'} {label} "
          f"(worst {worst[1]}: rel_err {worst[2]:.2e} = {worst[0]:.2f}x tol)")
    return ok


def check_seg_grads(cpu, height=192, width=640, compute_dtype=None,
                    precision=None):
    """Backward parity for the Segmentor train graph (pipeline A).

    Covers backward paths the footprint check never exercises: the PSP
    adaptive-avg-pool (overlapping mean slices), the align_corners=True
    resize-as-matmul transposes (models/segmentor.py), and the per-scale
    bilinear loss upsample (preprocessing/segmentation/losses.py).  The
    bf16/default config is the graph the seg trainer's mixed-precision
    path compiles (preprocessing/segmentation/trainer.py).
    """
    from footprints_tpu.models.segmentor import Segmentor
    from footprints_tpu.nn import layers
    from footprints_tpu.preprocessing.segmentation.losses import (
        compute_seg_losses)

    old_precision = layers.get_default_precision()
    if precision is not None:
        layers.set_default_precision(precision)

    net = Segmentor(depth=34, use_psp=True)
    params, state = net.init(jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    x = jax.random.uniform(keys[0], (2, height, width, 3), jnp.float32)
    ground_mask = (jax.random.uniform(keys[1], (2, height, width)) > 0.5
                   ).astype(jnp.float32)
    labelled_pix = (jax.random.uniform(keys[2], (2, height, width)) > 0.2
                    ).astype(jnp.float32)

    def loss_fn(params, x):
        p, xx = params, x
        if compute_dtype is not None:
            p = jax.tree.map(lambda a: a.astype(compute_dtype), p)
            xx = xx.astype(compute_dtype)
        outs, _ = net.apply(p, state, xx, train=True)
        return compute_seg_losses(outs, ground_mask, labelled_pix)["loss"]

    tag = ("f32" if compute_dtype is None else str(compute_dtype.__name__)
           ) + f"/{precision or 'highest'}"
    try:
        return _grad_parity(f"seg-grads {height}x{width} {tag}", loss_fn,
                            params, x, cpu, compute_dtype, precision)
    finally:
        layers.set_default_precision(old_precision)


def _gt_scene(frames, height, width, seed=0):
    """Synthetic-but-realistic GT-generation inputs (host-side numpy).

    A flat ground plane 1.65 m below a KITTI-like camera, viewed from
    `frames` neighbor poses (forward translations up to +-5 m, ~1 deg
    rotations), with the last 6 frames zero-depth (the static-padding path).
    Plane depths keep the splat dense (many duplicate pixel targets per
    output pixel), which is exactly the sort/scatter/median machinery the
    probe must exercise.
    """
    rng = np.random.RandomState(seed)
    K = np.array([[0.58 * width, 0, 0.5 * width, 0],
                  [0, 1.92 * height, 0.5 * height, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float64)
    invK = np.linalg.pinv(K)
    u, v = np.meshgrid(np.arange(width), np.arange(height))
    rays = invK[:3, :3] @ np.stack(
        [u.ravel(), v.ravel(), np.ones(u.size)])  # [3, P]
    ry = rays[1]  # y points down; ground plane at y = +1.65
    plane_d = np.where(ry > 0.05, 1.65 / np.maximum(ry, 0.05), 0.0)
    plane_d = np.clip(plane_d, 0.0, 80.0).reshape(height, width)

    def rodrigues(w):
        th = np.linalg.norm(w)
        if th < 1e-12:
            return np.eye(3)
        k = w / th
        km = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(th) * km + (1 - np.cos(th)) * (km @ km)

    depths = np.zeros((frames, height, width), np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (frames, 1, 1))
    n_live = max(frames - 6, 1)
    for i in range(n_live):
        noise = 1.0 + 0.01 * rng.randn(height, width)
        depths[i] = (plane_d * noise * (plane_d > 0)).astype(np.float32)
        R = rodrigues(rng.randn(3) * 0.02)
        t = np.array([rng.randn() * 0.3, rng.randn() * 0.05,
                      rng.uniform(-5.0, 5.0)])
        P = np.eye(4)
        P[:3, :3], P[:3, 3] = R, t
        poses[i] = P.astype(np.float32)
    Ks = np.tile(K.astype(np.float32)[None], (frames, 1, 1))
    invKs = np.tile(invK.astype(np.float32)[None], (frames, 1, 1))
    return depths, poses, Ks, invKs, plane_d.astype(np.float32)


def _compare_gt(name, a, b, bitwise=False, max_frac=0.005):
    """Count-based comparison for splat-family outputs.

    fp noise between backends can flip a floor() pixel index for
    projections within ~1e-4 px of a pixel boundary, moving single depths
    between neighboring bins — so scattered single-pixel differences are
    expected and benign.  The r2 miscompile class is structural (whole
    border rows wrong), so the gates are: overall mismatch fraction below
    `max_frac`, and no single row more than half mismatched.
    """
    a = np.asarray(a)
    b = np.asarray(b)
    if a.dtype == bool:
        diff = a != b
    else:
        diff = np.abs(a.astype(np.float64) - b.astype(np.float64)) > (
            1e-3 * np.maximum(1.0, np.abs(b.astype(np.float64))))
    frac = float(diff.mean())
    row_frac = float(diff.mean(axis=-1).max())
    border = diff[..., :3, :].mean() + diff[..., -3:, :].mean()
    lim = 0.0 if bitwise else max_frac
    ok = frac <= lim and row_frac <= 0.5
    print(f"  {'ok  ' if ok else 'FAIL'} {name}: mismatch frac={frac:.2e} "
          f"(gate {lim:g}), worst-row={row_frac:.3f}, border={border:.2e}")
    return ok


def check_gt(cpu, frames=76, height=192, width=640, time_it=True):
    """On-chip parity for the GT-generation device graphs (pipeline B).

    The only compiled-graph family previously without chip coverage — and
    it is built from exactly the op classes adjacent to the r2 chip-only
    miscompile: two-key jax.lax.sort, a unique-index scatter-set riding a
    mode="drop" sentinel (geometry.py:104-115), take_along_axis medians,
    and RANSAC's Gumbel-argmax.  Its output IS the training data, so a
    silent miscompile here propagates into every trained model.

    Probes (real KITTI window shape 76x192x640 by default):
      * aggregate_hidden_depth, robust and non-robust
        (reference flow: ground_truth_generator.py:124-142)
      * compute_depth_mask: RANSAC plane + 8x8 splat + agreement mask
        (reference: ground_truth_generator.py:70-122)
      * compute_moving_object_mask: induced-vs-observed flow, 3 px
        threshold (reference: ground_truth_generator.py:283-318) — flow is
        constructed with a 0.5 px margin off the threshold, so this one
        must be BITWISE equal across backends.
    """
    import time as _time

    from footprints_tpu.preprocessing.ground_truth_generation.geometry import (
        aggregate_hidden_depth)
    from footprints_tpu.preprocessing.ground_truth_generation.processing import (
        compute_depth_mask, compute_moving_object_mask)

    depths, poses, Ks, invKs, plane_d = _gt_scene(frames, height, width)
    ok = True

    for robust in (True, False):
        fn = lambda d, p, k, ik: aggregate_hidden_depth(
            d, p, k, ik, height=height, width=width, robust=robust)
        a = np.asarray(jax.jit(fn)(depths, poses, Ks, invKs))
        args_cpu = jax.device_put((depths, poses, Ks, invKs), cpu)
        b = np.asarray(jax.jit(lambda d, p, k, ik: fn(d, p, k, ik),
                               device=cpu)(*args_cpu))
        ok &= _compare_gt(
            f"gt hidden_depth {frames}x{height}x{width} robust={robust}",
            a, b)

    # depth mask: plane pixels (clear inliers, <1e-3 m off the fitted
    # plane) + object pixels at 0.7x plane depth (>=0.3 m off it) so the
    # RANSAC inlier sets — and therefore the integer argmax — are identical
    # across backends; remaining splat-boundary flips ride the count gate.
    rng = np.random.RandomState(1)
    ground_seg = np.where(plane_d > 0, 0.9, 0.1).astype(np.float32)
    objects = (rng.rand(height, width) < 0.15) & (plane_d > 0)
    ground_seg[objects] = 0.1
    dm_depth = np.where(objects, plane_d * 0.7, plane_d).astype(np.float32)
    key = jax.random.PRNGKey(10)
    dm_fn = lambda key, d, g, k, ik: compute_depth_mask(
        key, d, g, k, ik, height=height, width=width)
    a = np.asarray(jax.jit(dm_fn)(key, dm_depth, ground_seg, Ks[0], invKs[0]))
    args_cpu = jax.device_put((key, dm_depth, ground_seg, Ks[0], invKs[0]), cpu)
    b = np.asarray(jax.jit(lambda *t: dm_fn(*t), device=cpu)(*args_cpu))
    ok &= _compare_gt(f"gt depth_mask {height}x{width}", a, b)

    # moving objects: observed flow = (f64 host-computed induced flow) +
    # delta, |delta| in {1 px, 6 px} — every pixel is >=0.5 px from the
    # 3 px threshold, so any chip/CPU disagreement is a real backend bug.
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = (0.2, 0.02, 1.5)
    u, v = np.meshgrid(np.arange(width, dtype=np.float64),
                       np.arange(height, dtype=np.float64))
    K64, invK64 = Ks[0].astype(np.float64), invKs[0].astype(np.float64)
    pts = invK64[:3, :3] @ np.stack([u.ravel(), v.ravel(), np.ones(u.size)])
    world = pts * plane_d.astype(np.float64).ravel()
    wh = np.concatenate([world, np.ones((1, world.shape[1]))])
    cam = K64 @ (T.astype(np.float64) @ wh)
    z = cam[2] + 1e-7
    induced = np.stack([cam[0] / z - u.ravel(), cam[1] / z - v.ravel()])
    moving_sel = rng.rand(height, width) > 0.7
    delta_mag = np.where(moving_sel, 6.0, 1.0).ravel()
    theta = rng.rand(u.size) * 2 * np.pi
    flow = (induced + delta_mag * np.stack([np.cos(theta), np.sin(theta)])
            ).reshape(2, height, width).astype(np.float32)
    mo_fn = lambda d, t, k, ik, f: compute_moving_object_mask(
        d, t, k, ik, f, height=height, width=width)
    a = np.asarray(jax.jit(mo_fn)(plane_d, T, Ks[0], invKs[0], flow))
    args_cpu = jax.device_put((plane_d, T, Ks[0], invKs[0], flow), cpu)
    b = np.asarray(jax.jit(lambda *t: mo_fn(*t), device=cpu)(*args_cpu))
    ok &= _compare_gt(f"gt moving_objects {height}x{width}", a, b,
                      bitwise=True)

    if time_it:
        # on-chip ms/frame of the hidden-depth aggregation (fori_loop slope
        # — same methodology as bench.py; PERF.md quotes ~85 ms/frame)
        @jax.jit
        def chain(d, n):
            def body(_, c):
                r = aggregate_hidden_depth(c, poses, Ks, invKs,
                                           height=height, width=width,
                                           robust=True)
                return c * (1.0 + 1e-7 * jnp.mean(r))

            c = jax.lax.fori_loop(0, n, body, d)
            return jnp.sum(c[0, 0])

        def run(n):
            t0 = _time.perf_counter()
            np.asarray(chain(depths, jnp.int32(n)))
            return _time.perf_counter() - t0

        run(1)
        lo = run(2)
        hi = run(14)
        print(f"  aggregate_hidden_depth: {(hi - lo) / 12 * 1e3:.1f} "
              f"ms/frame on {jax.devices()[0].platform}")
    return ok


def check_compact(height=96, width=160):
    """Compact transport + separate-dispatch device decode vs raw f32,
    ON THE EXECUTING DEVICE, asserted BITWISE.

    Two legs:
      1. decode: decompact_on_device(compact) must equal the host f32
         batch bitwise for every key (the LUT gather is exhaustively
         checked per-code in check_ops; this checks the real batch
         pytree through the real put-path jit).
      2. train step: feeding the decoded batch to the real
         build_train_step executable must produce BITWISE identical
         params + loss to feeding the raw-f32 device batch — same
         compiled graph, identical inputs, so anything else is
         nondeterminism or an aliasing bug in the decode dispatch.

    (History: an earlier design traced the decode INTO the step; on v5e
    the changed fusion schedule moved params by 2e-4 after one Adam step
    even with bitwise-identical inputs.  The separate dispatch makes
    bitwise the correct expectation — see data/compact.py.)"""
    from footprints_tpu.data.compact import BatchCompactor, decompact_on_device
    from footprints_tpu.models.footprint import FootprintNetwork
    from footprints_tpu.train.step import (TrainStepConfig, build_train_step,
                                           init_train_state)

    rng = np.random.RandomState(3)
    u8 = rng.randint(0, 256, (2, height, width, 3)).astype(np.uint8)
    batch = {
        "image": u8.astype(np.float32) / np.float32(255.0),
        "visible_ground": rng.randint(0, 2, (2, height, width)).astype(np.float32),
        "all_ground": rng.randint(0, 2, (2, height, width)).astype(np.float32),
        "moving_object_mask": rng.randint(0, 2, (2, height, width)).astype(np.float32),
        "depth_mask": rng.randint(0, 2, (2, height, width)).astype(np.float32),
        "depth": (rng.rand(2, height, width) * 20).astype(np.float32),
        # f16-sourced like the matterport hidden_depth: locks the lossless
        # 'f16x' tier, so this check also covers its on-chip decode
        "ground_depth": (rng.rand(2, height, width) * 15).astype(np.float16)
        .astype(np.float32),
    }
    raw_dev = {k: jnp.asarray(v) for k, v in batch.items()}
    decoded = decompact_on_device(
        {k: jnp.asarray(v) for k, v in BatchCompactor("exact")(batch).items()})

    # on-device bitwise comparison: one bool scalar back over the tunnel
    @jax.jit
    def all_equal(a, b):
        eq = jax.tree.leaves(jax.tree.map(
            lambda x, y: jnp.all(x == y), a, b))
        return jnp.all(jnp.stack(eq))

    dec_ok = bool(np.asarray(all_equal(decoded, raw_dev)))
    print(f"  {'ok  ' if dec_ok else 'FAIL'} compact decode pytree "
          f"{height}x{width} ({'bitwise' if dec_ok else 'MISMATCH'})")

    net = FootprintNetwork()
    cfg = TrainStepConfig(steps_per_epoch=10, compute_dtype="bfloat16")
    state = init_train_state(net, jax.random.PRNGKey(0), cfg)
    step = build_train_step(net, cfg, mesh=None)

    s1, m1 = step(jax.tree.map(jnp.copy, state), raw_dev)
    s2, m2 = step(jax.tree.map(jnp.copy, state), decoded)
    step_ok = bool(np.asarray(all_equal((s1["params"], m1["loss"]),
                                        (s2["params"], m2["loss"]))))
    print(f"  {'ok  ' if step_ok else 'FAIL'} compact-fed train step "
          f"{height}x{width} ({'bitwise' if step_ok else 'MISMATCH'})")
    return dec_ok and step_ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", action="store_true", help="per-op checks only")
    ap.add_argument("--grads", action="store_true",
                    help="backward-pass (train gradient) checks only")
    ap.add_argument("--seg", action="store_true",
                    help="segmentation network checks only")
    ap.add_argument("--compact", action="store_true",
                    help="compact-batch vs raw-f32 train step, on-device")
    ap.add_argument("--gt", action="store_true",
                    help="GT-generation graphs (splat/RANSAC/flow) only")
    ap.add_argument("--resolutions", default="192x640",
                    help="comma list, e.g. 192x640,512x640,256x448")
    args = ap.parse_args()

    # persistent compilation cache: repeat parity runs skip the ~2-5 min
    # model/grad compiles (same knob as bench.py)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/fp_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    print(f"device under test: {dev} (reference: {cpu})")
    if dev.platform == "cpu":
        print("WARNING: default device is CPU — this run checks nothing.")

    ok = True
    if args.gt:
        ok &= check_gt(cpu)
    elif args.compact:
        ok &= check_compact()
    elif args.ops:
        ok &= check_ops(cpu)
    elif args.grads and args.seg:
        h, w = (int(v) for v in args.resolutions.split(",")[0].split("x"))
        ok &= check_seg_grads(cpu, h, w, compute_dtype=jnp.bfloat16,
                              precision="default")
        ok &= check_seg_grads(cpu, 96, 160)
    elif args.grads:
        h, w = (int(v) for v in args.resolutions.split(",")[0].split("x"))
        # primary: the production mixed-precision train graph (s2d-basis
        # '1/1' head + period-4 '1/2' head — the trainer's defaults under
        # bfloat16, r5)
        ok &= check_grads(cpu, h, w, compute_dtype=jnp.bfloat16,
                          precision="default", s2d_head=True, p4_head=True)
        # the standard-head mixed graph (s2d_head=off / bench headline path)
        ok &= check_grads(cpu, h, w, compute_dtype=jnp.bfloat16,
                          precision="default")
        # f32/highest only at a small shape (see the compile-cost note);
        # the heads leg is the bias-leaf exactness guard (see _grad_parity)
        ok &= check_grads(cpu, 96, 160)
        ok &= check_grads(cpu, 96, 160, s2d_head=True, p4_head=True)
        # seg backward (PSP pool / align_corners transposes), mixed graph
        ok &= check_seg_grads(cpu, h, w, compute_dtype=jnp.bfloat16,
                              precision="default")
    elif args.seg:
        h, w = (int(v) for v in args.resolutions.split(",")[0].split("x"))
        ok &= check_seg(h, w, jnp.float32, cpu)
        ok &= check_seg(h, w, jnp.bfloat16, cpu)
    else:
        for res in args.resolutions.split(","):
            h, w = (int(v) for v in res.split("x"))
            ok &= check_model(h, w, jnp.float32, cpu)
            ok &= check_model(h, w, jnp.bfloat16, cpu)
        # the seg net's unique paths (PSP pool + align_corners resize)
        # at the first resolution
        h, w = (int(v) for v in args.resolutions.split(",")[0].split("x"))
        ok &= check_seg(h, w, jnp.float32, cpu)
        ok &= check_seg(h, w, jnp.bfloat16, cpu)
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
