"""Capture + summarize a device trace of the train step on the real chip.

Usage:
  python tools/trace_train.py capture [batch] [outdir]   # run 5 steps under
                                                         # jax.profiler.trace
  python tools/trace_train.py capture-seg [batch] [outdir]  # ground-seg step
  python tools/trace_train.py report [outdir] [--top N] [--cat CATEGORY]

`capture` traces the production mixed-precision config (s2d '1/1' + p4
'1/2' heads with put-path packed targets, r5).

The report groups device-stream events by their `hlo_category` (as the
XLA:TPU backend labels them: "convolution fusion", "loop fusion", "data
formatting", ...) over the LAST full step window, prints ms/step per
category, and lists the top individual ops (with occurrence counts) so a
bucket like "data formatting" can be attributed to concrete HLO ops.
PERF.md's trace tables came from this method.

CAVEAT (learned r4): the traced step is the Python-dispatched jitted step
WITH its metrics dict returned, while bench.py/ablate_train.py time a
fori_loop chain whose body discards metrics — XLA dead-code-eliminates
the loss-metric computation there.  Absolute ms/step from this tool
therefore OVERSTATES the benched step (observed ~65 traced vs ~63.5
slope-measured, and up to +14 ms when a change regresses mainly the
metric-adjacent fusions).  Use traces for A/B deltas and per-op
attribution; use the slope bench for the headline number.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 192, 640


def capture(batch: int, outdir: str) -> None:
    import jax
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/fp_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from tools.ablate_train import make_batch
    from footprints_tpu.models import FootprintNetwork
    from footprints_tpu.nn import layers
    from footprints_tpu.train import TrainStepConfig, init_train_state
    from footprints_tpu.train.step import build_train_step

    layers.set_default_precision("default")
    net = FootprintNetwork(depth=34)
    b = make_batch(batch)
    # the production mixed-precision config: s2d '1/1' + p4 '1/2' heads
    # with put-path packed targets (r5; same wiring as bench.bench_train)
    from footprints_tpu.data.compact import decompact_on_device
    tk = tuple(k for k in b if k != "image")
    b = decompact_on_device(b, None, tk, tk)
    cfg = TrainStepConfig(steps_per_epoch=1000, compute_dtype="bfloat16",
                          s2d_head=True, p4_head=True)
    ts = init_train_state(net, jax.random.PRNGKey(0), cfg)
    step = jax.jit(build_train_step(net, cfg, mesh=False), donate_argnums=(0,))

    ts, m = step(ts, b)  # compile outside the trace
    _ = np.asarray(m["loss"])

    with jax.profiler.trace(outdir):
        for _ in range(5):
            ts, m = step(ts, b)
        _ = np.asarray(m["loss"])
    print(f"trace written under {outdir}")


def capture_seg(batch: int, outdir: str) -> None:
    """Same 5-step trace for the ground-seg train step (bench.py's
    bench_seg_train graph — the production seg trainer's mixed step)."""
    import jax
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/fp_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp
    import optax

    from footprints_tpu.models import Segmentor
    from footprints_tpu.nn import layers
    from footprints_tpu.preprocessing.segmentation.losses import (
        compute_seg_losses)

    layers.set_default_precision("default")
    net = Segmentor(depth=34, use_psp=True)
    params, state = net.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-4)
    ts = {"params": params, "state": state,
          "opt_state": optimizer.init(params)}

    rng = np.random.RandomState(0)
    b = {
        "image": jnp.asarray(rng.rand(batch, H, W, 3), jnp.float32),
        "ground_mask": jnp.asarray(rng.rand(batch, H, W) > 0.5, jnp.float32),
        "labelled_pix": jnp.asarray(rng.rand(batch, H, W) > 0.1, jnp.float32),
    }

    def loss_fn(params, state, batch):
        fwd_params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a is not None else None,
            params)
        outputs, new_state = net.apply(fwd_params, state,
                                       batch["image"].astype(jnp.bfloat16),
                                       train=True)
        losses = compute_seg_losses(outputs, batch["ground_mask"],
                                    batch["labelled_pix"])
        return losses["loss"], new_state

    @jax.jit
    def step(ts, batch):
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts["params"], ts["state"], batch)
        updates, new_opt = optimizer.update(grads, ts["opt_state"],
                                            ts["params"])
        return {"params": optax.apply_updates(ts["params"], updates),
                "state": new_state, "opt_state": new_opt}, loss

    ts, loss = step(ts, b)  # compile outside the trace
    _ = np.asarray(loss)

    with jax.profiler.trace(outdir):
        for _ in range(5):
            ts, loss = step(ts, b)
        _ = np.asarray(loss)
    print(f"seg trace written under {outdir}")


def load_events(outdir: str):
    paths = sorted(glob.glob(
        os.path.join(outdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {outdir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def report(outdir: str, top: int, cat_filter: str | None) -> None:
    events = load_events(outdir)
    # device-stream complete events with XLA op metadata
    ops = [e for e in events
           if e.get("ph") == "X" and isinstance(e.get("args"), dict)
           and ("hlo_category" in e["args"])]
    if not ops:
        raise SystemExit("no hlo_category events found (CPU-only trace?)")

    by_cat = defaultdict(float)
    by_op = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in ops:
        dur = e.get("dur", 0) / 1e3  # us -> ms
        cat = e["args"].get("hlo_category", "?")
        by_cat[cat] += dur
        total += dur
        if cat_filter is None or cat_filter in cat:
            name = e.get("name", "?")
            by_op[(cat, name)][0] += dur
            by_op[(cat, name)][1] += 1

    nsteps = 5
    print(f"total device op time: {total:.2f} ms over {nsteps} steps "
          f"({total / nsteps:.2f} ms/step)\n")
    print(f"{'category':<28}{'ms/step':>9}")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:<28}{ms / nsteps:>9.3f}")

    print(f"\ntop {top} ops" + (f" in '{cat_filter}'" if cat_filter else "") + ":")
    rows = sorted(by_op.items(), key=lambda kv: -kv[1][0])[:top]
    for (cat, name), (ms, n) in rows:
        print(f"  {ms / nsteps:7.3f} ms/step  x{n:<4} [{cat}] {name}")


def main():
    mode = sys.argv[1]
    rest = [a for a in sys.argv[2:] if not a.startswith("--")]
    if mode == "capture":
        batch = int(rest[0]) if rest else 12
        outdir = rest[1] if len(rest) > 1 else "/tmp/fp_trace"
        capture(batch, outdir)
    elif mode == "capture-seg":
        batch = int(rest[0]) if rest else 12
        outdir = rest[1] if len(rest) > 1 else "/tmp/fp_trace_seg"
        capture_seg(batch, outdir)
    elif mode == "report":
        outdir = rest[0] if rest else "/tmp/fp_trace"
        top = 25
        cat = None
        argv = sys.argv[2:]
        for i, a in enumerate(argv):
            if a == "--top":
                top = int(argv[i + 1])
            if a == "--cat":
                cat = argv[i + 1]
        report(outdir, top, cat)
    else:
        raise SystemExit(__doc__)


if __name__ == "__main__":
    main()
