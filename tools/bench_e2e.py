"""Steady-state END-TO-END training throughput: real DataLoader ->
DevicePrefetcher -> compiled train step (VERDICT r3 item 4; SURVEY §7 hard
part #6).

bench.py's train number times the compiled step alone on a device-resident
batch; tools/bench_loader.py times the host pipeline alone.  This tool runs
the actual production composition (`train/trainer.py:186-203`): the threaded
DataLoader over a synthetic KITTI tree (realistic on-disk sizes, same tree
builder as bench_loader), `DevicePrefetcher(depth=2)` issuing `shard_batch`
host->HBM copies, and the jitted mixed-precision train step consuming them —
for >=100 steps after warmup.

It also measures, in the SAME run on the SAME tree:
  * `put_imgs_per_s`  — the host->device transfer leg alone (DataLoader +
    shard_batch, no step), probe-synced;
  * `loader_imgs_per_s` — the host pipeline alone (no device at all);
so the steady-state number can be attributed to min(loader, H2D, step)
rather than guessed.

Caveat that must ride every number from THIS box: the TPU is behind the
axon tunnel, where host->device moves at ~20-25 MB/s (measured below as
`h2d_mb_per_s`) — a ~57 MB batch costs ~2.5 s, so e2e here is
tunnel-transfer-bound, NOT host-decode-bound and NOT step-bound.  On a real
TPU-VM (PCIe/DMA, GB/s) the transfer leg vanishes and the binding stage is
min(loader-rate x cores-scaling, step).  Record the measured numbers and
that attribution in PERF.md; do not extrapolate them to production hosts.

Usage:
  python tools/bench_e2e.py                 # real chip, batch 12, 100 steps
  python tools/bench_e2e.py --platform cpu --batch 4 --steps 12 --n 48
      # CPU-backend overlap check: step is the slow stage there, so
      # steady-state e2e ~= step-only rate proves the loader+puts hide.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_loader import make_tree, MAP_H, MAP_W  # noqa: E402


def batch_nbytes(batch):
    return sum(np.asarray(v).nbytes for v in batch.values())


def cycle(loader):
    while True:
        yield from loader


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96, help="tree size (images)")
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--steps", type=int, default=100,
                    help="timed steps after warmup")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--height", type=int, default=MAP_H)
    ap.add_argument("--width", type=int, default=MAP_W)
    ap.add_argument("--platform", choices=["default", "cpu"],
                    default="default")
    ap.add_argument("--compact", choices=["none", "exact", "f16"],
                    default="exact",
                    help="host->device batch encoding (data/compact.py); "
                         "mirrors the trainer's --host_batch_compact")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/fp_jax_cache")
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    root = tempfile.mkdtemp(prefix="fp_e2e_")
    print(f"building synthetic KITTI tree ({args.n} frames)...", flush=True)
    raw, td, lines = make_tree(root, args.n)

    import jax.numpy as jnp

    from footprints_tpu.data.kitti import KITTIDataset
    from footprints_tpu.data.loader import DataLoader, DevicePrefetcher
    from footprints_tpu.models import FootprintNetwork
    from footprints_tpu.nn import layers
    from footprints_tpu.parallel import make_mesh, replicate_tree, shard_batch
    from footprints_tpu.train import TrainStepConfig, init_train_state
    from footprints_tpu.train.step import build_train_step

    results = {"batch": args.batch, "steps": args.steps,
               "workers": args.workers, "platform": str(dev.platform)}

    ds = KITTIDataset(raw, td, lines, is_train=True, seed=10,
                      height=args.height, width=args.width,
                      no_depth_mask=False, moving_objects_method="ours",
                      project_down_baseline=False)

    def fresh_loader():
        return DataLoader(ds, args.batch, shuffle=True,
                          num_workers=args.workers, seed=0)

    # -- the exact trainer composition ------------------------------------
    layers.set_default_precision("default")
    net = FootprintNetwork(depth=34)
    mesh = make_mesh()
    cfg = TrainStepConfig(steps_per_epoch=1000, compute_dtype="bfloat16")
    train_state = replicate_tree(
        mesh, init_train_state(net, jax.random.PRNGKey(0), cfg))
    step = build_train_step(net, cfg, mesh=mesh)
    from footprints_tpu.data.compact import BatchCompactor, decompact_on_device
    compactor = BatchCompactor(args.compact)
    results["compact"] = args.compact
    # mirrors trainer._put: compact wire transport + separate-dispatch decode
    put = lambda b: decompact_on_device(  # noqa: E731
        shard_batch(mesh, compactor(b)))

    # one host batch for bookkeeping + warmup
    first = next(iter(fresh_loader()))
    nbytes = batch_nbytes(first)
    wire_bytes = batch_nbytes(compactor(first))
    results["batch_mb"] = round(nbytes / 2**20, 1)
    results["wire_mb"] = round(wire_bytes / 2**20, 1)
    print(f"host batch: {nbytes / 2**20:.1f} MB f32, "
          f"{wire_bytes / 2**20:.1f} MB on the wire ({args.compact}; "
          f"{ {k: str(np.asarray(v).dtype) for k, v in compactor(first).items()} })",
          flush=True)

    # measure raw H2D bandwidth with the real batch (slope: the probe makes
    # the transfer observable; block_until_ready does not sync the tunnel)
    @jax.jit
    def probe_sum(b):
        return sum(jnp.float32(jnp.asarray(v).ravel()[0]) for v in b.values())

    float(probe_sum(put(first)))  # compile + first transfer
    t0 = time.perf_counter()
    float(probe_sum(put(first)))
    dt = time.perf_counter() - t0
    results["h2d_mb_per_s"] = round(wire_bytes / 2**20 / dt, 1)
    print(f"h2d: {wire_bytes / 2**20 / dt:.1f} wire-MB/s "
          f"({dt:.2f} s/batch incl. dispatch)", flush=True)

    # -- leg 1: loader only ------------------------------------------------
    it = cycle(fresh_loader())
    next(it)
    t0 = time.perf_counter()
    n_loader = max(args.steps // 2, 8)
    for _ in range(n_loader):
        next(it)
    dt = time.perf_counter() - t0
    results["loader_imgs_per_s"] = round(n_loader * args.batch / dt, 1)
    print(f"loader only: {results['loader_imgs_per_s']} imgs/s", flush=True)

    # -- leg 2: loader + puts (no step) ------------------------------------
    acc = jnp.zeros((), jnp.float32)
    it = DevicePrefetcher(cycle(fresh_loader()), put, depth=2).__iter__()
    acc += probe_sum(next(it))
    t0 = time.perf_counter()
    n_put = max(args.steps // 2, 8)
    for _ in range(n_put):
        acc += probe_sum(next(it))
    float(acc)  # sync: depends on every transferred batch
    dt = time.perf_counter() - t0
    results["put_imgs_per_s"] = round(n_put * args.batch / dt, 1)
    print(f"loader+puts: {results['put_imgs_per_s']} imgs/s", flush=True)

    # -- leg 3: full e2e (trainer composition) ------------------------------
    # warmup: compile the step + fill the prefetch pipeline
    it = DevicePrefetcher(cycle(fresh_loader()), put, depth=2).__iter__()
    for _ in range(3):
        train_state, metrics = step(train_state, next(it))
    float(np.asarray(metrics["loss"]))  # sync warmup
    t0 = time.perf_counter()
    for i in range(args.steps):
        train_state, metrics = step(train_state, next(it))
    # the loss probe depends on the final step (and transitively on every
    # batch consumed), so fetching it bounds the whole pipeline
    loss = float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    results["e2e_imgs_per_s"] = round(args.steps * args.batch / dt, 1)
    results["e2e_ms_per_step"] = round(dt / args.steps * 1e3, 1)
    results["final_loss"] = round(loss, 4)
    print(f"e2e ({args.steps} steps): {results['e2e_imgs_per_s']} imgs/s "
          f"({results['e2e_ms_per_step']} ms/step), loss {loss:.4f}",
          flush=True)

    feed = min(("loader", results["loader_imgs_per_s"]),
               ("h2d", results["put_imgs_per_s"]),
               key=lambda kv: kv[1])
    # if e2e lands well below the measured feed rate, the consumer (compiled
    # step + per-step dispatch) is the binding stage, not the feed
    results["binding_stage_hint"] = (
        feed[0] if results["e2e_imgs_per_s"] >= 0.7 * feed[1]
        else "step_or_dispatch")
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
