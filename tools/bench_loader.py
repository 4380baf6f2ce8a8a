"""Host input-pipeline throughput benchmark (SURVEY §7 hard part #6).

Builds a synthetic KITTI tree at REALISTIC on-disk sizes (raw jpg at
375x1242 like KITTI raw; precomputed maps at the 192x640 the seg/GT
pipelines emit as float16; PSMNet stereo disparities at full res), then
measures:

  1. single-thread ``dataset[i]`` samples/s (the per-core decode+resize+
     augment cost — the number that scales with host cores);
  2. ``DataLoader`` end-to-end imgs/s at batch 12 for several worker
     counts (on this 1-core CI box the thread pool cannot exceed the
     single-core rate; on a real TPU-VM host it multiplies by cores);
  3. the same with FOOTPRINTS_NATIVE_RESIZE=1 (the C++ Lanczos resampler).

Prints one JSON line; record the numbers in PERF.md next to the train-step
ceiling so the host-vs-chip balance is documented, not guessed.

Usage:  python tools/bench_loader.py [--n 96] [--train]
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

RAW_H, RAW_W = 375, 1242      # KITTI raw camera frames
MAP_H, MAP_W = 192, 640       # seg / GT pipeline output resolution


def make_tree(root, n):
    from PIL import Image

    raw = os.path.join(root, "raw")
    td = os.path.join(root, "training_data")
    rng = np.random.RandomState(0)
    lines = []
    seq, cam = "2011_09_26/2011_09_26_drive_0001_sync", "image_02"
    os.makedirs(os.path.join(raw, seq, cam, "data"), exist_ok=True)
    img = rng.randint(0, 255, (RAW_H, RAW_W, 3), dtype=np.uint8)
    for i in range(n):
        f = str(i).zfill(10)
        lines.append(f"{seq} {i} l")
        Image.fromarray(img).save(
            os.path.join(raw, seq, cam, "data", f"{f}.jpg"), quality=92)
        for sub, arr in [
            ("ground_seg", rng.rand(MAP_H, MAP_W).astype(np.float16)),
            ("hidden_depths", (rng.rand(MAP_H, MAP_W) * 20).astype(np.float16)),
            ("depth_masks", (rng.rand(MAP_H, MAP_W) > 0.9).astype(np.float16)),
            ("moving_objects", np.zeros((MAP_H, MAP_W), np.float16)),
        ]:
            d = os.path.join(td, sub, seq, cam, "data")
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, f"{f}.npy"), arr)
        d = os.path.join(td, "stereo_matching_disps", seq, cam)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, f"{f}.npy"),
                (rng.rand(RAW_H, RAW_W) * 50 + 5).astype(np.float16))
    return raw, td, lines


def bench_dataset(ds, n, label, results):
    # warm the page cache + any lazy init
    ds[0]
    t0 = time.perf_counter()
    for i in range(n):
        ds[i % len(ds)]
    dt = time.perf_counter() - t0
    results[label] = round(n / dt, 2)
    print(f"  {label}: {n / dt:.1f} samples/s ({dt / n * 1e3:.1f} ms/sample)")


def bench_loader(ds, batch, workers, n_batches, label, results):
    from footprints_tpu.data.loader import DataLoader

    dl = DataLoader(ds, batch, shuffle=True, num_workers=workers, seed=0)
    it = iter(dl)
    next(it)  # warmup batch
    t0 = time.perf_counter()
    got = 1
    for b in it:
        got += 1
        if got >= n_batches:
            break
    dt = time.perf_counter() - t0
    imgs = (got - 1) * batch
    results[label] = round(imgs / dt, 2)
    print(f"  {label}: {imgs / dt:.1f} imgs/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96, help="tree size (images)")
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="fp_loader_bench_")
    print(f"building synthetic KITTI tree ({args.n} frames, raw "
          f"{RAW_H}x{RAW_W})... ", flush=True)
    raw, td, lines = make_tree(root, args.n)

    from footprints_tpu.data.kitti import KITTIDataset

    results = {"n": args.n, "host_cores": os.cpu_count()}
    common = dict(height=MAP_H, width=MAP_W, no_depth_mask=False,
                  moving_objects_method="ours", project_down_baseline=False)

    ds_train = KITTIDataset(raw, td, lines, is_train=True, seed=10, **common)
    ds_eval = KITTIDataset(raw, td, lines, is_train=False, seed=10, **common)

    # Pin the resize mode per leg regardless of the caller's environment:
    # baseline legs measure PIL, the native leg measures the native
    # resampler, and the caller's value is restored afterwards.
    orig_native = os.environ.get("FOOTPRINTS_NATIVE_RESIZE")
    os.environ["FOOTPRINTS_NATIVE_RESIZE"] = "0"
    try:
        print("single-thread __getitem__:")
        bench_dataset(ds_eval, min(args.n, 48), "eval_samples_per_s", results)
        bench_dataset(ds_train, min(args.n, 48), "train_samples_per_s",
                      results)

        os.environ["FOOTPRINTS_NATIVE_RESIZE"] = "1"
        try:
            bench_dataset(ds_train, min(args.n, 48),
                          "train_samples_per_s_native_resize", results)
        except Exception as e:  # native lib may not build everywhere
            print(f"  native resize path unavailable: {e}")
        os.environ["FOOTPRINTS_NATIVE_RESIZE"] = "0"
    finally:
        if orig_native is None:
            del os.environ["FOOTPRINTS_NATIVE_RESIZE"]
        else:
            os.environ["FOOTPRINTS_NATIVE_RESIZE"] = orig_native

    print(f"DataLoader batch {args.batch}:")
    for workers in (1, 4, 8):
        bench_loader(ds_train, args.batch, workers,
                     max(4, args.n // args.batch),
                     f"loader_imgs_per_s_w{workers}", results)

    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
