"""Measure the batch-inference dump rate (imgs/s), serial vs overlapped.

The production ground_seg dump (seg Tester over KITTI train+val, ~95k
images — reference preprocessing/segmentation/inference.py:57-71) and the
test-split prediction dump (eval/inference.py, reference
evaluation/inference.py:82-96) were forward->fetch->save serialized until
r5; their run loops now dispatch batch n+1 before fetching batch n and
queue per-image np.saves on a writer thread (data/loader.py:
BackgroundWriter).  This tool A/Bs the REAL run loops (overlap=False vs
True) over a synthetic in-memory dataset writing real npy files, so the
measured delta is the loop structure, not dataset disk reads.

Run on the real chip:  python tools/bench_dump.py [n_images] [batch]
Prints one JSON line with imgs/s for each (pipeline, mode).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np

H, W = 192, 640


class _SynthDataset:
    """Minimal inference-dataset stand-in: precomputed f32 images (8
    distinct, cycled) + an npy-writing save_result."""

    def __init__(self, n, h, w):
        rng = np.random.RandomState(0)
        self.images = rng.rand(8, h, w, 3).astype(np.float32)
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"image": self.images[i % 8], "idx": i}

    def save_result(self, idx, pred, savepath, viz=None):
        os.makedirs(savepath, exist_ok=True)
        np.save(os.path.join(savepath, f"{int(idx):06d}.npy"),
                np.asarray(pred))


class _Opt:
    batch_size = 16
    save_test_visualisations = False


def build_tester(n, batch, save_path):
    import jax

    from footprints_tpu.data.loader import DataLoader
    from footprints_tpu.models import Segmentor
    from footprints_tpu.preprocessing.segmentation.inference import Tester

    t = Tester.__new__(Tester)
    t.opt = _Opt()
    t.opt.batch_size = batch
    t.net = Segmentor(depth=34, use_psp=True)
    t.params, t.state = t.net.init(jax.random.PRNGKey(0))
    t.dataset = _SynthDataset(n, H, W)
    t.loader = DataLoader(t.dataset, batch, shuffle=False, drop_last=False,
                          num_workers=2)
    t.save_path = save_path
    t._forward = t._build_forward()
    return t


def build_eval_manager(n, batch, save_path):
    import jax

    from footprints_tpu.data.loader import DataLoader
    from footprints_tpu.eval.inference import InferenceManager
    from footprints_tpu.model_manager import ModelManager

    m = InferenceManager.__new__(InferenceManager)
    m.opt = _Opt()
    m.opt.batch_size = batch
    m.model_manager = ModelManager(is_inference=True)  # random init is fine
    m.dataset = _SynthDataset(n, H, W)
    m.loader = DataLoader(m.dataset, batch, shuffle=False, drop_last=False,
                          num_workers=2)
    m.savepath = save_path
    m._forward = m._build_forward()
    return m


def timed(fn, n_images):
    fn()  # warm: compile + cache
    t0 = time.perf_counter()
    fn()
    return n_images / (time.perf_counter() - t0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/fp_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    out = {"n_images": n, "batch": batch}
    root = tempfile.mkdtemp(prefix="fp_dump_bench_")
    try:
        tester = build_tester(n, batch, os.path.join(root, "seg"))
        out["seg_dump_serial_imgs_per_sec"] = round(
            timed(lambda: tester.test(overlap=False), n), 2)
        out["seg_dump_overlap_imgs_per_sec"] = round(
            timed(lambda: tester.test(overlap=True), n), 2)

        mgr = build_eval_manager(n, batch, os.path.join(root, "eval"))
        out["eval_dump_serial_imgs_per_sec"] = round(
            timed(lambda: mgr.run(overlap=False), n), 2)
        out["eval_dump_overlap_imgs_per_sec"] = round(
            timed(lambda: mgr.run(overlap=True), n), 2)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
