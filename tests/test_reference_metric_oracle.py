"""Metric parity tests whose ground truth is the REFERENCE'S OWN executed code.

tests/test_cli_end_to_end.py pins the metric harness against hand-computed
cases; a shared misreading of the reference's metric definitions would pass
those.  Here we import ``/root/reference/footprints/evaluation/
evaluate_model.py`` ITSELF (pure numpy — only its ``..utils`` relative
import and the unused-at-metric-time skimage hull need stubbing) and
property-test against it:

  * ``evaluate_mask`` / ``evaluate_depth`` on randomized + edge-case inputs
    (exact equality, NaN-aware);
  * the FULL drivers, reference ``evaluate()`` vs ours, over synthesized
    on-disk KITTI (all 697 indices — the reference hardcodes the count,
    reference evaluate_model.py:136) and Matterport trees.  Both sides'
    metric functions are wrapped with recorders, so we assert the
    *post-load, post-slice arrays fed to the metrics* are bitwise
    identical call-by-call — this covers the riskiest compound path,
    footprint metrics on inverted masks inside the free-space region
    (reference evaluate_model.py:164-171), plus channel extraction,
    ``sigmoid_to_depth`` on HIDDEN_DEPTH, the npy/png prediction fallback,
    and nanmean aggregation.
  * the cv2 ``convex_hull_image`` swap (ours) against an independent
    scipy-qhull geometric oracle.  skimage itself is not installed on this
    box; skimage's ``convex_hull_image(offset_coordinates=True)`` dilates
    the exact hull of pixel centers by at most half a pixel, so the oracle
    asserts exact agreement outside a 0.5 px boundary band and containment
    invariants everywhere — the equivalence class within which the cv2 and
    skimage rasterizations coincide.

The reference tree is read-only PUBLIC content; it is imported and executed
as a numeric oracle only.
"""

import importlib.util
import os
import sys
import types

import cv2
import numpy as np
import pytest

from footprints_tpu.core.ops import np_sigmoid_to_depth
from footprints_tpu.eval import evaluate_model as mine

REF = "/root/reference/footprints"


def _import_reference_eval():
    """Import the reference's evaluation/evaluate_model.py as a package
    member so its ``from ..utils import ...`` resolves.  skimage (not
    installed here) is stubbed with a hull that *raises*: the metric code
    under test never calls it, and the stub keeps that claim honest."""
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skm = types.ModuleType("skimage.morphology")

        def _no_hull(im):  # pragma: no cover - must never run
            raise AssertionError("metric path must not call convex_hull_image")

        skm.convex_hull_image = _no_hull
        sk.morphology = skm
        sys.modules["skimage"] = sk
        sys.modules["skimage.morphology"] = skm

    pkg = types.ModuleType("reffp")
    pkg.__path__ = [REF]
    sys.modules["reffp"] = pkg
    for name, path in [
        ("reffp.utils", f"{REF}/utils.py"),
        ("reffp.evaluation", f"{REF}/evaluation/__init__.py"),
        ("reffp.evaluation.evaluate_model", f"{REF}/evaluation/evaluate_model.py"),
    ]:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return sys.modules["reffp.evaluation.evaluate_model"]


@pytest.fixture(scope="module")
def ref_eval():
    return _import_reference_eval()


def _assert_scores_equal(a, b, ctx=""):
    assert set(a) == set(b), ctx
    for k in a:
        x, y = float(a[k]), float(b[k])
        assert (np.isnan(x) and np.isnan(y)) or x == y, f"{ctx} {k}: {x} != {y}"


# ---------------------------------------------------------------- functions


def _random_mask_pair(rng):
    h, w = rng.randint(3, 40), rng.randint(3, 40)
    kind = rng.randint(5)
    if kind == 0:  # empty gt -> NaN path
        true = np.zeros((h, w), np.float32)
    elif kind == 1:  # binary-ish gt with values straddling the 0.1 threshold
        true = rng.choice([0.0, 0.05, 0.2, 1.0], size=(h, w)).astype(np.float32)
    else:
        true = rng.rand(h, w).astype(np.float32)
    if kind == 2:  # empty prediction
        pred = np.zeros((h, w), np.float32)
    elif kind == 3:  # everything predicted
        pred = np.ones((h, w), np.float32)
    else:
        pred = rng.rand(h, w).astype(np.float32)
    return true, pred


def test_evaluate_mask_matches_reference(ref_eval):
    rng = np.random.RandomState(0)
    for trial in range(200):
        true, pred = _random_mask_pair(rng)
        _assert_scores_equal(mine.evaluate_mask(true, pred),
                             ref_eval.evaluate_mask(true, pred),
                             f"trial {trial}")


def test_evaluate_mask_inverted_freespace_compound(ref_eval):
    """The footprint-metric compound exactly as the driver composes it
    (reference evaluate_model.py:170): inverted masks restricted to the
    free-space region — including empty free space and bool preds (the
    KITTI baseline-png fallback feeds bools)."""
    rng = np.random.RandomState(1)
    for trial in range(100):
        h, w = rng.randint(3, 30), rng.randint(3, 30)
        gt = (rng.rand(h, w) > 0.5)
        fs = (rng.rand(h, w) > (0.9 if trial % 7 == 0 else 0.4))
        if trial % 11 == 0:
            fs[:] = False  # empty region -> empty arrays -> NaN path
        pred = rng.rand(h, w).astype(np.float32) if trial % 2 else (rng.rand(h, w) > 0.5)
        _assert_scores_equal(
            mine.evaluate_mask(1 - gt[fs], 1 - pred[fs]),
            ref_eval.evaluate_mask(1 - gt[fs], 1 - pred[fs]),
            f"trial {trial}")


def test_evaluate_depth_matches_reference(ref_eval):
    rng = np.random.RandomState(2)
    for trial in range(200):
        n = rng.randint(0, 200)  # includes the empty-gt NaN path
        gt = (rng.rand(n) * 30).astype(np.float32)  # spans the 0.5/20 clips
        pred = (rng.rand(n) * 30).astype(np.float32)
        _assert_scores_equal(mine.evaluate_depth(gt, pred),
                             ref_eval.evaluate_depth(gt, pred),
                             f"trial {trial}")


def test_sigmoid_to_depth_matches_reference(ref_eval):
    rng = np.random.RandomState(3)
    disp = rng.rand(17, 23).astype(np.float32)
    np.testing.assert_array_equal(np_sigmoid_to_depth(disp),
                                  ref_eval.sigmoid_to_depth(disp))


# ------------------------------------------------------------------ drivers


def _record(module, names, log):
    """Wrap module.<name> to record (copied args, result) while delegating."""
    originals = {}
    for name in names:
        fn = getattr(module, name)
        originals[name] = fn

        def wrapped(*args, _fn=fn, _name=name):
            out = _fn(*args)
            log.append((_name, [np.asarray(a).copy() for a in args], out))
            return out

        setattr(module, name, wrapped)
    return originals


def _restore(module, originals):
    for name, fn in originals.items():
        setattr(module, name, fn)


def _compare_logs(ref_log, my_log):
    assert len(ref_log) == len(my_log) > 0
    for i, ((rn, ra, rs), (mn, ma, ms)) in enumerate(zip(ref_log, my_log)):
        assert rn == mn, f"call {i}: {rn} vs {mn}"
        assert len(ra) == len(ma), f"call {i}"
        for j, (x, y) in enumerate(zip(ra, ma)):
            assert x.dtype == y.dtype, f"call {i} arg {j}: {x.dtype} vs {y.dtype}"
            assert x.shape == y.shape, f"call {i} arg {j}: {x.shape} vs {y.shape}"
            np.testing.assert_array_equal(x, y, err_msg=f"call {i} arg {j}")
        _assert_scores_equal(rs, ms, f"call {i} result")


H, W = 24, 48


def _write_mask_png(path, rng, empty=False):
    m = np.zeros((H, W), np.uint8) if empty else \
        (rng.rand(H, W) > 0.5).astype(np.uint8) * 255
    assert cv2.imwrite(str(path), m)
    return m


def _make_kitti_tree(root, rng):
    """697 gt png pairs (the reference hardcodes the count) + mixed
    npy/png-fallback predictions."""
    gt_dir = root / "ground_truth_files" / "kitti_ground_truth" / "kitti_ground_truth"
    pred_dir = root / "preds"
    gt_dir.mkdir(parents=True)
    pred_dir.mkdir()
    for idx in range(697):
        _write_mask_png(gt_dir / f"{idx:05d}_combined.png", rng,
                        empty=(idx % 97 == 0))  # exercise the NaN/nanmean path
        _write_mask_png(gt_dir / f"{idx:05d}_ground.png", rng,
                        empty=(idx % 131 == 0))  # empty free space
        if idx % 3 == 0:  # baseline-style png fallback (bool pred path)
            _write_mask_png(pred_dir / f"{idx:d}_ground_mask.png", rng)
        else:  # 4xHxW channels-first network prediction
            np.save(pred_dir / f"{idx:03d}.npy",
                    rng.rand(4, H, W).astype(np.float32))
    return str(root / "ground_truth_files"), str(pred_dir)


def _run_reference(ref_eval, monkeypatch, gt_root, pred_dir, datatype, metric,
                   log):
    monkeypatch.setattr(ref_eval, "GROUND_TRUTH_DIR", gt_root)
    monkeypatch.setattr(ref_eval, "download_ground_truths_if_dont_exist",
                        lambda *a, **k: None)
    originals = _record(ref_eval, ["evaluate_mask", "evaluate_depth"], log)
    try:
        ref_eval.evaluate(pred_dir, datatype, metric)
    finally:
        _restore(ref_eval, originals)


def _run_mine(gt_root, pred_dir, datatype, metric, log, **kw):
    sub = {"kitti": "kitti_ground_truth", "matterport": "matterport_ground_truth"}[datatype]
    originals = _record(mine, ["evaluate_mask", "evaluate_depth"], log)
    try:
        return mine.evaluate(pred_dir, datatype, metric, download=False,
                             verbose=False,
                             gt_dir=os.path.join(gt_root, sub, sub), **kw)
    finally:
        _restore(mine, originals)


def _assert_printed_aggregates_match(captured, results, fmt_keys):
    printed = [line.split()[-1] for line in captured.strip().splitlines()
               if line.strip()]
    expected = [f"{results[k]:0.3f}" for k in fmt_keys]
    assert printed == expected, (printed, expected)


def test_kitti_iou_driver_matches_reference(ref_eval, tmp_path, monkeypatch,
                                            capsys):
    gt_root, pred_dir = _make_kitti_tree(tmp_path, np.random.RandomState(4))
    ref_log, my_log = [], []
    _run_reference(ref_eval, monkeypatch, gt_root, pred_dir, "kitti", "iou",
                   ref_log)
    captured = capsys.readouterr().out
    results = _run_mine(gt_root, pred_dir, "kitti", "iou", my_log, n_kitti=697)
    _compare_logs(ref_log, my_log)
    assert len(ref_log) == 2 * 697  # freespace + footprint per image
    _assert_printed_aggregates_match(
        captured, results,
        ["freespace_iou", "freespace_f1", "footprint_iou", "footprint_f1"])


def _make_matterport_tree(root, rng, n=6):
    gt_dir = (root / "ground_truth_files" / "matterport_ground_truth"
              / "matterport_ground_truth")
    pred_dir = root / "preds"
    splits = root / "splits" / "matterport"
    gt_dir.mkdir(parents=True)
    pred_dir.mkdir()
    splits.mkdir(parents=True)
    lines = []
    for i in range(n):
        name = (f"scan{i}", f"pos{i}", str(i), str(i * 2))
        lines.append(" ".join(name))
        depth = (rng.rand(H, W) * 25).astype(np.float32)
        depth[rng.rand(H, W) > 0.7] = 0.0  # invalid pixels (mask = gt > 0)
        if i == n - 1:
            depth[:] = 0.0  # no hidden ground anywhere -> NaN path
        np.save(gt_dir / ("_".join(name) + "_groundtruth.npy"), depth)
        np.save(gt_dir / ("_".join(name) + "_freespace.npy"),
                rng.rand(H, W).astype(np.float32))
        (pred_dir / name[0]).mkdir(exist_ok=True)
        np.save(pred_dir / name[0] / ("_".join(name[1:]) + ".npy"),
                rng.rand(4, H, W).astype(np.float32))
    (splits / "test.txt").write_text("\n".join(lines) + "\n")
    return str(root / "ground_truth_files"), str(pred_dir)


@pytest.mark.parametrize("metric,keys", [
    ("iou", ["freespace_iou", "freespace_f1", "footprint_iou", "footprint_f1"]),
    ("depth", ["a1", "rmse", "abs_rel", "sq_rel"]),
])
def test_matterport_driver_matches_reference(ref_eval, tmp_path, monkeypatch,
                                             capsys, metric, keys):
    gt_root, pred_dir = _make_matterport_tree(tmp_path, np.random.RandomState(5))
    monkeypatch.chdir(tmp_path)  # the reference reads splits/ relative to CWD
    ref_log, my_log = [], []
    _run_reference(ref_eval, monkeypatch, gt_root, pred_dir, "matterport",
                   metric, ref_log)
    captured = capsys.readouterr().out
    results = _run_mine(gt_root, pred_dir, "matterport", metric, my_log,
                        split_root=str(tmp_path / "splits"))
    _compare_logs(ref_log, my_log)
    _assert_printed_aggregates_match(captured, results, keys)


# -------------------------------------------------------------- convex hull


def _hull_side_distances(mask):
    """Signed distance of every pixel center to the exact convex hull of the
    mask's pixel centers (scipy qhull; negative = inside).  Returns None for
    degenerate (<3 distinct, collinear) point sets."""
    from scipy.spatial import ConvexHull, QhullError

    ys, xs = np.nonzero(mask)
    pts = np.stack([xs, ys], 1).astype(np.float64)
    try:
        hull = ConvexHull(pts)
    except (QhullError, ValueError):
        return None
    gy, gx = np.mgrid[0:mask.shape[0], 0:mask.shape[1]]
    centers = np.stack([gx.ravel(), gy.ravel()], 1).astype(np.float64)
    # hull.equations: A @ p + b <= 0 inside; rows are unit normals
    d = centers @ hull.equations[:, :2].T + hull.equations[:, 2]
    return d.max(1).reshape(mask.shape)


def test_convex_hull_matches_geometric_oracle():
    """cv2-based convex_hull_image vs an independent scipy-qhull oracle.

    skimage (the reference's hull, evaluate_model.py:110-115) is not
    installed here; its offset_coordinates=True output differs from the
    exact pixel-center hull only within half a pixel of the hull boundary.
    So: strict agreement outside a 0.5 px band, containment inside it."""
    rng = np.random.RandomState(6)
    for trial in range(60):
        h, w = rng.randint(4, 50), rng.randint(4, 50)
        mask = rng.rand(h, w) > rng.uniform(0.7, 0.995)
        if mask.sum() == 0:
            continue
        hull = mine.convex_hull_image(mask)
        assert hull.dtype == bool and hull.shape == mask.shape
        assert hull[mask].all(), f"trial {trial}: hull must contain the mask"
        d = _hull_side_distances(mask)
        if d is None:
            continue
        eps = 0.5 + 1e-9
        assert hull[d < -eps].all(), f"trial {trial}: interior pixel missing"
        assert not hull[d > eps].any(), f"trial {trial}: exterior pixel set"


def test_convex_hull_degenerate_cases():
    empty = np.zeros((5, 7), bool)
    assert not mine.safe_convex_hull_image(empty).any()

    single = np.zeros((5, 7), bool)
    single[2, 3] = True
    np.testing.assert_array_equal(mine.convex_hull_image(single), single)

    line = np.zeros((5, 7), bool)
    line[2, 1:6] = True  # collinear points: hull is the segment itself
    np.testing.assert_array_equal(mine.convex_hull_image(line), line)
