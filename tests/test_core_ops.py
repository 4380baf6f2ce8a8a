import numpy as np
import pytest

from footprints_tpu.core import ops


def test_sigmoid_to_depth_endpoints():
    assert np.isclose(float(ops.sigmoid_to_depth(0.0)), 100.0)
    assert np.isclose(float(ops.sigmoid_to_depth(1.0)), 0.1)
    # mid-range monotonic decreasing
    d = np.asarray(ops.sigmoid_to_depth(np.linspace(0, 1, 11)))
    assert np.all(np.diff(d) < 0)


def test_sigmoid_to_depth_matches_numpy_twin():
    x = np.random.RandomState(0).rand(4, 5).astype(np.float32)
    a = np.asarray(ops.sigmoid_to_depth(x))
    b = ops.np_sigmoid_to_depth(x)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_depth_to_disp_zero_guard():
    depth = np.array([0.0, 1.0, 2.0], np.float32)
    disp = np.asarray(ops.depth_to_disp(depth))
    assert disp[0] == 0.0
    np.testing.assert_allclose(disp[1:], [1.0 / (1 + 1e-7), 1.0 / (2 + 1e-7)], rtol=1e-5)


def test_pixel_disp_to_depth_guards():
    disp = np.array([0.0, 1.0, 10.0], np.float32)
    depth = np.asarray(ops.pixel_disp_to_depth(disp, focal_length=100.0, baseline=0.54))
    assert depth[0] == 0.0  # zero disparity -> zero depth (not inf/negative)
    np.testing.assert_allclose(depth[1], 54.0, rtol=1e-6)
    np.testing.assert_allclose(depth[2], 5.4, rtol=1e-6)


def test_normalise_image():
    img = np.array([[1.0, 3.0], [2.0, 5.0]], np.float32)
    out = np.asarray(ops.normalise_image(img))
    assert out.min() == 0.0
    assert out.max() == pytest.approx(1.0, abs=1e-5)
