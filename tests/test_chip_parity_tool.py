"""CPU selftest of tools/chip_parity.py.

The tool is the repo's only defense against XLA:TPU backend miscompiles
(see CLAUDE.md: the r2 lane-concat bug was invisible to every CPU-mesh
golden test), and it is run manually on the real chip — so nothing in CI
would notice if a refactor broke its probe/compare machinery until the
next on-chip ritual failed for the wrong reason.  Here both "device" and
reference legs run on the CPU backend at tiny shapes: every check must
pass trivially, proving the harness itself still works end-to-end.
"""

import importlib.util
import os
import sys

import pytest

import jax

_TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "chip_parity.py")


@pytest.fixture(scope="module")
def tool():
    spec = importlib.util.spec_from_file_location("chip_parity", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["chip_parity"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def cpu():
    return jax.local_devices(backend="cpu")[0]


def test_check_model_selftest(tool, cpu):
    assert tool.check_model(32, 64, "float32", cpu)


def test_check_grads_selftest(tool, cpu):
    assert tool.check_grads(cpu, height=32, width=64)


def test_check_grads_s2d_head_selftest(tool, cpu):
    assert tool.check_grads(cpu, height=32, width=64, s2d_head=True)


def test_check_seg_grads_selftest(tool, cpu):
    assert tool.check_seg_grads(cpu, height=32, width=64)


def test_check_gt_selftest(tool, cpu):
    assert tool.check_gt(cpu, frames=10, height=48, width=64, time_it=False)


def test_check_gt_compare_rejects_row_corruption(tool):
    """The count-gate must still catch the r2 miscompile class: a whole
    border row systematically wrong."""
    import numpy as np

    a = np.random.RandomState(0).rand(48, 64).astype(np.float32)
    b = a.copy()
    b[0] += 1.0  # corrupt one full row
    assert not tool._compare_gt("selftest-row", a, b)
    # but scattered single-pixel flips (floor-boundary noise) pass
    c = a.copy()
    c[5, 7] += 1.0
    assert tool._compare_gt("selftest-flip", a, c)
