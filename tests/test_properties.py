"""Property-based tests (hypothesis) for numeric primitives and the
checkpoint format."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

from footprints_tpu.core import ops
from footprints_tpu.train.checkpoint import load_checkpoint, save_checkpoint


@settings(max_examples=50, deadline=None)
@given(hnp.arrays(np.float32, hnp.array_shapes(max_dims=2, max_side=8),
                  elements=st.floats(0, 1, width=32)))
def test_sigmoid_to_depth_range(disp):
    depth = np.asarray(ops.sigmoid_to_depth(disp))
    assert (depth >= 0.1 - 1e-4).all()
    assert (depth <= 100.0 + 1e-3).all()


@settings(max_examples=50, deadline=None)
@given(hnp.arrays(np.float32, (6,), elements=st.floats(0.25, 99.0, width=32)))
def test_depth_disp_roundtrip(depth):
    """depth -> sigmoid-disp -> depth is the identity on (0.1, 100)."""
    min_disp, max_disp = 1 / 100.0, 1 / 0.1
    sig = (1.0 / depth - min_disp) / (max_disp - min_disp)
    back = np.asarray(ops.sigmoid_to_depth(sig))
    np.testing.assert_allclose(back, depth, rtol=1e-4)


@settings(max_examples=30, deadline=None)
@given(st.recursive(
    hnp.arrays(np.float32, hnp.array_shapes(max_dims=2, max_side=4),
               elements=st.floats(-10.0, 10.0, width=32)) | st.none(),
    lambda children: st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=4), children,
        max_size=3) | st.lists(children, max_size=3).map(list),
    max_leaves=8,
))
def test_checkpoint_roundtrip_arbitrary_pytrees(tree):
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "c.npz")
        _roundtrip_check(tree, path)


def _roundtrip_check(tree, path):
    save_checkpoint(path, tree)
    loaded = load_checkpoint(path)

    def eq(a, b):
        if a is None:
            assert b is None
        elif isinstance(a, dict):
            assert isinstance(b, dict) and set(a) == set(b)
            for k in a:
                eq(a[k], b[k])
        elif isinstance(a, list):
            assert isinstance(b, list) and len(a) == len(b)
            for x, y in zip(a, b):
                eq(x, y)
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    eq(tree, loaded)
