"""TPU fast paths for the decoder hot ops.

`s2d` (space-to-depth execution of the decoder tail / up-concat blocks) is
what the model actually runs.  `conv3x3_on_nearest_up` is the executable
SPECIFICATION of the phase-summed-kernel identity the s2d kernels are built
from — kept (and golden-tested in tests/test_fast_ops.py) as the readable
derivation and oracle twin; the model path itself uses the s2d formulation,
which subsumes it.
"""

from .s2d import depth_to_space, s2d_conv3x3_reflect, space_to_depth, up_conv_to_s2d
from .upconv import conv3x3_on_nearest_up

__all__ = [
    "conv3x3_on_nearest_up",
    "depth_to_space",
    "s2d_conv3x3_reflect",
    "space_to_depth",
    "up_conv_to_s2d",
]
