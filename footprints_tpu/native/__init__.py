"""ctypes bindings for the native host-side image kernels (native/).

The shared object is built on demand with the repo Makefile (g++ only, no
pybind11).  Everything degrades gracefully: if the toolchain or library is
unavailable, callers fall back to PIL.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfp_image.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u8 = ctypes.POINTER(ctypes.c_uint8)
    f32 = ctypes.POINTER(ctypes.c_float)
    i = ctypes.c_int
    lib.fp_resize_lanczos_u8.argtypes = [u8, i, i, i, u8, i, i]
    lib.fp_resize_lanczos_u8_to_f32.argtypes = [u8, i, i, i, f32, i, i]
    lib.fp_resize_nearest_f32.argtypes = [f32, i, i, f32, i, i]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def resize_lanczos(image: np.ndarray, height: int, width: int) -> np.ndarray:
    """uint8 [H,W,C] -> uint8 [height,width,C], PIL-LANCZOS-compatible."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    image = np.ascontiguousarray(image, np.uint8)
    if image.ndim == 2:
        image = image[..., None]
    sh, sw, ch = image.shape
    out = np.empty((height, width, ch), np.uint8)
    lib.fp_resize_lanczos_u8(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw, ch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), height, width)
    return out


def resize_lanczos_f32(image: np.ndarray, height: int, width: int) -> np.ndarray:
    """uint8 [H,W,C] -> float32 [height,width,C] in [0,1] (fused convert)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    image = np.ascontiguousarray(image, np.uint8)
    if image.ndim == 2:
        image = image[..., None]
    sh, sw, ch = image.shape
    out = np.empty((height, width, ch), np.float32)
    lib.fp_resize_lanczos_u8_to_f32(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw, ch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), height, width)
    return out


def resize_nearest_f32(arr: np.ndarray, height: int, width: int) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    arr = np.ascontiguousarray(arr, np.float32)
    out = np.empty((height, width), np.float32)
    lib.fp_resize_nearest_f32(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        arr.shape[0], arr.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), height, width)
    return out
