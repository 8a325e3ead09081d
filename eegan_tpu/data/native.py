"""ctypes bindings for the native host image ops (native/image_ops.cpp).

Builds the shared library on first use with g++ (cached next to the source);
every consumer falls back to the PIL path when the toolchain or library is
unavailable, so the framework never hard-depends on it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "image_ops.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libimage_ops.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain missing or compile error
        print(f"native image ops unavailable ({e}); using the PIL path")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB) or (
                os.path.isfile(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not os.path.isfile(_SRC) or not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        lib.resize_bilinear_u8_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int]
        lib.batch_pyramid.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
        lib.batch_pyramid_varsize.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
        lib.batch_pyramid_varsize_u8.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def resize_bilinear(img: np.ndarray, out_hw) -> np.ndarray:
    """uint8 (H, W, C) -> float32 (h, w, C) in [0, 255], Pillow-style filter."""
    lib = get_lib()
    assert lib is not None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    oh, ow = out_hw
    out = np.empty((oh, ow, c), np.float32)
    lib.resize_bilinear_u8_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow)
    return out


def batch_pyramid_varsize(images, crops: np.ndarray, target: int, base: int,
                          sizes: Sequence[int],
                          as_uint8: bool = False) -> List[np.ndarray]:
    """Batch augment over differently-sized decoded uint8 images.

    images: list of (H_i, W_i, C) uint8 arrays; crops: (B, 3) int32
    (y, x, flip) in the shorter-side=``target`` resized frame.
    Per image: resize shorter side to `target`, crop `base`², optional
    hflip, per-branch resize + normalise to [-1, 1] float32 — or, with
    ``as_uint8``, Pillow-rounded uint8 in [0, 255] (4x smaller
    host->device transfer; the jitted step normalises on device).
    OpenMP-parallel, one C call per batch (zero IPC — the TPU-host
    feeding path).
    """
    lib = get_lib()
    assert lib is not None
    b = len(images)
    c = images[0].shape[2]
    images = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * b)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in images])
    dims = np.ascontiguousarray(
        [[im.shape[0], im.shape[1]] for im in images], dtype=np.int32)
    crops = np.ascontiguousarray(crops, dtype=np.int32)
    sizes_arr = np.ascontiguousarray(sizes, dtype=np.int32)
    out_dtype = np.uint8 if as_uint8 else np.float32
    ctype = ctypes.c_uint8 if as_uint8 else ctypes.c_float
    outs = [np.empty((b, s, s, c), out_dtype) for s in sizes]
    optrs = (ctypes.POINTER(ctype) * len(outs))(
        *[o.ctypes.data_as(ctypes.POINTER(ctype)) for o in outs])
    fn = lib.batch_pyramid_varsize_u8 if as_uint8 else lib.batch_pyramid_varsize
    fn(ptrs, dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), b, c,
       target, base, crops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       sizes_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(sizes),
       optrs)
    return outs


def batch_pyramid(images: np.ndarray, crops: np.ndarray, flips: np.ndarray,
                  sizes: Sequence[int]) -> List[np.ndarray]:
    """Batch crop+flip+multi-scale resize+normalise to [-1, 1].

    images: (B, H, W, C) uint8 (same size); crops: (B, 4) int32 y/x/h/w;
    flips: (B,) int32. Returns one (B, s, s, C) float32 array per size.
    """
    lib = get_lib()
    assert lib is not None
    images = np.ascontiguousarray(images, dtype=np.uint8)
    b, h, w, c = images.shape
    crops = np.ascontiguousarray(crops, dtype=np.int32)
    flips = np.ascontiguousarray(flips, dtype=np.int32)
    sizes_arr = np.ascontiguousarray(sizes, dtype=np.int32)

    outs = [np.empty((b, s, s, c), np.float32) for s in sizes]
    ptrs = (ctypes.POINTER(ctypes.c_float) * len(outs))(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for o in outs])
    lib.batch_pyramid(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), b, h, w, c,
        crops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        sizes_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(sizes), ptrs)
    return outs
