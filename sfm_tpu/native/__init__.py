"""ctypes bindings for the native host runtime (sfm_native.cpp).

Build lazily with build(); all callers fall back to pure-Python paths
(PIL / scipy) when the shared library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libsfm_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the native library. Returns True on success."""
    src = os.path.join(_HERE, "sfm_native.cpp")
    if os.path.exists(_SO) and not force and (
            os.path.getmtime(_SO) >= os.path.getmtime(src)):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             src, "-o", _SO, "-lz"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Returns the loaded library or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.sfm_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.sfm_decode_image.restype = ctypes.c_int
        lib.sfm_delaunay.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.sfm_delaunay.restype = ctypes.c_int
        lib.sfm_write_ply.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int]
        lib.sfm_write_ply.restype = ctypes.c_int
        _lib = lib
        return _lib


def decode_image(path: str, max_pixels: int = 1 << 24):
    """Native grayscale decode (PGM/PNG). Returns array or None."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(max_pixels, np.uint8)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    rc = lib.sfm_decode_image(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_pixels, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


def delaunay(points: np.ndarray):
    """Native Delaunay. points [N,2] float32. Returns [T,3] int32 or None."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    max_tris = 2 * n + 16
    tris = np.empty((max_tris, 3), np.int32)
    cnt = lib.sfm_delaunay(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), max_tris)
    if cnt < 0:
        return None
    return tris[:cnt].copy()


def write_ply(path: str, points: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    pts = np.ascontiguousarray(points, np.float64)
    return lib.sfm_write_ply(
        path.encode(), pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(pts)) == 0
