"""ctypes bindings for the native IO/render library (native/pointio.cpp).

Auto-builds on first use when a toolchain is present; all callers fall back
to the numpy path when the library is unavailable, so the framework has no
hard native dependency.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libpointdae_native.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "pointio.cpp"))
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _stale() -> bool:
    """The library is built from source (never committed); rebuild whenever
    it is missing or older than pointio.cpp so a stale build can't load."""
    if not os.path.exists(_LIB_PATH):
        return True
    try:
        return os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)
    except OSError:
        return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if _stale() and not _build():
        return None
    lib = None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        # symbol check guards against a foreign/stale blob
        lib.pdae_load_npy_batch
        lib.pdae_render_balls
    except (OSError, AttributeError):
        # e.g. wrong-arch leftover: rebuild from source once and retry
        lib = None
        if _build():
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                lib.pdae_load_npy_batch
                lib.pdae_render_balls
            except (OSError, AttributeError):
                lib = None
    if lib is None:
        return None
    lib.pdae_load_npy_batch.restype = ctypes.c_int64
    lib.pdae_load_npy_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte)]
    lib.pdae_render_balls.restype = None
    lib.pdae_render_balls.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_npy_batch(paths: List[str], n_points: int, n_cols: int,
                   seed: int = 0, n_threads: int = 0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded native batch load of float32/64 .npy clouds into a
    (B, n_points, n_cols) buffer (subsample/pad to n_points). Returns
    (batch, ok_mask). Raises RuntimeError when the library is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    b = len(paths)
    out = np.empty((b, n_points, n_cols), np.float32)
    ok = np.zeros(b, np.uint8)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    lib.pdae_load_npy_batch(
        arr, b, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_points, n_cols, seed,
        n_threads, ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out, ok.astype(bool)


def render_balls(points: np.ndarray, colors: Optional[np.ndarray] = None,
                 h: int = 512, w: int = 512, radius: float = 6.0,
                 scale: Optional[float] = None) -> np.ndarray:
    """Z-buffered sphere-impostor render (role of visualizer/render_balls_so
    + show3d_balls.py). points: (N, 3) roughly unit-sphere normalized.
    Returns (h, w, 3) float32 image in [0, 1]."""
    lib = _load()
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    n = pts.shape[0]
    if colors is None:
        colors = np.tile(np.array([[0.4, 0.7, 1.0]], np.float32), (n, 1))
    colors = np.ascontiguousarray(colors, np.float32)
    img = np.zeros((h, w, 3), np.float32)
    if lib is None:
        # numpy fallback: nearest-point splat
        s = scale or (0.45 * min(h, w))
        xs = (pts[:, 0] * s + w / 2).astype(int).clip(0, w - 1)
        ys = (pts[:, 1] * s + h / 2).astype(int).clip(0, h - 1)
        order = np.argsort(-pts[:, 2])
        img[ys[order], xs[order]] = colors[order]
        return img
    lib.pdae_render_balls(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        colors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        ctypes.c_float(radius), ctypes.c_float(scale or 0.45 * min(h, w)),
        ctypes.c_float(w / 2.0), ctypes.c_float(h / 2.0))
    return img
