"""Native host runtime bindings (ctypes).

Loads libnpcd_runtime.so (built from src/npcd_runtime.cpp), compiling it on
first use if a toolchain is available. Provides:

  * decode_png_batch(paths, size)  — threaded libpng decode + bilinear
    resize to float32 [n, size, size, 3] in [0, 1]
  * collate_f32(arrays)            — threaded batch collation
  * fps(points, k)                 — farthest point sampling

Every entry point has a pure-python/numpy fallback (available == False)
so the framework runs without the native library.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_HERE = osp.dirname(osp.realpath(__file__))
_SRC = osp.join(_HERE, "src", "npcd_runtime.cpp")
_BUILD_DIR = osp.join(_HERE, "build")
_SO = osp.join(_BUILD_DIR, "libnpcd_runtime.so")

_lib: Optional[ctypes.CDLL] = None
_pool = None
_lock = threading.Lock()
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
        "-o", _SO, _SRC, "-lpng", "-lz", "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"build failed: {e}"
    if proc.returncode != 0:
        return f"build failed: {proc.stderr[-2000:]}"
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _pool, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not osp.exists(_SO):
            _build_error = _build()
            if _build_error is not None:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.nr_create_pool.restype = ctypes.c_void_p
        lib.nr_create_pool.argtypes = [ctypes.c_int]
        lib.nr_decode_png_batch.restype = ctypes.c_int
        lib.nr_decode_png_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.nr_collate_f32.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
        ]
        lib.nr_fps.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        _pool = lib.nr_create_pool(max(2, (os.cpu_count() or 2)))
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def decode_png_batch(paths: Sequence[str], size: int) -> np.ndarray:
    """-> float32 [n, size, size, 3] in [0, 1]."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, size, size, 3), np.float32)
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        ok = lib.nr_decode_png_batch(
            _pool, c_paths, n, size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if ok == n:
            return out
    # fallback: PIL
    from PIL import Image

    for i, p in enumerate(paths):
        img = Image.open(p).convert("RGB").resize((size, size))
        out[i] = np.asarray(img, np.float32) / 255.0
    return out


def collate_f32(arrays: List[np.ndarray]) -> np.ndarray:
    lib = _load()
    arrays = [np.ascontiguousarray(a, np.float32) for a in arrays]
    if lib is None or len(arrays) < 4:
        return np.stack(arrays)
    n = len(arrays)
    elem = int(arrays[0].size)
    out = np.empty((n,) + arrays[0].shape, np.float32)
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrays]
    )
    lib.nr_collate_f32(
        _pool, ptrs, n, elem, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    return out


def fps(points: np.ndarray, k: int, start: int = 0) -> np.ndarray:
    """points [n, 3] -> idx [k] int32."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    if lib is not None:
        idx = np.empty((k,), np.int32)
        lib.nr_fps(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            points.shape[0], k, start,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return idx
    # fallback: numpy O(k n)
    n = points.shape[0]
    min_d2 = np.full((n,), np.inf, np.float32)
    idx = np.zeros((k,), np.int32)
    idx[0] = start
    for j in range(1, k):
        d2 = np.sum((points - points[idx[j - 1]]) ** 2, axis=-1)
        np.minimum(min_d2, d2, out=min_d2)
        idx[j] = int(np.argmax(min_d2))
    return idx
