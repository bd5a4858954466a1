"""ctypes bindings for the native host core (csrc/postproc.cpp).

Loads (or builds on first use, ~2 s with g++) the shared library providing
union-find connected components, fused regionprops, and hole filling — the
host postprocessing hot core. Falls back transparently to the numpy/scipy
implementations in ``cc_host`` when no compiler is available; callers use
``cc_host`` which dispatches here automatically.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from lungmask_tpu.logger import logger

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "postproc.cpp")
_OUT_DIR = os.path.join(os.path.dirname(__file__), "_native")
_OUT = os.path.join(_OUT_DIR, "libpostproc.so")


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    os.makedirs(_OUT_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src, "-o", _OUT]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _OUT
    except Exception as e:
        logger.info(f"native postproc build skipped ({e}); using numpy fallback")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _OUT if os.path.exists(_OUT) else _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as e:
        logger.info(f"native postproc load failed ({e}); using numpy fallback")
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.lm_label.restype = ctypes.c_int32
    lib.lm_label.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, i32p
    ]
    lib.lm_regionprops.restype = None
    lib.lm_regionprops.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, i64p, i32p, i32p,
    ]
    lib.lm_fill_holes.restype = None
    lib.lm_fill_holes.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    _LIB = lib
    return _LIB


def _as3d(a: np.ndarray) -> np.ndarray:
    return a[None] if a.ndim == 2 else a


def label(image: np.ndarray, connectivity: Optional[int] = None):
    """Native CC labeling; returns (labels int32, n) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = _as3d(np.ascontiguousarray(image, dtype=np.int32))
    nz, ny, nx = img.shape
    conn = 1 if connectivity == 1 else 0  # 0 = full
    out = np.empty_like(img)
    n = lib.lm_label(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nz, ny, nx, conn,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n < 0:
        return None
    return out.reshape(image.shape), int(n)


def regionprops_arrays(labels: np.ndarray, intensity: Optional[np.ndarray], n: int):
    """Native fused regionprops → (areas int64, max_int int32|None, bbox (n,6))."""
    lib = get_lib()
    if lib is None:
        return None
    lab = _as3d(np.ascontiguousarray(labels, dtype=np.int32))
    nz, ny, nx = lab.shape
    areas = np.zeros(n, dtype=np.int64)
    maxint = np.zeros(n, dtype=np.int32)
    bbox = np.zeros((n, 6), dtype=np.int32)
    ip = ctypes.POINTER(ctypes.c_int32)
    inten_ptr = ip()
    if intensity is not None:
        inten = _as3d(np.ascontiguousarray(intensity, dtype=np.int32))
        inten_ptr = inten.ctypes.data_as(ip)
    lib.lm_regionprops(
        lab.ctypes.data_as(ip), inten_ptr, nz, ny, nx, n,
        areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        maxint.ctypes.data_as(ip),
        bbox.ctypes.data_as(ip),
    )
    return areas, (maxint if intensity is not None else None), bbox


def fill_holes(mask: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    m = _as3d(np.ascontiguousarray(mask, dtype=np.uint8)).copy()
    nz, ny, nx = m.shape
    lib.lm_fill_holes(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nz, ny, nx
    )
    return m.reshape(mask.shape).astype(bool)
