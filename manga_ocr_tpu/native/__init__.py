"""ctypes bindings for the native (C++) host ops.

Builds lazily with ``make`` on first use if the shared library is missing;
callers treat ``load()`` returning None as "native unavailable" and fall
back to cv2 / pure NumPy (see ``detect/contours.py``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmocr_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build() -> bool:
    try:
        out = subprocess.run(
            ["make", "-C", _DIR], capture_output=True, timeout=120
        )
        return out.returncode == 0 and os.path.exists(_SO)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        if not os.path.exists(_SO) and not build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.trace_external_contours.restype = ctypes.c_int32
        lib.trace_external_contours.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.fill_polygon.restype = None
        lib.fill_polygon.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_uint8,
        ]
        lib.dilate_box.restype = None
        lib.dilate_box.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.prep_gray_batch.restype = None
        lib.prep_gray_batch.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.prep_gray_packed.restype = None
        lib.prep_gray_packed.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def trace_external_contours(mask: np.ndarray) -> list[np.ndarray] | None:
    lib = load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    max_pts = h * w + 16
    max_contours = 4096
    xy = np.empty((max_pts, 2), np.int32)
    sizes = np.empty((max_contours,), np.int32)
    n = lib.trace_external_contours(
        _u8ptr(mask), h, w, _i32ptr(xy), max_pts, _i32ptr(sizes), max_contours
    )
    if n < 0:
        return None  # buffer overflow: fall back
    polys, off = [], 0
    for i in range(n):
        cnt = int(sizes[i])
        polys.append(xy[off : off + cnt].copy())
        off += cnt
    return polys


def fill_polygon(mask: np.ndarray, poly: np.ndarray, value: int = 255) -> bool:
    lib = load()
    if lib is None:
        return False
    assert mask.flags["C_CONTIGUOUS"] and mask.dtype == np.uint8
    pts = np.ascontiguousarray(poly, np.int32)
    lib.fill_polygon(
        _u8ptr(mask), mask.shape[0], mask.shape[1], _i32ptr(pts), len(pts), value
    )
    return True


def dilate_box(mask: np.ndarray, radius: int) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    out = np.empty_like(mask)
    lib.dilate_box(_u8ptr(mask), _u8ptr(out), mask.shape[0], mask.shape[1], radius)
    return out


def prep_gray_batch(
    crops: list[np.ndarray],
    rots: np.ndarray,
    dst: np.ndarray,
) -> bool:
    """Fused orient + gray + edge-replicate pad of ``crops`` into the
    [n, bh, bw] uint8 batch ``dst`` (first ``len(crops)`` rows).

    ``rots``: int32 per-crop rotation code (0 none, 1 = 90° CW, 2 = 90° CCW)
    — the reference's orientation rule, resolved by the caller on real crop
    dims.  Crops must be contiguous uint8 [h, w, 3] (BGR) or [h, w]; the
    rotated crop must fit (bh, bw).  Returns False when the native library
    is unavailable (caller falls back to the NumPy path)."""
    lib = load()
    if lib is None:
        return False
    n = len(crops)
    assert dst.flags["C_CONTIGUOUS"] and dst.dtype == np.uint8 and dst.ndim == 3
    assert n <= dst.shape[0]
    dims = np.empty((n, 2), np.int32)
    chs = np.empty((n,), np.int32)
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    for i, c in enumerate(crops):
        assert c.flags["C_CONTIGUOUS"] and c.dtype == np.uint8
        dims[i] = c.shape[:2]
        chs[i] = 1 if c.ndim == 2 else c.shape[2]
        ptrs[i] = _u8ptr(c)
    rots = np.ascontiguousarray(rots, np.int32)
    lib.prep_gray_batch(
        ptrs, _i32ptr(dims), _i32ptr(chs), _i32ptr(rots), n,
        _u8ptr(dst), dst.shape[1], dst.shape[2],
    )
    return True


def prep_gray_packed(
    crops: list[np.ndarray],
    rots: np.ndarray,
    row_offsets: np.ndarray,
    dst: np.ndarray,
) -> bool:
    """Fused orient + gray of ``crops`` into the ROW-PACKED wire buffer
    ``dst`` [H_total, bw]: each crop occupies its rotated height of rows
    starting at ``row_offsets[i]``, width edge-padded to bw — heights are
    tight, so height padding never crosses the host→device link and the
    device reconstructs the padded batch with a per-ROW clamped gather
    (0.04 ms vs 34 ms element-granular; scripts/perf_unpack_variants).
    Returns False when the native library is unavailable."""
    lib = load()
    if lib is None:
        return False
    n = len(crops)
    assert dst.flags["C_CONTIGUOUS"] and dst.dtype == np.uint8 and dst.ndim == 2
    bw = dst.shape[1]
    dims = np.empty((n, 2), np.int32)
    chs = np.empty((n,), np.int32)
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    for i, c in enumerate(crops):
        assert c.flags["C_CONTIGUOUS"] and c.dtype == np.uint8
        dims[i] = c.shape[:2]
        chs[i] = 1 if c.ndim == 2 else c.shape[2]
        ptrs[i] = _u8ptr(c)
    rots = np.ascontiguousarray(rots, np.int32)
    byte_offsets = np.ascontiguousarray(row_offsets, np.int64) * bw
    if n:
        last_h = int(dims[-1, 1] if rots[-1] else dims[-1, 0])
        assert int(row_offsets[-1]) + last_h <= dst.shape[0]
    lib.prep_gray_packed(
        ptrs, _i32ptr(dims), _i32ptr(chs), _i32ptr(rots),
        byte_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        _u8ptr(dst), bw,
    )
    return True
