"""Native (C++) eval kernels with transparent numpy fallback.

`bbox_overlaps` and `nms` mirror the numpy reference implementations in
`eval.wider_eval` / `eval.tta` exactly (property-tested); the shared library
is built on first use with g++ and loaded via ctypes (no pybind in this
image). If no toolchain is available the numpy paths serve alone.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "nms_ext.cpp")
    so = os.path.join(here, "libnms_ext.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            # Build to a per-pid temp path and os.rename() into place: rename
            # is atomic on one filesystem, so concurrent processes
            # (pytest-xdist, multi-worker eval) never CDLL a half-written .so.
            tmp = f"{so}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", tmp],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.rename(tmp, so)
        lib = ctypes.CDLL(so)
        lib.bbox_overlaps.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.nms.restype = ctypes.c_int64
        lib.nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


_STAGE_LIB: Optional[ctypes.CDLL] = None
_STAGE_TRIED = False


def _build_and_load_stage() -> Optional[ctypes.CDLL]:
    """Build/load the host staging kernel (stem LUT apply); same atomic-
    rename discipline as the eval kernels."""
    global _STAGE_LIB, _STAGE_TRIED
    if _STAGE_LIB is not None or _STAGE_TRIED:
        return _STAGE_LIB
    _STAGE_TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "stage_ext.cpp")
    so = os.path.join(here, "libstage_ext.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            tmp = f"{so}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
                 "-o", tmp, "-lpthread"],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.rename(tmp, so)
        lib = ctypes.CDLL(so)
        lib.stem_lut_apply.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8),
            ctypes.c_int32,
        ]
        _STAGE_LIB = lib
    except Exception:
        _STAGE_LIB = None
    return _STAGE_LIB


def stem_lut_apply(
    imgs_u8: np.ndarray,
    lut: np.ndarray,
    out: Optional[np.ndarray] = None,
    nthreads: int = 0,
) -> Optional[np.ndarray]:
    """C++ threaded LUT gather: (..., 3) uint8 -> int8 through a (256, 3)
    table, or None if the native lib is unavailable. nthreads=0 uses the
    host's CPU count. `out` (same shape, int8, C-contiguous — e.g. a leading-
    axis slice of a coalesced launch buffer) lets the serving assembly write
    straight into the batch buffer with no second copy."""
    lib = _build_and_load_stage()
    if lib is None:
        return None
    src = np.ascontiguousarray(imgs_u8, np.uint8)
    table = np.ascontiguousarray(lut, np.int8)
    if src.shape[-1] != 3 or table.shape != (256, 3):
        raise ValueError("expected (..., 3) uint8 images and a (256, 3) LUT")
    if out is None:
        dst = np.empty(src.shape, np.int8)
    else:
        if (
            out.shape != src.shape
            or out.dtype != np.int8
            or not out.flags.c_contiguous
        ):
            raise ValueError("out must be C-contiguous int8 of the same shape")
        dst = out
    if nthreads <= 0:
        nthreads = os.cpu_count() or 1
    if src.size:
        lib.stem_lut_apply(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            src.size // 3,
            table.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            nthreads,
        )
    return dst


def available() -> bool:
    return _build_and_load() is not None


def stage_available() -> bool:
    return _build_and_load_stage() is not None


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray) -> Optional[np.ndarray]:
    """C++ IoU matrix, or None if the native lib is unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    b = np.ascontiguousarray(boxes, np.float64)
    q = np.ascontiguousarray(query, np.float64)
    out = np.empty((len(b), len(q)), np.float64)
    if len(b) and len(q):
        lib.bbox_overlaps(
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(b),
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(q),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
    return out


def nms(dets_sorted: np.ndarray, thresh: float) -> Optional[np.ndarray]:
    """C++ greedy NMS over score-descending (N,5) dets, or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    d = np.ascontiguousarray(dets_sorted, np.float32)
    keep = np.empty(len(d), np.int64)
    n = lib.nms(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(d),
        ctypes.c_float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    ) if len(d) else 0
    return keep[:n]
