"""ctypes bindings for the native host-path kernels (libfastops.so).

Auto-builds with ``make`` on first import if a compiler is available;
every entry point has a numpy fallback so the package works without the
native library. The accelerated surfaces mirror the host hot loops of the
reference pipeline (see fastops.cpp header).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from .. import logger

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libfastops.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _HERE], check=True, capture_output=True, timeout=120
        )
        return os.path.isfile(_LIB_PATH)
    except Exception as e:  # noqa: BLE001
        logger.debug("native build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.debug("native load failed: %s", e)
        return None
    if not hasattr(lib, "rpn_anchor_stats"):
        # Stale .so from an older source revision: rebuild (the Makefile
        # recompiles when fastops.cpp is newer) and reload once.
        del lib
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:  # noqa: BLE001
            logger.debug("native reload failed: %s", e)
            return None
        if not hasattr(lib, "rpn_anchor_stats"):
            return None
    lib.iou_matrix.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.rpn_anchor_stats.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.zscale_limits.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_double,
        ctypes.c_int64, ctypes.c_double, ctypes.c_int64, ctypes.c_double,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.zscale_limits.restype = ctypes.c_int
    lib.stretch_to_u8.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.mask_iou.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.mask_iou.restype = ctypes.c_double
    lib.masks_connected.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.masks_connected.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def iou_matrix(b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    """Native pairwise IoU; falls back to the numpy oracle."""
    lib = _load()
    if lib is None:
        from ..utils.boxes import compute_overlaps

        return compute_overlaps(b1, b2)
    b1 = np.ascontiguousarray(b1, dtype=np.float32)
    b2 = np.ascontiguousarray(b2, dtype=np.float32)
    out = np.empty((b1.shape[0], b2.shape[0]), dtype=np.float64)
    lib.iou_matrix(
        _fptr(b1), b1.shape[0], _fptr(b2), b2.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def rpn_anchor_stats(
    anchors: np.ndarray, gt: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Single-pass anchor<->GT stats for RPN target building.

    Returns ``(anchor_iou_max [A] f32, anchor_iou_argmax [A] i32,
    tie [A] bool)`` where ``tie`` marks the best-anchor-per-GT positive
    set including exact ties (reference: mrcnn/model.py:1583-1595).
    IoU is computed in f32 (vs the f64 numpy oracle: max diff ~1e-7,
    safely inside the 0.3/0.7 match thresholds; tie equality is
    self-consistent because cells and column maxima come from the same
    f32 values). Returns None when the native library is unavailable
    (callers keep their numpy path).
    """
    lib = _load()
    if lib is None:
        return None
    anchors = np.ascontiguousarray(anchors, dtype=np.float32)
    gt = np.ascontiguousarray(gt, dtype=np.float32)
    a = anchors.shape[0]
    amax = np.empty((a,), dtype=np.float32)
    aarg = np.empty((a,), dtype=np.int32)
    tie = np.empty((a,), dtype=np.uint8)
    lib.rpn_anchor_stats(
        _fptr(anchors), a, _fptr(gt), gt.shape[0],
        _fptr(amax),
        aarg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _u8ptr(tie),
    )
    return amax, aarg, tie.view(bool)


def zscale_limits(
    data: np.ndarray,
    contrast: float = 0.25,
    nsamples: int = 1000,
    max_reject: float = 0.5,
    min_npixels: int = 5,
    krej: float = 2.5,
    max_iterations: int = 5,
) -> Tuple[float, float]:
    lib = _load()
    if lib is None:
        from ..utils.zscale import zscale_limits as np_limits

        return np_limits(data, contrast, nsamples, max_reject, min_npixels,
                         krej, max_iterations)
    flat = np.ascontiguousarray(data, dtype=np.float32).ravel()
    vmin = ctypes.c_double()
    vmax = ctypes.c_double()
    lib.zscale_limits(
        _fptr(flat), flat.size, contrast, nsamples, max_reject,
        min_npixels, krej, max_iterations,
        ctypes.byref(vmin), ctypes.byref(vmax),
    )
    return vmin.value, vmax.value


def stretch_to_u8(data: np.ndarray, vmin: float, vmax: float) -> np.ndarray:
    """Fused interval map + clip + 255 scale + round to uint8."""
    lib = _load()
    flat = np.ascontiguousarray(data, dtype=np.float32)
    if lib is None:
        if vmax <= vmin:
            return np.zeros(flat.shape, dtype=np.uint8)
        v = np.clip((flat - vmin) / (vmax - vmin), 0.0, 1.0)
        return np.round(v * 255.0).astype(np.uint8)
    out = np.empty(flat.shape, dtype=np.uint8)
    lib.stretch_to_u8(
        _fptr(flat), flat.size, vmin, vmax, _u8ptr(out)
    )
    return out


def mask_iou(m1: np.ndarray, m2: np.ndarray) -> float:
    lib = _load()
    a = np.ascontiguousarray(m1, dtype=np.uint8)
    b = np.ascontiguousarray(m2, dtype=np.uint8)
    if lib is None:
        from ..analysis.masks import mask_iou as np_iou

        return np_iou(a, b)
    return float(lib.mask_iou(_u8ptr(a), _u8ptr(b), a.size))


def masks_connected(m1: np.ndarray, m2: np.ndarray) -> bool:
    lib = _load()
    a = np.ascontiguousarray(m1, dtype=np.uint8)
    b = np.ascontiguousarray(m2, dtype=np.uint8)
    if lib is None:
        from ..analysis.masks import are_masks_connected

        return are_masks_connected(a, b)
    h, w = a.shape
    return bool(lib.masks_connected(_u8ptr(a), _u8ptr(b), h, w))
