"""Binary-mask operations for detection post-processing.

Replaces the reference's per-pair full-frame ``skimage.measure.label``
connectivity test (reference: mrcnn/analyze.py:2142-2173 — an O(N^2 * H * W)
hot loop) with bbox-gated ``scipy.ndimage`` morphology.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from scipy import ndimage

_STRUCT8 = np.ones((3, 3), dtype=bool)  # 8-connectivity


def mask_bbox(mask: np.ndarray) -> Tuple[int, int, int, int]:
    """(y1, x1, y2, x2) with y2/x2 exclusive; zeros for empty mask.

    Row/column-projection argmax instead of ``np.nonzero`` — nonzero
    materializes every set pixel's indices and dominated the evaluation
    host profile (~half of per-image analysis time at realistic
    detection counts)."""
    rows = mask.any(axis=1)
    if not rows.any():
        return (0, 0, 0, 0)
    cols = mask.any(axis=0)
    y1 = int(np.argmax(rows))
    y2 = int(len(rows) - np.argmax(rows[::-1]))
    x1 = int(np.argmax(cols))
    x2 = int(len(cols) - np.argmax(cols[::-1]))
    return (y1, x1, y2, x2)


def bboxes_adjacent(b1, b2, gap: int = 1) -> bool:
    y11, x11, y12, x12 = b1
    y21, x21, y22, x22 = b2
    if y12 == y11 or y22 == y21:
        return False
    return not (
        y12 + gap <= y21 or y22 + gap <= y11 or x12 + gap <= x21 or x22 + gap <= x11
    )


def are_masks_connected(m1: np.ndarray, m2: np.ndarray, b1=None, b2=None) -> bool:
    """True if the union of the two masks forms one 8-connected component —
    i.e. some pixel pair is within |dx|<=1, |dy|<=1 (the reference's merge
    criterion, mrcnn/analyze.py:2154-2173 / sfinder.py:786-810).

    Fast path: reject via bbox distance, then test a dilated overlap on the
    joint bbox crop only. Precomputed bboxes can be passed to avoid
    recomputation in O(N^2) pair loops.
    """
    b1 = b1 if b1 is not None else mask_bbox(m1)
    b2 = b2 if b2 is not None else mask_bbox(m2)
    if b1[2] == b1[0] or b2[2] == b2[0]:
        return False
    if not bboxes_adjacent(b1, b2, gap=2):
        return False
    y1 = min(b1[0], b2[0])
    x1 = min(b1[1], b2[1])
    y2 = max(b1[2], b2[2])
    x2 = max(b1[3], b2[3])
    c1 = m1[y1:y2, x1:x2]
    c2 = m2[y1:y2, x1:x2]
    try:
        from ..native import available, masks_connected as native_connected

        if available():
            return native_connected(c1, c2)
    except ImportError:
        pass
    d1 = ndimage.binary_dilation(c1.astype(bool), structure=_STRUCT8)
    return bool(np.any(d1 & c2.astype(bool)))


def split_mask_components(mask: np.ndarray) -> List[np.ndarray]:
    """Split into 8-connected components (reference split step:
    mrcnn/analyze.py:1211-1243)."""
    labels, n = ndimage.label(mask.astype(bool), structure=_STRUCT8)
    return [(labels == i + 1).astype(np.uint8) for i in range(n)]


def merge_masks(m1: np.ndarray, m2: np.ndarray) -> np.ndarray:
    """Union (reference: mrcnn/analyze.py:2142-2147)."""
    return np.logical_or(m1.astype(bool), m2.astype(bool)).astype(np.uint8)


def mask_iou(m1: np.ndarray, m2: np.ndarray) -> float:
    """Jaccard index of two binary masks (the reference's
    ``sklearn.metrics.jaccard_score`` usage, mrcnn/analyze.py:1273)."""
    a = m1.astype(bool)
    b = m2.astype(bool)
    union = np.logical_or(a, b).sum()
    if union == 0:
        return 0.0
    return float(np.logical_and(a, b).sum() / union)


def find_contours_xy(mask: np.ndarray) -> List[np.ndarray]:
    """Object boundary polygons as [[x, y], ...] float arrays.

    Equivalent role of the reference's padded ``skimage.find_contours``
    (mrcnn/analyze.py:1911-1920), via OpenCV.
    """
    import cv2

    m = np.ascontiguousarray(mask.astype(np.uint8))
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    out = []
    for c in contours:
        pts = c[:, 0, :].astype(np.float64)  # [N, (x, y)]
        if len(pts) >= 3:
            out.append(pts)
    return out
