"""Box math — numpy (host) and jax (device) twins.

Boxes are ``[N, (y1, x1, y2, x2)]``; in pixel coordinates ``(y2, x2)`` is
*outside* the box, in normalized coordinates it is inside
(reference conventions: mrcnn/utils.py:45-298, 923-954).

The numpy functions double as test oracles for the jitted versions.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------- numpy


def extract_bboxes(mask: np.ndarray) -> np.ndarray:
    """Bounding boxes from a stack of binary masks [H, W, N] -> [N, 4] int32.

    Empty masks yield a zero box (reference: mrcnn/utils.py:49-72).
    """
    n = mask.shape[-1]
    boxes = np.zeros([n, 4], dtype=np.int32)
    any_x = mask.any(axis=0)  # [W, N]
    any_y = mask.any(axis=1)  # [H, N]
    for i in range(n):
        xs = np.flatnonzero(any_x[:, i])
        ys = np.flatnonzero(any_y[:, i])
        if xs.size:
            boxes[i] = (ys[0], xs[0], ys[-1] + 1, xs[-1] + 1)
    return boxes


def compute_overlaps(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise IoU matrix [N1, N2] (reference: mrcnn/utils.py:148-165)."""
    boxes1 = np.asarray(boxes1, dtype=np.float64)
    boxes2 = np.asarray(boxes2, dtype=np.float64)
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    y1 = np.maximum(boxes1[:, None, 0], boxes2[None, :, 0])
    x1 = np.maximum(boxes1[:, None, 1], boxes2[None, :, 1])
    y2 = np.minimum(boxes1[:, None, 2], boxes2[None, :, 2])
    x2 = np.minimum(boxes1[:, None, 3], boxes2[None, :, 3])
    inter = np.maximum(y2 - y1, 0) * np.maximum(x2 - x1, 0)
    union = area1[:, None] + area2[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
    return iou


def compute_overlaps_masks(masks1: np.ndarray, masks2: np.ndarray) -> np.ndarray:
    """Mask-IoU matrix for [H, W, N] stacks (reference: mrcnn/utils.py:168-185)."""
    if masks1.shape[-1] == 0 or masks2.shape[-1] == 0:
        return np.zeros((masks1.shape[-1], masks2.shape[-1]))
    m1 = np.reshape(masks1 > 0.5, (-1, masks1.shape[-1])).astype(np.float32)
    m2 = np.reshape(masks2 > 0.5, (-1, masks2.shape[-1])).astype(np.float32)
    area1 = m1.sum(axis=0)
    area2 = m2.sum(axis=0)
    inter = m1.T @ m2
    union = area1[:, None] + area2[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(union > 0, inter / union, 0.0)


def non_max_suppression(boxes: np.ndarray, scores: np.ndarray, threshold: float) -> np.ndarray:
    """Greedy NMS oracle; returns kept indices in descending-score order
    (reference: mrcnn/utils.py:188-222)."""
    assert boxes.shape[0] > 0
    boxes = boxes.astype(np.float64)
    iou = compute_overlaps(boxes, boxes)
    order = np.argsort(scores, kind="stable")[::-1]
    suppressed = np.zeros(len(boxes), dtype=bool)
    pick = []
    for i in order:
        if suppressed[i]:
            continue
        pick.append(i)
        suppressed |= iou[i] > threshold
    return np.array(pick, dtype=np.int32)


def apply_box_deltas(boxes: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    """Apply (dy, dx, log dh, log dw) refinements (reference: mrcnn/utils.py:225-247)."""
    boxes = boxes.astype(np.float32)
    h = boxes[:, 2] - boxes[:, 0]
    w = boxes[:, 3] - boxes[:, 1]
    cy = boxes[:, 0] + 0.5 * h + deltas[:, 0] * h
    cx = boxes[:, 1] + 0.5 * w + deltas[:, 1] * w
    h = h * np.exp(deltas[:, 2])
    w = w * np.exp(deltas[:, 3])
    y1 = cy - 0.5 * h
    x1 = cx - 0.5 * w
    return np.stack([y1, x1, y1 + h, x1 + w], axis=1)


def box_refinement(box: np.ndarray, gt_box: np.ndarray) -> np.ndarray:
    """Deltas needed to turn ``box`` into ``gt_box`` (reference: mrcnn/utils.py:275-298)."""
    box = box.astype(np.float32)
    gt_box = gt_box.astype(np.float32)
    h = box[:, 2] - box[:, 0]
    w = box[:, 3] - box[:, 1]
    gh = gt_box[:, 2] - gt_box[:, 0]
    gw = gt_box[:, 3] - gt_box[:, 1]
    dy = (gt_box[:, 0] + 0.5 * gh - (box[:, 0] + 0.5 * h)) / h
    dx = (gt_box[:, 1] + 0.5 * gw - (box[:, 1] + 0.5 * w)) / w
    return np.stack([dy, dx, np.log(gh / h), np.log(gw / w)], axis=1)


def norm_boxes(boxes: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    """Pixel -> normalized coords (reference: mrcnn/utils.py:923-937)."""
    h, w = shape
    scale = np.array([h - 1, w - 1, h - 1, w - 1])
    shift = np.array([0, 0, 1, 1])
    return ((np.asarray(boxes) - shift) / scale).astype(np.float32)


def denorm_boxes(boxes: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    """Normalized -> pixel coords (reference: mrcnn/utils.py:940-954)."""
    h, w = shape
    scale = np.array([h - 1, w - 1, h - 1, w - 1])
    shift = np.array([0, 0, 1, 1])
    return np.around(np.asarray(boxes) * scale + shift).astype(np.int32)


def trim_zeros(x: np.ndarray) -> np.ndarray:
    """Drop all-zero rows (reference: mrcnn/utils.py:715-722)."""
    assert x.ndim == 2
    return x[~np.all(x == 0, axis=1)]


# --------------------------------------------------------------------------- jax


def overlaps_jax(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU [N1, N2] on device; zero-area pairs give 0.

    Fully batched — replaces the reference's tile/reshape emulation
    (reference: mrcnn/model.py:541-567). The division is guarded *inside*
    the select (``jnp.where(c, a/b, 0)`` with b=0 produces NaN gradients
    through the untaken branch).
    """
    y1 = jnp.maximum(boxes1[:, None, 0], boxes2[None, :, 0])
    x1 = jnp.maximum(boxes1[:, None, 1], boxes2[None, :, 1])
    y2 = jnp.minimum(boxes1[:, None, 2], boxes2[None, :, 2])
    x2 = jnp.minimum(boxes1[:, None, 3], boxes2[None, :, 3])
    inter = jnp.maximum(y2 - y1, 0.0) * jnp.maximum(x2 - x1, 0.0)
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


# exp(dh/dw) clamp: an untrained RPN can emit huge log-scale deltas; the
# unguarded exp overflows to inf and poisons downstream box math. The cap
# matches the Detectron convention (max box scale change 1000/16).
_MAX_DELTA_LOG = 4.135166556742356


def apply_box_deltas_jax(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Device twin of :func:`apply_box_deltas` (reference: mrcnn/model.py:287-308)."""
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    cy = boxes[..., 0] + 0.5 * h + deltas[..., 0] * h
    cx = boxes[..., 1] + 0.5 * w + deltas[..., 1] * w
    h = h * jnp.exp(jnp.clip(deltas[..., 2], -_MAX_DELTA_LOG, _MAX_DELTA_LOG))
    w = w * jnp.exp(jnp.clip(deltas[..., 3], -_MAX_DELTA_LOG, _MAX_DELTA_LOG))
    y1 = cy - 0.5 * h
    x1 = cx - 0.5 * w
    return jnp.stack([y1, x1, y1 + h, x1 + w], axis=-1)


def box_refinement_jax(box: jnp.ndarray, gt_box: jnp.ndarray) -> jnp.ndarray:
    """Device twin of :func:`box_refinement` (reference: mrcnn/utils.py:250-272).

    Guards h/w against zero so padded boxes don't produce NaNs (callers mask
    the results).
    """
    h = jnp.maximum(box[..., 2] - box[..., 0], 1e-8)
    w = jnp.maximum(box[..., 3] - box[..., 1], 1e-8)
    gh = jnp.maximum(gt_box[..., 2] - gt_box[..., 0], 1e-8)
    gw = jnp.maximum(gt_box[..., 3] - gt_box[..., 1], 1e-8)
    dy = (gt_box[..., 0] + 0.5 * gh - (box[..., 0] + 0.5 * h)) / h
    dx = (gt_box[..., 1] + 0.5 * gw - (box[..., 1] + 0.5 * w)) / w
    return jnp.stack([dy, dx, jnp.log(gh / h), jnp.log(gw / w)], axis=-1)


def clip_boxes_jax(boxes: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Clip boxes to window (y1, x1, y2, x2) (reference: mrcnn/model.py:311-326)."""
    wy1, wx1, wy2, wx2 = window[0], window[1], window[2], window[3]
    y1 = jnp.clip(boxes[..., 0], wy1, wy2)
    x1 = jnp.clip(boxes[..., 1], wx1, wx2)
    y2 = jnp.clip(boxes[..., 2], wy1, wy2)
    x2 = jnp.clip(boxes[..., 3], wx1, wx2)
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def norm_boxes_jax(boxes: jnp.ndarray, shape) -> jnp.ndarray:
    """Device twin of :func:`norm_boxes`."""
    h, w = shape[0], shape[1]
    scale = jnp.stack([h - 1, w - 1, h - 1, w - 1]).astype(jnp.float32)
    shift = jnp.array([0.0, 0.0, 1.0, 1.0], dtype=jnp.float32)
    return (boxes - shift) / scale
