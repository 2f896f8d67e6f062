"""Host-side image geometry: resize modes, mask resize, mini-masks, unmold.

Behavioral parity with the reference's skimage/scipy-based helpers
(reference: mrcnn/utils.py:456-645) using OpenCV for interpolation (same
half-pixel-center coordinate convention as ``skimage.transform.resize`` with
``anti_aliasing=False``).
"""

from __future__ import annotations

import random
from typing import Optional, Tuple

import cv2
import numpy as np


def _resize_raw(image: np.ndarray, shape: Tuple[int, int], order: int = 1) -> np.ndarray:
    """Bilinear (order=1) or nearest (order=0) resize to (h, w), float output."""
    h, w = int(shape[0]), int(shape[1])
    interp = cv2.INTER_LINEAR if order == 1 else cv2.INTER_NEAREST
    src = np.asarray(image)
    src_f = src.astype(np.float32)
    if src_f.ndim == 3 and src_f.shape[2] > 512:
        # cv2 limits channel count; fall back to chunked resize
        chunks = [
            cv2.resize(src_f[..., i : i + 512], (w, h), interpolation=interp)
            for i in range(0, src_f.shape[2], 512)
        ]
        chunks = [c if c.ndim == 3 else c[..., None] for c in chunks]
        return np.concatenate(chunks, axis=-1)
    out = cv2.resize(src_f, (w, h), interpolation=interp)
    if src_f.ndim == 3 and out.ndim == 2:
        out = out[..., None]
    return out


def resize(image: np.ndarray, output_shape, order: int = 1, preserve_range: bool = True) -> np.ndarray:
    """skimage-style resize wrapper (reference: mrcnn/utils.py:957-978).

    Bool input is resized bilinearly as float (like the reference's mask
    path) and returned as float for the caller to threshold.
    """
    src = np.asarray(image)
    out = _resize_raw(src.astype(np.float32), output_shape[:2], order=order)
    if not preserve_range and src.dtype == np.uint8:
        out = out / 255.0
    return out


def resize_image(
    image: np.ndarray,
    min_dim: Optional[int] = None,
    max_dim: Optional[int] = None,
    min_scale: Optional[float] = None,
    mode: str = "square",
):
    """Aspect-preserving resize + pad (reference: mrcnn/utils.py:456-561).

    Returns (image, window(y1,x1,y2,x2), scale, padding, crop).
    """
    image_dtype = image.dtype
    h, w = image.shape[:2]
    window = (0, 0, h, w)
    scale = 1.0
    padding = [(0, 0), (0, 0), (0, 0)]
    crop = None

    if mode == "none":
        return image, window, scale, padding, crop

    if min_dim:
        scale = max(1.0, min_dim / min(h, w))
    if min_scale and scale < min_scale:
        scale = min_scale

    if max_dim and mode == "square":
        image_max = max(h, w)
        if round(image_max * scale) > max_dim:
            scale = max_dim / image_max

    if scale != 1.0:
        image = resize(image, (round(h * scale), round(w * scale)), preserve_range=True)

    if mode == "square":
        h, w = image.shape[:2]
        top_pad = (max_dim - h) // 2
        bottom_pad = max_dim - h - top_pad
        left_pad = (max_dim - w) // 2
        right_pad = max_dim - w - left_pad
        padding = [(top_pad, bottom_pad), (left_pad, right_pad), (0, 0)]
        image = np.pad(image, padding[: image.ndim], mode="constant", constant_values=0)
        window = (top_pad, left_pad, h + top_pad, w + left_pad)
    elif mode == "pad64":
        h, w = image.shape[:2]
        if min_dim:
            assert min_dim % 64 == 0, "Minimum dimension must be a multiple of 64"
        top_pad = bottom_pad = left_pad = right_pad = 0
        if h % 64 > 0:
            max_h = h - (h % 64) + 64
            top_pad = (max_h - h) // 2
            bottom_pad = max_h - h - top_pad
        if w % 64 > 0:
            max_w = w - (w % 64) + 64
            left_pad = (max_w - w) // 2
            right_pad = max_w - w - left_pad
        padding = [(top_pad, bottom_pad), (left_pad, right_pad), (0, 0)]
        image = np.pad(image, padding[: image.ndim], mode="constant", constant_values=0)
        window = (top_pad, left_pad, h + top_pad, w + left_pad)
    elif mode == "crop":
        h, w = image.shape[:2]
        y = random.randint(0, (h - min_dim))
        x = random.randint(0, (w - min_dim))
        crop = (y, x, min_dim, min_dim)
        image = image[y : y + min_dim, x : x + min_dim]
        window = (0, 0, min_dim, min_dim)
    else:
        raise ValueError(f"Mode {mode} not supported")
    return image.astype(image_dtype), window, scale, padding, crop


def resize_mask(mask: np.ndarray, scale: float, padding, crop=None) -> np.ndarray:
    """Nearest-neighbor mask resize matching the image transform
    (reference: mrcnn/utils.py:564-583)."""
    h, w = mask.shape[:2]
    out = _resize_raw(
        mask.astype(np.float32), (round(h * scale), round(w * scale)), order=0
    )
    if out.ndim == 2:
        out = out[..., None] if mask.ndim == 3 else out
    out = out.astype(mask.dtype) if mask.dtype != bool else out > 0.5
    if crop is not None:
        y, x, ch, cw = crop
        out = out[y : y + ch, x : x + cw]
    else:
        out = np.pad(out, padding[: out.ndim], mode="constant", constant_values=0)
    return out


def minimize_mask(bbox: np.ndarray, mask: np.ndarray, mini_shape) -> np.ndarray:
    """Crop each instance mask to its bbox and resize to ``mini_shape``
    (reference: mrcnn/utils.py:586-601)."""
    mini = np.zeros(tuple(mini_shape) + (mask.shape[-1],), dtype=bool)
    for i in range(mask.shape[-1]):
        m = mask[:, :, i].astype(bool)
        y1, x1, y2, x2 = bbox[i][:4]
        m = m[y1:y2, x1:x2]
        if m.size == 0:
            raise ValueError("Invalid bounding box with area of zero")
        mini[:, :, i] = np.around(resize(m, mini_shape)).astype(bool)
    return mini


def expand_mask(bbox: np.ndarray, mini_mask: np.ndarray, image_shape) -> np.ndarray:
    """Inverse of :func:`minimize_mask` (reference: mrcnn/utils.py:604-618)."""
    mask = np.zeros(tuple(image_shape[:2]) + (mini_mask.shape[-1],), dtype=bool)
    for i in range(mask.shape[-1]):
        m = mini_mask[:, :, i]
        y1, x1, y2, x2 = bbox[i][:4]
        h, w = y2 - y1, x2 - x1
        mask[y1:y2, x1:x2, i] = np.around(resize(m, (h, w))).astype(bool)
    return mask


def unmold_mask(mask: np.ndarray, bbox, image_shape) -> np.ndarray:
    """Paste a 28x28 float mask into the full frame at ``bbox``, threshold
    0.5 (reference: mrcnn/utils.py:629-645)."""
    threshold = 0.5
    y1, x1, y2, x2 = [int(v) for v in bbox]
    m = resize(mask, (y2 - y1, x2 - x1))
    m = (m >= threshold)
    full = np.zeros(tuple(image_shape[:2]), dtype=bool)
    full[y1:y2, x1:x2] = m
    return full


def mold_image(images: np.ndarray, mean_pixel) -> np.ndarray:
    """Subtract mean pixel, float32 (reference: mrcnn/model.py:2964-2969)."""
    return images.astype(np.float32) - np.asarray(mean_pixel, dtype=np.float32)


def unmold_image(normalized_images: np.ndarray, mean_pixel) -> np.ndarray:
    """Inverse of :func:`mold_image` (reference: mrcnn/model.py:2971-2974)."""
    return (normalized_images + np.asarray(mean_pixel)).astype(np.uint8)
