"""ROIAlign: bilinear crop-and-resize + FPN multilevel pooling, XLA-native.

Replaces ``tf.image.crop_and_resize`` (reference: mrcnn/model.py:505-507 for
ROIAlign, mrcnn/model.py:684-686 for mask targets) and the reference's
``PyramidROIAlign`` per-level gather/re-sort dance
(reference: mrcnn/model.py:452-531).

TPU-first design: instead of looping over pyramid levels with dynamic-shape
``tf.where`` gathers and re-sorting, all levels' feature maps are flattened
into ONE ``[sum(H_l*W_l), C]`` buffer and each box computes
level-dependent flat indices, so pooling every box is a single batched
bilinear gather — fully static shapes, no reordering.

Sampling matches ``tf.image.crop_and_resize``: for normalized box
(y1, x1, y2, x2) on an ``H x W`` map, sample point ``i`` of ``P`` lies at
``y1*(H-1) + i * (y2-y1)*(H-1)/(P-1)`` (corners aligned).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sample_coords(lo, hi, extent_minus_1, n: int):
    """Crop-and-resize sample positions along one axis. lo/hi scalar
    normalized coords; returns [n] float positions in pixel units.

    Uses an exact-endpoint linspace form so the last sample of a box that
    touches the image border lands exactly on ``extent-1`` (a naive
    ``i * step`` accumulates float error past the border and would be
    masked to zero).
    """
    if n > 1:
        t = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)
        return (lo + (hi - lo) * t) * extent_minus_1
    return 0.5 * (lo + hi) * extent_minus_1 * jnp.ones((1,), dtype=jnp.float32)


def crop_and_resize(
    image: jnp.ndarray, boxes: jnp.ndarray, crop_size: Tuple[int, int]
) -> jnp.ndarray:
    """Bilinear crop-and-resize of one image for N boxes.

    Args:
      image: [H, W, C] (or [H, W] treated as C=1).
      boxes: [N, 4] normalized (y1, x1, y2, x2).
      crop_size: (ph, pw).

    Returns [N, ph, pw, C]. Out-of-range samples read 0 (TF semantics,
    extrapolation_value=0).
    """
    image = jnp.asarray(image)
    boxes = jnp.asarray(boxes)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    h, w, c = image.shape
    ph, pw = crop_size

    def one_box(box):
        ys = _sample_coords(box[0], box[2], float(h - 1), ph)  # [ph]
        xs = _sample_coords(box[1], box[3], float(w - 1), pw)  # [pw]
        return _bilinear_sample(image, ys, xs)

    out = jax.vmap(one_box)(boxes)
    return out[..., 0] if squeeze else out


def _bilinear_sample(image: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample image [H, W, C] at the outer product of ys [ph], xs [pw]."""
    h, w, _ = image.shape
    in_y = (ys >= 0) & (ys <= h - 1)
    in_x = (xs >= 0) & (xs <= w - 1)
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys, 0, h - 1) - y0  # [ph]
    wx = jnp.clip(xs, 0, w - 1) - x0  # [pw]
    y0i, y1i, x0i, x1i = (v.astype(jnp.int32) for v in (y0, y1, x0, x1))

    rows0 = image[y0i]  # [ph, W, C]
    rows1 = image[y1i]
    f00 = rows0[:, x0i]  # [ph, pw, C]
    f01 = rows0[:, x1i]
    f10 = rows1[:, x0i]
    f11 = rows1[:, x1i]
    top = f00 * (1 - wx)[None, :, None] + f01 * wx[None, :, None]
    bot = f10 * (1 - wx)[None, :, None] + f11 * wx[None, :, None]
    out = top * (1 - wy)[:, None, None] + bot * wy[:, None, None]
    mask = (in_y[:, None] & in_x[None, :])[..., None]
    return jnp.where(mask, out, 0.0)


def roi_levels(boxes: jnp.ndarray, image_area: float, num_levels: int = 4) -> jnp.ndarray:
    """FPN level per box, 0-based over [P2..P5].

    Equation 1 of the FPN paper adapted for normalized coordinates
    (reference: mrcnn/model.py:470-477): ``level = 4 + round(log2(
    sqrt(h*w) / (224 / sqrt(image_area))))`` clipped to [2, 5], shifted to
    0-based.
    """
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    scale = jnp.sqrt(jnp.maximum(h * w, 1e-12)) / (224.0 / jnp.sqrt(image_area))
    lvl = 4.0 + jnp.round(jnp.log2(scale))
    return jnp.clip(lvl, 2, 2 + num_levels - 1).astype(jnp.int32) - 2


def multilevel_roi_align_batched(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    image_shape: Tuple[int, int],
    pool: int,
    gather_dtype=None,
) -> jnp.ndarray:
    """Batched multilevel ROIAlign as ONE flat gather across the batch.

    Args:
      features: list of [B, H_l, W_l, C] maps, P2..P5.
      boxes: [B, N, 4] normalized.
      image_shape: (H, W) of the network input (level assignment).
      pool: output spatial size.
      gather_dtype: see :func:`multilevel_roi_align`.

    Returns [B, N, pool, pool, C].

    All images' pyramid levels are flattened into a single
    [B * sum(H_l*W_l) + 1, C] row buffer and every (image, box, sample,
    tap) gathers through one global index — bit-identical to vmapping
    :func:`multilevel_roi_align` over the batch, but measured 1.55x
    faster on v5e (11.6 vs 18.0 ms at the detect shape): XLA's batched
    gather serializes over the batch dimension, a single flat gather
    doesn't.
    """
    num_levels = len(features)
    c = features[0].shape[-1]
    b = features[0].shape[0]
    dtype = features[0].dtype
    shapes = np.array([f.shape[1:3] for f in features], dtype=np.int32)
    sizes = shapes[:, 0] * shapes[:, 1]
    level_off = np.concatenate([[0], np.cumsum(sizes)])
    per_img = int(level_off[-1])
    flat = jnp.concatenate([f.reshape(b, -1, c) for f in features], axis=1)
    flat = flat.reshape(b * per_img, c)
    if gather_dtype is not None:
        flat = flat.astype(gather_dtype)
    flat = jnp.concatenate([flat, jnp.zeros((1, c), dtype=flat.dtype)], axis=0)
    zero_row = flat.shape[0] - 1

    levels = roi_levels(boxes, float(image_shape[0] * image_shape[1]), num_levels)
    lvl_h = jnp.asarray(shapes[:, 0], jnp.float32)[levels]   # [B, N]
    lvl_w = jnp.asarray(shapes[:, 1], jnp.float32)[levels]
    lvl_off = jnp.asarray(level_off[:-1], jnp.int32)[levels]
    img_off = (jnp.arange(b, dtype=jnp.int32) * per_img)[:, None]
    base_off = lvl_off + img_off                              # [B, N]

    def per_box(box, h, w, off):
        ys = _sample_coords(box[0], box[2], h - 1.0, pool)
        xs = _sample_coords(box[1], box[3], w - 1.0, pool)
        in_y = (ys >= 0) & (ys <= h - 1)
        in_x = (xs >= 0) & (xs <= w - 1)
        y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        wy = (jnp.clip(ys, 0, h - 1) - y0)[:, None]
        wx = (jnp.clip(xs, 0, w - 1) - x0)[None, :]
        wi = jnp.asarray(w, jnp.int32)
        ok = in_y[:, None] & in_x[None, :]

        def flat_idx(yi, xi):
            base = off + yi.astype(jnp.int32)[:, None] * wi + xi.astype(jnp.int32)[None, :]
            return jnp.where(ok, base, zero_row)

        return (
            flat_idx(y0, x0), flat_idx(y0, x1), flat_idx(y1, x0), flat_idx(y1, x1),
            (1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx,
        )

    i00, i01, i10, i11, w00, w01, w10, w11 = jax.vmap(jax.vmap(per_box))(
        boxes, lvl_h, lvl_w, base_off
    )
    return (
        flat[i00].astype(dtype) * w00[..., None].astype(dtype)
        + flat[i01].astype(dtype) * w01[..., None].astype(dtype)
        + flat[i10].astype(dtype) * w10[..., None].astype(dtype)
        + flat[i11].astype(dtype) * w11[..., None].astype(dtype)
    )


def multilevel_roi_align(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    image_shape: Tuple[int, int],
    pool: int,
    gather_dtype=None,
) -> jnp.ndarray:
    """Pool [N, pool, pool, C] from the right pyramid level per box.

    Args:
      features: list of [H_l, W_l, C] maps, P2..P5 (single image).
      boxes: [N, 4] normalized. Zero-padded entries pool the level-0
        corner pixel (identical to TF crop_and_resize on a degenerate
        box — the reference does the same; downstream consumers ignore
        padded slots via their validity masks).
      image_shape: (H, W) of the network input (for level assignment).
      pool: output spatial size.
      gather_dtype: optional narrower dtype (e.g. ``jnp.float8_e4m3fn``)
        for the flattened gather buffer. The gather is HBM-bytes-bound on
        TPU, so an 8-bit buffer halves the dominant cost of this op;
        gathered taps are cast back to the feature dtype before the
        bilinear weighting, so only the feature values themselves are
        quantized. Output dtype is unchanged.
    """
    num_levels = len(features)
    c = features[0].shape[-1]
    dtype = features[0].dtype
    shapes = np.array([f.shape[:2] for f in features], dtype=np.int32)
    offsets = np.concatenate([[0], np.cumsum(shapes[:, 0] * shapes[:, 1])])
    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)
    if gather_dtype is not None:
        flat = flat.astype(gather_dtype)
    # one zero row at the end for out-of-range samples
    flat = jnp.concatenate([flat, jnp.zeros((1, c), dtype=flat.dtype)], axis=0)
    zero_row = flat.shape[0] - 1

    levels = roi_levels(boxes, float(image_shape[0] * image_shape[1]), num_levels)
    lvl_h = jnp.asarray(shapes[:, 0], dtype=jnp.float32)[levels]  # [N]
    lvl_w = jnp.asarray(shapes[:, 1], dtype=jnp.float32)[levels]
    lvl_off = jnp.asarray(offsets[:-1], dtype=jnp.int32)[levels]

    def one_box(box, h, w, off):
        ys = _sample_coords(box[0], box[2], h - 1.0, pool)  # [P]
        xs = _sample_coords(box[1], box[3], w - 1.0, pool)
        in_y = (ys >= 0) & (ys <= h - 1)
        in_x = (xs >= 0) & (xs <= w - 1)
        y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        wy = (jnp.clip(ys, 0, h - 1) - y0)[:, None]  # [P,1]
        wx = (jnp.clip(xs, 0, w - 1) - x0)[None, :]  # [1,P]
        wi = jnp.asarray(w, dtype=jnp.int32)

        def flat_idx(yi, xi):
            # [P,1] x [1,P] -> [P,P] flat row index into `flat`
            base = off + yi.astype(jnp.int32)[:, None] * wi + xi.astype(jnp.int32)[None, :]
            ok = (in_y[:, None] & in_x[None, :])
            return jnp.where(ok, base, zero_row)

        i00 = flat_idx(y0, x0)
        i01 = flat_idx(y0, x1)
        i10 = flat_idx(y1, x0)
        i11 = flat_idx(y1, x1)
        w00 = ((1 - wy) * (1 - wx))[..., None]
        w01 = ((1 - wy) * wx)[..., None]
        w10 = (wy * (1 - wx))[..., None]
        w11 = (wy * wx)[..., None]
        return (
            flat[i00].astype(dtype) * w00.astype(dtype)
            + flat[i01].astype(dtype) * w01.astype(dtype)
            + flat[i10].astype(dtype) * w10.astype(dtype)
            + flat[i11].astype(dtype) * w11.astype(dtype)
        )

    return jax.vmap(one_box)(boxes, lvl_h, lvl_w, lvl_off)
