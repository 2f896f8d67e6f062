"""Image meta vector codec.

Packs per-image attributes into one float vector exactly like the reference
(reference: mrcnn/model.py:2887-2961): ``[image_id(1), original_shape(3),
image_shape(3), window(4), scale(1), active_class_ids(num_classes)]``.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def compose_image_meta(
    image_id, original_image_shape, image_shape, window, scale, active_class_ids
) -> np.ndarray:
    return np.array(
        [image_id]
        + list(original_image_shape)
        + list(image_shape)
        + list(window)
        + [scale]
        + list(active_class_ids),
        dtype=np.float32,
    )


def parse_image_meta(meta: np.ndarray) -> Dict[str, np.ndarray]:
    """numpy parse, batch axis first (reference: mrcnn/model.py:2916-2937)."""
    meta = np.asarray(meta)
    return {
        "image_id": meta[:, 0].astype(np.int32),
        "original_image_shape": meta[:, 1:4].astype(np.int32),
        "image_shape": meta[:, 4:7].astype(np.int32),
        "window": meta[:, 7:11].astype(np.int32),
        "scale": meta[:, 11].astype(np.float32),
        "active_class_ids": meta[:, 12:].astype(np.int32),
    }


def parse_image_meta_jax(meta: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Device parse (reference: mrcnn/model.py:2940-2961)."""
    return {
        "image_id": meta[..., 0],
        "original_image_shape": meta[..., 1:4],
        "image_shape": meta[..., 4:7],
        "window": meta[..., 7:11],
        "scale": meta[..., 11],
        "active_class_ids": meta[..., 12:],
    }
