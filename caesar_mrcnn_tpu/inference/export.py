"""Ahead-of-time export of the detect graph for serving.

The reference has no serving story beyond pickled Keras weights; a
production TPU deployment wants a self-contained compiled artifact that
can be loaded without the model-building code, Python config surface, or
weight checkpoints. This uses ``jax.export`` (StableHLO serialization):
the trained variables and anchors are baked into the graph as constants,
so one file carries the whole detector; the sidecar JSON carries the
molding metadata (image shape, classes, batch) needed to drive it.

The exported artifact is portable across processes and machines with the
same jax major version and accepts any platform the serializer recorded
(TPU serving artifacts are exported on TPU; tests export/load on CPU).

Reference parity anchor: the closest reference concept is
``model.keras_model.save_weights`` + rebuild-from-code
(mrcnn/model.py:2357-2393); this replaces both steps with one artifact.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .. import logger
from ..models.meta import compose_image_meta


def export_detector(detector, path: str) -> None:
    """Serialize ``detector``'s compiled detect step to ``path``.

    Writes ``<path>`` (StableHLO blob, weights baked in) and
    ``<path>.json`` (molding metadata). The exported callable takes ONE
    argument — molded images ``[B, H, W, C] float32`` — and returns
    ``(detections [B, D, 6], masks [B, D, mh, mw])``; image metas and
    anchors are baked for the canonical full-window molding, matching
    ``Detector.detect`` on images already at the model's input size.
    """
    from jax import export as jexport

    from ..models.mask_rcnn import forward_inference
    from ..utils.anchors import get_anchors

    cfg = detector.config
    b = cfg.batch_size
    h, w, c = cfg.image_shape
    meta = np.stack(
        [
            compose_image_meta(
                i, (h, w, c), (h, w, c), (0, 0, h, w), 1.0,
                np.zeros(cfg.num_classes),
            )
            for i in range(b)
        ]
    ).astype(np.float32)
    metas = jnp.asarray(meta)
    anchors = jnp.asarray(get_anchors(cfg))
    variables = jax.device_get(detector.variables)  # host constants

    stages = getattr(detector, "_stages", None)  # int8 graph exports as-is

    def fn(images):
        out = forward_inference(
            detector.model, variables, images, metas, anchors, stages=stages
        )
        return out.detections, out.masks

    exp = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((b, h, w, c), jnp.float32)
    )
    with open(path, "wb") as f:
        f.write(exp.serialize())
    sidecar = {
        "image_shape": [h, w, c],
        "batch_size": b,
        "num_classes": cfg.num_classes,
        "class_names": list(cfg.class_names),
        "detection_max_instances": cfg.detection_max_instances,
        "mask_wire_dtype": cfg.mask_wire_dtype,
        "mean_pixel": list(cfg.mean_pixel),
        "platforms": list(exp.platforms),
        "jax_version": jax.__version__,
        "quant_mode": "int8" if stages is not None else "none",
    }
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2)
    logger.info(
        "exported detect graph (%d-batch %dx%d, %d classes) -> %s (%.1f MB)",
        b, h, w, cfg.num_classes, path, os.path.getsize(path) / 1e6,
    )


class ServingDetector:
    """Standalone detector backed by an exported artifact — no model code,
    config object, or checkpoint needed. API mirrors ``Detector.detect``
    for images already at the artifact's input size."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(path, "rb") as f:
            self._exp = jexport.deserialize(f.read())
        with open(path + ".json") as f:
            self.meta: Dict = json.load(f)
        self._call = jax.jit(self._exp.call)

    @property
    def batch_size(self) -> int:
        return int(self.meta["batch_size"])

    @property
    def class_names(self) -> List[str]:
        return list(self.meta["class_names"])

    def detect(self, images: Sequence[np.ndarray]) -> List[Dict]:
        """images: list of [H, W, C] float arrays at the exported size.
        Returns the Detector-style per-image dicts (rois in pixel coords,
        class_ids, scores, masks [mh, mw, N] at model resolution)."""
        b = self.batch_size
        h, w, c = self.meta["image_shape"]
        n = len(images)
        if n == 0 or n > b:
            raise ValueError(f"expected 1..{b} images, got {n}")
        mean = np.asarray(self.meta["mean_pixel"], np.float32)
        molded = np.stack(
            [np.asarray(im, np.float32) - mean for im in images]
        )
        if molded.shape[1:] != (h, w, c):
            raise ValueError(
                f"images must be pre-sized to {(h, w, c)}, got "
                f"{molded.shape[1:]} — use the full Detector for molding"
            )
        if n < b:  # pad the tail to the compiled batch
            molded = np.concatenate(
                [molded, np.repeat(molded[-1:], b - n, axis=0)]
            )
        detections, masks = self._call(jnp.asarray(molded))
        detections = np.asarray(detections)
        masks = np.asarray(masks)
        if self.meta["mask_wire_dtype"] == "uint8":
            masks = masks.astype(np.float32) / 255.0

        from ..utils import boxes as B
        from ..utils import image as I

        results = []
        for i in range(n):
            det = detections[i]
            # padded suffix convention: first class-0 slot ends the list
            zero_ix = np.where(det[:, 4] == 0)[0]
            k = zero_ix[0] if zero_ix.shape[0] > 0 else det.shape[0]
            boxes = B.denorm_boxes(det[:k, :4], (h, w))
            class_ids = det[:k, 4].astype(np.int32)
            scores = det[:k, 5].astype(np.float32)
            m = masks[i, :k]
            # drop boxes that collapse to zero pixel area after denorm
            # rounding — same exclusion as Detector.unmold_detections
            # (reference: mrcnn/model.py:2585-2595); unmold_mask cannot
            # resize to an empty box.
            keep = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]) > 0
            boxes, class_ids, scores, m = (
                boxes[keep], class_ids[keep], scores[keep], m[keep]
            )
            k = boxes.shape[0]
            full = [
                I.unmold_mask(m[j], boxes[j], (h, w, c)) for j in range(k)
            ]
            results.append(
                {
                    "rois": boxes,
                    "class_ids": class_ids,
                    "scores": scores,
                    "masks": (
                        np.stack(full, axis=-1)
                        if full
                        else np.zeros((h, w, 0), bool)
                    ),
                }
            )
        return results
