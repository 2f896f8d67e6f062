"""Final detection refinement: class assignment, box refinement, per-class
NMS, top-k — fully static shapes.

Re-design of the reference DetectionLayer/refine_detections_graph
(reference: mrcnn/model.py:766-909). Instead of ``tf.unique`` +
``tf.map_fn`` over dynamically-discovered class ids, we run the static NMS
kernel once per (known) foreground class with score-masking — identical
results, fixed shapes, and the per-class passes batch cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.nms import nms_padded_auto
from ..utils.boxes import apply_box_deltas_jax, clip_boxes_jax


def refine_detections_single(
    rois: jnp.ndarray,       # [R, 4] normalized, zero-padded
    probs: jnp.ndarray,      # [R, num_classes]
    deltas: jnp.ndarray,     # [R, num_classes, 4]
    window: jnp.ndarray,     # [4] normalized (y1, x1, y2, x2)
    bbox_std_dev: jnp.ndarray,
    num_classes: int,
    max_instances: int,
    min_confidence: float,
    nms_threshold: float,
) -> jnp.ndarray:
    """Returns detections [max_instances, 6] = (y1, x1, y2, x2, class, score),
    zero-padded (class==0 marks padding, like the reference)."""
    r = rois.shape[0]
    class_ids = jnp.argmax(probs, axis=1)
    class_scores = jnp.take_along_axis(probs, class_ids[:, None], axis=1)[:, 0]
    deltas_specific = jnp.take_along_axis(
        deltas, class_ids[:, None, None].repeat(4, axis=2), axis=1
    )[:, 0]
    refined = apply_box_deltas_jax(rois, deltas_specific * bbox_std_dev)
    refined = clip_boxes_jax(refined, window)

    roi_valid = (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]) > 0
    keep = roi_valid & (class_ids > 0)
    if min_confidence:
        keep = keep & (class_scores >= min_confidence)

    # Per-class NMS in ONE kernel call via the coordinate-offset trick:
    # boxes are normalized to [0, 1], so shifting each class's boxes by
    # class_id * 2 makes cross-class IoU exactly 0 — one NMS pass then
    # equals independent per-class NMS (the reference's tf.map_fn loop,
    # mrcnn/model.py:820-846).
    offset = class_ids.astype(jnp.float32) * 2.0
    boxes_for_nms = refined + offset[:, None]
    nms_scores = jnp.where(keep, class_scores, -jnp.inf)
    max_out = min(r, max_instances * max(num_classes - 1, 1))
    idx, valid = nms_padded_auto(boxes_for_nms, nms_scores, max_out, nms_threshold)
    # Padded NMS slots carry idx=0 with valid=False; scattering `valid`
    # directly would let a padding slot's False overwrite a genuine keep of
    # roi 0 (last-write-wins). Route invalid slots to a sentinel row instead.
    safe_idx = jnp.where(valid, idx, r)
    kept_any = jnp.zeros((r + 1,), dtype=bool).at[safe_idx].set(True)[:r]
    # cap per-class survivors at max_instances (reference caps each class's
    # NMS output, mrcnn/model.py:826-832)
    if num_classes > 2:
        order = jnp.argsort(-jnp.where(kept_any, class_scores, -jnp.inf), stable=True)
        ranked_cls = class_ids[order]
        within = jnp.cumsum(
            jax.nn.one_hot(ranked_cls, num_classes, dtype=jnp.int32), axis=0
        )
        rank_in_class = jnp.take_along_axis(within, ranked_cls[:, None], axis=1)[:, 0]
        over_cap = jnp.zeros((r,), dtype=bool).at[order].set(rank_in_class > max_instances)
        kept_any = kept_any & ~over_cap

    # Top max_instances by score among survivors.
    final_scores = jnp.where(kept_any, class_scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(final_scores, max_instances)
    top_valid = top_scores > -jnp.inf
    det = jnp.concatenate(
        [
            refined[top_idx],
            class_ids[top_idx, None].astype(jnp.float32),
            class_scores[top_idx, None],
        ],
        axis=1,
    )
    return jnp.where(top_valid[:, None], det, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "max_instances", "min_confidence", "nms_threshold"),
)
def refine_detections(
    rois: jnp.ndarray,       # [B, R, 4]
    probs: jnp.ndarray,      # [B, R, C]
    deltas: jnp.ndarray,     # [B, R, C, 4]
    windows: jnp.ndarray,    # [B, 4] normalized
    bbox_std_dev: jnp.ndarray,
    num_classes: int,
    max_instances: int,
    min_confidence: float,
    nms_threshold: float,
) -> jnp.ndarray:
    fn = functools.partial(
        refine_detections_single,
        bbox_std_dev=bbox_std_dev,
        num_classes=num_classes,
        max_instances=max_instances,
        min_confidence=min_confidence,
        nms_threshold=nms_threshold,
    )
    return jax.vmap(fn)(rois, probs, deltas, windows)
