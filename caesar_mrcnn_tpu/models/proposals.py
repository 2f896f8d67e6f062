"""Proposal generation: RPN outputs + anchors -> NMS'd ROIs, fully batched.

Re-design of the reference ProposalLayer (reference: mrcnn/model.py:283-406)
with ``vmap`` replacing ``utils.batch_slice`` per-image graph unrolling
(reference: mrcnn/utils.py:872-906) and the static-shape tiled NMS kernel
replacing ``tf.image.non_max_suppression``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.nms import nms_padded_auto
from ..utils.boxes import apply_box_deltas_jax, clip_boxes_jax


def _propose_single(
    scores: jnp.ndarray,       # [A] foreground prob
    deltas: jnp.ndarray,       # [A, 4] (already scaled by RPN_BBOX_STD_DEV)
    anchors: jnp.ndarray,      # [A, 4] normalized
    proposal_count: int,
    nms_threshold: float,
    pre_nms_limit: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    k = min(pre_nms_limit, scores.shape[0])
    top_scores, ix = jax.lax.top_k(scores, k)
    top_deltas = deltas[ix]
    top_anchors = anchors[ix]
    boxes = apply_box_deltas_jax(top_anchors, top_deltas)
    boxes = clip_boxes_jax(boxes, jnp.array([0.0, 0.0, 1.0, 1.0], dtype=jnp.float32))
    idx, valid = nms_padded_auto(boxes, top_scores, proposal_count, nms_threshold)
    proposals = jnp.where(valid[:, None], boxes[idx], 0.0)
    return proposals, valid


@functools.partial(
    jax.jit, static_argnames=("proposal_count", "pre_nms_limit")
)
def generate_proposals(
    rpn_probs: jnp.ndarray,    # [B, A, 2]
    rpn_bbox: jnp.ndarray,     # [B, A, 4]
    anchors: jnp.ndarray,      # [A, 4] normalized
    rpn_bbox_std_dev: jnp.ndarray,  # [4]
    proposal_count: int,
    nms_threshold: float,
    pre_nms_limit: int = 6000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (proposals [B, proposal_count, 4] zero-padded, valid [B, P])."""
    scores = rpn_probs[..., 1]
    deltas = rpn_bbox * rpn_bbox_std_dev.reshape(1, 1, 4)
    fn = functools.partial(
        _propose_single,
        proposal_count=proposal_count,
        nms_threshold=nms_threshold,
        pre_nms_limit=pre_nms_limit,
    )
    return jax.vmap(lambda s, d: fn(s, d, anchors))(scores, deltas)
