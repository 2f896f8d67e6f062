"""Region Proposal Network head, shared across pyramid levels.

Re-design of the reference RPN (reference: mrcnn/model.py:912-979): a
3x3/512 shared conv, a 1x1 objectness conv (2 logits per anchor), and a 1x1
delta conv (4 per anchor). One module instance is applied to each of
P2..P6; per-level outputs are flattened to [B, H*W*A, ...] and concatenated
in level order (matching the anchor concatenation order of
utils/anchors.py).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class RPNHead(nn.Module):
    anchors_per_location: int = 3
    anchor_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_map):
        a = self.anchors_per_location
        shared = nn.Conv(
            512, (3, 3), strides=self.anchor_stride, padding="SAME",
            dtype=self.dtype, name="rpn_conv_shared",
        )(feature_map)
        shared = nn.relu(shared)
        logits = nn.Conv(2 * a, (1, 1), dtype=self.dtype, name="rpn_class_raw")(shared)
        bbox = nn.Conv(4 * a, (1, 1), dtype=self.dtype, name="rpn_bbox_pred")(shared)
        b = feature_map.shape[0]
        logits = logits.reshape(b, -1, 2).astype(jnp.float32)
        bbox = bbox.reshape(b, -1, 4).astype(jnp.float32)
        probs = nn.softmax(logits, axis=-1)
        return logits, probs, bbox


def apply_rpn_to_pyramid(
    rpn: RPNHead, variables, features: Sequence[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Apply the shared head to each level and concatenate over anchors
    (reference: mrcnn/model.py:2040-2055)."""
    outs = [rpn.apply(variables, f) for f in features]
    logits = jnp.concatenate([o[0] for o in outs], axis=1)
    probs = jnp.concatenate([o[1] for o in outs], axis=1)
    bbox = jnp.concatenate([o[2] for o in outs], axis=1)
    return logits, probs, bbox
