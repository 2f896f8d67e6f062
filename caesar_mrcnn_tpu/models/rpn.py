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


class _Conv1x1Params(nn.Module):
    """Parameters of a 1x1 conv, laid out exactly like ``nn.Conv`` so the
    checkpoint/keras-h5 tree is unchanged whether or not the fused path
    is active."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class RPNHead(nn.Module):
    """``fused_heads`` runs the objectness and delta 1x1 convs as ONE
    matmul over concatenated output channels (identical math: each output
    channel's dot product is unchanged) — halves the reads of the 512-ch
    shared map and the MXU passes for the low-channel heads. Param tree
    is identical either way."""

    anchors_per_location: int = 3
    anchor_stride: int = 1
    dtype: Any = jnp.float32
    fused_heads: bool = False

    @nn.compact
    def __call__(self, feature_map):
        a = self.anchors_per_location
        shared = nn.Conv(
            512, (3, 3), strides=self.anchor_stride, padding="SAME",
            dtype=self.dtype, name="rpn_conv_shared",
        )(feature_map)
        shared = nn.relu(shared)
        if self.fused_heads:
            kc, bc = _Conv1x1Params(2 * a, 512, name="rpn_class_raw")()
            kb, bb = _Conv1x1Params(4 * a, 512, name="rpn_bbox_pred")()
            w = jnp.concatenate([kc[0, 0], kb[0, 0]], axis=-1)  # [512, 6a]
            bias = jnp.concatenate([bc, bb])
            y = (
                shared.astype(self.dtype) @ w.astype(self.dtype)
                + bias.astype(self.dtype)
            )
            logits, bbox = y[..., : 2 * a], y[..., 2 * a :]
        else:
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
