"""FPN classifier and mask heads.

Re-design of the reference heads (reference: mrcnn/model.py:982-1091). The
reference wraps every layer in ``TimeDistributed`` to map over the ROI axis;
here ROIs are simply folded into the batch axis — pooled features arrive as
``[num_rois, pool, pool, C]`` per image and the heads are plain convs/denses
vmapped over images by the caller.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .backbone import FrozenableBatchNorm


class ClassifierHead(nn.Module):
    """ROI features -> (class logits, probs, per-class bbox deltas)
    (reference fpn_classifier_graph: mrcnn/model.py:986-1039)."""

    num_classes: int
    pool_size: int = 7
    fc_size: int = 1024
    train_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [R, pool, pool, C] — first FC implemented as a VALID conv over
        # the full pool window (reference mrcnn_class_conv1)
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.fc_size, (self.pool_size, self.pool_size), padding="VALID",
            dtype=self.dtype, name="mrcnn_class_conv1",
        )(x)
        x = FrozenableBatchNorm(self.train_bn, self.dtype, name="mrcnn_class_bn1")(x, train)
        x = nn.relu(x)
        x = nn.Conv(self.fc_size, (1, 1), dtype=self.dtype, name="mrcnn_class_conv2")(x)
        x = FrozenableBatchNorm(self.train_bn, self.dtype, name="mrcnn_class_bn2")(x, train)
        x = nn.relu(x)
        shared = x.reshape(x.shape[0], -1)  # [R, fc]

        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="mrcnn_class_logits")(shared)
        logits = logits.astype(jnp.float32)
        probs = nn.softmax(logits, axis=-1)
        bbox = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="mrcnn_bbox_fc")(shared)
        bbox = bbox.reshape(-1, self.num_classes, 4).astype(jnp.float32)
        return logits, probs, bbox


class MaskHead(nn.Module):
    """ROI features -> per-class sigmoid masks [R, 2*pool, 2*pool, classes]
    (reference build_fpn_mask_graph: mrcnn/model.py:1042-1091)."""

    num_classes: int
    train_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for i in range(1, 5):
            x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name=f"mrcnn_mask_conv{i}")(x)
            x = FrozenableBatchNorm(self.train_bn, self.dtype, name=f"mrcnn_mask_bn{i}")(x, train)
            x = nn.relu(x)
        x = nn.ConvTranspose(256, (2, 2), strides=(2, 2), dtype=self.dtype, name="mrcnn_mask_deconv")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="mrcnn_mask")(x)
        return nn.sigmoid(x.astype(jnp.float32))
