"""Pure-function losses with the pad+mask convention.

Re-derivation of the reference Lambda-layer losses
(reference: mrcnn/model.py:1094-1270 and dice loss at 3036-3046) as pure
functions of (predictions, targets, masks). Dynamic ``tf.gather_nd`` picks
become masked reductions — bitwise-identical means because masked-out terms
contribute zero to both numerator and denominator.

All losses compute in float32 even when the model runs bfloat16: bf16
log-softmax rounds confident log-probs slightly positive (observed as a
small *negative* CE), and bf16 resolution near p=1 makes mask BCE noisy.
The cast happens at the loss boundary so the forward/backward matmuls stay
bf16 on the MXU.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import Config


def smooth_l1(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Huber with delta=1 (reference: mrcnn/model.py:1097-1105)."""
    diff = jnp.abs(y_true - y_pred)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def _safe_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over masked elements; 0 when the mask is empty (matches the
    reference's K.switch(size>0, mean, 0) idiom)."""
    num = jnp.sum(values * mask)
    den = jnp.sum(mask)
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


def rpn_class_loss(rpn_match: jnp.ndarray, rpn_class_logits: jnp.ndarray) -> jnp.ndarray:
    """Objectness CE over non-neutral anchors
    (reference: mrcnn/model.py:1108-1130).

    rpn_match: [B, A] in {-1, 0, 1}; logits: [B, A, 2].
    """
    rpn_class_logits = rpn_class_logits.astype(jnp.float32)
    anchor_class = (rpn_match == 1).astype(jnp.int32)
    use = (rpn_match != 0).astype(jnp.float32)
    logp = jax.nn.log_softmax(rpn_class_logits, axis=-1)
    # clamp: TPU's approximated exp can put logsumexp a few ulp BELOW the
    # max logit, making the "CE" of an ultra-confident correct prediction
    # ~-1e-3; CE is non-negative by definition (observed in f32 on real
    # runs, round 2/3)
    ce = jnp.maximum(-jnp.take_along_axis(logp, anchor_class[..., None], axis=-1)[..., 0], 0.0)
    return _safe_mean(ce, use)


def rpn_bbox_loss(
    target_deltas: jnp.ndarray, rpn_match: jnp.ndarray, rpn_bbox: jnp.ndarray
) -> jnp.ndarray:
    """Smooth-L1 on positive anchors (reference: mrcnn/model.py:1133-1159).

    target_deltas here are anchor-aligned [B, A, 4] (see targets.py), so no
    batch_pack repacking is needed; the mean runs over positive-anchor
    delta components exactly like the reference's packed version.
    """
    pos = (rpn_match == 1).astype(jnp.float32)[..., None]
    loss = smooth_l1(
        target_deltas.astype(jnp.float32), rpn_bbox.astype(jnp.float32)
    )
    return _safe_mean(loss, jnp.broadcast_to(pos, loss.shape))


def mrcnn_class_loss(
    target_class_ids: jnp.ndarray,
    pred_class_logits: jnp.ndarray,
    active_class_ids: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Head classification CE with inactive-class erasure
    (reference: mrcnn/model.py:1162-1195).

    target_class_ids: [B, R] int (0 = bg/pad); logits: [B, R, C];
    active_class_ids: [B, C].

    ``class_weights`` [C] rescales each ROI's CE by its target class's
    weight — the role of Keras ``fit(class_weight=...)`` fed with the
    n/(k*n_c) weights (reference: mrcnn/model.py:2498 +
    scripts/run.py:785-815). The normalizer stays the active-ROI count,
    matching Keras' sample-weighted mean semantics.
    """
    t = target_class_ids.astype(jnp.int32)
    logp = jax.nn.log_softmax(pred_class_logits.astype(jnp.float32), axis=-1)
    # non-negative by definition; clamp the few-ulp logsumexp undershoot of
    # TPU's approximated exp (see rpn_class_loss)
    ce = jnp.maximum(-jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0], 0.0)
    if class_weights is not None:
        ce = ce * class_weights[t]
    pred_class = jnp.argmax(pred_class_logits, axis=-1)
    # reference uses image 0's active ids for the whole batch; we use each
    # image's own row (the documented TODO at mrcnn/model.py:1180)
    pred_active = jnp.take_along_axis(active_class_ids, pred_class, axis=1).astype(
        jnp.float32
    )
    num = jnp.sum(ce * pred_active)
    den = jnp.sum(pred_active)
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


def mrcnn_bbox_loss(
    target_deltas: jnp.ndarray,
    target_class_ids: jnp.ndarray,
    pred_deltas: jnp.ndarray,
) -> jnp.ndarray:
    """Smooth-L1 on positive ROIs for the target class
    (reference: mrcnn/model.py:1198-1226)."""
    t = target_class_ids.astype(jnp.int32)
    pos = (t > 0).astype(jnp.float32)
    picked = jnp.take_along_axis(
        pred_deltas, t[..., None, None].repeat(4, axis=-1), axis=2
    )[:, :, 0, :]
    loss = smooth_l1(target_deltas.astype(jnp.float32), picked.astype(jnp.float32))
    return _safe_mean(loss, jnp.broadcast_to(pos[..., None], loss.shape))


def mrcnn_mask_loss(
    target_masks: jnp.ndarray,
    target_class_ids: jnp.ndarray,
    pred_masks: jnp.ndarray,
    mask_loss_function: str = "binary_crossentropy",
) -> jnp.ndarray:
    """Per-class mask BCE or dice (reference: mrcnn/model.py:1229-1270).

    target_masks: [B, R, mh, mw]; pred_masks: [B, R, mh, mw, C] sigmoid.
    """
    t = target_class_ids.astype(jnp.int32)
    pos = (t > 0).astype(jnp.float32)
    y_pred = jnp.take_along_axis(
        pred_masks, t[..., None, None, None], axis=-1
    )[..., 0].astype(jnp.float32)
    y_true = target_masks.astype(jnp.float32)
    eps = 1e-7
    if mask_loss_function == "dice_coef_loss":
        # dice over positive-ROI pixels only (reference: mrcnn/model.py:3038-3046)
        m = pos[..., None, None]
        inter = jnp.sum(y_true * y_pred * m)
        denom = jnp.sum(y_true * m) + jnp.sum(y_pred * m)
        dice = (2.0 * inter + eps) / (denom + eps)
        return jnp.where(jnp.sum(pos) > 0, 1.0 - dice, 0.0)
    p = jnp.clip(y_pred, eps, 1.0 - eps)
    bce = -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log(1.0 - p))
    return _safe_mean(bce, jnp.broadcast_to(pos[..., None, None], bce.shape))


def compute_losses(
    outputs,
    rpn_match: jnp.ndarray,
    rpn_target_deltas: jnp.ndarray,
    active_class_ids: jnp.ndarray,
    config: Config,
    class_weights: jnp.ndarray | None = None,
) -> Dict[str, jnp.ndarray]:
    """All five losses + the weighted total (weights/switches:
    reference mrcnn/config.py:189-203, applied at mrcnn/model.py:2263-2283)."""
    # The mask head runs on the positive-ROI prefix only (see
    # forward_train); slice the targets to the predicted-ROI count. All
    # positive slots live in that prefix, so the loss is unchanged.
    r_masks = outputs.masks.shape[1]
    losses = {
        "rpn_class_loss": rpn_class_loss(rpn_match, outputs.rpn_class_logits),
        "rpn_bbox_loss": rpn_bbox_loss(rpn_target_deltas, rpn_match, outputs.rpn_bbox),
        "mrcnn_class_loss": mrcnn_class_loss(
            outputs.target_class_ids,
            outputs.class_logits,
            active_class_ids,
            class_weights,
        ),
        "mrcnn_bbox_loss": mrcnn_bbox_loss(
            outputs.target_deltas, outputs.target_class_ids, outputs.bbox_deltas
        ),
        "mrcnn_mask_loss": mrcnn_mask_loss(
            outputs.target_masks[:, :r_masks],
            outputs.target_class_ids[:, :r_masks],
            outputs.masks,
            config.mask_loss_function,
        ),
    }
    total = jnp.asarray(0.0)
    for name, value in losses.items():
        if config.use_losses.get(name, True):
            total = total + config.loss_weights.get(name, 1.0) * value
    losses["total_loss"] = total
    return losses
