"""Loss functions: masked-reduction semantics vs hand-computed values."""

import jax.numpy as jnp
import numpy as np

from caesar_mrcnn_tpu.models import losses as L


def test_smooth_l1():
    y_true = jnp.array([0.0, 0.0, 0.0])
    y_pred = jnp.array([0.5, 1.0, 3.0])
    out = np.asarray(L.smooth_l1(y_true, y_pred))
    np.testing.assert_allclose(out, [0.125, 0.5, 2.5], atol=1e-6)


def test_rpn_class_loss_ignores_neutral():
    # 2 anchors used (1 pos, 1 neg), 1 neutral ignored
    rpn_match = jnp.array([[1, -1, 0]])
    big = 10.0
    logits = jnp.array([[[-big, big], [big, -big], [0.0, 0.0]]])  # both correct
    loss = float(L.rpn_class_loss(rpn_match, logits))
    assert loss < 1e-4
    # flip the positive -> large loss
    logits_bad = jnp.array([[[big, -big], [big, -big], [0.0, 0.0]]])
    assert float(L.rpn_class_loss(rpn_match, logits_bad)) > 1.0


def test_rpn_bbox_loss_only_positive():
    rpn_match = jnp.array([[1, -1, 0]])
    target = jnp.zeros((1, 3, 4))
    pred = jnp.ones((1, 3, 4))  # wrong everywhere
    loss = float(L.rpn_bbox_loss(target, rpn_match, pred))
    np.testing.assert_allclose(loss, 0.5, atol=1e-6)  # smooth_l1(1)=0.5 on pos only
    # no positives -> 0
    assert float(L.rpn_bbox_loss(target, jnp.array([[-1, -1, 0]]), pred)) == 0.0


def test_mrcnn_class_loss_active_mask():
    t = jnp.array([[1, 0]])
    big = 10.0
    logits = jnp.array([[[-big, big, -big], [big, -big, -big]]])  # correct preds
    active = jnp.ones((1, 3), jnp.int32)
    assert float(L.mrcnn_class_loss(t, logits, active)) < 1e-4
    # deactivate class predicted -> loss erased
    logits_bad = jnp.array([[[-big, -big, big], [big, -big, -big]]])
    active2 = jnp.array([[1, 1, 0]], jnp.int32)  # class 2 inactive
    loss_masked = float(L.mrcnn_class_loss(t, logits_bad, active2))
    loss_unmasked = float(L.mrcnn_class_loss(t, logits_bad, active))
    assert loss_masked < loss_unmasked


def test_mrcnn_bbox_loss_per_class_pick():
    t = jnp.array([[2, 0]])
    target = jnp.zeros((1, 2, 4))
    pred = jnp.zeros((1, 2, 3, 4)).at[0, 0, 2].set(1.0)  # wrong for class 2
    loss = float(L.mrcnn_bbox_loss(target, t, pred))
    np.testing.assert_allclose(loss, 0.5, atol=1e-6)
    # class 1 deltas are ignored
    pred2 = jnp.zeros((1, 2, 3, 4)).at[0, 0, 1].set(5.0)
    assert float(L.mrcnn_bbox_loss(target, t, pred2)) == 0.0


def test_mask_loss_bce_and_dice():
    t = jnp.array([[1, 0]])
    target = jnp.ones((1, 2, 4, 4))
    pred = jnp.full((1, 2, 4, 4, 2), 0.5)
    pred = pred.at[0, 0, :, :, 1].set(0.999999)  # near-perfect for class 1
    bce = float(L.mrcnn_mask_loss(target, t, pred))
    assert bce < 1e-4
    dice = float(L.mrcnn_mask_loss(target, t, pred, "dice_coef_loss"))
    assert dice < 1e-4
    # no positives -> 0
    assert float(L.mrcnn_mask_loss(target, jnp.zeros((1, 2)), pred)) == 0.0


def test_mrcnn_class_loss_class_weights():
    """Weighted CE: upweighting the target class scales its contribution;
    the normalizer (active-ROI count) is unchanged (reference class_weight:
    mrcnn/model.py:2498 + scripts/run.py:785-815)."""
    t = jnp.array([[1, 2]])
    logits = jnp.array([[[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]])
    active = jnp.ones((1, 3), jnp.int32)
    base = float(L.mrcnn_class_loss(t, logits, active))
    w_id = jnp.array([1.0, 1.0, 1.0])
    assert float(L.mrcnn_class_loss(t, logits, active, w_id)) == np.float32(base)
    # upweight class 1 by 3x: its CE triples, class 2's unchanged
    w = jnp.array([1.0, 3.0, 1.0])
    logp = np.asarray(jnp.log(jnp.exp(logits) / jnp.exp(logits).sum(-1, keepdims=True)))
    ce1, ce2 = -logp[0, 0, 1], -logp[0, 1, 2]
    expected = (3.0 * ce1 + ce2) / 2.0
    np.testing.assert_allclose(
        float(L.mrcnn_class_loss(t, logits, active, w)), expected, rtol=1e-6
    )


def test_mask_loss_positive_prefix_equivalence():
    """Running the mask head on the positive-ROI prefix only is numerically
    identical: non-positive slots never contribute to the loss."""
    rng = np.random.RandomState(0)
    r, pos = 8, 3
    t = np.zeros((1, r), np.int32)
    t[0, :pos] = [1, 2, 1]
    target = rng.rand(1, r, 4, 4).round().astype(np.float32)
    pred_full = rng.uniform(0.01, 0.99, (1, r, 4, 4, 3)).astype(np.float32)
    full = float(L.mrcnn_mask_loss(jnp.asarray(target), jnp.asarray(t), jnp.asarray(pred_full)))
    prefix = float(
        L.mrcnn_mask_loss(
            jnp.asarray(target[:, :pos]), jnp.asarray(t[:, :pos]),
            jnp.asarray(pred_full[:, :pos]),
        )
    )
    np.testing.assert_allclose(full, prefix, rtol=1e-6)
