"""RPN target builder (host) and detection targets (device)."""

import jax
import jax.numpy as jnp
import numpy as np

from caesar_mrcnn_tpu.config import detector_config
from caesar_mrcnn_tpu.models.targets import build_rpn_targets, detection_targets
from caesar_mrcnn_tpu.utils import boxes as B
from caesar_mrcnn_tpu.utils.anchors import generate_pyramid_anchors


def _cfg():
    return detector_config(
        image_min_dim=128,
        image_max_dim=128,
        num_classes=4,
        rpn_anchor_scales=(8, 16, 32, 64, 128),
        rpn_train_anchors_per_image=64,
        train_rois_per_image=32,
        max_gt_instances=4,
        use_mini_mask=False,
        mask_shape=(28, 28),
    )


def _anchors(cfg):
    shapes = cfg.backbone_shapes
    return generate_pyramid_anchors(
        cfg.rpn_anchor_scales, cfg.rpn_anchor_ratios, shapes,
        cfg.backbone_strides, cfg.rpn_anchor_stride,
    )


def test_rpn_targets_basic():
    cfg = _cfg()
    anchors = _anchors(cfg)
    gt_boxes = np.array([[30, 30, 60, 60], [80, 80, 110, 100]], dtype=np.float32)
    gt_ids = np.array([1, 2], dtype=np.int32)
    rng = np.random.RandomState(0)
    match, deltas = build_rpn_targets(anchors, gt_ids, gt_boxes, cfg, rng)
    assert match.shape == (anchors.shape[0],)
    assert deltas.shape == (anchors.shape[0], 4)
    n_pos = (match == 1).sum()
    n_neg = (match == -1).sum()
    assert n_pos >= 2  # every GT has at least one anchor
    assert n_pos <= cfg.rpn_train_anchors_per_image // 2
    assert n_pos + n_neg <= cfg.rpn_train_anchors_per_image
    # positive anchor deltas reconstruct their GT box
    pos = np.where(match == 1)[0]
    std = np.asarray(cfg.rpn_bbox_std_dev, np.float32)
    rec = B.apply_box_deltas(anchors[pos].astype(np.float32), deltas[pos] * std)
    ious = B.compute_overlaps(rec, gt_boxes)
    assert (ious.max(axis=1) > 0.99).all()


def test_rpn_targets_empty_gt():
    cfg = _cfg()
    anchors = _anchors(cfg)
    match, deltas = build_rpn_targets(
        anchors, np.zeros((0,), np.int32), np.zeros((0, 4), np.float32), cfg,
        np.random.RandomState(0),
    )
    assert (match == 1).sum() == 0
    assert (match == -1).sum() == cfg.rpn_train_anchors_per_image


def test_detection_targets_sampling():
    cfg = _cfg()
    g = cfg.max_gt_instances
    p = 64
    rng = np.random.RandomState(2)
    # GT: two valid boxes
    gt_boxes = np.zeros((g, 4), np.float32)
    gt_boxes[0] = [0.1, 0.1, 0.4, 0.4]
    gt_boxes[1] = [0.6, 0.6, 0.9, 0.9]
    gt_ids = np.zeros((g,), np.int32)
    gt_ids[:2] = [1, 3]
    gt_masks = np.zeros((128, 128, g), np.float32)
    gt_masks[13:51, 13:51, 0] = 1.0
    gt_masks[77:115, 77:115, 1] = 1.0
    # proposals: near-GT positives + background negatives + zero padding
    proposals = np.zeros((p, 4), np.float32)
    proposals[0] = [0.1, 0.1, 0.41, 0.39]   # matches gt 0
    proposals[1] = [0.62, 0.58, 0.9, 0.92]  # matches gt 1
    for i in range(2, 40):
        y = rng.uniform(0, 0.05)
        proposals[i] = [y, y, y + 0.04, y + 0.04]  # tiny bg boxes
    out = detection_targets(
        jax.random.PRNGKey(0),
        jnp.asarray(proposals),
        jnp.asarray(gt_ids),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_masks),
        cfg,
    )
    rois, class_ids, deltas, masks = (np.asarray(o) for o in out)
    r = cfg.train_rois_per_image
    assert rois.shape == (r, 4)
    assert masks.shape == (r, 28, 28)
    pos = class_ids > 0
    assert pos.sum() == 2
    assert set(class_ids[pos]) == {1, 3}
    # positive fraction respected
    assert pos.sum() <= int(r * cfg.roi_positive_ratio)
    # negatives keep ratio: pos=2 -> total ~ 2/0.33 = 6 -> ~4 negatives
    n_neg = ((rois.sum(axis=1) != 0) & ~pos).sum()
    assert 3 <= n_neg + pos.sum() <= 8
    # deltas reconstruct the assigned GT
    std = np.asarray(cfg.bbox_std_dev, np.float32)
    pos_idx = np.where(pos)[0]
    rec = B.apply_box_deltas(rois[pos_idx], deltas[pos_idx] * std)
    ious = B.compute_overlaps(rec, gt_boxes[:2])
    assert (ious.max(axis=1) > 0.99).all()
    # mask targets are binary and nonempty for positives
    assert set(np.unique(masks)).issubset({0.0, 1.0})
    assert masks[pos_idx].sum() > 0


def test_detection_targets_no_gt():
    cfg = _cfg()
    g = cfg.max_gt_instances
    proposals = np.zeros((16, 4), np.float32)
    proposals[0] = [0.1, 0.1, 0.2, 0.2]
    out = detection_targets(
        jax.random.PRNGKey(1),
        jnp.asarray(proposals),
        jnp.zeros((g,), jnp.int32),
        jnp.zeros((g, 4), jnp.float32),
        jnp.zeros((64, 64, g), jnp.float32),
        cfg,
    )
    rois, class_ids, deltas, masks = (np.asarray(o) for o in out)
    assert (class_ids == 0).all()
    assert np.isfinite(deltas).all()


def test_rpn_targets_zero_overlap_gt_no_positive_blast():
    """A GT with zero IoU against every anchor must not mark anchors
    positive (the reference's unguarded tie-match marks ALL of them,
    reference mrcnn/model.py:1590 — observed as a 144-point rpn_bbox_loss
    spike in a real run)."""
    from caesar_mrcnn_tpu.models.targets import build_rpn_targets
    from caesar_mrcnn_tpu.config import detector_config
    from caesar_mrcnn_tpu.utils.anchors import generate_pyramid_anchors

    cfg = detector_config(
        image_min_dim=64, image_max_dim=64, num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        rpn_anchor_scales=(8, 16, 32, 64, 128),
    )
    anchors = generate_pyramid_anchors(
        cfg.rpn_anchor_scales, cfg.rpn_anchor_ratios, cfg.backbone_shapes,
        cfg.backbone_strides, cfg.rpn_anchor_stride,
    )
    # one normal GT + one degenerate GT far outside the anchor grid
    gt_boxes = np.array([[10, 10, 30, 30], [5000, 5000, 5000, 5000]], np.float32)
    gt_ids = np.array([2, 2], np.int32)
    rng = np.random.RandomState(0)
    match, deltas = build_rpn_targets(anchors, gt_ids, gt_boxes, cfg, rng)
    pos = np.where(match == 1)[0]
    assert 1 <= pos.size <= cfg.rpn_train_anchors_per_image // 2
    # all positive deltas point at the REAL box: finite and moderate
    assert np.isfinite(deltas[pos]).all()
    assert np.abs(deltas[pos]).max() < 10.0


def test_rand_subset_exact_unique_uniform():
    """_rand_subset: exact size, unique, in-range; roughly uniform."""
    from caesar_mrcnn_tpu.models.targets import _rand_subset

    rng = np.random.RandomState(5)
    for n, k in ((16000, 250), (100, 90), (8, 8), (50, 0), (10000, 2499)):
        s = _rand_subset(rng, n, k)
        assert len(s) == k == len(np.unique(s))
        if k:
            assert s.min() >= 0 and s.max() < n
    # uniformity smoke: each element's inclusion frequency ~ k/n
    n, k, trials = 40, 10, 4000
    counts = np.zeros(n)
    for _ in range(trials):
        counts[_rand_subset(rng, n, k)] += 1
    freq = counts / trials
    assert np.all(np.abs(freq - k / n) < 0.05)


def test_rpn_targets_native_matches_numpy_fallback():
    """Native single-pass stats path vs the numpy oracle path: identical
    match/delta outputs given the same RNG (up to f32-rounding tie picks)."""
    from caesar_mrcnn_tpu import native
    from caesar_mrcnn_tpu.models import targets as T

    if not native.available():
        import pytest

        pytest.skip("libfastops not built")
    cfg = _cfg()
    anchors = _anchors(cfg)
    rng = np.random.RandomState(11)
    gt_boxes = np.array(
        [[10, 10, 40, 44], [60, 62, 100, 96], [30, 90, 55, 120]], np.float32
    )
    gt_ids = np.array([1, 2, 1], np.int32)
    m1, d1 = T.build_rpn_targets(anchors, gt_ids, gt_boxes, cfg, np.random.RandomState(3))
    stats_fn = native.rpn_anchor_stats
    try:
        native.rpn_anchor_stats = lambda *a, **k: None  # force numpy path
        m2, d2 = T.build_rpn_targets(anchors, gt_ids, gt_boxes, cfg, np.random.RandomState(3))
    finally:
        native.rpn_anchor_stats = stats_fn
    assert np.array_equal(m1, m2)
    np.testing.assert_allclose(d1, d2, atol=1e-5)
