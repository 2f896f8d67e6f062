"""Model core smoke + shape tests (small custom backbone, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caesar_mrcnn_tpu.config import detector_config
from caesar_mrcnn_tpu.models.mask_rcnn import (
    MaskRCNN,
    forward_inference,
    forward_train,
    init_model,
)
from caesar_mrcnn_tpu.models.meta import compose_image_meta
from caesar_mrcnn_tpu.utils.anchors import get_anchors


@pytest.fixture(scope="module")
def small_cfg():
    return detector_config(
        backbone="custom",
        image_min_dim=128,
        image_max_dim=128,
        num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        images_per_device=1,
        rpn_anchor_scales=(8, 16, 32, 64, 128),
        pre_nms_limit=256,
        post_nms_rois_training=128,
        post_nms_rois_inference=64,
        train_rois_per_image=64,
        detection_max_instances=16,
        max_gt_instances=8,
        compute_dtype="float32",
        mask_shape=(28, 28),
        use_mini_mask=True,
        mini_mask_shape=(56, 56),
    )


@pytest.fixture(scope="module")
def model_and_vars(small_cfg):
    return init_model(small_cfg, jax.random.PRNGKey(0))


def test_init_and_feature_shapes(small_cfg, model_and_vars):
    model, variables = model_and_vars
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    pyramid = model.apply(variables, images, False, method=MaskRCNN.features)
    assert [p.shape for p in pyramid] == [
        (1, 32, 32, 256),
        (1, 16, 16, 256),
        (1, 8, 8, 256),
        (1, 4, 4, 256),
        (1, 2, 2, 256),
    ]


def test_rpn_matches_anchor_count(small_cfg, model_and_vars):
    model, variables = model_and_vars
    anchors = get_anchors(small_cfg)
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    pyramid = model.apply(variables, images, False, method=MaskRCNN.features)
    logits, probs, bbox = model.apply(variables, pyramid, method=MaskRCNN.rpn)
    assert logits.shape == (1, anchors.shape[0], 2)
    assert bbox.shape == (1, anchors.shape[0], 4)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_forward_inference_shapes(small_cfg, model_and_vars):
    model, variables = model_and_vars
    anchors = jnp.asarray(get_anchors(small_cfg))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    meta = compose_image_meta(0, (128, 128, 3), (128, 128, 3), (0, 0, 128, 128), 1.0,
                              np.ones(4))[None]
    out = forward_inference(model, variables, images, jnp.asarray(meta), anchors)
    d = small_cfg.detection_max_instances
    assert out.detections.shape == (1, d, 6)
    assert out.masks.shape == (1, d, 28, 28)
    assert np.isfinite(np.asarray(out.detections)).all()
    # zero-padded detections carry class 0
    det = np.asarray(out.detections[0])
    classes = det[:, 4]
    assert ((classes >= 0) & (classes < 4)).all()


def test_forward_train_shapes(small_cfg, model_and_vars):
    model, variables = model_and_vars
    anchors = jnp.asarray(get_anchors(small_cfg))
    g = small_cfg.max_gt_instances
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    gt_class_ids = np.zeros((1, g), np.int32)
    gt_class_ids[0, :2] = [1, 2]
    gt_boxes = np.zeros((1, g, 4), np.float32)
    gt_boxes[0, 0] = [0.1, 0.1, 0.3, 0.3]
    gt_boxes[0, 1] = [0.5, 0.5, 0.8, 0.9]
    mh, mw = small_cfg.mini_mask_shape
    gt_masks = np.zeros((1, mh, mw, g), np.float32)
    gt_masks[0, :, :, :2] = 1.0
    out, new_stats = forward_train(
        model, variables, jax.random.PRNGKey(3), images,
        jnp.asarray(gt_class_ids), jnp.asarray(gt_boxes), jnp.asarray(gt_masks),
        anchors,
    )
    r = small_cfg.train_rois_per_image
    pos_cap = int(r * small_cfg.roi_positive_ratio)
    assert out.class_logits.shape == (1, r, 4)
    assert out.bbox_deltas.shape == (1, r, 4, 4)
    # mask head runs on the positive-ROI prefix only
    assert out.masks.shape == (1, pos_cap, 28, 28, 4)
    assert out.target_class_ids.shape == (1, r)
    assert np.isfinite(np.asarray(out.target_deltas)).all()
    assert new_stats == {}  # train_bn=False -> no BN stat updates
