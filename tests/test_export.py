"""AOT serving export (jax.export): artifact roundtrip + parity with the
live Detector (inference/export.py)."""

import numpy as np
import pytest

import jax

from caesar_mrcnn_tpu.config import detector_config, inference_config
from caesar_mrcnn_tpu.inference.detector import Detector
from caesar_mrcnn_tpu.inference.export import ServingDetector, export_detector
from caesar_mrcnn_tpu.models.mask_rcnn import init_model


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = inference_config(
        detector_config(
            backbone="custom",
            image_min_dim=64,
            image_max_dim=64,
            num_classes=4,
            class_names=("bkg", "sidelobe", "source", "galaxy"),
            rpn_anchor_scales=(8, 16, 32, 64, 128),
            pre_nms_limit=128,
            post_nms_rois_inference=32,
            detection_max_instances=8,
            compute_dtype="float32",
        ),
        images_per_device=2,
        num_devices=1,
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    # strong stable detections (the test_mesh_detect stabilization trick)
    v = jax.device_get(variables)
    cb = np.array(v["params"]["classifier_head"]["mrcnn_class_logits"]["bias"])
    cb[:] = 0.0
    cb[2] = 6.0
    v["params"]["classifier_head"]["mrcnn_class_logits"]["bias"] = cb
    det = Detector(cfg, model, v)
    path = str(tmp_path_factory.mktemp("export") / "detector.stablehlo")
    export_detector(det, path)
    return det, path


def test_export_writes_artifact_and_sidecar(exported):
    import json
    import os

    _, path = exported
    assert os.path.getsize(path) > 1000
    with open(path + ".json") as f:
        meta = json.load(f)
    assert meta["image_shape"] == [64, 64, 3]
    assert meta["batch_size"] == 2
    assert meta["class_names"][2] == "source"


def test_serving_detector_matches_live(exported):
    det, path = exported
    srv = ServingDetector(path)
    rng = np.random.RandomState(0)
    images = [rng.rand(64, 64, 3).astype(np.float32) for _ in range(2)]
    live = det.detect(images)
    served = srv.detect(images)
    assert len(live) == len(served) == 2
    for a, b in zip(live, served):
        np.testing.assert_array_equal(a["class_ids"], b["class_ids"])
        np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-5)
        np.testing.assert_allclose(a["rois"], b["rois"], atol=1)
        assert a["masks"].shape == b["masks"].shape


def test_serving_detector_partial_batch_and_validation(exported):
    _, path = exported
    srv = ServingDetector(path)
    rng = np.random.RandomState(1)
    out = srv.detect([rng.rand(64, 64, 3).astype(np.float32)])
    assert len(out) == 1
    with pytest.raises(ValueError):
        srv.detect([rng.rand(32, 32, 3).astype(np.float32)])
    with pytest.raises(ValueError):
        srv.detect([])


def test_serving_detector_drops_zero_area_boxes(exported):
    """A detection whose box collapses to zero pixel area after denorm
    rounding must be excluded before unmold_mask (cv2.resize cannot
    produce an empty target) — the same exclusion the live
    Detector.unmold_detections applies (detector.py)."""
    _, path = exported
    srv = ServingDetector(path)
    b = srv.batch_size
    d = srv.meta["detection_max_instances"]
    mh = mw = 2 * 14  # mask head output resolution

    def fake_call(molded):
        det = np.zeros((b, d, 6), np.float32)
        # one healthy detection + one degenerate (inverted y: y2 < y1,
        # which denorms to non-positive pixel area) detection
        det[:, 0] = [0.1, 0.1, 0.5, 0.5, 2, 0.9]
        det[:, 1] = [0.25, 0.2, 0.15, 0.6, 2, 0.8]
        masks = np.ones((b, d, mh, mw), np.float32)
        return det, masks

    srv._call = fake_call
    rng = np.random.RandomState(2)
    out = srv.detect([rng.rand(64, 64, 3).astype(np.float32)])
    # the degenerate box is dropped, the healthy one survives
    assert out[0]["rois"].shape[0] == 1
    assert out[0]["masks"].shape[-1] == 1
