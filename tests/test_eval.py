"""Evaluation metrics: VOC AP, COCO AP, matterport AP on synthetic data."""

import numpy as np

from caesar_mrcnn_tpu.evalmetrics import ap as AP
from caesar_mrcnn_tpu.evalmetrics import coco as COCO
from caesar_mrcnn_tpu.evalmetrics import voc as VOC


def test_voc_perfect_detection():
    gts = [VOC.BBox("img1", "source", (10, 10, 20, 20)),
           VOC.BBox("img1", "source", (40, 40, 60, 60))]
    dets = [VOC.BBox("img1", "source", (10, 10, 20, 20), 0.9),
            VOC.BBox("img1", "source", (40, 40, 60, 60), 0.8)]
    res = VOC.pascal_voc_metrics(gts, dets)
    assert abs(res["source"]["AP"] - 1.0) < 1e-9
    assert abs(res["mAP"] - 1.0) < 1e-9


def test_voc_false_positive_penalty():
    gts = [VOC.BBox("img1", "source", (10, 10, 20, 20))]
    dets = [
        VOC.BBox("img1", "source", (100, 100, 120, 120), 0.95),  # FP first
        VOC.BBox("img1", "source", (10, 10, 20, 20), 0.90),      # TP second
    ]
    res = VOC.pascal_voc_metrics(gts, dets)
    # every-point AP: precision reaches 1/2 at recall 1 -> AP = 0.5
    assert abs(res["source"]["AP"] - 0.5) < 1e-9
    res11 = VOC.pascal_voc_metrics(gts, dets, method="eleven_point")
    assert 0.4 < res11["source"]["AP"] <= 0.5 + 1e-9


def test_voc_both_orders_of_interp_agree_on_perfect():
    gts = [VOC.BBox("i", "a", (0, 0, 10, 10))]
    dets = [VOC.BBox("i", "a", (0, 0, 10, 10), 1.0)]
    r1 = VOC.evaluate_class(gts, dets, method="every_point")["AP"]
    r2 = VOC.evaluate_class(gts, dets, method="eleven_point")["AP"]
    assert abs(r1 - 1.0) < 1e-9 and abs(r2 - 1.0) < 1e-6


def test_padilla_dir_roundtrip(tmp_path):
    gts = [VOC.BBox("img1", "source", (10, 10, 20, 20))]
    dets = [VOC.BBox("img1", "source", (10, 10, 20, 20), 0.75)]
    VOC.write_padilla_dirs(gts, dets, str(tmp_path / "gt"), str(tmp_path / "det"))
    gts2, dets2 = VOC.read_padilla_dirs(str(tmp_path / "gt"), str(tmp_path / "det"))
    assert len(gts2) == 1 and len(dets2) == 1
    assert gts2[0].box == (10.0, 10.0, 20.0, 20.0)
    assert abs(dets2[0].score - 0.75) < 1e-6
    res = VOC.pascal_voc_metrics(gts2, dets2)
    assert abs(res["mAP"] - 1.0) < 1e-9


def test_coco_single_image():
    # Perfect detections, but the tarlen5 score sweep (which we reproduce
    # exactly, quirks included) never samples the all-detections PR point:
    # it sweeps every unique score except the highest with a strict >
    # cut, so recall tops out at 0.5 here and AP = 6/11 (verified against
    # the vendored tool — see tests/test_eval_parity.py).
    gt = {"img1": [[10, 10, 20, 20], [40, 40, 60, 60]]}
    pred = {"img1": {"boxes": [[10, 10, 20, 20], [40, 40, 60, 60]], "scores": [0.9, 0.8]}}
    res = COCO.get_avg_precision_at_iou(gt, pred, 0.5)
    assert abs(res["avg_prec"] - 6.0 / 11.0) < 1e-9
    m = COCO.coco_map(gt, pred)
    assert abs(m["mAP"] - 6.0 / 11.0) < 1e-9


def test_coco_greedy_matching():
    r = COCO.get_single_image_results(
        [[0, 0, 10, 10]], [[0, 0, 10, 10], [1, 1, 11, 11]], 0.5
    )
    assert r == {"true_pos": 1, "false_pos": 1, "false_neg": 0}


def test_matterport_ap_mask_based():
    h = w = 32
    gt_masks = np.zeros((h, w, 2), dtype=bool)
    gt_masks[2:10, 2:10, 0] = True
    gt_masks[20:30, 20:30, 1] = True
    gt_boxes = np.array([[2, 2, 10, 10], [20, 20, 30, 30]], dtype=np.float64)
    gt_ids = np.array([1, 2])
    # perfect predictions
    ap, prec, rec, _ = AP.compute_ap(
        gt_boxes, gt_ids, gt_masks,
        gt_boxes, gt_ids, np.array([0.9, 0.8]), gt_masks,
    )
    assert abs(ap - 1.0) < 1e-9
    # wrong class -> no match
    ap2 = AP.compute_ap(
        gt_boxes, gt_ids, gt_masks,
        gt_boxes, np.array([2, 1]), np.array([0.9, 0.8]), gt_masks,
    )[0]
    assert ap2 < 0.5


def test_compute_ap_range():
    h = w = 32
    gt_masks = np.zeros((h, w, 1), dtype=bool)
    gt_masks[4:12, 4:12, 0] = True
    gt_boxes = np.array([[4, 4, 12, 12]], dtype=np.float64)
    gt_ids = np.array([1])
    val = AP.compute_ap_range(
        gt_boxes, gt_ids, gt_masks, gt_boxes, gt_ids, np.array([0.9]), gt_masks
    )
    assert abs(val - 1.0) < 1e-9
