"""Evaluator parity oracles: our evalmetrics vs the reference's vendored
tools executed live on the reference's own committed fixtures.

The committed ``Object-Detection-Metrics/{groundtruths,detections}`` dirs are
NOT the inputs that produced ``results/results.txt`` (those had ~29k
detections; the dirs hold 47) — so instead of asserting the published 66.51%
mAP we run the vendored evaluators themselves (pure Python, imported from the
read-only reference tree) on the committed fixtures and on randomized data,
and assert bit-level agreement. Note the vendored Padilla CLI enumerates
files via glob (arbitrary order) so its *published* AP depends on tie order;
we feed both tools the same insertion order.
"""

import copy
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REF_ODM = "/root/reference/Object-Detection-Metrics"
REF_TARLEN = "/root/reference/tarlen5-calculate-mean-ap"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF_ODM) and os.path.isdir(REF_TARLEN)),
    reason="reference tree not available",
)


# ---------------------------------------------------------------- helpers


def _load_padilla_vendored():
    sys.path.insert(0, os.path.join(REF_ODM, "lib"))
    try:
        from BoundingBox import BoundingBox
        from BoundingBoxes import BoundingBoxes
        from Evaluator import Evaluator
        from utils import BBFormat, BBType, MethodAveragePrecision
    finally:
        sys.path.pop(0)
    return BoundingBox, BoundingBoxes, Evaluator, BBFormat, BBType, MethodAveragePrecision


def _load_tarlen_vendored():
    spec = importlib.util.spec_from_file_location(
        "tarlen_calculate", os.path.join(REF_TARLEN, "calculate.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _vendored_voc(gts, dets, iou_thr, method_name):
    """Run the vendored Padilla Evaluator on our BBox lists (same order)."""
    BoundingBox, BoundingBoxes, Evaluator, BBFormat, BBType, Method = _load_padilla_vendored()
    allbb = BoundingBoxes()
    for g in gts:
        allbb.addBoundingBox(
            BoundingBox(g.image_id, g.class_name, *g.box,
                        bbType=BBType.GroundTruth, format=BBFormat.XYX2Y2)
        )
    for d in dets:
        allbb.addBoundingBox(
            BoundingBox(d.image_id, d.class_name, *d.box,
                        bbType=BBType.Detected, classConfidence=d.score,
                        format=BBFormat.XYX2Y2)
        )
    method = (Method.EveryPointInterpolation if method_name == "every_point"
              else Method.ElevenPointInterpolation)
    res = Evaluator().GetPascalVOCMetrics(allbb, IOUThreshold=iou_thr, method=method)
    return {
        r["class"]: {
            "AP": r["AP"],
            "npos": r["total positives"],
            "TP": r["total TP"],
            "FP": r["total FP"],
        }
        for r in res
    }


def _random_boxes(rng, n, size=128):
    x1 = rng.randint(0, size - 8, n)
    y1 = rng.randint(0, size - 8, n)
    w = rng.randint(4, 40, n)
    h = rng.randint(4, 40, n)
    return np.stack([x1, y1, np.minimum(x1 + w, size - 1), np.minimum(y1 + h, size - 1)], 1)


# ------------------------------------------------------- Padilla VOC parity


@pytest.mark.parametrize("method", ["every_point", "eleven_point"])
@pytest.mark.parametrize("iou_thr", [0.3, 0.5])
def test_voc_parity_on_committed_dirs(method, iou_thr):
    from caesar_mrcnn_tpu.evalmetrics.voc import pascal_voc_metrics, read_padilla_dirs

    gts, dets = read_padilla_dirs(f"{REF_ODM}/groundtruths", f"{REF_ODM}/detections")
    assert len(gts) == 41 and len(dets) == 47
    ours = pascal_voc_metrics(gts, dets, iou_threshold=iou_thr, method=method)
    ref = _vendored_voc(gts, dets, iou_thr, method)
    for cls, r in ref.items():
        assert ours[cls]["AP"] == pytest.approx(r["AP"], abs=1e-9), cls
        assert ours[cls]["total_positives"] == r["npos"]
        assert ours[cls]["total_TP"] == r["TP"]
        assert ours[cls]["total_FP"] == r["FP"]


def test_voc_parity_randomized():
    from caesar_mrcnn_tpu.evalmetrics.voc import BBox, pascal_voc_metrics

    rng = np.random.RandomState(7)
    gts, dets = [], []
    classes = ["sidelobe", "source", "galaxy"]
    for img in range(6):
        gb = _random_boxes(rng, 8)
        for b in gb:
            gts.append(BBox(str(img), classes[rng.randint(3)], tuple(float(v) for v in b)))
        db = _random_boxes(rng, 12)
        # jitter half the detections onto GT boxes so TPs exist
        db[:4] = gb[:4] + rng.randint(-3, 4, (4, 4))
        scores = rng.permutation(12) / 12.0 + 0.01
        for b, s in zip(db, scores):
            dets.append(BBox(str(img), classes[rng.randint(3)],
                             tuple(float(v) for v in b), float(s)))
    for method in ("every_point", "eleven_point"):
        ours = pascal_voc_metrics(gts, dets, iou_threshold=0.5, method=method)
        ref = _vendored_voc(gts, dets, 0.5, method)
        for cls, r in ref.items():
            assert ours[cls]["AP"] == pytest.approx(r["AP"], abs=1e-9), (method, cls)


# ------------------------------------------------------- tarlen5 COCO parity


def test_tarlen_parity_on_committed_jsons():
    from caesar_mrcnn_tpu.evalmetrics.coco import get_avg_precision_at_iou

    calc = _load_tarlen_vendored()
    with open(f"{REF_TARLEN}/ground_truth_boxes.json") as f:
        gt = json.load(f)
    with open(f"{REF_TARLEN}/predicted_boxes.json") as f:
        pred = json.load(f)

    for thr in np.arange(0.5, 0.76, 0.05):
        v = calc.get_avg_precision_at_iou(copy.deepcopy(gt), copy.deepcopy(pred), iou_thr=thr)
        m = get_avg_precision_at_iou(copy.deepcopy(gt), copy.deepcopy(pred), iou_thr=thr)
        assert m["avg_prec"] == pytest.approx(v["avg_prec"], abs=1e-12), thr
        np.testing.assert_allclose(m["precisions"], v["precisions"], atol=1e-12)
        np.testing.assert_allclose(m["recalls"], v["recalls"], atol=1e-12)

    for cls in ("galaxy", "source", "sidelobe"):
        gts_c, preds_c = calc.split_boxes_by_class(copy.deepcopy(gt), copy.deepcopy(pred), cls)
        v = calc.get_avg_precision_at_iou(copy.deepcopy(gts_c), copy.deepcopy(preds_c), iou_thr=0.5)
        m = get_avg_precision_at_iou(copy.deepcopy(gts_c), copy.deepcopy(preds_c), iou_thr=0.5)
        assert m["avg_prec"] == pytest.approx(v["avg_prec"], abs=1e-12), cls


def test_tarlen_parity_randomized():
    from caesar_mrcnn_tpu.evalmetrics.coco import get_avg_precision_at_iou

    calc = _load_tarlen_vendored()
    rng = np.random.RandomState(3)
    gt, pred = {}, {}
    for img in range(5):
        gb = _random_boxes(rng, 6)
        gt[str(img)] = {"boxes": gb.tolist(), "class": ["source"] * 6}
        db = _random_boxes(rng, 9)
        db[:3] = gb[:3] + rng.randint(-2, 3, (3, 4))
        scores = (rng.permutation(9) / 9.0 + 0.05).round(3)
        pred[str(img)] = {"boxes": db.tolist(), "scores": scores.tolist(),
                          "class": ["source"] * 9}
    for thr in (0.4, 0.5, 0.65):
        v = calc.get_avg_precision_at_iou(copy.deepcopy(gt), copy.deepcopy(pred), iou_thr=thr)
        m = get_avg_precision_at_iou(copy.deepcopy(gt), copy.deepcopy(pred), iou_thr=thr)
        assert m["avg_prec"] == pytest.approx(v["avg_prec"], abs=1e-12), thr
