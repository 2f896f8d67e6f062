"""Analyzer post-processing pipeline + GT matching on synthetic masks."""

import numpy as np
import pytest

from caesar_mrcnn_tpu.analysis import masks as M
from caesar_mrcnn_tpu.analysis.analyzer import Analyzer
from caesar_mrcnn_tpu.analysis.gt_eval import evaluate_image, extract_gt_masks
from caesar_mrcnn_tpu.config import detector_config

CLASS_NAMES = ("bkg", "sidelobe", "source", "galaxy")


def _mk_analyzer():
    cfg = detector_config(
        num_classes=4, class_names=CLASS_NAMES, score_thr=0.5, iou_thr=0.6
    )
    return Analyzer(detector=None, config=cfg)


def _mask(h, w, y1, x1, y2, x2):
    m = np.zeros((h, w), dtype=np.uint8)
    m[y1:y2, x1:x2] = 1
    return m


def test_mask_ops():
    m1 = _mask(32, 32, 2, 2, 10, 10)
    m2 = _mask(32, 32, 9, 9, 16, 16)   # touches m1
    m3 = _mask(32, 32, 25, 25, 30, 30)  # far away
    assert M.are_masks_connected(m1, m2)
    assert not M.are_masks_connected(m1, m3)
    assert M.mask_iou(m1, m1) == 1.0
    assert M.mask_iou(m1, m3) == 0.0
    comps = M.split_mask_components(M.merge_masks(m1, m3))
    assert len(comps) == 2
    contours = M.find_contours_xy(m1)
    assert len(contours) == 1


def test_extract_det_masks_threshold_and_split():
    an = _mk_analyzer()
    h = w = 64
    # obj A: two disconnected blobs in one mask (class source -> split)
    mask_a = np.zeros((h, w), np.uint8)
    mask_a[2:8, 2:8] = 1
    mask_a[30:40, 30:40] = 1
    # obj B: below score threshold
    mask_b = _mask(h, w, 50, 50, 60, 60)
    masks = np.stack([mask_a, mask_b], axis=-1)
    class_ids = np.array([2, 2])
    scores = np.array([0.9, 0.1])
    an.extract_det_masks(masks, class_ids, scores)
    assert len(an.masks_final) == 2  # split into 2 components; B dropped
    assert all(c == 2 for c in an.class_ids_final)
    assert all(s == pytest.approx(0.9) for s in an.scores_final)


def test_extract_det_masks_merge_same_class():
    an = _mk_analyzer()
    an.split_masks = False
    h = w = 64
    m1 = _mask(h, w, 10, 10, 20, 20)
    m2 = _mask(h, w, 10, 12, 20, 22)  # heavy overlap, same class
    masks = np.stack([m1, m2], axis=-1)
    an.extract_det_masks(masks, np.array([2, 2]), np.array([0.8, 0.6]))
    assert len(an.masks_final) == 1
    assert an.scores_final[0] == pytest.approx(0.7)
    assert an.masks_final[0].sum() == np.logical_or(m1, m2).sum()


def test_extract_det_masks_best_overlap_cross_class():
    an = _mk_analyzer()
    an.split_masks = False
    h = w = 64
    m1 = _mask(h, w, 10, 10, 20, 20)          # galaxy, score 0.9
    m2 = _mask(h, w, 12, 12, 22, 22)          # source, score 0.6 overlapping
    masks = np.stack([m1, m2], axis=-1)
    an.extract_det_masks(masks, np.array([3, 2]), np.array([0.9, 0.6]))
    assert len(an.masks_final) == 1
    assert an.class_ids_final[0] == 3  # higher score wins


def test_spurious_exception_keeps_both():
    an = _mk_analyzer()
    an.split_masks = False
    h = w = 64
    # sidelobe touching a source with tiny IoU -> kept separate
    m1 = _mask(h, w, 10, 10, 20, 20)
    m2 = _mask(h, w, 20, 10, 40, 40)  # touches at edge, IoU ~ 0
    masks = np.stack([m1, m2], axis=-1)
    an.extract_det_masks(masks, np.array([1, 2]), np.array([0.9, 0.8]))
    assert len(an.masks_final) == 2


def test_gt_merge_and_image_eval():
    h = w = 64
    g1 = _mask(h, w, 10, 10, 20, 20)
    g2 = _mask(h, w, 19, 10, 30, 20)  # touches g1, same class -> merged
    g3 = _mask(h, w, 40, 40, 50, 50)
    gt = np.stack([g1, g2, g3], axis=-1).astype(bool)
    gt_ids = np.array([2, 2, 3])
    masks, ids, members = extract_gt_masks(gt, gt_ids)
    assert len(masks) == 2
    assert sorted(ids) == [2, 3]

    # detection identical to merged GT
    ev = evaluate_image(masks, ids, masks, ids, [0.9, 0.8], CLASS_NAMES, iou_thr=0.6)
    assert ev.confusion_matrix[2, 2] == 1
    assert ev.confusion_matrix[3, 3] == 1
    assert all(ev.is_gt_obj_detected)
    assert all(ev.is_det_obj_matching_to_gt_obj)
    assert (ev.nobjs_det_right == ev.nobjs_true).all()

    # misclassified detection
    ev2 = evaluate_image(masks, ids, masks, [3, 2], [0.9, 0.8], CLASS_NAMES, iou_thr=0.6)
    assert ev2.confusion_matrix[2, 3] == 1
    assert ev2.confusion_matrix[3, 2] == 1
    assert ev2.nobjs_det_right.sum() == 0


def test_json_results_and_regions(tmp_path):
    an = _mk_analyzer()
    an.image = np.zeros((64, 64, 3), np.uint8)
    an.masks_final = [_mask(64, 64, 10, 10, 20, 20)]
    an.class_ids_final = [2]
    an.class_names_final = ["source"]
    an.scores_final = [0.9]
    an.bboxes = [np.array([10, 10, 20, 20])]
    an.obj_pars = []
    res = an.make_json_results()
    assert len(res["objs"]) == 1
    obj = res["objs"][0]
    assert obj["class_name"] == "source"
    assert not obj["edge"]
    assert len(obj["pixels"]) == 100
    assert len(obj["vertexes"]) >= 1
    out = str(tmp_path / "r.reg")
    an.results = res
    an.write_regions(out)
    content = open(out).read()
    assert "polygon(" in content and "tag={source}" in content


def test_per_class_score_threshold():
    """config.score_thr_per_class overrides the global threshold for the
    named class only (the sidelobe F1-knee operating point; reference has
    a single global threshold, mrcnn/analyze.py:1744)."""
    cfg = detector_config(
        num_classes=4, class_names=CLASS_NAMES, score_thr=0.5,
        score_thr_per_class=(("sidelobe", 0.9),),
    )
    assert cfg.class_score_thr("sidelobe") == 0.9
    assert cfg.class_score_thr("source") == 0.5
    an = Analyzer(detector=None, config=cfg)
    h = w = 64
    masks = np.stack(
        [_mask(h, w, 2, 2, 10, 10), _mask(h, w, 30, 30, 40, 40),
         _mask(h, w, 50, 50, 60, 60)], axis=-1,
    )
    # sidelobe at 0.8 (below its 0.9 knee -> dropped), sidelobe at 0.95
    # (kept), source at 0.6 (above the 0.5 global -> kept)
    an.extract_det_masks(masks, np.array([1, 1, 2]), np.array([0.8, 0.95, 0.6]))
    kept = sorted(zip(an.class_ids_final, an.scores_final))
    assert kept == [(1, pytest.approx(0.95)), (2, pytest.approx(0.6))]
    # empty override tuple restores the single global threshold
    cfg2 = detector_config(
        num_classes=4, class_names=CLASS_NAMES, score_thr=0.5,
        score_thr_per_class=(),
    )
    an2 = Analyzer(detector=None, config=cfg2)
    an2.extract_det_masks(masks, np.array([1, 1, 2]), np.array([0.8, 0.95, 0.6]))
    assert len(an2.masks_final) == 3
