"""refine_detections vs a numpy per-class oracle (reference semantics:
mrcnn/model.py:770-865)."""

import numpy as np
import pytest

from caesar_mrcnn_tpu.models.detection import refine_detections_single
from caesar_mrcnn_tpu.utils import boxes as B

STD = np.array([0.1, 0.1, 0.2, 0.2], np.float32)


def oracle_refine(rois, probs, deltas, window, num_classes, max_instances,
                  min_confidence, nms_threshold):
    class_ids = probs.argmax(1)
    scores = probs[np.arange(len(probs)), class_ids]
    d = deltas[np.arange(len(probs)), class_ids] * STD
    refined = B.apply_box_deltas(rois, d)
    refined = np.clip(refined, [window[0], window[1], window[0], window[1]],
                      [window[2], window[3], window[2], window[3]])
    valid = (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]) > 0
    keep = valid & (class_ids > 0)
    if min_confidence:
        keep &= scores >= min_confidence
    kept = np.zeros(len(rois), bool)
    for cls in range(1, num_classes):
        ix = np.where(keep & (class_ids == cls))[0]
        if ix.size == 0:
            continue
        sel = B.non_max_suppression(refined[ix], scores[ix], nms_threshold)
        kept[ix[sel[:max_instances]]] = True
    idx = np.where(kept)[0]
    idx = idx[np.argsort(-scores[idx], kind="stable")][:max_instances]
    out = np.zeros((max_instances, 6), np.float32)
    for row, i in enumerate(idx):
        out[row] = [*refined[i], class_ids[i], scores[i]]
    return out


def test_roi0_isolated_keep_survives_padding_scatter():
    """Regression: padded NMS slots return idx=0 with valid=False; a
    last-write-wins scatter of `valid` would overwrite roi 0's genuine keep.
    Here roi 0 is an isolated high-score detection and most slots are padding."""
    r, c = 16, 4
    rois = np.zeros((r, 4), np.float32)
    rois[0] = [0.1, 0.1, 0.3, 0.3]   # isolated valid roi
    rois[1] = [0.6, 0.6, 0.8, 0.8]   # second isolated roi, lower score
    probs = np.zeros((r, c), np.float32)
    probs[:, 0] = 1.0                # padding rows -> background
    probs[0] = [0.05, 0.9, 0.03, 0.02]
    probs[1] = [0.1, 0.7, 0.1, 0.1]
    deltas = np.zeros((r, c, 4), np.float32)
    window = np.array([0.0, 0.0, 1.0, 1.0], np.float32)

    got = np.asarray(
        refine_detections_single(
            rois, probs, deltas, window, STD,
            num_classes=c, max_instances=8,
            min_confidence=0.5, nms_threshold=0.3,
        )
    )
    kept_classes = got[got[:, 4] > 0]
    assert len(kept_classes) == 2, f"expected both rois kept, got\n{got}"
    np.testing.assert_allclose(kept_classes[0, :4], rois[0], atol=1e-5)
    assert kept_classes[0, 5] == pytest.approx(0.9)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_refine_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    r, c = 80, 4
    rois = rng.uniform(0, 0.8, (r, 4)).astype(np.float32)
    rois = np.stack([
        rois[:, 0], rois[:, 1],
        np.minimum(rois[:, 0] + rng.uniform(0.02, 0.3, r), 1.0),
        np.minimum(rois[:, 1] + rng.uniform(0.02, 0.3, r), 1.0),
    ], axis=1).astype(np.float32)
    rois[-5:] = 0  # zero padding
    logits = rng.randn(r, c).astype(np.float32) * 2
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    deltas = rng.randn(r, c, 4).astype(np.float32) * 0.1
    window = np.array([0.0, 0.0, 1.0, 1.0], np.float32)

    for min_conf, nms_thr in [(0.0, 0.3), (0.5, 0.3), (0.0, 0.7)]:
        got = np.asarray(
            refine_detections_single(
                rois, probs, deltas, window, STD,
                num_classes=c, max_instances=16,
                min_confidence=min_conf, nms_threshold=nms_thr,
            )
        )
        exp = oracle_refine(rois, probs, deltas, window, c, 16, min_conf, nms_thr)
        np.testing.assert_allclose(got[:, 4:], exp[:, 4:], atol=1e-5,
                                   err_msg=f"conf={min_conf} nms={nms_thr}")
        np.testing.assert_allclose(got[:, :4], exp[:, :4], atol=1e-5)
