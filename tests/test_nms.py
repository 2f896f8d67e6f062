"""Tiled static-shape NMS vs the greedy numpy oracle."""

import numpy as np
import pytest

from caesar_mrcnn_tpu.ops.nms import nms_boxes_padded, nms_padded, nms_padded_global
from caesar_mrcnn_tpu.utils.boxes import non_max_suppression


def _random_boxes(rng, n, size=1.0):
    y1 = rng.uniform(0, size * 0.8, n)
    x1 = rng.uniform(0, size * 0.8, n)
    h = rng.uniform(0.01, size * 0.4, n)
    w = rng.uniform(0.01, size * 0.4, n)
    return np.stack([y1, x1, np.minimum(y1 + h, size), np.minimum(x1 + w, size)], axis=1).astype(
        np.float32
    )


@pytest.mark.parametrize("n,thr", [(10, 0.5), (100, 0.5), (300, 0.3), (777, 0.7), (1500, 0.5)])
def test_nms_matches_oracle(n, thr):
    rng = np.random.RandomState(n)
    boxes = _random_boxes(rng, n)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    expected = non_max_suppression(boxes, scores, thr)
    max_out = min(n, 200)
    idx, valid = nms_padded(boxes, scores, max_out, thr)
    idx, valid = np.asarray(idx), np.asarray(valid)
    got = idx[valid]
    exp = expected[:max_out]
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("n,thr", [(10, 0.5), (300, 0.3), (777, 0.7), (1500, 0.5)])
def test_global_nms_matches_oracle(n, thr):
    rng = np.random.RandomState(n + 1)
    boxes = _random_boxes(rng, n)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    expected = non_max_suppression(boxes, scores, thr)
    max_out = min(n, 200)
    idx, valid = nms_padded_global(boxes, scores, max_out, thr)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, expected[:max_out])


def test_global_nms_invalid_entries():
    boxes = np.array(
        [[0, 0, 0.5, 0.5], [0.5, 0.5, 1, 1], [0, 0, 0.5, 0.5]], dtype=np.float32
    )
    scores = np.array([0.9, -np.inf, 0.8], dtype=np.float32)
    idx, valid = nms_padded_global(boxes, scores, 3, 0.5)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, [0])


def test_nms_heavy_overlap():
    # many near-identical boxes -> exactly one survivor per cluster
    rng = np.random.RandomState(0)
    base = np.array([[0.1, 0.1, 0.3, 0.3], [0.6, 0.6, 0.9, 0.9]], dtype=np.float32)
    boxes = np.concatenate([base + rng.uniform(-0.005, 0.005, (2, 4)).astype(np.float32) for _ in range(100)])
    scores = rng.uniform(0.1, 1.0, 200).astype(np.float32)
    expected = non_max_suppression(boxes, scores, 0.5)
    idx, valid = nms_padded(boxes, scores, 50, 0.5)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, expected[:50])
    assert len(got) == 2


def test_nms_invalid_entries_excluded():
    boxes = np.array(
        [[0, 0, 0.5, 0.5], [0.5, 0.5, 1, 1], [0, 0, 0.5, 0.5]], dtype=np.float32
    )
    scores = np.array([0.9, -np.inf, 0.8], dtype=np.float32)
    idx, valid = nms_padded(boxes, scores, 3, 0.5)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, [0])  # 1 invalid, 2 suppressed by 0


def test_nms_padding_shape():
    boxes = np.array([[0, 0, 0.5, 0.5]], dtype=np.float32)
    scores = np.array([0.9], dtype=np.float32)
    out_boxes, out_scores, valid = nms_boxes_padded(boxes, scores, 10, 0.5)
    assert out_boxes.shape == (10, 4)
    assert np.asarray(valid).sum() == 1
    np.testing.assert_allclose(np.asarray(out_boxes)[0], boxes[0])
    np.testing.assert_allclose(np.asarray(out_boxes)[1:], 0.0)


@pytest.mark.parametrize("n,thr", [(10, 0.5), (300, 0.3), (777, 0.7), (1500, 0.5)])
def test_unrolled_nms_matches_oracle(n, thr):
    from caesar_mrcnn_tpu.ops.nms import nms_padded_seq_unrolled

    rng = np.random.RandomState(n + 1)
    boxes = _random_boxes(rng, n)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    expected = non_max_suppression(boxes, scores, thr)
    max_out = min(n, 200)
    idx, valid = nms_padded_seq_unrolled(boxes, scores, max_out, thr)
    idx, valid = np.asarray(idx), np.asarray(valid)
    np.testing.assert_array_equal(idx[valid], expected[:max_out])


def test_unrolled_nms_heavy_overlap_and_invalid():
    from caesar_mrcnn_tpu.ops.nms import nms_padded_seq_unrolled

    # heavy-overlap chains + -inf invalid entries in one go
    rng = np.random.RandomState(7)
    base = _random_boxes(rng, 40)
    boxes = np.concatenate([base + rng.uniform(-0.005, 0.005, (40, 4)) for _ in range(8)])
    scores = rng.uniform(0.01, 1.0, 320).astype(np.float32)
    scores[::13] = -np.inf
    keep = scores > -np.inf
    expected_keep = non_max_suppression(boxes[keep], scores[keep], 0.5)
    orig = np.where(keep)[0]
    idx, valid = nms_padded_seq_unrolled(boxes, scores, 100, 0.5)
    idx, valid = np.asarray(idx), np.asarray(valid)
    np.testing.assert_array_equal(idx[valid], orig[expected_keep][:100])
