"""Box math: numpy oracles vs brute force, and jax twins vs numpy."""

import jax.numpy as jnp
import numpy as np

from caesar_mrcnn_tpu.utils import boxes as B


def _random_boxes(rng, n, size=100):
    y1 = rng.uniform(0, size, n)
    x1 = rng.uniform(0, size, n)
    h = rng.uniform(1, size / 2, n)
    w = rng.uniform(1, size / 2, n)
    return np.stack([y1, x1, y1 + h, x1 + w], axis=1)


def test_extract_bboxes(rng):
    mask = np.zeros((32, 32, 3), dtype=bool)
    mask[4:10, 6:20, 0] = True
    mask[0:1, 0:1, 1] = True
    # channel 2 empty
    out = B.extract_bboxes(mask)
    assert out.tolist() == [[4, 6, 10, 20], [0, 0, 1, 1], [0, 0, 0, 0]]


def test_iou_brute_force(rng):
    b1 = _random_boxes(rng, 17)
    b2 = _random_boxes(rng, 11)
    iou = B.compute_overlaps(b1, b2)
    for i in range(len(b1)):
        for j in range(len(b2)):
            y1 = max(b1[i, 0], b2[j, 0])
            x1 = max(b1[i, 1], b2[j, 1])
            y2 = min(b1[i, 2], b2[j, 2])
            x2 = min(b1[i, 3], b2[j, 3])
            inter = max(y2 - y1, 0) * max(x2 - x1, 0)
            a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
            a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
            expected = inter / (a1 + a2 - inter)
            assert abs(iou[i, j] - expected) < 1e-9


def test_overlaps_jax_matches_numpy(rng):
    b1 = _random_boxes(rng, 33).astype(np.float32)
    b2 = _random_boxes(rng, 21).astype(np.float32)
    np_iou = B.compute_overlaps(b1, b2)
    jx_iou = np.asarray(B.overlaps_jax(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(np_iou, jx_iou, atol=1e-5)


def test_apply_deltas_roundtrip(rng):
    boxes = _random_boxes(rng, 25).astype(np.float32)
    gt = _random_boxes(rng, 25).astype(np.float32)
    deltas = B.box_refinement(boxes, gt)
    recovered = B.apply_box_deltas(boxes, deltas)
    np.testing.assert_allclose(recovered, gt, atol=1e-3)
    # jax twins agree
    jd = np.asarray(B.box_refinement_jax(jnp.asarray(boxes), jnp.asarray(gt)))
    np.testing.assert_allclose(jd, deltas, atol=1e-4)
    jr = np.asarray(B.apply_box_deltas_jax(jnp.asarray(boxes), jnp.asarray(deltas)))
    np.testing.assert_allclose(jr, recovered, atol=1e-3)


def test_norm_denorm_roundtrip(rng):
    boxes = np.array([[0, 0, 128, 128], [10, 20, 30, 40]], dtype=np.float32)
    norm = B.norm_boxes(boxes, (128, 128))
    denorm = B.denorm_boxes(norm, (128, 128))
    np.testing.assert_array_equal(denorm, boxes.astype(np.int32))
    jn = np.asarray(B.norm_boxes_jax(jnp.asarray(boxes), (128, 128)))
    np.testing.assert_allclose(jn, norm, atol=1e-6)


def test_clip_boxes():
    boxes = jnp.array([[-0.5, 0.2, 0.7, 1.5], [0.1, 0.1, 0.4, 0.4]], dtype=jnp.float32)
    window = jnp.array([0.0, 0.0, 1.0, 1.0])
    out = np.asarray(B.clip_boxes_jax(boxes, window))
    np.testing.assert_allclose(out, [[0.0, 0.2, 0.7, 1.0], [0.1, 0.1, 0.4, 0.4]], atol=1e-6)


def test_nms_oracle_simple():
    boxes = np.array(
        [[0, 0, 10, 10], [0, 0, 10, 10.1], [20, 20, 30, 30]], dtype=np.float32
    )
    scores = np.array([0.9, 0.8, 0.7])
    keep = B.non_max_suppression(boxes, scores, 0.5)
    assert keep.tolist() == [0, 2]


def test_trim_zeros():
    x = np.array([[1, 2], [0, 0], [3, 4], [0, 0]])
    np.testing.assert_array_equal(B.trim_zeros(x), [[1, 2], [3, 4]])
