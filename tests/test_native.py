"""Native C++ fastops vs numpy references (skipped if no compiler)."""

import numpy as np
import pytest

from caesar_mrcnn_tpu import native as N
from caesar_mrcnn_tpu.analysis import masks as M
from caesar_mrcnn_tpu.utils.boxes import compute_overlaps
from caesar_mrcnn_tpu.utils.zscale import zscale_limits as np_zscale_limits

pytestmark = pytest.mark.skipif(not N.available(), reason="libfastops not built")


def test_native_iou_matrix():
    rng = np.random.RandomState(0)
    b1 = rng.rand(40, 4).astype(np.float32)
    b1[:, 2:] += b1[:, :2]
    b2 = rng.rand(25, 4).astype(np.float32)
    b2[:, 2:] += b2[:, :2]
    np.testing.assert_allclose(N.iou_matrix(b1, b2), compute_overlaps(b1, b2), atol=1e-6)


def test_native_zscale_matches_numpy():
    rng = np.random.RandomState(1)
    data = rng.normal(3.0, 1.5, (300, 300))
    v_native = N.zscale_limits(data)
    v_numpy = np_zscale_limits(data)
    assert abs(v_native[0] - v_numpy[0]) < 1e-3
    assert abs(v_native[1] - v_numpy[1]) < 1e-3


def test_native_stretch_to_u8():
    data = np.linspace(-1.0, 2.0, 100).astype(np.float32)
    out = N.stretch_to_u8(data, 0.0, 1.0)
    assert out.dtype == np.uint8
    assert out[0] == 0 and out[-1] == 255
    mid = np.argmin(np.abs(data - 0.5))
    expected = int(round(np.clip(data[mid], 0, 1) * 255))
    assert abs(int(out[mid]) - expected) <= 1


def test_native_mask_ops():
    m1 = np.zeros((24, 24), np.uint8)
    m1[2:8, 2:8] = 1
    m2 = np.zeros((24, 24), np.uint8)
    m2[8:12, 2:8] = 1  # touches m1 (8-adjacency)
    m3 = np.zeros((24, 24), np.uint8)
    m3[15:20, 15:20] = 1
    assert N.masks_connected(m1, m2)
    assert not N.masks_connected(m1, m3)
    assert N.mask_iou(m1, m1) == 1.0
    assert N.mask_iou(m1, m3) == 0.0
    # agree with the python implementation
    assert N.masks_connected(m1, m2) == M.are_masks_connected(m1, m2)


def test_native_rpn_anchor_stats_matches_oracle():
    """Single-pass kernel vs the iou_matrix + numpy argmax/max/tie path."""
    rng = np.random.RandomState(3)
    anchors = rng.rand(900, 4) * 200
    anchors[:, 2:] = anchors[:, :2] + rng.rand(900, 2) * 60 + 1
    for g in (1, 2, 7, 33):
        gt = rng.rand(g, 4).astype(np.float32) * 150
        gt[:, 2:] = gt[:, :2] + rng.rand(g, 2).astype(np.float32) * 50 + 2
        ov = N.iou_matrix(anchors, gt)
        amax, aarg, tie = N.rpn_anchor_stats(anchors, gt)
        assert amax.dtype == np.float32 and aarg.dtype == np.int32
        np.testing.assert_allclose(amax, ov.max(axis=1), atol=1e-6)
        # f32 vs f64 argmax can differ only on near-exact ties
        diff = aarg != np.argmax(ov, axis=1)
        if diff.any():
            np.testing.assert_allclose(
                ov[np.arange(len(ov)), aarg][diff], ov.max(axis=1)[diff], atol=1e-6
            )
        gmax = ov.max(axis=0)
        tie_ref = ((ov == gmax) & (gmax > 0)).any(axis=1)
        # tie sets agree except anchors within f32 rounding of the column max
        mism = np.flatnonzero(tie != tie_ref)
        for i in mism:
            assert np.any(np.abs(ov[i] - gmax) < 1e-6)
        # every GT with any overlap keeps at least one tied (best) anchor
        cover = np.zeros(g, bool)
        for j in range(g):
            cover[j] = (gmax[j] == 0) or np.any(tie & (np.abs(ov[:, j] - gmax[j]) < 1e-6))
        assert cover.all()


def test_native_rpn_anchor_stats_empty_gt():
    anchors = np.array([[0, 0, 4, 4], [2, 2, 8, 8]], np.float32)
    amax, aarg, tie = N.rpn_anchor_stats(anchors, np.zeros((0, 4), np.float32))
    assert (amax == 0).all() and (aarg == 0).all() and (~tie).all()
