"""Pallas ROIAlign kernels vs the gather oracle (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from caesar_mrcnn_tpu.ops.roi_align import multilevel_roi_align


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    import caesar_mrcnn_tpu.ops.roi_align_pallas as rap

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(rap.pl, "pallas_call", patched)
    return rap


def _data():
    rng = np.random.RandomState(7)
    feats = [
        jnp.asarray(rng.randn(128 // (2 ** i), 128 // (2 ** i), 32).astype(np.float32))
        for i in range(4)
    ]
    boxes = np.array(
        [
            [0.1, 0.1, 0.14, 0.15],
            [0.0, 0.0, 1.0, 1.0],
            [0.5, 0.5, 0.52, 0.53],
            [0.3, 0.4, 0.33, 0.47],
            [0.0, 0.0, 0.0, 0.0],
        ],
        dtype=np.float32,
    )
    return feats, boxes


def test_dma_kernel_matches_gather(interpret_pallas):
    feats, boxes = _data()
    ref = np.asarray(multilevel_roi_align(feats, boxes, (512, 512), 7))
    out = np.asarray(
        interpret_pallas.multilevel_roi_align_pallas(
            feats, jnp.asarray(boxes), (512, 512), 7
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_vmem_kernel_matches_gather(interpret_pallas):
    feats, boxes = _data()
    ref = np.asarray(multilevel_roi_align(feats, boxes, (512, 512), 7))
    out = np.asarray(
        interpret_pallas.multilevel_roi_align_vmem(
            feats, jnp.asarray(boxes), (512, 512), 7, boxes_per_step=4
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_level_bump_only_on_degenerate_aspect(interpret_pallas):
    """The footprint rule only deviates from the FPN area rule for
    pathologically elongated boxes."""
    from caesar_mrcnn_tpu.ops.roi_align import roi_levels
    from caesar_mrcnn_tpu.ops.roi_align_pallas import _assign_levels, BLOCK_H

    shapes = np.array([[128, 128], [64, 64], [32, 32], [16, 16]], np.int32)
    boxes = jnp.asarray(
        np.array(
            [
                [0.1, 0.1, 0.15, 0.15],   # normal small
                [0.2, 0.2, 0.9, 0.85],    # normal large
                [0.0, 0.45, 1.0, 0.47],   # degenerate: full-height sliver
            ],
            dtype=np.float32,
        )
    )
    area = np.asarray(roi_levels(boxes, 512.0 * 512.0, 4))
    safe = np.asarray(_assign_levels(boxes, (512, 512), shapes, BLOCK_H - 2))
    assert (safe[:2] == area[:2]).all()
    assert safe[2] >= area[2]  # bumped coarser
