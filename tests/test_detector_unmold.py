"""Detector molding/unmolding window math (no model involved)."""

import numpy as np
import pytest

from caesar_mrcnn_tpu.config import detector_config, inference_config
from caesar_mrcnn_tpu.inference.detector import Detector
from caesar_mrcnn_tpu.utils import boxes as B


@pytest.fixture()
def det():
    cfg = inference_config(
        detector_config(
            num_classes=4, class_names=("bkg", "sidelobe", "source", "galaxy"),
            image_min_dim=256, image_max_dim=256,
        )
    )
    return Detector(cfg, model=None, variables=None)


def test_mold_square_resize(det):
    """132^2 uint8 image -> 256^2 molded with centered window
    (reference: mrcnn/model.py:2519-2556)."""
    img = np.full((132, 132, 3), 128, np.uint8)
    molded, metas, windows = det.mold_inputs([img])
    assert molded.shape == (1, 256, 256, 3)
    y1, x1, y2, x2 = windows[0]
    assert y2 - y1 == 256 and x2 - x1 == 256  # scaled up to full frame
    meta = metas[0]
    assert meta[1:4].tolist() == [132, 132, 3]
    assert meta[4:7].tolist() == [256, 256, 3]
    assert abs(meta[11] - 256 / 132) < 1e-6  # scale


def test_mold_window_padding(det):
    """Non-square image gets centered zero padding."""
    img = np.full((128, 256, 3), 50, np.uint8)
    molded, metas, windows = det.mold_inputs([img])
    y1, x1, y2, x2 = windows[0]
    assert (y1, x1, y2, x2) == (64, 0, 192, 256)
    # padding regions are zero (minus mean_pixel=0)
    assert molded[0, :64].max() == 0
    assert molded[0, 64:192].max() > 0


def test_unmold_detections_roundtrip(det):
    """Normalized detections on the molded frame map back to original
    pixels (reference: mrcnn/model.py:2558-2621)."""
    original_shape = (132, 132, 3)
    image_shape = (256, 256, 3)
    window = (0, 0, 256, 256)
    # a box at original pixels (33, 33, 66, 66) -> scaled by 256/132 in the
    # molded frame -> normalized
    scale = 256 / 132
    box_molded = np.array([33, 33, 66, 66], np.float64) * scale
    norm = B.norm_boxes(box_molded[None], (256, 256))[0]
    detections = np.zeros((10, 6), np.float32)
    detections[0, :4] = norm
    detections[0, 4] = 2      # class
    detections[0, 5] = 0.9
    masks = np.random.RandomState(0).rand(10, 28, 28).astype(np.float32)
    boxes, class_ids, scores, full_masks = det.unmold_detections(
        detections, masks, original_shape, image_shape, window
    )
    assert len(class_ids) == 1
    assert class_ids[0] == 2
    np.testing.assert_allclose(boxes[0], [33, 33, 66, 66], atol=1.0)
    assert full_masks.shape == (132, 132, 1)


def test_unmold_drops_padding_and_zero_area(det):
    detections = np.zeros((5, 6), np.float32)  # all padding (class 0)
    masks = np.zeros((5, 28, 28), np.float32)
    boxes, class_ids, scores, full_masks = det.unmold_detections(
        detections, masks, (132, 132, 3), (256, 256, 3), (0, 0, 256, 256)
    )
    assert len(class_ids) == 0
    assert full_masks.shape == (132, 132, 0)


def _tiny_fits_dataset():
    from caesar_mrcnn_tpu.data.dataset import SourceDataset
    from caesar_mrcnn_tpu.utils import fits as F
    import tempfile

    tmp = tempfile.mkdtemp()
    ds = SourceDataset()
    ds.set_class_dict({"sidelobe": 1, "source": 2, "galaxy": 3})
    rng = np.random.RandomState(0)
    rows = []
    for i in range(2):
        img = rng.rand(64, 64).astype(np.float32)
        mask = np.zeros((64, 64), np.float32)
        mask[20:40, 20:40] = 1
        F.write_fits(img, f"{tmp}/i{i}.fits")
        F.write_fits(mask, f"{tmp}/m{i}.fits")
        rows.append(f"{tmp}/i{i}.fits,{tmp}/m{i}.fits,source")
    with open(f"{tmp}/l.dat", "w") as f:
        f.write("\n".join(rows))
    ds.load_data_from_list(f"{tmp}/l.dat")
    ds.prepare()
    return ds


def test_prefetch_pipeline():
    """Threaded prefetch yields the same shapes as the sync iterator."""
    from caesar_mrcnn_tpu.data.generator import TrainingPipeline

    ds = _tiny_fits_dataset()
    cfg = detector_config(
        image_min_dim=64, image_max_dim=64, num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        images_per_device=2, rpn_anchor_scales=(8, 16, 32, 64, 128),
        max_gt_instances=4, use_mini_mask=True, mini_mask_shape=(28, 28),
    )
    pipe = TrainingPipeline(ds, cfg, seed=0)
    it = pipe.prefetch(device_put=False)
    b1 = next(it)
    b2 = next(it)
    # Default train_wire="compact" + replicated-gray dataset -> mono wire:
    # images ship one channel; trainer.mold_batch broadcasts back to 3.
    assert b1["images"].shape == (2, 64, 64, 1)
    assert set(b1) == set(b2)


def test_compact_wire_contract():
    """Pin the compact-wire batch schema explicitly (config.train_wire).

    Any change to the wire format must update this test AND every dense-
    batch consumer (trainer.mold_batch, bench_train.py, examples/,
    __graft_entry__.dryrun_multichip)."""
    import jax.numpy as jnp
    from caesar_mrcnn_tpu.data.generator import TrainingPipeline
    from caesar_mrcnn_tpu.train.trainer import mold_batch

    cfg = detector_config(
        image_min_dim=64, image_max_dim=64, num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        images_per_device=2, rpn_anchor_scales=(8, 16, 32, 64, 128),
        max_gt_instances=4, use_mini_mask=True, mini_mask_shape=(28, 28),
    )
    ds = _tiny_fits_dataset()
    pipe = TrainingPipeline(ds, cfg, seed=0)
    batch = next(pipe.batches())
    budget = cfg.rpn_train_anchors_per_image
    g = cfg.max_gt_instances
    expected = {
        "images": ((2, 64, 64, 1), np.uint8),
        "image_meta": ((2, cfg.image_meta_size), np.float32),
        "rpn_pos_idx": ((2, budget // 2), np.int32),
        "rpn_neg_idx": ((2, budget), np.int32),
        "rpn_pos_deltas": ((2, budget // 2, 4), np.float32),
        "gt_class_ids": ((2, g), np.int32),
        "gt_boxes": ((2, g, 4), np.float32),
        "gt_masks_packed": ((2, (28 * 28 * g + 7) // 8), np.uint8),
    }
    assert set(batch) == set(expected), (set(batch), set(expected))
    for k, (shape, dtype) in expected.items():
        assert batch[k].shape == shape, (k, batch[k].shape, shape)
        assert batch[k].dtype == dtype, (k, batch[k].dtype, dtype)
    # mold_batch restores the dense training contract on device
    molded = mold_batch({k: jnp.asarray(v) for k, v in batch.items()}, cfg)
    assert molded["images"].shape == (2, 64, 64, 3)
    assert molded["images"].dtype == jnp.float32
    assert molded["rpn_match"].shape[0] == 2
    assert molded["rpn_deltas"].shape[-1] == 4
    assert molded["gt_masks"].shape == (2, 28, 28, g)[:1] + (28, 28, g)
