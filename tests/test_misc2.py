"""Additional coverage: 4D FITS planes, crowd boxes, class-id remap,
grayscale path."""

import numpy as np
import pytest

from caesar_mrcnn_tpu.utils import fits as F


def _write_4d_fits(path, data4d):
    """Hand-roll a NAXIS=4 FITS ([c, z, y, x] degenerate leading axes)."""
    c, z, ny, nx = data4d.shape
    cards = [
        F._format_card("SIMPLE", True),
        F._format_card("BITPIX", -32),
        F._format_card("NAXIS", 4),
        F._format_card("NAXIS1", nx),
        F._format_card("NAXIS2", ny),
        F._format_card("NAXIS3", z),
        F._format_card("NAXIS4", c),
        "END".ljust(80).encode("ascii"),
    ]
    head = b"".join(cards)
    head += b" " * (-len(head) % 2880)
    body = data4d.astype(">f4").tobytes()
    body += b"\x00" * (-len(body) % 2880)
    with open(path, "wb") as f:
        f.write(head)
        f.write(body)


def test_read_4d_fits_plane(tmp_path):
    """The reference reads plane [0, 0] of 4D cubes
    (reference: mrcnn/utils.py:1060-1062)."""
    rng = np.random.RandomState(0)
    cube = rng.rand(1, 1, 32, 40).astype(np.float32)
    path = str(tmp_path / "cube.fits")
    _write_4d_fits(path, cube)
    data, hdr = F.read_fits_data(path)
    assert hdr["NAXIS"] == 4
    np.testing.assert_array_equal(data, cube[0, 0])
    win, _ = F.read_fits_data(path, xmin=5, xmax=20, ymin=2, ymax=30)
    np.testing.assert_array_equal(win, cube[0, 0, 2:30, 5:20])


def test_rpn_targets_crowd_boxes():
    """Negative class ids = crowd regions: nearby anchors become neutral
    (reference: mrcnn/model.py:1556-1571)."""
    from caesar_mrcnn_tpu.config import detector_config
    from caesar_mrcnn_tpu.models.targets import build_rpn_targets
    from caesar_mrcnn_tpu.utils.anchors import generate_pyramid_anchors

    cfg = detector_config(
        image_min_dim=128, image_max_dim=128,
        rpn_anchor_scales=(8, 16, 32, 64, 128),
        rpn_train_anchors_per_image=64,
    )
    anchors = generate_pyramid_anchors(
        cfg.rpn_anchor_scales, cfg.rpn_anchor_ratios, cfg.backbone_shapes,
        cfg.backbone_strides, cfg.rpn_anchor_stride,
    )
    gt_boxes = np.array([[30, 30, 60, 60], [80, 80, 120, 120]], np.float32)
    gt_ids = np.array([2, -1], np.int32)  # second is crowd
    match, deltas = build_rpn_targets(anchors, gt_ids, gt_boxes, cfg,
                                      np.random.RandomState(0))
    # anchors inside the crowd region must not be negative
    import caesar_mrcnn_tpu.utils.boxes as B

    crowd_iou = B.compute_overlaps(anchors, gt_boxes[1:2]).max(axis=1)
    in_crowd = crowd_iou > 0.3
    assert (match[in_crowd] != -1).all()
    # the real GT still yields positives
    assert (match == 1).sum() >= 1


def test_classid_remap_in_tester(tmp_path, monkeypatch):
    from scipy import ndimage

    from caesar_mrcnn_tpu.analysis.tester import ModelTester
    from caesar_mrcnn_tpu.config import detector_config
    from caesar_mrcnn_tpu.data.dataset import SourceDataset

    class Det:  # always reports class 1
        def detect(self, images, verbose=0):
            out = []
            for img in images:
                chan = img[..., 0].astype(np.float32)
                mask = chan > 0.9 * chan.max()
                labels, n_all = ndimage.label(mask)
                keep = [i + 1 for i in range(n_all) if (labels == i + 1).sum() >= 20]
                masks = (np.stack([(labels == k) for k in keep], -1)
                         if keep else np.zeros(chan.shape + (0,), bool))
                boxes = [[ys.min(), xs.min(), ys.max() + 1, xs.max() + 1]
                         for k in keep for ys, xs in [np.nonzero(labels == k)]]
                out.append({"rois": np.array(boxes, np.int32).reshape(len(keep), 4),
                            "class_ids": np.full(len(keep), 1, np.int32),
                            "scores": np.full(len(keep), 0.9, np.float32),
                            "masks": masks})
            return out

    rng = np.random.RandomState(0)
    img = rng.normal(0, 0.005, (64, 64)).astype(np.float32)
    img[20:40, 20:40] += 8.0
    mask = np.zeros((64, 64), np.float32)
    mask[20:40, 20:40] = 1.0
    F.write_fits(img, str(tmp_path / "i.fits"))
    F.write_fits(mask, str(tmp_path / "m.fits"))
    with open(tmp_path / "l.dat", "w") as f:
        f.write(f"{tmp_path}/i.fits,{tmp_path}/m.fits,source\n")
    ds = SourceDataset()
    ds.set_class_dict({"sidelobe": 1, "source": 2, "galaxy": 3})
    ds.load_data_from_list(str(tmp_path / "l.dat"))
    ds.prepare()
    monkeypatch.chdir(tmp_path)

    cfg = detector_config(num_classes=4,
                          class_names=("bkg", "sidelobe", "source", "galaxy"),
                          score_thr=0.5, iou_thr=0.6)
    t = ModelTester(Det(), cfg, ds)
    t.compute_map = False
    t.classid_remap_dict = {1: 2}  # model's class 1 means GT class 2
    t.test()
    assert t.classification_matrix[2, 2] == 1  # remapped -> correct match


def test_grayscale_dataset_image(tmp_path):
    from caesar_mrcnn_tpu.data.dataset import SourceDataset

    rng = np.random.RandomState(0)
    img = rng.rand(32, 32).astype(np.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[10:20, 10:20] = 1
    F.write_fits(img, str(tmp_path / "i.fits"))
    F.write_fits(mask, str(tmp_path / "m.fits"))
    with open(tmp_path / "l.dat", "w") as f:
        f.write(f"{tmp_path}/i.fits,{tmp_path}/m.fits,source\n")
    ds = SourceDataset()
    ds.set_class_dict({"source": 2})
    ds.convert_to_rgb = False
    ds.convert_to_uint8 = False
    ds.load_data_from_list(str(tmp_path / "l.dat"))
    ds.prepare()
    image = ds.load_image(0)
    assert image.shape == (32, 32, 1)
    assert image.dtype == np.float32
