"""End-to-end detect slice: FITS -> preprocess -> jit forward -> unmold ->
JSON + DS9 + PNG on the bundled reference image (SURVEY.md §7 milestone 4)."""

import json
import os

import jax
import numpy as np
import pytest

from caesar_mrcnn_tpu.analysis.analyzer import Analyzer
from caesar_mrcnn_tpu.config import detector_config, inference_config
from caesar_mrcnn_tpu.inference.detector import Detector
from caesar_mrcnn_tpu.models.mask_rcnn import init_model
from caesar_mrcnn_tpu.utils import fits as F


@pytest.fixture(scope="module")
def detector():
    cfg = detector_config(
        backbone="custom",
        image_min_dim=128,
        image_max_dim=128,
        num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        images_per_device=1,
        pre_nms_limit=256,
        post_nms_rois_inference=64,
        detection_max_instances=16,
        compute_dtype="float32",
        score_thr=0.0,  # random weights: accept anything the NMS leaves
    )
    cfg = inference_config(cfg)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    return Detector(cfg, model, variables)


def test_detect_on_bundled_fits(detector, ref_data_dir, tmp_path):
    image, header = F.read_fits(f"{ref_data_dir}/galaxy0002.fits")
    assert image.shape == (132, 132, 3)

    results = detector.detect([image])
    assert len(results) == 1
    r = results[0]
    n = len(r["class_ids"])
    assert r["rois"].shape == (n, 4)
    assert r["masks"].shape[:2] == image.shape[:2]
    assert r["masks"].shape[2] == n
    # boxes within image bounds
    if n:
        assert (r["rois"][:, [0, 2]] <= image.shape[0]).all()
        assert (r["rois"][:, [0, 1]] >= 0).all()

    # Analyzer end-to-end: post-process + catalog + regions + png
    analyzer = Analyzer(detector, detector.config)
    analyzer.outfile_json = str(tmp_path / "catalog.json")
    analyzer.outfile_ds9 = str(tmp_path / "regions.reg")
    analyzer.outfile_img = str(tmp_path / "overlay.png")
    analyzer.draw = True
    raw, _ = F.read_fits_data(f"{ref_data_dir}/galaxy0002.fits")
    assert analyzer.predict(image, image_id="galaxy0002", header=header, raw_image=raw) == 0

    assert os.path.isfile(analyzer.outfile_json)
    with open(analyzer.outfile_json) as f:
        catalog = json.load(f)
    assert catalog["image_id"] == "galaxy0002"
    assert isinstance(catalog["objs"], list)
    for obj in catalog["objs"]:
        assert set(obj) >= {"name", "x1", "x2", "y1", "y2", "class_id", "class_name",
                            "score", "pixels", "vertexes", "edge"}
    assert os.path.isfile(analyzer.outfile_ds9)
    with open(analyzer.outfile_ds9) as f:
        lines = f.read().splitlines()
    assert lines[0].startswith("# Region file format: DS9")
    assert lines[1] == "image"
    assert os.path.isfile(analyzer.outfile_img)


def test_detect_batch_padding(detector, ref_data_dir):
    """Single image with compiled batch 1 plus second call reuses the jit."""
    img1, _ = F.read_fits(f"{ref_data_dir}/galaxy0002.fits")
    img2, _ = F.read_fits(f"{ref_data_dir}/sidelobe0001.fits")
    r1 = detector.detect([img1])
    r2 = detector.detect([img2])
    assert len(r1) == 1 and len(r2) == 1


def test_detect_tiles_fast_path_matches_detect(detector):
    """The uint8 device-mold tile path (dispatch_tiles/collect) must produce
    the same detections as the generic mold-on-host detect()."""
    rng = np.random.RandomState(3)
    tile = rng.randint(0, 255, (128, 128), np.uint8)
    rgb = np.stack([tile] * 3, axis=-1)

    ref = detector.detect([rgb])[0]
    fast = detector.detect_tiles(tile[None])[0]
    np.testing.assert_allclose(fast["rois"], ref["rois"], atol=1e-5)
    np.testing.assert_array_equal(fast["class_ids"], ref["class_ids"])
    np.testing.assert_allclose(fast["scores"], ref["scores"], rtol=1e-5)
    np.testing.assert_array_equal(fast["masks"], ref["masks"])

    # pipelined handles: dispatch two batches before collecting either
    h1 = detector.dispatch_tiles(tile[None])
    h2 = detector.dispatch_tiles((255 - tile)[None])
    r1 = detector.collect(h1)
    r2 = detector.collect(h2)
    np.testing.assert_allclose(r1[0]["rois"], ref["rois"], atol=1e-5)
    assert len(r2) == 1


def test_dispatch_tiles_raw_matches_u8_path(detector):
    """On-device preprocessing (raw f32 wire + zscale limits) must match
    the host-fused uint8 path: same premolded pixels (up to 1 quantum on
    rounding-boundary pixels), same detections on identical premolds."""
    from caesar_mrcnn_tpu.native import stretch_to_u8
    from caesar_mrcnn_tpu.utils.zscale import zscale_limits

    rng = np.random.RandomState(11)
    raw = rng.normal(0.0, 0.1, (1, 128, 128)).astype(np.float32)
    raw[0, 30:60, 30:60] += 4.0
    raw[0, 5, 5] = np.nan
    vmin, vmax = zscale_limits(np.nan_to_num(raw[0], nan=np.nanmin(raw)), 0.25)
    u8 = stretch_to_u8(np.nan_to_num(raw[0], nan=np.nanmin(raw)), vmin, vmax)

    molded_u8 = np.asarray(detector._premold_fn()(u8[None]))
    molded_raw = np.asarray(
        detector._premold_raw_fn()(
            raw, np.array([vmin], np.float32), np.array([vmax], np.float32)
        )
    )
    diff = np.abs(molded_u8 - molded_raw)
    assert diff.max() <= 1.0
    assert (diff == 0).mean() > 0.99

    # full path executes and unmolds
    res = detector.collect(
        detector.dispatch_tiles_raw(raw, np.array([[vmin, vmax]], np.float32))
    )
    assert len(res) == 1 and "masks" in res[0]


def test_nonsquare_input_graph_compiles_and_detects():
    """The detect graph compiles for a rectangular input (rect-tile fast
    path) — anchors/FPN/meta all follow input_shape_override."""
    from caesar_mrcnn_tpu.config import detector_config, inference_config
    from caesar_mrcnn_tpu.models.mask_rcnn import init_model

    cfg = detector_config(
        backbone="custom", image_min_dim=96, image_max_dim=128,
        input_shape_override=(96, 128),
        num_classes=4, class_names=("bkg", "sidelobe", "source", "galaxy"),
        images_per_device=1, num_devices=1, pre_nms_limit=256,
        post_nms_rois_inference=64, detection_max_instances=16,
        compute_dtype="float32", score_thr=0.0,
    )
    cfg = inference_config(cfg)
    assert cfg.image_shape == (96, 128, 3)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    det = Detector(cfg, model, variables)
    tile = np.random.RandomState(5).randint(0, 255, (96, 128), np.uint8)
    res = det.detect_tiles(tile[None])
    assert len(res) == 1
    assert res[0]["masks"].shape[:2] == (96, 128)
