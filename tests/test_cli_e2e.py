"""Full CLI end-to-end: train 2 steps -> checkpoint -> test mode -> detect
mode, all through cli.run.main() with a tiny config."""

import json
import os

import numpy as np
import pytest

from caesar_mrcnn_tpu.cli import run as cli
from caesar_mrcnn_tpu.utils import fits as F

TINY = [
    "--imgsize", "64",
    "--backbone", "custom",
    "--rpn_anchor_scales", "8,16,32,64,128",
    "--rpn_train_anchors_per_image", "32",
    "--train_rois_per_image", "16",
    "--max_gt_instances", "4",
    "--pre_nms_limit", "128",
    "--post_nms_rois_training", "32",
    "--post_nms_rois_inference", "32",
    "--detection_max_instances", "8",
    "--use_mini_mask",
    "--nimg_per_gpu", "2",
]


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    rng = np.random.RandomState(0)
    rows = []
    for i in range(4):
        img = rng.normal(0, 0.02, (64, 64)).astype(np.float32)
        img[20:44, 20:44] += 5.0
        mask = np.zeros((64, 64), np.float32)
        mask[20:44, 20:44] = 1.0
        F.write_fits(img, str(tmp_path / f"img{i}.fits"))
        F.write_fits(mask, str(tmp_path / f"mask{i}.fits"))
        rows.append(f"{tmp_path}/img{i}.fits,{tmp_path}/mask{i}.fits,source")
    with open(tmp_path / "list.dat", "w") as f:
        f.write("\n".join(rows))
    monkeypatch.chdir(tmp_path)
    return tmp_path


@pytest.mark.slow
def test_cli_train_test_detect(workdir):
    # --- train 1 epoch of 2 steps
    rc = cli.main(
        ["train", "--datalist", str(workdir / "list.dat"),
         "--nepochs", "1", "--epoch_length", "2",
         "--grad_accum_steps", "2",  # one optimizer update from 2 micro-steps
         "--logs", str(workdir / "logs"),
         "--no_augmentation"] + TINY
    )
    assert rc == 0
    ckpts = [n for n in os.listdir(workdir / "logs") if n.startswith("mask_rcnn_")]
    assert len(ckpts) == 1
    ckpt = str(workdir / "logs" / ckpts[0])
    assert os.path.isfile(workdir / "logs" / "loss_curve.png")
    assert os.path.isfile(workdir / "logs" / "train_metrics.jsonl")

    # --- test mode with the checkpoint (dumps go to --logs)
    rc = cli.main(
        ["test", "--datalist", str(workdir / "list.dat"),
         "--weights", ckpt, "--maxnimgs", "2", "--scoreThr", "0.0",
         "--logs", str(workdir / "logs")] + TINY
    )
    assert rc == 0
    assert os.path.isfile(workdir / "logs" / "map_summary.json")
    assert os.path.isdir(workdir / "logs" / "groundtruths")

    # --- detect mode on one FITS
    rc = cli.main(
        ["detect", "--image", str(workdir / "img0.fits"),
         "--weights", ckpt, "--detect_outfile_json",
         str(workdir / "cat.json")] + TINY
    )
    assert rc == 0
    with open(workdir / "cat.json") as f:
        cat = json.load(f)
    assert "objs" in cat

    # --- export mode: AOT serving artifact from the same checkpoint
    art = str(workdir / "detector.stablehlo")
    rc = cli.main(
        ["export", "--weights", ckpt, "--export_path", art] + TINY
    )
    assert rc == 0
    assert os.path.getsize(art) > 1000
    from caesar_mrcnn_tpu.inference.export import ServingDetector

    srv = ServingDetector(art)
    assert srv.batch_size == 2
    out = srv.detect(
        [np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)]
    )
    assert len(out) == 1 and "masks" in out[0]
