"""CLI surface: parsing, validation, config building, dataset factories,
draw_img debugger."""

import json
import os

import numpy as np
import pytest

from caesar_mrcnn_tpu.cli import run as cli
from caesar_mrcnn_tpu.utils import fits as F


def test_parse_defaults():
    args = cli.parse_args(["train", "--datalist", "x.dat"])
    assert args.command == "train"
    assert args.imgsize == 256
    assert args.backbone == "resnet101"
    assert args.rpn_anchor_scales == "4,8,16,32,64"
    assert args.zscale and args.to_uint8 and args.norm_img
    assert args.optimizer == "adam"


def test_validate_args():
    assert cli.validate_args(cli.parse_args(["train", "--datalist", "x"])) == 0
    assert cli.validate_args(cli.parse_args(["train"])) == -1
    assert cli.validate_args(cli.parse_args(["detect"])) == -1
    assert cli.validate_args(cli.parse_args(["detect", "--image", "x.fits"])) == 0
    assert cli.validate_args(cli.parse_args(["bogus", "--datalist", "x"])) == -1


def test_build_config():
    args = cli.parse_args(
        [
            "train", "--datalist", "x.dat",
            "--imgsize", "128",
            "--backbone", "custom",
            "--rpn_anchor_scales", "8,16,32,64,128",
            "--no_mrcnn_mask_loss",
            "--mrcnn_bbox_loss_weight", "0.5",
            "--optimizer", "sgd",
            "--scoreThr", "0.8",
            "--grayimg",
        ]
    )
    cfg = cli.build_config(args)
    assert cfg.image_shape[:2] == (128, 128)
    assert cfg.backbone == "custom"
    assert cfg.rpn_anchor_scales == (8, 16, 32, 64, 128)
    assert cfg.use_losses["mrcnn_mask_loss"] is False
    assert cfg.loss_weights["mrcnn_bbox_loss"] == 0.5
    assert cfg.optimizer == "sgd"
    assert cfg.score_thr == 0.8
    assert cfg.image_channel_count == 1
    assert cfg.num_classes == 4
    assert cfg.class_names == ("bkg", "sidelobe", "source", "galaxy")
    assert cfg.roi_gather_dtype == "none"
    args2 = cli.parse_args(
        ["detect", "--image", "x.fits", "--roi_gather_dtype", "float8_e4m3fn"]
    )
    assert cli.build_config(args2).roi_gather_dtype == "float8_e4m3fn"


def _write_synthetic_pair(tmp_path, idx):
    rng = np.random.RandomState(idx)
    img = rng.normal(0, 0.01, (64, 64)).astype(np.float32)
    img[20:40, 20:40] += 5.0
    mask = np.zeros((64, 64), np.float32)
    mask[20:40, 20:40] = 1.0
    img_path = str(tmp_path / f"img{idx}.fits")
    mask_path = str(tmp_path / f"mask{idx}.fits")
    F.write_fits(img, img_path)
    F.write_fits(mask, mask_path)
    return img_path, mask_path


def test_dataset_factories(tmp_path):
    rows = []
    for i in range(6):
        img, mask = _write_synthetic_pair(tmp_path, i)
        rows.append(f"{img},{mask},source")
    datalist = str(tmp_path / "list.dat")
    with open(datalist, "w") as f:
        f.write("\n".join(rows) + "\n")

    os.chdir(tmp_path)
    args = cli.parse_args(["train", "--datalist", datalist, "--imgsize", "64"])
    cfg = cli.build_config(args)
    ds_train, ds_val = cli.create_train_val_datasets(args, cfg)
    assert ds_train.num_images + ds_val.num_images == 6
    assert ds_val.num_images >= 1
    img = ds_train.load_image(0)
    assert img.shape == (64, 64, 3)
    mask, ids = ds_train.load_mask(0)
    assert mask.shape == (64, 64, 1)
    assert ids.tolist() == [2]

    ds_test = cli.create_test_dataset(args, cfg)
    assert ds_test.num_images == 6


def test_json_dataset_loader(tmp_path):
    img, mask = _write_synthetic_pair(tmp_path, 0)
    desc = {
        "img": os.path.basename(img),
        "telescope": "TEST", "bkg": 0.0, "rms": 0.01,
        "bmaj": 1e-3, "bmin": 1e-3, "dx": 2e-4, "dy": 2e-4, "nx": 64, "ny": 64,
        "objs": [
            {"mask": os.path.basename(mask), "class": "extended",
             "nislands": 2, "sidelobe-mixed": 0, "sidelobe-near": 0},
        ],
    }
    json_path = str(tmp_path / "img0.json")
    with open(json_path, "w") as f:
        json.dump(desc, f)

    from caesar_mrcnn_tpu.data.dataset import SourceDataset

    ds = SourceDataset()
    ds.set_class_dict(
        {"sidelobe": 1, "source": 2, "galaxy": 3, "extended": 4,
         "extended-multisland": 5, "flagged": 6}
    )
    assert ds.load_data_from_json_search(str(tmp_path)) == 0
    ds.prepare()
    assert ds.num_images == 1
    # multi-island extended got renamed (reference: scripts/run.py:505-512)
    assert ds.image_info[0]["class_ids"] == [5]
    assert ds.image_metadata(0)["telescope"] == "TEST"
    ds.compute_class_weights()
    assert ds.class_weights[5] > 0


def test_draw_img_cli(tmp_path, ref_data_dir):
    from caesar_mrcnn_tpu.cli import draw_img

    out = str(tmp_path / "channels.png")
    rc = draw_img.main(["--image", f"{ref_data_dir}/galaxy0002.fits", "--outfile", out])
    assert rc == 0
    assert os.path.isfile(out)


def test_score_thr_per_class_flag():
    """--scoreThrPerClass parse + default (sidelobe knee) + 'none' reset."""
    cfg = cli.build_config(cli.parse_args(["train", "--datalist", "x.dat"]))
    assert cfg.score_thr_per_class == (("sidelobe", 0.9),)  # product default
    cfg = cli.build_config(cli.parse_args(
        ["train", "--datalist", "x.dat",
         "--scoreThrPerClass", "sidelobe=0.85,galaxy=0.95"]
    ))
    assert cfg.score_thr_per_class == (("sidelobe", 0.85), ("galaxy", 0.95))
    assert cfg.class_score_thr("galaxy") == 0.95
    assert cfg.class_score_thr("source") == cfg.score_thr
    cfg = cli.build_config(cli.parse_args(
        ["train", "--datalist", "x.dat", "--scoreThrPerClass", "none"]
    ))
    assert cfg.score_thr_per_class == ()
    import pytest
    with pytest.raises(SystemExit):
        cli.build_config(cli.parse_args(
            ["train", "--datalist", "x.dat", "--scoreThrPerClass", "oops"]
        ))


def test_serving_preset():
    """--serving applies the measured quality-gated serving defaults;
    explicit flags override the preset."""
    cfg = cli.build_config(cli.parse_args(["detect", "--image", "x.fits"]))
    assert (cfg.pre_nms_limit, cfg.post_nms_rois_inference, cfg.quant_mode) \
        == (6000, 1000, "none")  # reference defaults without the preset
    cfg = cli.build_config(cli.parse_args(
        ["detect", "--image", "x.fits", "--serving"]))
    assert (cfg.pre_nms_limit, cfg.post_nms_rois_inference, cfg.quant_mode) \
        == (3000, 512, "int8")
    cfg = cli.build_config(cli.parse_args(
        ["detect", "--image", "x.fits", "--serving",
         "--pre_nms_limit", "4000", "--quant_mode", "none"]))
    assert (cfg.pre_nms_limit, cfg.post_nms_rois_inference, cfg.quant_mode) \
        == (4000, 512, "none")
