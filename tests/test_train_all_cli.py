"""Legacy train_all CLI compat shim (reference: scripts/train_all.py,
scripts/train_all_gpu.py)."""

import pytest

from caesar_mrcnn_tpu.cli import run as cli_run
from caesar_mrcnn_tpu.cli import train_all as shim


def _translated(argv):
    return shim.translate(shim.parse_args(argv))


def test_train_translation_parses_and_validates():
    argv = _translated(
        ["train", "--dataset", "list.dat", "--nepochs", "3",
         "--epoch_length", "7", "--nvalidation_steps", "2",
         "--ngpu", "2", "--nimg_per_gpu", "4", "--nthreads", "2",
         "--logs", "joblogs/"]
    )
    args = cli_run.parse_args(argv)
    assert cli_run.validate_args(args) == 0
    assert args.command == "train"
    # legacy semantics: same filelist for train and val (no split)
    assert args.datalist_train == "list.dat"
    assert args.datalist_val == "list.dat"
    assert args.nepochs == 3 and args.epoch_length == 7
    assert args.nvalidation_steps == 2
    assert args.ngpu == 2 and args.nimg_per_gpu == 4
    assert args.logs == "joblogs/"
    # legacy SDetectorConfig deltas (scripts/train_all.py:75-180)
    assert args.imgsize == 256
    assert args.rpn_nms_threshold == 0.9
    assert args.weights is None  # '' => train from scratch


def test_test_translation_maps_thresholds():
    argv = _translated(
        ["test", "--dataset", "list.dat", "--nimg_test", "5",
         "--scoreThr_test", "0.5", "--iouThr_test", "0.4",
         "--weights", "ckpt_dir"]
    )
    args = cli_run.parse_args(argv)
    assert cli_run.validate_args(args) == 0
    assert args.command == "test"
    assert args.datalist == "list.dat"
    assert args.maxnimgs == 5
    assert args.scoreThr == 0.5 and args.iouThr == 0.4
    assert args.weights == "ckpt_dir"
    assert args.exclude_layers == ""


def test_coco_weighttype_excludes_head_layers():
    argv = _translated(
        ["train", "--dataset", "l.dat", "--weights", "w.h5",
         "--weighttype", "coco"]
    )
    args = cli_run.parse_args(argv)
    assert args.weights == "w.h5"
    # the class-count-dependent head set (reference:
    # scripts/train_all.py:475-484)
    assert cli_run._exclude_patterns(args) == [
        "mrcnn_class_logits", "mrcnn_bbox_fc", "mrcnn_bbox", "mrcnn_mask",
    ]


def test_exclude_patterns_combines_flags():
    args = cli_run.parse_args(
        ["train", "--datalist", "x", "--exclude_layers", "a, b",
         "--exclude_first_layer_weights"]
    )
    assert cli_run._exclude_patterns(args) == ["a", "b", "conv1"]
    args = cli_run.parse_args(["train", "--datalist", "x"])
    assert cli_run._exclude_patterns(args) is None


def test_errors_and_delegation(monkeypatch):
    # bad command / missing dataset fail without invoking the modern CLI
    with pytest.raises(ValueError):
        _translated(["splash", "--dataset", "x"])
    with pytest.raises(ValueError):
        _translated(["train"])
    assert shim.main(["bogus", "--dataset", "x"]) == 1

    seen = {}

    def fake_main(argv):
        seen["argv"] = argv
        return 0

    monkeypatch.setattr(cli_run, "main", fake_main)
    assert shim.main(["train", "--dataset", "list.dat"]) == 0
    assert seen["argv"][0] == "train"
    assert "--datalist_train" in seen["argv"]
