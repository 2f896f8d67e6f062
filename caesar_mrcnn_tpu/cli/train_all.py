"""Legacy single-mask trainer CLI (compat shim).

Covers the reference's two legacy application scripts
(reference: scripts/train_all.py:394-495, scripts/train_all_gpu.py — the
Matterport-balloon-derived precursors of scripts/run.py) with their exact
flag surface, mapped onto the modern pipeline:

* the legacy dataset format is one ``img,mask,label`` line per image with
  a SINGLE binary FITS mask (reference: scripts/train_all.py:183-307) —
  exactly the ``datalist`` loader of :mod:`..data.dataset`;
* the legacy trainers reuse the same filelist for train and validation
  (reference: scripts/train_all.py:334-342) — mirrored here by passing the
  list as both ``--datalist_train`` and ``--datalist_val``;
* ``--weighttype coco`` excludes the class-count-dependent head layers on
  restore (reference: scripts/train_all.py:475-484);
* the GPU variant's ``--ngpu``/``--nimg_per_gpu`` (scripts/train_all_gpu.py)
  map to the mesh-sharded train step;
* config deltas vs the modern CLI defaults match the legacy
  ``SDetectorConfig`` (scripts/train_all.py:75-180): 256**2 square resize,
  RPN_NMS_THRESHOLD 0.9, IMAGES_PER_GPU 2, Adam @5e-4 — the legacy
  ``OPTIMIZER="ADAM"`` knob was dead in the reference (compile hard-codes
  SGD, mrcnn/model.py:2260-2262) but is real here.

Everything else (augmentation SomeOf(0-2){flips,rot90s}, train all layers,
epoch-stamped checkpoints, ModelTester for ``test``) is the modern
pipeline's default behavior, which matches the legacy scripts.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from .. import logger

COCO_HEAD_EXCLUDE = "mrcnn_class_logits,mrcnn_bbox_fc,mrcnn_bbox,mrcnn_mask"


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Legacy single-mask-per-image trainer (compat wrapper "
        "over the main caesar-mrcnn-tpu CLI)."
    )
    parser.add_argument("command", metavar="<command>", help="'train' or 'test'")
    parser.add_argument("--dataset", required=False,
                        help="filelist with img,mask,label rows")
    parser.add_argument("--weights", required=False, default="",
                        help="path to weights (.h5 or checkpoint); '' trains "
                        "from scratch")
    parser.add_argument("--logs", required=False, default="logs/",
                        help="logs and checkpoints directory")
    parser.add_argument("--nepochs", type=int, default=10)
    parser.add_argument("--epoch_length", type=int, default=10)
    parser.add_argument("--nvalidation_steps", type=int, default=50)
    parser.add_argument("--ngpu", type=int, default=1)
    parser.add_argument("--nimg_per_gpu", type=int, default=2)
    parser.add_argument("--weighttype", default="",
                        help="'coco' excludes the class-count head layers "
                        "on restore")
    parser.add_argument("--nthreads", type=int, default=1)
    parser.add_argument("--nimg_test", type=int, default=-1)
    parser.add_argument("--scoreThr_test", type=float, default=0.7)
    parser.add_argument("--iouThr_test", type=float, default=0.6)
    return parser.parse_args(argv)


def translate(args: argparse.Namespace) -> List[str]:
    """Map the legacy flag surface onto the modern CLI's argv."""
    if args.command not in ("train", "test"):
        raise ValueError(
            f"'{args.command}' is not recognized. Use 'train' or 'test'"
        )
    if not args.dataset:
        raise ValueError(f"Argument --dataset is required for {args.command}")

    argv = [
        args.command,
        "--dataloader", "datalist",
        "--imgsize", "256",
        "--rpn_nms_threshold", "0.9",
        "--logs", args.logs,
        "--nthreads", str(args.nthreads),
    ]
    if args.command == "train":
        argv += [
            "--datalist_train", args.dataset,
            "--datalist_val", args.dataset,
            "--nepochs", str(args.nepochs),
            "--epoch_length", str(args.epoch_length),
            "--nvalidation_steps", str(args.nvalidation_steps),
            "--ngpu", str(args.ngpu),
            "--nimg_per_gpu", str(args.nimg_per_gpu),
        ]
    else:
        argv += [
            "--datalist", args.dataset,
            "--maxnimgs", str(args.nimg_test),
            "--scoreThr", str(args.scoreThr_test),
            "--iouThr", str(args.iouThr_test),
        ]
    if args.weights:
        argv += ["--weights", args.weights]
        if args.weighttype.lower() == "coco":
            argv += ["--exclude_layers", COCO_HEAD_EXCLUDE]
    return argv


def main(argv: Optional[List[str]] = None) -> int:
    args = parse_args(argv)
    try:
        run_argv = translate(args)
    except ValueError as exc:
        logger.error(str(exc))
        return 1
    from . import run as cli_run

    return cli_run.main(run_argv)


if __name__ == "__main__":
    sys.exit(main())
