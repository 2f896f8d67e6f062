"""Source-classification CLI:
``python -m caesar_mrcnn_tpu.cli.sclassifier --image img.fits --scatalog cat.dat``.

Re-design of the reference classifier script
(reference: scripts/sclassifier.py): 4+1-class config, inference model with
weights, ``SClassifier.run(image, scatalog)``.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from .. import logger
from ..config import detector_config, inference_config

# reference 4+1 classes (reference: scripts/sclassifier.py:46-47)
DEFAULT_CLASSDICT = '{"spurious":1,"compact":2,"extended":3,"extended-multisland":4}'


def parse_args(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser(description="Classify pre-detected radio sources.")
    parser.add_argument("--image", required=True, type=str, help="Input FITS image")
    parser.add_argument("--scatalog", required=True, type=str, help="Caesar ascii catalog")
    parser.add_argument("--weights", default=None, type=str)
    parser.add_argument("--classdict", type=str, default=DEFAULT_CLASSDICT)
    parser.add_argument("--scutout_size", type=int, default=132)
    parser.add_argument("--scoreThr", type=float, default=0.7)
    parser.add_argument("--iouThr", type=float, default=0.6)
    parser.add_argument("--nmax", type=int, default=-1)
    parser.add_argument("--outfile", type=str, default="sclass_catalog.dat")
    return parser.parse_args(argv)


def main(argv: Optional[List[str]] = None) -> int:
    import json

    from ..analysis.classifier import SClassifier
    from ..inference.detector import build_detector

    args = parse_args(argv)
    class_dict = json.loads(args.classdict)
    names = ["bkg"] + [None] * len(class_dict)
    for name, cid in class_dict.items():
        names[cid] = name
    cfg = inference_config(
        detector_config(
            num_classes=len(names),
            class_names=tuple(n or f"class{i}" for i, n in enumerate(names)),
            image_min_dim=args.scutout_size,
            image_max_dim=args.scutout_size,
            score_thr=args.scoreThr,
            iou_thr=args.iouThr,
        )
    )
    detector = build_detector(cfg, weights_path=args.weights)
    sc = SClassifier(detector, cfg)
    sc.scutout_size = args.scutout_size
    sc.n_max_sources = args.nmax
    if sc.run(args.image, args.scatalog) < 0:
        return 1
    sc.write_catalog(args.outfile)
    logger.info("classification catalog written to %s", args.outfile)
    return 0


if __name__ == "__main__":
    sys.exit(main())
