"""COCO-style mAP CLI over ground_truth_boxes.json / predicted_boxes.json.

Drop-in for the vendored tarlen5 ``calculate.py`` entry point
(reference: tarlen5-calculate-mean-ap/calculate.py): same json formats,
AP per IoU threshold + the averaged mAP, optional PR plot.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional

import numpy as np

from ..evalmetrics.coco import coco_map, get_avg_precision_at_iou


def parse_args(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser(description="COCO-style mAP from box jsons.")
    parser.add_argument("--gt", default="ground_truth_boxes.json")
    parser.add_argument("--pred", default="predicted_boxes.json")
    parser.add_argument("--iou_start", type=float, default=0.5)
    parser.add_argument("--iou_end", type=float, default=0.75)
    parser.add_argument("--iou_step", type=float, default=0.05)
    parser.add_argument("--plot", type=str, default="")
    return parser.parse_args(argv)


def main(argv: Optional[List[str]] = None) -> int:
    args = parse_args(argv)
    with open(args.gt) as f:
        gt = json.load(f)
    with open(args.pred) as f:
        pred = json.load(f)
    thrs = np.arange(args.iou_start, args.iou_end + 1e-9, args.iou_step)
    out = coco_map(gt, pred, thrs)
    for t, ap in out["per_iou"].items():
        print(f"AP@IoU={t:.2f}: {ap:.4f}")
    print(f"mAP: {out['mAP']:.4f}")
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(1)
        for t in thrs:
            res = get_avg_precision_at_iou(gt, pred, float(t))
            ax.plot(res["recalls"], res["precisions"], label=f"IoU {t:.2f}")
        ax.set_xlabel("Recall")
        ax.set_ylabel("Precision")
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
        fig.savefig(args.plot, bbox_inches="tight", dpi=120)
    return 0


if __name__ == "__main__":
    sys.exit(main())
