"""Pascal-VOC AP evaluation CLI over groundtruths/ + detections/ txt dirs.

Drop-in replacement for the vendored Padilla ``pascalvoc.py`` CLI the
reference shipped (reference: Object-Detection-Metrics/pascalvoc.py):
reads the same per-image txt format (GT rows ``class x1 y1 x2 y2``,
detection rows ``class score x1 y1 x2 y2``), writes ``results.txt`` with
per-class AP + mAP and per-class PR-curve PNGs.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

from ..evalmetrics.voc import pascal_voc_metrics, read_padilla_dirs


def parse_args(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser(description="Pascal VOC AP over txt dirs.")
    parser.add_argument("-gt", "--gtfolder", required=True)
    parser.add_argument("-det", "--detfolder", required=True)
    parser.add_argument("-t", "--threshold", type=float, default=0.5)
    parser.add_argument(
        "-m", "--method", default="every_point",
        choices=["every_point", "eleven_point"],
    )
    parser.add_argument("-sp", "--savepath", default="results")
    parser.add_argument("--noplot", action="store_true", default=False)
    return parser.parse_args(argv)


def main(argv: Optional[List[str]] = None) -> int:
    args = parse_args(argv)
    gts, dets = read_padilla_dirs(args.gtfolder, args.detfolder)
    results = pascal_voc_metrics(gts, dets, args.threshold, args.method)

    os.makedirs(args.savepath, exist_ok=True)
    lines = ["Object Detection Metrics", "", f"IOU threshold: {args.threshold}", ""]
    for cls, res in results.items():
        if cls == "mAP":
            continue
        lines.append(f"Class: {cls}")
        lines.append(f"AP: {100.0 * res['AP']:.2f}%")
        lines.append(
            f"Positives: {res['total_positives']}  TP: {res['total_TP']:.0f}"
            f"  FP: {res['total_FP']:.0f}"
        )
        lines.append("")
        if not args.noplot:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(1)
            ax.plot(res["recall"], res["precision"])
            ax.set_xlabel("Recall")
            ax.set_ylabel("Precision")
            ax.set_title(f"{cls}: AP={100.0 * res['AP']:.2f}%")
            ax.grid(alpha=0.3)
            fig.savefig(os.path.join(args.savepath, f"{cls}.png"),
                        bbox_inches="tight", dpi=120)
            plt.close(fig)
    lines.append(f"mAP: {100.0 * results['mAP']:.2f}%")
    out = "\n".join(lines)
    with open(os.path.join(args.savepath, "results.txt"), "w") as f:
        f.write(out + "\n")
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
