"""Score-threshold operating curve + PR curves from a Padilla dump.

Consumes the ``groundtruths/`` + ``detections/`` directories the
ModelTester writes (analysis/tester.py — the reference's
Object-Detection-Metrics txt format, mrcnn/analyze.py:458-530). Run the
test ONCE at a low score threshold (e.g. ``--scoreThr 0.05``) so the
dump contains the full scored detection set; this script then sweeps the
operating threshold host-side:

* per class and threshold: completeness (TP/GT), reliability (TP/dets),
  F1 — greedy per-image IoU matching at the reference operating IoU;
* the F1 knee per class (the recommended operating threshold);
* every-point PR curve per class (AP is threshold-independent).

Usage:
  python scripts/operating_curve.py --gt .../groundtruths \
      --det .../detections --out /tmp/opcurve [--iou 0.6]

Outputs: <out>/operating_curve.csv, <out>/pr_<class>.png,
<out>/summary.json. Reference operating point for comparison:
scoreThr 0.7 (reference: scripts/run.py:231-232, README.md:80-81).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

import numpy as np

# repo-root import without PYTHONPATH (which breaks axon plugin discovery)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from caesar_mrcnn_tpu.analysis.visualize import plot_precision_recall
from caesar_mrcnn_tpu.evalmetrics.voc import (
    evaluate_class,
    read_padilla_dirs,
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--gt", required=True)
    p.add_argument("--det", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--iou", type=float, default=0.6)
    p.add_argument("--thresholds", default="0.05:0.95:0.05",
                   help="start:stop:step sweep of the score threshold")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    gts, dets = read_padilla_dirs(args.gt, args.det)
    classes = sorted({g.class_name for g in gts})
    if not classes:
        sys.exit(f"no ground-truth classes parsed from {args.gt}")
    try:
        t0, t1, dt = (float(v) for v in args.thresholds.split(":"))
    except ValueError:
        sys.exit(f"--thresholds must be start:stop:step, got {args.thresholds!r}")
    thresholds = np.arange(t0, t1 + 1e-9, dt)
    if thresholds.size == 0:
        sys.exit(f"--thresholds {args.thresholds!r} yields an empty sweep")

    # PR curves (threshold-independent: from the full scored set)
    summary = {"iou": args.iou, "classes": {}}
    for cls in classes:
        res = evaluate_class(
            [g for g in gts if g.class_name == cls],
            [d for d in dets if d.class_name == cls],
            iou_threshold=args.iou,
        )
        png = os.path.join(args.out, f"pr_{cls}.png")
        plot_precision_recall(res["AP"], res["precision"], res["recall"], png)
        summary["classes"][cls] = {
            "AP": round(res["AP"], 4),
            "n_gt": res["total_positives"],
            "pr_curve": png,
        }
    summary["mAP"] = round(
        float(np.mean([summary["classes"][c]["AP"] for c in classes])), 4
    )

    # threshold sweep
    rows = []
    for t in thresholds:
        kept = [d for d in dets if (d.score or 0.0) >= t]
        for cls in classes:
            res = evaluate_class(
                [g for g in gts if g.class_name == cls],
                [d for d in kept if d.class_name == cls],
                iou_threshold=args.iou,
            )
            npos = max(res["total_positives"], 1)
            ndet = res["total_TP"] + res["total_FP"]
            comp = res["total_TP"] / npos
            rel = res["total_TP"] / ndet if ndet else 0.0
            f1 = 2 * comp * rel / (comp + rel) if comp + rel else 0.0
            rows.append({
                "threshold": round(float(t), 3), "class": cls,
                "completeness": round(comp, 4), "reliability": round(rel, 4),
                "f1": round(f1, 4), "n_det": int(ndet),
            })

    csv_path = os.path.join(args.out, "operating_curve.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    for cls in classes:
        crows = [r for r in rows if r["class"] == cls]
        knee = max(crows, key=lambda r: r["f1"])
        summary["classes"][cls]["knee"] = knee
    summary["csv"] = csv_path
    # ready-to-paste product knob (config.score_thr_per_class / CLI
    # --scoreThrPerClass): each class at its F1 knee
    summary["recommended_score_thr_per_class"] = ",".join(
        f"{c}={summary['classes'][c]['knee']['threshold']}" for c in classes
    )

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    for cls in classes:
        k = summary["classes"][cls]["knee"]
        print(
            f"{cls:<10} AP={summary['classes'][cls]['AP']:.4f} "
            f"knee: thr={k['threshold']} comp={k['completeness']} "
            f"rel={k['reliability']} f1={k['f1']}"
        )
    print(f"mAP={summary['mAP']:.4f} -> {args.out}")


if __name__ == "__main__":
    main()
