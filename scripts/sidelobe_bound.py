"""Sidelobe completeness: capacity-vs-information bound (VERDICT r4 item 5).

For three rounds the sidelobe class has been the weakest (completeness
0.65-0.68 at the reference operating point), with 71% of misses below
dataset SNR 6. This experiment quantifies whether a detector at this
resolution COULD recover the misses, by separating the two failure modes:

* **localization failure** (capacity): the pipeline never proposes a box
  on the object, but with an ORACLE box the classifier head scores it as
  sidelobe — a better RPN/training recipe could recover these;
* **evidence failure** (information floor): even with the oracle box the
  classifier cannot call it a sidelobe — the pixels in the box do not
  carry the class evidence at this noise level, so no proposal mechanism
  can fix it (only more sensitivity could).

Method: for every test-set sidelobe GT, (a) match it against the standard
detect output (box IoU >= 0.5, any detection of the same class) at the
given score threshold; (b) run the classifier head on the GT box itself
(features -> PyramidROIAlign -> classifier, skipping RPN/proposals/NMS)
and record P(sidelobe). Misses whose oracle P(sidelobe) clears the
operating threshold are localization failures; the rest are evidence
failures. Reported per SNR bin.

Usage:
  python scripts/sidelobe_bound.py --datalist .../test/datalist.dat \
      --weights <ckpt> --out bound.json [--imgsize 512] [--max-imgs N]

Prints ONE JSON summary line and writes the full record to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--datalist", required=True)
    p.add_argument("--weights", default="",
                   help="checkpoint path (empty = random init, smoke only)")
    p.add_argument("--out", default="")
    p.add_argument("--imgsize", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-imgs", type=int, default=-1)
    p.add_argument("--score-thr", type=float, default=0.7)
    p.add_argument("--iou", type=float, default=0.5)
    p.add_argument("--oracle-rois", type=int, default=32,
                   help="padded oracle ROI slots per image")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/caesar_mrcnn_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from caesar_mrcnn_tpu.config import detector_config, inference_config
    from caesar_mrcnn_tpu.data.dataset import SourceDataset
    from caesar_mrcnn_tpu.inference.detector import build_detector
    from caesar_mrcnn_tpu.models.mask_rcnn import (
        MaskRCNN,
        pyramid_roi_align_batched,
    )
    from caesar_mrcnn_tpu.utils import boxes as B
    from caesar_mrcnn_tpu.utils.anchors import get_anchors

    cfg = inference_config(images_per_device=args.batch, cfg=detector_config(
        num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        image_min_dim=args.imgsize,
        image_max_dim=args.imgsize,
        images_per_device=args.batch,
        compute_dtype="bfloat16",
        mean_pixel=(0.0, 0.0, 0.0),
        zscale_stretch=True,
        img_to_uint8=True,
        img_to_rgb=True,
    ))
    ds = SourceDataset()
    ds.set_class_dict({"sidelobe": 1, "source": 2, "galaxy": 3})
    assert ds.load_data_from_json_list(args.datalist, args.max_imgs) == 0
    ds.prepare()

    det = build_detector(cfg, weights_path=args.weights or None)
    model = det.model
    R = args.oracle_rois
    h, w, _c = cfg.image_shape

    def oracle_probs_fn(variables, images, rois_norm):
        """[B,H,W,C] molded images + [B,R,4] normalized boxes ->
        [B,R,num_classes] classifier probabilities (oracle localization:
        the exact head the detect graph runs, minus RPN/NMS)."""
        pyramid = model.apply(variables, images, False,
                              method=MaskRCNN.features)
        pooled = pyramid_roi_align_batched(
            pyramid, rois_norm, cfg.image_shape[:2], cfg.pool_size
        )
        _, probs, _ = model.apply(variables, pooled, False,
                                  method=MaskRCNN.classifier)
        return probs

    oracle_jit = jax.jit(oracle_probs_fn)
    sidelobe_id = 1
    records = []

    ids = list(ds.image_ids)
    for s in range(0, len(ids), args.batch):
        chunk = ids[s : s + args.batch]
        images, gt_list = [], []
        for img_id in chunk:
            img = ds.load_image(img_id)
            masks, class_ids = ds.load_mask(img_id)
            boxes = B.extract_bboxes(masks)  # [N,4] y1,x1,y2,x2 px
            info = ds.image_info[img_id]
            snrs = [o.get("snr") for o in info.get("objs", [])]
            gt_list.append((boxes, class_ids, snrs))
            images.append(img)
        pad = args.batch - len(images)
        if pad:
            images += [images[-1]] * pad
        results = det.detect(images)[: len(chunk)]

        molded, metas, _ = det.mold_inputs(images)
        rois = np.zeros((args.batch, R, 4), np.float32)
        for bi, (boxes, class_ids, _snrs) in enumerate(gt_list):
            sel = np.where(class_ids == sidelobe_id)[0][:R]
            if len(sel):
                rois[bi, : len(sel)] = B.norm_boxes(
                    boxes[sel].astype(np.float32), (h, w)
                )
        probs = np.asarray(
            oracle_jit(det.variables, jnp.asarray(molded), jnp.asarray(rois))
        )[: len(chunk)]

        for bi, (boxes, class_ids, snrs) in enumerate(gt_list):
            r = results[bi]
            det_boxes = np.asarray(r["rois"], np.float32)
            det_cls = np.asarray(r["class_ids"])
            det_scores = np.asarray(r["scores"])
            keep = det_scores >= args.score_thr
            det_boxes, det_cls = det_boxes[keep], det_cls[keep]
            sel = np.where(class_ids == sidelobe_id)[0][:R]
            for k, gi in enumerate(sel):
                gt_box = boxes[gi].astype(np.float32)
                same = det_boxes[det_cls == sidelobe_id]
                iou = (
                    B.compute_overlaps(gt_box[None], same)[0]
                    if len(same)
                    else np.zeros(0)
                )
                matched = bool(len(iou) and iou.max() >= args.iou)
                records.append({
                    "image": int(s + bi),
                    "snr": (float(snrs[gi])
                            if gi < len(snrs) and snrs[gi] is not None
                            else None),
                    "matched": matched,
                    "oracle_p_sidelobe": float(probs[bi, k, sidelobe_id]),
                    "oracle_argmax": int(np.argmax(probs[bi, k])),
                })

    n = len(records)
    missed = [r for r in records if not r["matched"]]
    thr = args.score_thr

    def frac(rs, pred):
        return round(sum(pred(r) for r in rs) / len(rs), 4) if rs else None

    orc = [r for r in missed if r["oracle_p_sidelobe"] >= thr]
    summary = {
        "n_gt_sidelobe": n,
        "n_missed": len(missed),
        "completeness_box_iou": frac(records, lambda r: r["matched"]),
        # localization failures: oracle box rescues the classification
        "missed_oracle_recovered_frac": frac(
            missed, lambda r: r["oracle_p_sidelobe"] >= thr),
        "missed_oracle_argmax_sidelobe_frac": frac(
            missed, lambda r: r["oracle_argmax"] == sidelobe_id),
        # evidence failures: even the oracle box scores below threshold
        "missed_evidence_floor_frac": frac(
            missed, lambda r: r["oracle_p_sidelobe"] < thr),
        "missed_median_snr": (
            float(np.median([r["snr"] for r in missed if r["snr"]]))
            if missed else None),
        "missed_recovered_median_snr": (
            float(np.median([r["snr"] for r in orc if r["snr"]]))
            if orc else None),
        "matched_oracle_p_median": (
            float(np.median([
                r["oracle_p_sidelobe"] for r in records if r["matched"]]))
            if n > len(missed) else None),
        "score_thr": thr,
        "box_iou": args.iou,
    }
    # per-SNR-bin split of the misses
    bins = [(0, 4), (4, 6), (6, 10), (10, 1e9)]
    summary["missed_by_snr"] = {
        f"{lo}-{hi if hi < 1e9 else 'inf'}": {
            "n": len(sub),
            "oracle_recovered_frac": frac(
                sub, lambda r: r["oracle_p_sidelobe"] >= thr),
        }
        for lo, hi in bins
        for sub in [[r for r in missed if r["snr"] and lo <= r["snr"] < hi]]
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "records": records}, f, indent=1)


if __name__ == "__main__":
    main()
