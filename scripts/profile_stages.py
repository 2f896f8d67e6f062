"""Per-stage detect-graph profile + roofline audit (VERDICT r3 item 6).

Times each stage of the flagship detect graph individually on device-
resident inputs, repeating the stage R times INSIDE one jit via lax.scan
(a host loop of jitted calls through the dev tunnel measures dispatch,
~2.5 ms/call, not device time — CLAUDE.md). The repeated computation is
made loop-carried (input perturbed by the carry * 1e-38) so XLA cannot
hoist it out of the scan.

Prints a table merging measured ms/batch with the analytic roofline floor
(observability.detect_roofline): FLOPs, HBM bytes, bound type, floor, and
achieved efficiency. Stages at <50% of their floor are the audit's
candidates for one measured experiment each.

Usage (real chip): python scripts/profile_stages.py [--size 512] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# repo-root import without PYTHONPATH (which breaks axon plugin discovery)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--repeat", type=int, default=20)
    p.add_argument("--rpn-fused", action="store_true",
                   help="A/B: fused RPN 1x1 heads (config.rpn_fused_heads)")
    p.add_argument("--pre-nms", type=int, default=6000)
    p.add_argument("--post-nms", type=int, default=1000,
                   help="serving trim: --pre-nms 3000 --post-nms 512")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from caesar_mrcnn_tpu.config import detector_config
    from caesar_mrcnn_tpu.models.detection import refine_detections
    from caesar_mrcnn_tpu.models.mask_rcnn import (
        MaskRCNN,
        init_model,
        pyramid_roi_align_batched,
    )
    from caesar_mrcnn_tpu.models.meta import compose_image_meta, parse_image_meta_jax
    from caesar_mrcnn_tpu.models.proposals import generate_proposals
    from caesar_mrcnn_tpu.train.observability import detect_roofline
    from caesar_mrcnn_tpu.utils.anchors import get_anchors

    cfg = detector_config(
        num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        image_min_dim=args.size,
        image_max_dim=args.size,
        images_per_device=args.batch,
        num_devices=1,
        compute_dtype="bfloat16",
        rpn_fused_heads=args.rpn_fused,
        pre_nms_limit=args.pre_nms,
        post_nms_rois_inference=args.post_nms,
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    b = args.batch
    h, w, c = cfg.image_shape
    rng = np.random.RandomState(0)
    images = jax.device_put(rng.rand(b, h, w, c).astype(np.float32))
    anchors = jax.device_put(get_anchors(cfg))
    meta = np.stack(
        [
            compose_image_meta(
                i, (h, w, c), (h, w, c), (0, 0, h, w), 1.0, np.ones(cfg.num_classes)
            )
            for i in range(b)
        ]
    ).astype(np.float32)
    metas = jax.device_put(meta)

    def sync(x) -> float:
        return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])

    def timed(name, fn, *fargs):
        """Device ms/batch for fn(*fargs), scan-repeated inside one jit."""

        @jax.jit
        def run(fa):
            def body(acc, _):
                # perturb EVERY float leaf by acc*1e-38: loop-carried
                # dependence defeats hoisting, numerically negligible.
                # Perturbing only the first leaf is not enough — head
                # stages never read the (alphabetically first) backbone
                # param, so their whole computation was loop-invariant
                # and XLA hoisted it out of the scan (caught round 4:
                # rpn/mask "ran" at 237/339 TF/s, above the 197 peak).
                leaves, treedef = jax.tree_util.tree_flatten(fa)
                for i, leaf in enumerate(leaves):
                    if jnp.issubdtype(leaf.dtype, jnp.floating):
                        leaves[i] = leaf + (acc * 1e-38).astype(leaf.dtype)
                out = fn(*jax.tree_util.tree_unflatten(treedef, leaves))
                # Reduce over EVERY output element: taking a single scalar
                # lets XLA slice the batch/ROI dim straight through the
                # convs and under-measure (caught round 4: mask head
                # "ran" 2.8x faster than its compute roofline).
                red = jnp.float32(0)
                for leaf in jax.tree_util.tree_leaves(out):
                    red = red + jnp.sum(leaf.astype(jnp.float32))
                return acc + red, None

            acc, _ = lax.scan(body, jnp.float32(0), None, length=args.repeat)
            return acc

        sync(run(fargs))  # compile + warm
        t0 = time.perf_counter()
        sync(run(fargs))
        dt = (time.perf_counter() - t0) / args.repeat
        print(f"  {name:<12} {dt * 1e3:7.2f} ms/batch", flush=True)
        return dt * 1e3

    def harness_overhead(name, *fargs):
        """ms/batch the scan harness itself charges a stage with these
        inputs: the per-iteration perturbation add over every float leaf
        plus the all-element output reduction, measured on an identity
        stage. Subtract from the stage's timed() number for the
        stage-only cost (first-order — the real stage reduces its own
        outputs, not its inputs)."""
        return timed(name, lambda *a: a, *fargs)

    # ---- build intermediate tensors once (device-resident) -------------
    feats = lambda v, x: model.apply(v, x, False, method=MaskRCNN.features)  # noqa: E731
    backbone_only = lambda v, x: model.apply(  # noqa: E731
        v, x, method=lambda m, xx: m.backbone(xx, False)
    )
    c_feats = jax.jit(backbone_only)(variables, images)
    fpn_direct = lambda v, c2, c3, c4, c5: model.apply(  # noqa: E731
        v, c2, c3, c4, c5,
        method=lambda m, a2, a3, a4, a5: m.fpn(a2, a3, a4, a5)
    )
    pyramid = jax.jit(feats)(variables, images)
    rpn_fn = lambda v, p: model.apply(v, p, method=MaskRCNN.rpn)  # noqa: E731
    _, rpn_probs, rpn_bbox = jax.jit(rpn_fn)(variables, pyramid)

    def props(probs, bbox, anc):
        return generate_proposals(
            probs, bbox, anc,
            jnp.asarray(cfg.rpn_bbox_std_dev, jnp.float32),
            proposal_count=cfg.post_nms_rois_inference,
            nms_threshold=cfg.rpn_nms_threshold,
            pre_nms_limit=cfg.pre_nms_limit,
        )[0]

    proposals = jax.jit(props)(rpn_probs, rpn_bbox, anchors)
    shape2 = cfg.image_shape[:2]

    def cls_align(p, boxes):
        return pyramid_roi_align_batched(p, boxes, shape2, cfg.pool_size)

    pooled = jax.jit(cls_align)(pyramid, proposals)
    clf = lambda v, x: model.apply(v, x, False, method=MaskRCNN.classifier)  # noqa: E731
    _, probs, deltas = jax.jit(clf)(variables, pooled)

    mparse = parse_image_meta_jax(metas)
    hh = mparse["image_shape"][:, 0:1].astype(jnp.float32)
    ww = mparse["image_shape"][:, 1:2].astype(jnp.float32)
    scale = jnp.concatenate([hh - 1, ww - 1, hh - 1, ww - 1], axis=1)
    windows = (mparse["window"].astype(jnp.float32) - jnp.array([0.0, 0.0, 1.0, 1.0])) / scale

    def refine(prop, pr, dl):
        return refine_detections(
            prop, pr, dl, windows,
            jnp.asarray(cfg.bbox_std_dev, jnp.float32),
            num_classes=cfg.num_classes,
            max_instances=cfg.detection_max_instances,
            min_confidence=cfg.detection_min_confidence,
            nms_threshold=cfg.detection_nms_threshold,
        )

    detections = jax.jit(refine)(proposals, probs, deltas)
    det_boxes = detections[..., :4]

    def mask_align(p, boxes):
        return pyramid_roi_align_batched(p, boxes, shape2, cfg.mask_pool_size)

    mask_pooled = jax.jit(mask_align)(pyramid, det_boxes)
    mhead = lambda v, x: model.apply(v, x, False, method=MaskRCNN.mask)  # noqa: E731

    # ---- measure --------------------------------------------------------
    print(f"stage profile: {args.size}^2 batch {b} resnet101 bf16 "
          f"(scan x{args.repeat} in-graph)", flush=True)
    ms = {}
    ms["backbone"] = timed("backbone", backbone_only, variables, images)
    ms["backbone+fpn"] = timed("backbone+fpn", feats, variables, images)
    # direct measurement on precomputed C2-C5 (the subtraction estimate
    # backbone+fpn minus backbone double-charges the un-fused C-feature
    # materialization; keep both, roofline uses the direct one)
    ms["fpn"] = timed("fpn(direct)", fpn_direct, variables, *c_feats)
    ms["fpn_by_subtraction"] = round(ms["backbone+fpn"] - ms["backbone"], 3)
    ms["rpn"] = timed("rpn", rpn_fn, variables, pyramid)
    ms["proposals"] = timed("proposals", props, rpn_probs, rpn_bbox, anchors)
    ms["cls_align"] = timed("cls-align", cls_align, pyramid, proposals)
    ms["classifier"] = timed("classifier", clf, variables, pooled)
    ms["refine"] = timed("refine", refine, proposals, probs, deltas)
    ms["mask_align"] = timed("mask-align", mask_align, pyramid, det_boxes)
    ms["mask"] = timed("mask-head", mhead, variables, mask_pooled)

    print("harness overhead (identity stage on the same inputs):",
          flush=True)
    ovh = {}
    ovh["backbone"] = harness_overhead("ovh:backbone", variables, images)
    ovh["fpn"] = harness_overhead("ovh:fpn", variables, *c_feats)
    ovh["rpn"] = harness_overhead("ovh:rpn", variables, pyramid)
    ovh["classifier"] = harness_overhead("ovh:classifier", variables, pooled)
    ovh["mask"] = harness_overhead("ovh:mask", variables, mask_pooled)

    conv_stages = ("backbone", "fpn", "rpn", "classifier", "mask")
    # The raw standalone time overcharges a stage (it pays the harness's
    # perturb+reduce, which the real fused graph amortizes); subtracting
    # the identity-stage time overcorrects (the identity's adds/reduce
    # don't fuse into convs the way the real stage's do). Report the
    # efficiency as the [raw, corrected] RANGE the truth must lie in.
    corrected = {k: max(ms[k] - ovh[k], 1e-3) for k in conv_stages}
    roof = detect_roofline(cfg, b, {k: ms[k] for k in conv_stages})
    for k in conv_stages:
        roof[k]["efficiency_upper"] = round(
            roof[k]["floor_ms_per_batch"] / corrected[k], 3)
    print("\nroofline audit (conv stages; eff = floor/time, "
          "[raw .. overhead-corrected] bounds):")
    hdr = (f"{'stage':<12} {'meas ms':>8} {'floor ms':>9} {'eff range':>12} "
           f"{'bound':>10} {'GF/img':>8} {'MB/batch':>9}")
    print(hdr)
    for stage, r in roof.items():
        lo = r.get("efficiency_vs_floor", float("nan"))
        hi = r.get("efficiency_upper", float("nan"))
        print(
            f"{stage:<12} {r.get('measured_ms', float('nan')):8.2f} "
            f"{r['floor_ms_per_batch']:9.2f} "
            f"{lo:5.2f}..{min(hi, 9.99):4.2f} "
            f"{r['bound']:>10} {r['gflops_per_img']:8.1f} "
            f"{r['mbytes_per_batch']:9.1f}"
        )
    print("\nnon-conv stages (gather/sort/NMS — byte/latency-bound):")
    for k in ("proposals", "cls_align", "refine", "mask_align"):
        print(f"  {k:<12} {ms[k]:7.2f} ms/batch")
    print("\n" + json.dumps({
        "measured_ms": ms,
        "harness_overhead_ms": ovh,
        "corrected_ms": corrected,
        "roofline": roof,
    }))


if __name__ == "__main__":
    main()
