"""Train-step benchmark on real hardware (VERDICT r3 item 2).

Measures the training twin of bench.py's detect number: images/sec/chip
for one full optimizer step (fwd + bwd + optimizer update) on the
flagship ResNet-101+FPN model at the production training shape
(256^2, batch 8, bf16 compute — the shape of the real chunked survey
runs; reference hot loop #2: mrcnn/model.py:2487-2499). Prints ONE JSON
line with step time, img/s, analytic train MFU, and the fwd/bwd split.

Inputs are device-resident (the host pipeline is benchmarked separately —
CLAUDE.md "Training performance state"); the batch is generated once and
reused, which matches steady-state training where the producer thread
overlaps sample creation with the device step.

Levers (A/B via flags, results recorded in CLAUDE.md's train ledger):
  --remat none|backbone|all   jax.checkpoint policy (config.train_remat)
  --opt sgd|adam              optimizer (config default: adam)
  --opt-dtype float32|bfloat16  optimizer accumulator dtype
  --size/--batch/--steps      shape overrides
  --no-fwd                    skip the forward-only split measurement
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def sync(x) -> float:
    """Fence device execution: on the axon platform block_until_ready does
    NOT fence — only a host fetch does (CLAUDE.md)."""
    return float(np.asarray(x))


def build_problem(args):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from caesar_mrcnn_tpu.config import detector_config
    from caesar_mrcnn_tpu.models.mask_rcnn import init_model
    from caesar_mrcnn_tpu.models.meta import compose_image_meta
    from caesar_mrcnn_tpu.train.trainer import create_train_state
    from caesar_mrcnn_tpu.utils.anchors import get_anchors

    cfg = detector_config(
        num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        image_min_dim=args.size,
        image_max_dim=args.size,
        images_per_device=args.batch,
        num_devices=1,
        compute_dtype="bfloat16",
        train_remat=args.remat,
        optimizer=args.opt,
        opt_state_dtype=args.opt_dtype,
        max_gt_instances=args.gt,
        rpn_fused_heads=args.rpn_fused,
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    state, tx = create_train_state(cfg, variables, layers="all")
    anchors_np = get_anchors(cfg)

    # Synthetic batch in the production thin-wire dtypes (u8 images/masks,
    # i8 rpn_match — trainer.mold_batch widens on device). ~11 objects per
    # image with box-consistent rectangular masks, the r3 survey density.
    b = cfg.batch_size
    h, w, c = cfg.image_shape
    g = cfg.max_gt_instances
    a = anchors_np.shape[0]
    n_obj = min(12, g)
    rng = np.random.RandomState(0)
    images = (rng.rand(b, h, w, c) * 255).astype(np.uint8)
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_ids = np.zeros((b, g), np.int32)
    gt_masks = np.zeros((b, h, w, g), np.uint8)
    for i in range(b):
        for j in range(n_obj):
            y1, x1 = rng.randint(0, h - 40), rng.randint(0, w - 40)
            dy, dx = rng.randint(8, 40), rng.randint(8, 40)
            y2, x2 = min(h, y1 + dy), min(w, x1 + dx)
            gt_boxes[i, j] = (y1 / h, x1 / w, y2 / h, x2 / w)
            gt_ids[i, j] = rng.randint(1, cfg.num_classes)
            gt_masks[i, y1:y2, x1:x2, j] = 1
    rpn_match = np.zeros((b, a), np.int8)
    rpn_match[:, : n_obj * 3] = 1
    rpn_match[:, n_obj * 3 : cfg.rpn_train_anchors_per_image] = -1
    rpn_deltas = np.zeros((b, a, 4), np.float32)
    rpn_deltas[:, : n_obj * 3] = rng.randn(b, n_obj * 3, 4) * 0.1
    meta = np.stack(
        [
            compose_image_meta(
                i, (h, w, c), (h, w, c), (0, 0, h, w), 1.0,
                np.ones(cfg.num_classes),
            )
            for i in range(b)
        ]
    ).astype(np.float32)
    batch = {
        "images": images,
        "image_meta": meta,
        "rpn_match": rpn_match,
        "rpn_deltas": rpn_deltas,
        "gt_class_ids": gt_ids,
        "gt_boxes": gt_boxes,
        "gt_masks": gt_masks,
    }
    import jax as _jax

    batch = {k: _jax.device_put(v) for k, v in batch.items()}
    return cfg, model, state, tx, anchors_np, batch


def measure_steps(step, state, batch, keys, warmup=2):
    """Time len(keys)-warmup chained steps; the final loss fetch fences."""
    if len(keys) <= warmup:
        raise SystemExit(
            f"--steps must exceed the warmup ({warmup}); got {len(keys)}")
    for k in keys[:warmup]:
        state, losses = step(state, batch, k)
    sync(losses["total_loss"])
    t0 = time.perf_counter()
    for k in keys[warmup:]:
        state, losses = step(state, batch, k)
    total = sync(losses["total_loss"])
    dt = time.perf_counter() - t0
    return dt / (len(keys) - warmup), total, state


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--gt", type=int, default=300)
    p.add_argument("--remat", default="none", choices=["none", "backbone", "all"])
    p.add_argument("--opt", default="adam", choices=["sgd", "adam"])
    p.add_argument("--opt-dtype", default="float32")
    p.add_argument("--no-fwd", action="store_true")
    p.add_argument("--rpn-fused", action="store_true")
    args = p.parse_args()

    import jax

    from caesar_mrcnn_tpu.train.observability import (
        V5E_BF16_PEAK_FLOPS,
        train_flops,
    )
    from caesar_mrcnn_tpu.train.trainer import make_eval_step, make_train_step

    cfg, model, state, tx, anchors, batch = build_problem(args)
    step = make_train_step(model, tx, anchors)
    keys = [jax.random.PRNGKey(i) for i in range(args.steps)]

    step_s, last_loss, state = measure_steps(step, state, batch, keys)
    img_s = args.batch / step_s
    fl = train_flops(cfg)
    mfu = fl["total"] * img_s / V5E_BF16_PEAK_FLOPS

    rec = {
        "metric": f"train img/s/chip at {args.size}^2 (resnet101 bf16 "
        f"batch {args.batch}, {args.opt}, remat={args.remat})",
        "value": round(img_s, 2),
        "unit": "img/s",
        "step_ms": round(step_s * 1e3, 2),
        "train_mfu": round(mfu, 4),
        "tflops_per_img": round(fl["total"] / 1e12, 3),
        "total_loss": round(last_loss, 4),
        "opt_state_dtype": args.opt_dtype,
        "rpn_fused_heads": args.rpn_fused,
    }

    if not args.no_fwd:
        # Forward-only split via the eval step (same graph minus grad/opt).
        ev = make_eval_step(model, anchors)
        for k in keys[:2]:
            losses = ev(state, batch, k)
        sync(losses["total_loss"])
        t0 = time.perf_counter()
        for k in keys[2:]:
            losses = ev(state, batch, k)
        sync(losses["total_loss"])
        fwd_s = (time.perf_counter() - t0) / (len(keys) - 2)
        rec["fwd_ms"] = round(fwd_s * 1e3, 2)
        rec["bwd_opt_ms"] = round((step_s - fwd_s) * 1e3, 2)

    print(json.dumps(rec))


if __name__ == "__main__":
    main()
