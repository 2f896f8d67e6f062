"""End-to-end training *pipeline* benchmark (host producer -> wire -> step).

bench_train.py measures the device step with a device-resident batch; this
script measures what a real run sees: samples produced by the threaded
TrainingPipeline, shipped over the host->device wire (config.train_wire:
"compact" index/bit-packed tensors vs "dense" f32/u8 — see
trainer.mold_batch), and consumed by the jitted train step. A per-step loss
fetch fences each step (conservative: train_loop itself only fetches every
log_every=50 steps), so the number slightly understates the steady-state
steps/s of `cli/run.py train`.

Reference hot loop: mrcnn/model.py:2487-2499 (fit_generator with worker
pool); the wire has no reference analogue — TF feeds host tensors — but on
a tunneled dev TPU (16-21 MB/s upload) and on production PCIe alike the
bytes/step decide whether the producer or the device binds.

Usage (chip):
  python scripts/bench_pipeline.py --datalist /tmp/wiretest/train/datalist.dat \
      --wire compact --steps 120
Prints ONE JSON line: steady s/step, img/s, wire MB/step, producer-only rate.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--datalist", required=True)
    p.add_argument("--wire", choices=("dense", "compact"), default="compact")
    p.add_argument("--steps", type=int, default=120, help="timed steps")
    p.add_argument("--warmup", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--nthreads", type=int, default=4)
    p.add_argument("--data-cache-gb", type=float, default=4.0)
    p.add_argument("--producer-only", action="store_true",
                   help="time the host producer alone (no device step)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from caesar_mrcnn_tpu.config import detector_config
    from caesar_mrcnn_tpu.data.dataset import Dataset
    from caesar_mrcnn_tpu.data.generator import TrainingPipeline
    from caesar_mrcnn_tpu.models.mask_rcnn import init_model
    from caesar_mrcnn_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    cfg = detector_config(
        num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        image_min_dim=args.size,
        image_max_dim=args.size,
        images_per_device=args.batch,
        num_devices=1,
        compute_dtype="bfloat16",
        use_mini_mask=True,
        max_gt_instances=64,
        train_wire=args.wire,
    )

    ds = Dataset(cfg)
    ds.load_data_from_json_list(args.datalist)
    ds.prepare()

    pipeline = TrainingPipeline(
        ds, cfg, augmentation=True, seed=0, num_workers=args.nthreads,
        cache_bytes=int(args.data_cache_gb * (1 << 30)),
    )

    # wire bytes per step, from one host batch (before device_put)
    host_batch = next(pipeline.batches(args.batch))
    wire_bytes = sum(v.nbytes for v in host_batch.values())

    if args.producer_only:
        # threaded producer (prefetch with num_workers), device_put skipped
        # — matches the producer the e2e path actually runs, not the serial
        # batches() iterator
        it = pipeline.prefetch(args.batch, device_put=False)
        for _ in range(args.warmup):
            next(it)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            next(it)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"train pipeline producer-only ({args.wire} wire)",
            "s_per_step": round(dt / args.steps, 4),
            "img_per_sec": round(args.batch * args.steps / dt, 1),
            "wire_MB_per_step": round(wire_bytes / 1e6, 3),
            "nthreads": args.nthreads,
        }))
        return

    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    state, tx = create_train_state(cfg, variables)
    step = make_train_step(model, tx, pipeline.anchors_normalized())

    batches = pipeline.prefetch()
    rng = jax.random.PRNGKey(42)

    if args.warmup < 1:
        p.error("--warmup must be >= 1 (the first step compiles)")
    for _ in range(args.warmup):  # compile + queue fill
        rng, sub = jax.random.split(rng)
        state, losses = step(state, next(batches), sub)
    float(losses["total_loss"])  # fence

    t0 = time.perf_counter()
    for _ in range(args.steps):
        rng, sub = jax.random.split(rng)
        state, losses = step(state, next(batches), sub)
        # Per-step loss fetch: a conservative timing choice, not train_loop
        # parity (train_loop fetches losses only every log_every=50 steps).
        # It fences every step — honest on the axon platform where
        # block_until_ready does not fence (CLAUDE.md) — at the cost of a
        # ~6 ms tunnel round-trip that mildly understates the steady rate.
        float(losses["total_loss"])
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": f"train pipeline e2e ({args.wire} wire)",
        "s_per_step": round(dt / args.steps, 4),
        "img_per_sec": round(args.batch * args.steps / dt, 1),
        "wire_MB_per_step": round(wire_bytes / 1e6, 3),
        "batch": args.batch,
        "size": args.size,
        "nthreads": args.nthreads,
        "steps": args.steps,
    }))


if __name__ == "__main__":
    main()
