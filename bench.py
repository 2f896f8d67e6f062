"""Detect-throughput benchmark on real hardware.

Measures the driver north-star: images/sec/chip for 512^2 FITS detect on
the flagship ResNet-101+FPN model (BASELINE.md; baseline target
50 img/sec/chip). Prints ONE JSON line.

The measured step is the full jitted detect graph (backbone -> FPN -> RPN
-> proposal NMS -> heads -> per-class NMS -> masks) in bfloat16 on
device-resident inputs; host unmold is excluded (it runs overlapped with
the next device step in production via the prefetch pipeline).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from caesar_mrcnn_tpu.config import detector_config
    from caesar_mrcnn_tpu.models.mask_rcnn import init_model, make_inference_fn
    from caesar_mrcnn_tpu.models.meta import compose_image_meta
    from caesar_mrcnn_tpu.utils.anchors import get_anchors

    batch = 8
    size = 512
    cfg = detector_config(
        num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        image_min_dim=size,
        image_max_dim=size,
        images_per_device=batch,
        num_devices=1,
        compute_dtype="bfloat16",
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    fn = make_inference_fn(model)

    h, w, c = cfg.image_shape
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, h, w, c).astype(np.float32))
    meta = np.stack(
        [
            compose_image_meta(
                i, (h, w, c), (h, w, c), (0, 0, h, w), 1.0, np.ones(cfg.num_classes)
            )
            for i in range(batch)
        ]
    ).astype(np.float32)
    metas = jnp.asarray(meta)
    anchors = jnp.asarray(get_anchors(cfg))

    def sync(o):
        # On tunneled platforms block_until_ready can return before the
        # device work drains; a tiny host fetch is the reliable fence.
        np.asarray(o.detections[0, 0, :1])

    # compile + warmup
    out = fn(variables, images, metas, anchors)
    sync(out)
    for _ in range(2):
        out = fn(variables, images, metas, anchors)
    sync(out)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, images, metas, anchors)
    sync(out)  # queue drains in order: fetching the last output fences all
    dt = time.perf_counter() - t0

    img_per_sec = batch * iters / dt
    baseline = 50.0
    print(
        json.dumps(
            {
                "metric": "img/sec/chip at 512^2 FITS detect (resnet101 bf16 batch 8)",
                "value": round(img_per_sec, 2),
                "unit": "img/s",
                "vs_baseline": round(img_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
