"""End-to-end learning smoke: overfit a small model on synthetic radio
sources and verify detections emerge.

Runs on whatever jax backend is active (TPU in production, CPU works too).
Usage: python examples/overfit_synthetic.py [steps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(tmp, n_images=16, size=128, seed=0):
    from caesar_mrcnn_tpu.data.dataset import SourceDataset
    from caesar_mrcnn_tpu.utils import fits as F

    rng = np.random.RandomState(seed)
    ds = SourceDataset()
    ds.set_class_dict({"sidelobe": 1, "source": 2, "galaxy": 3})
    rows = []
    for i in range(n_images):
        img = rng.normal(0.0, 0.05, (size, size)).astype(np.float32)
        mask = np.zeros((size, size), np.float32)
        # 1-3 gaussian blobs per image, sized for good anchor coverage
        # (~20-35 px, between the 16/32 anchor scales)
        for _ in range(rng.randint(1, 4)):
            cy, cx = rng.randint(24, size - 24, 2)
            s = rng.uniform(3.5, 6.0)
            yy, xx = np.mgrid[0:size, 0:size]
            blob = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
            img += 10.0 * blob.astype(np.float32)
            mask[blob > 0.1] = 1.0
        ip = f"{tmp}/img{i}.fits"
        mp = f"{tmp}/mask{i}.fits"
        F.write_fits(img, ip)
        F.write_fits(mask, mp)
        rows.append(f"{ip},{mp},source")
    lst = f"{tmp}/list.dat"
    with open(lst, "w") as f:
        f.write("\n".join(rows))
    assert ds.load_data_from_list(lst) == 0
    ds.prepare()
    return ds


def main(steps=150):
    import jax

    from caesar_mrcnn_tpu.config import detector_config, inference_config
    from caesar_mrcnn_tpu.data.generator import TrainingPipeline
    from caesar_mrcnn_tpu.inference.detector import Detector
    from caesar_mrcnn_tpu.models.mask_rcnn import init_model
    from caesar_mrcnn_tpu.train.trainer import create_train_state, make_train_step

    cfg = detector_config(
        backbone="custom",
        image_min_dim=128,
        image_max_dim=128,
        num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        images_per_device=4,
        rpn_anchor_scales=(8, 16, 32, 64, 128),
        rpn_train_anchors_per_image=128,
        pre_nms_limit=1024,
        post_nms_rois_training=256,
        post_nms_rois_inference=128,
        train_rois_per_image=64,
        max_gt_instances=8,
        detection_max_instances=16,
        use_mini_mask=True,
        mini_mask_shape=(56, 56),
        optimizer="adam",
        learning_rate=1e-3,
        compute_dtype="float32",
        score_thr=0.5,
    )
    tmp = tempfile.mkdtemp()
    ds = make_dataset(tmp)
    pipe = TrainingPipeline(ds, cfg, seed=0, augmentation=False)

    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    state, tx = create_train_state(cfg, variables)
    step = make_train_step(model, tx, pipe.anchors_normalized())

    rng = jax.random.PRNGKey(1)
    batches = pipe.batches()
    t0 = time.time()
    first_loss = None
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        batch = next(batches)
        state, losses = step(state, batch, sub)
        if i == 0:
            tot = float(losses["total_loss"])
            first_loss = tot
            print(f"step 1: total_loss={tot:.4f} (compile {time.time() - t0:.0f}s)")
        elif (i + 1) % 25 == 0:
            print(f"step {i + 1}: total_loss={float(losses['total_loss']):.4f}")
    final_loss = float(losses["total_loss"])
    print(f"loss {first_loss:.3f} -> {final_loss:.3f} in {steps} steps, "
          f"{(time.time() - t0) / steps * 1000:.0f} ms/step avg")

    # detect on a training image with the trained weights
    icfg = inference_config(cfg)
    det = Detector(icfg, *init_model(icfg, jax.random.PRNGKey(0)))
    det.variables = {"params": jax.device_get(state.params)}
    if state.batch_stats:
        det.variables["batch_stats"] = jax.device_get(state.batch_stats)
    n_det = 0
    for img_id in range(3):
        img = ds.load_image(img_id)
        r = det.detect([img])[0]
        good = [
            (int(c), round(float(s), 3))
            for c, s in zip(r["class_ids"], r["scores"])
            if s > 0.3
        ]
        gt_mask, _ = ds.load_mask(img_id)
        print(
            f"train image {img_id}: {len(r['class_ids'])} detections, "
            f"{len(good)} with score>0.3 {good[:6]} (GT: {gt_mask.shape[-1]})"
        )
        n_det += len(good)
    assert final_loss < first_loss, "loss did not decrease"
    print("OK" if n_det else "WARNING: no detections emerged yet (train longer)")

    # int8 quality gate on the TRAINED weights (config.quant_mode): the
    # quantized detect graph must RECALL the same GT sources as the exact
    # one. (Detection-set matching is the wrong gate here: a 150-250-step
    # model emits stacks of duplicate borderline boxes per source and NMS
    # reshuffles them under tiny perturbations — measured stage-level int8
    # error is only 3-7% rel-L2, see scripts/quant_diag.py.)
    qdet = Detector(
        icfg.replace(quant_mode="int8"), det.model, jax.device_get(det.variables)
    )

    def iou(a, b):
        yy1, xx1 = max(a[0], b[0]), max(a[1], b[1])
        yy2, xx2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0, yy2 - yy1) * max(0, xx2 - xx1)
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / ua if ua > 0 else 0.0

    rec_f = rec_q = n_gt = 0
    for img_id in range(6):
        img = ds.load_image(img_id)
        rf = det.detect([img])[0]
        rq = qdet.detect([img])[0]
        gt_mask, _ = ds.load_mask(img_id)
        for k in range(gt_mask.shape[-1]):
            ys, xs = np.where(gt_mask[..., k])
            g = (ys.min(), xs.min(), ys.max(), xs.max())
            n_gt += 1
            rec_f += any(iou(g, b) > 0.3 for b in rf["rois"])
            rec_q += any(iou(g, b) > 0.3 for b in rq["rois"])
    print(f"GT recall on trained weights: f32 {rec_f}/{n_gt}, int8 {rec_q}/{n_gt}")
    assert rec_q >= rec_f - 1, (
        f"int8 graph lost GT recall: {rec_q}/{n_gt} vs f32 {rec_f}/{n_gt}"
    )
    return 0


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    sys.exit(main(steps))
