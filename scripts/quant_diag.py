"""Int8 quantization quality diagnostic on TRAINED weights.

Trains the small overfit model (examples/overfit_synthetic.py recipe),
quantizes the detect graph, and reports WHERE the int8 path diverges from
the exact one: per-stage relative L2 (pyramid, RPN logits/deltas,
classifier logits/deltas, mask probs) plus per-image detection tables and
GT recall for both paths. Distinguishes real quantization damage from NMS
threshold discreteness on duplicate borderline boxes.

Usage: python scripts/quant_diag.py [steps]
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


def main(steps=250):
    import jax
    import jax.numpy as jnp

    from examples.overfit_synthetic import make_dataset
    from caesar_mrcnn_tpu.config import detector_config, inference_config
    from caesar_mrcnn_tpu.data.generator import TrainingPipeline
    from caesar_mrcnn_tpu.inference.detector import Detector
    from caesar_mrcnn_tpu.models import heads_int8 as Q
    from caesar_mrcnn_tpu.models.mask_rcnn import MaskRCNN, init_model
    from caesar_mrcnn_tpu.models.meta import compose_image_meta
    from caesar_mrcnn_tpu.train.trainer import create_train_state, make_train_step
    from caesar_mrcnn_tpu.utils.anchors import get_anchors

    cfg = detector_config(
        backbone="custom", image_min_dim=128, image_max_dim=128,
        num_classes=4, class_names=("bkg", "sidelobe", "source", "galaxy"),
        images_per_device=4, rpn_anchor_scales=(8, 16, 32, 64, 128),
        rpn_train_anchors_per_image=128, pre_nms_limit=1024,
        post_nms_rois_training=256, post_nms_rois_inference=128,
        train_rois_per_image=64, max_gt_instances=8,
        detection_max_instances=16, use_mini_mask=True,
        mini_mask_shape=(56, 56), optimizer="adam", learning_rate=1e-3,
        compute_dtype="float32", score_thr=0.5,
    )
    tmp = tempfile.mkdtemp()
    ds = make_dataset(tmp)
    pipe = TrainingPipeline(ds, cfg, seed=0, augmentation=False)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    state, tx = create_train_state(cfg, variables)
    step = make_train_step(model, tx, pipe.anchors_normalized())
    rng = jax.random.PRNGKey(1)
    batches = pipe.batches()
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        state, losses = step(state, next(batches), sub)
    print(f"trained {steps} steps, total_loss={float(losses['total_loss']):.3f}")

    icfg = inference_config(cfg)
    trained = {"params": jax.device_get(state.params)}
    if state.batch_stats:
        trained["batch_stats"] = jax.device_get(state.batch_stats)
    det = Detector(icfg, model, trained)

    # --- stage-level errors on a real molded training image -------------
    img = ds.load_image(0)
    molded, metas, _ = det.mold_inputs([img])
    anchors = get_anchors(icfg, molded[0].shape)
    host_vars = jax.device_get(det.variables)
    folded = Q.fold_detect(host_vars, icfg)
    scales = Q.calibrate_detect(
        model, host_vars, icfg, folded, molded, metas, anchors, batch=1
    )
    qtree = Q.quantize_detect(folded, scales)
    vars_f = dict(host_vars); vars_f["folded"] = folded
    vars_q = dict(host_vars); vars_q["quant"] = qtree
    f_st = Q.folded_stages(icfg)
    q_st = Q.int8_stages(icfg)

    x = jnp.asarray(molded)
    pyr_f = f_st["features"](vars_f, x)
    pyr_q = q_st["features"](vars_q, x)
    for i, (pf, pq) in enumerate(zip(pyr_f, pyr_q)):
        print(f"  P{i+2}: rel_l2={rel_l2(pq, pf):.4f} "
              f"(|f32| max {float(jnp.abs(pf).max()):.2f})")
    rpn_f = f_st["rpn"](vars_f, pyr_f)
    rpn_q = q_st["rpn"](vars_q, pyr_f)  # same pyramid input: isolate RPN error
    print(f"  rpn logits rel_l2={rel_l2(rpn_q[0], rpn_f[0]):.4f} "
          f"deltas rel_l2={rel_l2(rpn_q[2], rpn_f[2]):.4f}")
    # interesting calibration scales
    for site in ("bb/conv1", "rpn/shared@p2", "cls/conv1", "mask/conv1"):
        print(f"  scale[{site}] = {scales[site]:.5f} (range {scales[site]*127:.2f})")

    # --- detection tables + GT recall ------------------------------------
    qdet = Detector(icfg.replace(quant_mode="int8"), model, trained)

    def gt_boxes(img_id):
        m, cls = ds.load_mask(img_id)
        out = []
        for k in range(m.shape[-1]):
            ys, xs = np.where(m[..., k])
            out.append((ys.min(), xs.min(), ys.max(), xs.max(), int(cls[k])))
        return out

    def iou(a, b):
        yy1, xx1 = max(a[0], b[0]), max(a[1], b[1])
        yy2, xx2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0, yy2 - yy1) * max(0, xx2 - xx1)
        ua = ((a[2]-a[0])*(a[3]-a[1]) + (b[2]-b[0])*(b[3]-b[1]) - inter)
        return inter / ua if ua > 0 else 0.0

    rec_f = rec_q = n_gt = 0
    for img_id in range(6):
        img = ds.load_image(img_id)
        rf = det.detect([img])[0]
        rq = qdet.detect([img])[0]
        print(f"img {img_id}: f32 " + str([
            (int(c), round(float(s), 2), [int(v) for v in b])
            for c, s, b in zip(rf["class_ids"], rf["scores"], rf["rois"])]))
        print(f"        int8 " + str([
            (int(c), round(float(s), 2), [int(v) for v in b])
            for c, s, b in zip(rq["class_ids"], rq["scores"], rq["rois"])]))
        for g in gt_boxes(img_id):
            n_gt += 1
            rec_f += any(iou(g, b) > 0.3 for b in rf["rois"])
            rec_q += any(iou(g, b) > 0.3 for b in rq["rois"])
    print(f"GT recall (IoU>0.3, any score): f32 {rec_f}/{n_gt}  int8 {rec_q}/{n_gt}")
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 250))
