"""Full train -> evaluate cycle on a 3-class synthetic radio dataset.

Trains the detector to distinguish compact sources, extended 'galaxies'
and faint elongated 'sidelobes', then runs the complete ModelTester
evaluation (confusion matrix, completeness/reliability CSVs, mAP in all
three evaluator formats) on a held-out split.

Usage: python examples/train_eval_synthetic.py [train_steps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLASSES = {"sidelobe": 1, "source": 2, "galaxy": 3}


def _blob(size, cy, cx, sy, sx, angle=0.0):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    ca, sa = np.cos(angle), np.sin(angle)
    dy = (yy - cy) * ca + (xx - cx) * sa
    dx = -(yy - cy) * sa + (xx - cx) * ca
    return np.exp(-(dy ** 2 / (2 * sy ** 2) + dx ** 2 / (2 * sx ** 2)))


def make_dataset(tmp, n_images, seed, size=128):
    """Images with 1-3 objects of random classes; per-object FITS masks."""
    from caesar_mrcnn_tpu.data.dataset import SourceDataset
    from caesar_mrcnn_tpu.utils import fits as F
    import json

    rng = np.random.RandomState(seed)
    ds = SourceDataset()
    ds.set_class_dict(CLASSES)
    os.makedirs(tmp, exist_ok=True)
    for i in range(n_images):
        img = rng.normal(0.0, 0.05, (size, size)).astype(np.float32)
        objs = []
        for _ in range(rng.randint(1, 4)):
            cls = rng.choice(list(CLASSES))
            cy, cx = rng.randint(25, size - 25, 2)
            if cls == "source":          # compact bright
                s = rng.uniform(3.0, 5.0)
                blob = 12.0 * _blob(size, cy, cx, s, s)
            elif cls == "galaxy":        # extended diffuse
                s = rng.uniform(7.0, 11.0)
                blob = 4.0 * _blob(size, cy, cx, s, rng.uniform(0.7, 1.0) * s)
            else:                        # sidelobe: faint elongated
                sy = rng.uniform(8.0, 12.0)
                sx = rng.uniform(1.5, 2.5)
                blob = 2.0 * _blob(size, cy, cx, sy, sx, rng.uniform(0, np.pi))
            img += blob.astype(np.float32)
            mask = (blob > 0.15 * blob.max()).astype(np.float32)
            mpath = f"{tmp}/m{i}_{len(objs)}.fits"
            F.write_fits(mask, mpath)
            objs.append((mpath, cls))
        ipath = f"{tmp}/i{i}.fits"
        F.write_fits(img, ipath)
        # json descriptor (exercises the json loader + metadata path)
        desc = {
            "img": os.path.basename(ipath),
            "telescope": "SYN", "bkg": 0.0, "rms": 0.05,
            "bmaj": 1.5e-3, "bmin": 1.2e-3, "dx": 2.8e-4, "dy": 2.8e-4,
            "nx": size, "ny": size,
            "objs": [
                {"mask": os.path.basename(m), "class": c, "nislands": 1,
                 "sidelobe-mixed": 0, "sidelobe-near": 0, "name": f"S{i}_{k}",
                 "snr": 10.0, "maxsize_beam": 2.0, "minsize_beam": 1.0,
                 "border": 0}
                for k, (m, c) in enumerate(objs)
            ],
        }
        with open(f"{tmp}/i{i}.json", "w") as f:
            json.dump(desc, f)
    lst = f"{tmp}/list.dat"
    with open(lst, "w") as f:
        f.write("\n".join(f"{tmp}/i{i}.json" for i in range(n_images)))
    assert ds.load_data_from_json_list(lst) == 0
    ds.prepare()
    return ds


def main(steps=2000):
    import jax

    from caesar_mrcnn_tpu.config import detector_config, inference_config
    from caesar_mrcnn_tpu.data.generator import TrainingPipeline
    from caesar_mrcnn_tpu.inference.detector import Detector
    from caesar_mrcnn_tpu.models.mask_rcnn import init_model
    from caesar_mrcnn_tpu.analysis.tester import ModelTester
    from caesar_mrcnn_tpu.train.trainer import create_train_state, make_train_step

    base = dict(
        backbone="custom",
        image_min_dim=128,
        image_max_dim=128,
        num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        rpn_anchor_scales=(8, 16, 32, 64, 128),
        rpn_train_anchors_per_image=128,
        pre_nms_limit=1024,
        post_nms_rois_training=256,
        post_nms_rois_inference=128,
        train_rois_per_image=100,
        max_gt_instances=8,
        detection_max_instances=16,
        use_mini_mask=True,
        mini_mask_shape=(56, 56),
        optimizer="adam",
        learning_rate=1e-3,
        compute_dtype="float32",
        score_thr=0.5,
        iou_thr=0.5,
    )
    cfg = detector_config(images_per_device=8, **base)
    work = tempfile.mkdtemp()
    print("workdir:", work)
    ds_train = make_dataset(f"{work}/train", 48, seed=0)
    ds_test = make_dataset(f"{work}/test", 16, seed=999)

    pipe = TrainingPipeline(ds_train, cfg, seed=0, augmentation=True, num_workers=4)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    state, tx = create_train_state(cfg, variables)
    step = make_train_step(model, tx, pipe.anchors_normalized())
    rng = jax.random.PRNGKey(1)
    batches = pipe.prefetch()
    t0 = time.time()
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        state, losses = step(state, next(batches), sub)
        if (i + 1) % 200 == 0:
            print(f"step {i + 1}: total_loss={float(losses['total_loss']):.3f}")
    print(f"trained {steps} steps in {time.time() - t0:.0f}s")

    icfg = inference_config(detector_config(images_per_device=4, **base))
    det = Detector(icfg, *init_model(icfg, jax.random.PRNGKey(0)))
    det.variables = {"params": jax.device_get(state.params)}
    if state.batch_stats:
        det.variables["batch_stats"] = jax.device_get(state.batch_stats)

    os.chdir(work)
    tester = ModelTester(det, icfg, ds_test)
    tester.outdir = work
    tester.test()
    perf = tester.compute_performances()
    print("confusion matrix (rows=true, cols=pred):")
    print(tester.classification_matrix.astype(int))
    print("completeness per class:", np.round(perf["completeness"], 3))
    print("reliability per class:", np.round(perf["reliability"], 3))
    summary = tester.compute_mAP()
    print("VOC per-class AP:", {k: round(v, 3) for k, v in summary["voc"].items()})
    print("matterport mAP@0.5:", round(summary["matterport_mAP@0.5"], 3))
    return 0


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    sys.exit(main(steps))
