"""ModelTester end-to-end on a synthetic dataset with a fake detector:
confusion matrix, completeness/reliability CSVs, mAP dumps."""

import json
import os

import numpy as np
import pytest
from scipy import ndimage

from caesar_mrcnn_tpu.analysis.tester import ModelTester
from caesar_mrcnn_tpu.config import detector_config
from caesar_mrcnn_tpu.data.dataset import SourceDataset
from caesar_mrcnn_tpu.utils import fits as F


class FakeDetector:
    """Thresholds channel 0; labels everything class 2 ('source')."""

    def detect(self, images, verbose=0):
        results = []
        for img in images:
            chan = img[..., 0].astype(np.float32)
            mask = chan > 0.9 * chan.max() if chan.max() > 0 else chan > np.inf
            labels, n_all = ndimage.label(mask)
            keep = [i + 1 for i in range(n_all) if (labels == i + 1).sum() >= 20]
            n = len(keep)
            masks = (
                np.stack([(labels == k) for k in keep], axis=-1)
                if n else np.zeros(chan.shape + (0,), bool)
            )
            boxes = [
                [ys.min(), xs.min(), ys.max() + 1, xs.max() + 1]
                for k in keep for ys, xs in [np.nonzero(labels == k)]
            ]
            results.append({
                "rois": np.array(boxes, np.int32).reshape(n, 4),
                "class_ids": np.full(n, 2, np.int32),
                "scores": np.full(n, 0.9, np.float32),
                "masks": masks,
            })
        return results


@pytest.fixture()
def dataset(tmp_path):
    ds = SourceDataset()
    ds.set_class_dict({"sidelobe": 1, "source": 2, "galaxy": 3})
    rng = np.random.RandomState(0)
    for i in range(3):
        img = rng.normal(0, 0.005, (96, 96)).astype(np.float32)
        y, x = 20 + 10 * i, 25 + 8 * i
        img[y:y + 16, x:x + 16] += 8.0
        mask = np.zeros((96, 96), np.float32)
        mask[y:y + 16, x:x + 16] = 1.0
        F.write_fits(img, str(tmp_path / f"img{i}.fits"))
        F.write_fits(mask, str(tmp_path / f"mask{i}.fits"))
    # 2 images labeled source (match), 1 labeled galaxy (misclassification)
    rows = [
        f"{tmp_path}/img0.fits,{tmp_path}/mask0.fits,source",
        f"{tmp_path}/img1.fits,{tmp_path}/mask1.fits,source",
        f"{tmp_path}/img2.fits,{tmp_path}/mask2.fits,galaxy",
    ]
    lst = str(tmp_path / "list.dat")
    with open(lst, "w") as f:
        f.write("\n".join(rows))
    assert ds.load_data_from_list(lst) == 0
    ds.prepare()
    return ds


def test_model_tester(dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = detector_config(
        num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        score_thr=0.5,
        iou_thr=0.6,
        image_min_dim=96,
        image_max_dim=96,
    )
    tester = ModelTester(FakeDetector(), cfg, dataset)
    tester.outdir = str(tmp_path)
    assert tester.test() == 0

    # confusion matrix: 2 source->source, 1 galaxy->source
    assert tester.classification_matrix[2, 2] == 2
    assert tester.classification_matrix[3, 2] == 1
    assert tester.nobjs_true[2] == 2 and tester.nobjs_true[3] == 1
    assert tester.nobjs_det[2] == 3
    assert tester.nobjs_det_right[2] == 2

    perf = tester.compute_performances()
    assert perf["completeness"][2] == 1.0      # both sources found
    assert perf["reliability"][2] == pytest.approx(2 / 3)

    # CSV tables
    comp = open(tmp_path / "completeness.csv").read().splitlines()
    rel = open(tmp_path / "reliability.csv").read().splitlines()
    assert comp[0].startswith("# img,")
    assert len(comp) == 4  # header + 3 GT objects
    assert len(rel) == 4   # header + 3 detections
    assert "detected" in comp[0] and "matching_gt" in rel[0]

    # mAP dumps in the three external-evaluator formats
    assert os.path.isdir(tmp_path / "groundtruths")
    assert os.path.isdir(tmp_path / "detections")
    assert os.path.isfile(tmp_path / "ground_truth_boxes.json")
    assert os.path.isfile(tmp_path / "predicted_boxes.json")
    assert os.path.isfile(tmp_path / "metric_computation_input.json")
    summary = json.load(open(tmp_path / "map_summary.json"))
    # the 'source' class is perfectly detected for 2/2 GT -> per-class AP 1.0
    assert summary["voc"]["source"] == pytest.approx(1.0, abs=1e-6)
    assert 0 <= summary["matterport_mAP@0.5"] <= 1.0
    assert 0 <= summary["coco"]["mAP"] <= 1.0
