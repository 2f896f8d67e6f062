"""SClassifier cutout classification with a fake detector."""

import numpy as np
import pytest
from scipy import ndimage

from caesar_mrcnn_tpu.analysis.classifier import SClassifier
from caesar_mrcnn_tpu.config import detector_config
from caesar_mrcnn_tpu.utils import fits as F


class FakeDetector:
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
                if n
                else np.zeros(chan.shape + (0,), bool)
            )
            boxes = [
                [ys.min(), xs.min(), ys.max() + 1, xs.max() + 1]
                for k in keep
                for ys, xs in [np.nonzero(labels == k)]
            ]
            results.append(
                {
                    "rois": np.array(boxes, np.int32).reshape(n, 4),
                    "class_ids": np.full(n, 2, np.int32),
                    "scores": np.full(n, 0.9, np.float32),
                    "masks": masks,
                }
            )
        return results


def test_sclassifier(tmp_path):
    # image with two blobs
    rng = np.random.RandomState(1)
    data = rng.normal(0, 0.01, (300, 300)).astype(np.float32)
    data[100:120, 100:120] += 5.0
    data[200:215, 230:250] += 5.0
    img_path = str(tmp_path / "img.fits")
    F.write_fits(data, img_path)

    # Caesar-style ascii catalog: 17+ columns; cols 0,5,6,13..16 used
    cat_path = str(tmp_path / "catalog.dat")
    rows = [
        # name .. x0 y0 .. xmin xmax ymin ymax
        ("S1", 110, 110, 100, 120, 100, 120),
        ("S2", 240, 207, 230, 250, 200, 215),
    ]
    with open(cat_path, "w") as f:
        f.write("# header\n")
        for name, x0, y0, xmin, xmax, ymin, ymax in rows:
            cols = [name] + ["0"] * 4 + [str(x0), str(y0)] + ["0"] * 6 + [
                str(xmin), str(xmax), str(ymin), str(ymax), "0",
            ]
            f.write(" ".join(cols) + "\n")

    cfg = detector_config(
        num_classes=4, class_names=("bkg", "sidelobe", "source", "galaxy"),
        score_thr=0.5, iou_thr=0.6,
    )
    sc = SClassifier(FakeDetector(), cfg)
    assert sc.run(img_path, cat_path) == 0
    assert len(sc.sources) == 2
    for s in sc.sources:
        assert s.visited
        assert len(s.class_info) >= 1
        assert s.class_info[0].class_name == "source"
        assert s.class_info[0].score == pytest.approx(0.9)

    out = str(tmp_path / "sclass.dat")
    sc.write_catalog(out)
    lines = open(out).read().splitlines()
    assert len(lines) == 3
    assert "source" in lines[1]
