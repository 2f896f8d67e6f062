"""Radio-realistic synthetic survey generator (data/synthetic.py)."""

import numpy as np

from caesar_mrcnn_tpu.data.synthetic import CLASSES, SkySimulator, write_survey
from caesar_mrcnn_tpu.data.dataset import SourceDataset


def test_simulator_produces_all_classes_and_valid_masks():
    sim = SkySimulator(size=128, seed=3)
    counts = {c: 0 for c in CLASSES}
    for _ in range(40):
        img, objs = sim.sample()
        assert img.shape == (128, 128) and np.isfinite(img).all()
        for o in objs:
            counts[o["class"]] += 1
            assert o["mask"].dtype == bool and o["mask"].sum() >= 5
            assert o["snr"] > 3.0
    assert all(v > 0 for v in counts.values()), counts
    # source-dominated skew like the reference survey
    assert counts["source"] > counts["galaxy"]


def test_simulator_deterministic_per_seed():
    a, _ = SkySimulator(size=64, seed=11).sample()
    b, _ = SkySimulator(size=64, seed=11).sample()
    np.testing.assert_array_equal(a, b)


def test_write_survey_roundtrips_through_datalist_loader(tmp_path):
    lst = write_survey(str(tmp_path), 4, seed=5, size=128)
    ds = SourceDataset()
    ds.set_class_dict(CLASSES)
    assert ds.load_data_from_json_list(lst) == 0
    ds.prepare()
    assert ds.num_images == 4
    img = ds.load_image(0)
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    mask, cids = ds.load_mask(0)
    assert mask.shape[:2] == (128, 128) and mask.shape[2] == len(cids)
    assert mask.any(axis=(0, 1)).all()  # every stored mask is non-empty
    assert ds.compute_class_weights() == 0
