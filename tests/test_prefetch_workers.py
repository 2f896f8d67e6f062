"""Multi-worker prefetch: parallel sample production, correct batch shapes."""

import numpy as np

from caesar_mrcnn_tpu.config import detector_config
from caesar_mrcnn_tpu.data.dataset import SourceDataset
from caesar_mrcnn_tpu.data.generator import TrainingPipeline
from caesar_mrcnn_tpu.utils import fits as F


def _dataset(tmp_path, n=4):
    ds = SourceDataset()
    ds.set_class_dict({"source": 2})
    rng = np.random.RandomState(0)
    rows = []
    for i in range(n):
        img = rng.rand(64, 64).astype(np.float32)
        mask = np.zeros((64, 64), np.float32)
        mask[10 + i : 30 + i, 10:30] = 1
        F.write_fits(img, f"{tmp_path}/i{i}.fits")
        F.write_fits(mask, f"{tmp_path}/m{i}.fits")
        rows.append(f"{tmp_path}/i{i}.fits,{tmp_path}/m{i}.fits,source")
    with open(f"{tmp_path}/l.dat", "w") as f:
        f.write("\n".join(rows))
    ds.load_data_from_list(f"{tmp_path}/l.dat")
    ds.prepare()
    return ds


def test_multiworker_prefetch(tmp_path):
    ds = _dataset(tmp_path)
    cfg = detector_config(
        image_min_dim=64, image_max_dim=64, num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        images_per_device=2, rpn_anchor_scales=(8, 16, 32, 64, 128),
        max_gt_instances=4, use_mini_mask=True, mini_mask_shape=(28, 28),
    )
    pipe = TrainingPipeline(ds, cfg, seed=0, num_workers=4)
    it = pipe.prefetch(device_put=False)
    batches = [next(it) for _ in range(4)]
    for b in batches:
        # compact wire (the default): mono image channel, sparse RPN targets
        assert b["images"].shape == (2, 64, 64, 1)
        assert (b["gt_class_ids"] > 0).sum() == 2  # one GT per image
        assert np.isfinite(b["rpn_pos_deltas"]).all()
        assert b["rpn_pos_idx"].dtype == np.int32


def test_sample_cache_identity_and_eviction(tmp_path):
    """Cross-epoch load cache: hit path bit-identical, LRU stays in budget."""
    ds = _dataset(tmp_path, n=6)
    cfg = detector_config(
        image_min_dim=64, image_max_dim=64, num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        images_per_device=2, rpn_anchor_scales=(8, 16, 32, 64, 128),
        max_gt_instances=4, use_mini_mask=True, mini_mask_shape=(28, 28),
    )
    plain = TrainingPipeline(ds, cfg, seed=0, augmentation=True)
    cached = TrainingPipeline(ds, cfg, seed=0, augmentation=True,
                              cache_bytes=1 << 30)
    for i in range(6):
        cached.make_sample(i)  # populate (miss path)
    assert len(cached._cache) == 6 and cached._cache_used > 0
    for i in range(6):
        a = plain.make_sample(i, rng=np.random.RandomState(i))
        b = cached.make_sample(i, rng=np.random.RandomState(i))  # hit path
        for k in a:
            assert a[k].dtype == b[k].dtype, k
            assert np.array_equal(a[k], b[k]), k

    # tiny budget -> evicts down to a single resident entry, still correct
    tiny = TrainingPipeline(ds, cfg, seed=0, cache_bytes=1)
    for i in range(6):
        tiny.make_sample(i)
    assert len(tiny._cache) == 1
    assert tiny._cache_used <= next(iter(tiny._cache.values()))[1]

    # random-crop resize mode must disable caching entirely
    crop_cfg = detector_config(
        image_min_dim=64, image_max_dim=64, num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        images_per_device=2, rpn_anchor_scales=(8, 16, 32, 64, 128),
        max_gt_instances=4, image_resize_mode="crop",
    )
    nocache = TrainingPipeline(ds, crop_cfg, seed=0, cache_bytes=1 << 30)
    assert nocache._cache_budget == 0
