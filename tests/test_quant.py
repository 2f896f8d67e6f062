"""Int8 post-training quantization: BN-fold exactness, bounded quantization
error, and the Detector auto-calibration path (config.quant_mode="int8").

The folded f32 stages must match the standard frozen-BN graph bit-near for
a float32-compute model (fold is algebraically exact); the int8 stages must
stay within a small relative error of the folded graph. Stage-level
comparisons avoid NMS threshold discreteness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caesar_mrcnn_tpu.config import detector_config, inference_config
from caesar_mrcnn_tpu.inference.detector import Detector
from caesar_mrcnn_tpu.models import backbone_int8 as BQ
from caesar_mrcnn_tpu.models import heads_int8 as Q
from caesar_mrcnn_tpu.models.mask_rcnn import MaskRCNN, init_model
from caesar_mrcnn_tpu.models.meta import compose_image_meta
from caesar_mrcnn_tpu.utils.anchors import get_anchors


def _small_cfg(**kw):
    base = dict(
        backbone="custom",
        image_min_dim=128,
        image_max_dim=128,
        num_classes=4,
        class_names=("bkg", "sidelobe", "source", "galaxy"),
        images_per_device=2,
        pre_nms_limit=256,
        post_nms_rois_inference=64,
        detection_max_instances=16,
        compute_dtype="float32",
        score_thr=0.0,
    )
    base.update(kw)
    return detector_config(**base)


def _jitter(variables, seed=7):
    """Non-trivial BN statistics/affine params so folding is exercised
    (init leaves mean=0, var=1, scale=1, bias=0 — fold would be near-trivial)."""
    rs = np.random.RandomState(seed)

    def jit_stats(path, x):
        name = path[-1].key
        x = np.asarray(x)
        if name == "mean":
            return x + rs.normal(0.0, 0.2, x.shape).astype(x.dtype)
        if name == "var":
            return x * rs.uniform(0.5, 1.8, x.shape).astype(x.dtype)
        return x

    def jit_params(path, x):
        names = [p.key for p in path]
        x = np.asarray(x)
        if "BatchNorm_0" in names:
            if names[-1] == "scale":
                return x * rs.uniform(0.7, 1.4, x.shape).astype(x.dtype)
            return x + rs.normal(0.0, 0.1, x.shape).astype(x.dtype)
        return x

    return {
        "params": jax.tree_util.tree_map_with_path(jit_params, variables["params"]),
        "batch_stats": jax.tree_util.tree_map_with_path(
            jit_stats, variables["batch_stats"]
        ),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = _small_cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(3))
    variables = _jitter(variables)
    rs = np.random.RandomState(11)
    h, w, c = cfg.image_shape
    molded = rs.uniform(0, 255, (cfg.batch_size, h, w, c)).astype(np.float32)
    meta = compose_image_meta(
        0, (h, w, c), (h, w, c), (0, 0, h, w), 1.0, np.zeros(cfg.num_classes)
    )
    metas = np.tile(meta.astype(np.float32), (cfg.batch_size, 1))
    anchors = get_anchors(cfg, (h, w, c))
    return cfg, model, variables, molded, metas, anchors


def _rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_backbone_fold_exact(setup):
    cfg, model, variables, molded, _, _ = setup
    bb_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }
    folded = BQ.fold_bn(bb_vars, cfg.backbone)
    c_folded = BQ.folded_forward(folded, jnp.asarray(molded), cfg.backbone)
    from caesar_mrcnn_tpu.models.backbone import ResNet

    resnet = ResNet(cfg.backbone, train_bn=False, dtype=jnp.float32)
    c_ref = resnet.apply(bb_vars, jnp.asarray(molded), False)
    for cf, cr in zip(c_folded, c_ref):
        assert _rel_l2(cf, cr) < 1e-5


def test_folded_detect_stages_exact(setup):
    """Every folded stage matches the standard f32 frozen-BN graph."""
    cfg, model, variables, molded, metas, anchors = setup
    folded = Q.fold_detect(variables, cfg)
    vars_f = dict(variables)
    vars_f["folded"] = folded
    stages = Q.folded_stages(cfg)

    pyr_ref = model.apply(variables, jnp.asarray(molded), False,
                          method=MaskRCNN.features)
    pyr_fold = stages["features"](vars_f, jnp.asarray(molded))
    assert len(pyr_fold) == len(pyr_ref) == 5
    for pf, pr in zip(pyr_fold, pyr_ref):
        assert pf.shape == pr.shape
        assert _rel_l2(pf, pr) < 1e-5

    rpn_ref = model.apply(variables, pyr_ref, method=MaskRCNN.rpn)
    rpn_fold = stages["rpn"](vars_f, pyr_ref)
    for rf, rr in zip(rpn_fold, rpn_ref):
        assert _rel_l2(rf, rr) < 1e-4

    rs = np.random.RandomState(5)
    pooled = rs.normal(0, 1, (cfg.batch_size, 8, cfg.pool_size,
                              cfg.pool_size, cfg.top_down_pyramid_size)
                       ).astype(np.float32)
    cls_ref = model.apply(variables, jnp.asarray(pooled), False,
                          method=MaskRCNN.classifier)
    cls_fold = stages["classifier"](vars_f, jnp.asarray(pooled))
    for cf, cr in zip(cls_fold, cls_ref):
        assert cf.shape == cr.shape
        assert _rel_l2(cf, cr) < 1e-4

    mpooled = rs.normal(0, 1, (cfg.batch_size, 8, cfg.mask_pool_size,
                               cfg.mask_pool_size, cfg.top_down_pyramid_size)
                        ).astype(np.float32)
    m_ref = model.apply(variables, jnp.asarray(mpooled), False,
                        method=MaskRCNN.mask)
    m_fold = stages["mask"](vars_f, jnp.asarray(mpooled))
    assert m_fold.shape == m_ref.shape
    assert _rel_l2(m_fold, m_ref) < 1e-4


def test_int8_stages_error_bounded(setup):
    """Calibrated int8 stages track the folded f32 graph within a small
    relative error, and the calibration emits per-level RPN scales."""
    cfg, model, variables, molded, metas, anchors = setup
    folded = Q.fold_detect(variables, cfg)
    scales = Q.calibrate_detect(
        model, variables, cfg, folded, molded, metas, anchors
    )
    # every folded site is calibrated; RPN shared is per-level
    for lvl in ("p2", "p3", "p4", "p5", "p6"):
        assert f"rpn/shared@{lvl}" in scales
    for site in folded:
        if site == "rpn/shared":
            continue
        assert site in scales, f"uncalibrated site {site}"

    qtree = Q.quantize_detect(folded, scales)
    assert qtree["rpn/shared@p2"]["w"].dtype == np.int8

    vars_f = dict(variables)
    vars_f["folded"] = folded
    vars_q = dict(variables)
    vars_q["quant"] = qtree
    f_stages = Q.folded_stages(cfg)
    q_stages = Q.int8_stages(cfg)

    x = jnp.asarray(molded)
    pyr_f = f_stages["features"](vars_f, x)
    pyr_q = q_stages["features"](vars_q, x)
    for pf, pq in zip(pyr_f, pyr_q):
        assert _rel_l2(pq, pf) < 0.25

    rpn_f = f_stages["rpn"](vars_f, pyr_f)
    rpn_q = q_stages["rpn"](vars_q, pyr_f)
    # logits in relative L2: random jittered weights produce saturated
    # softmax probabilities where infinitesimal logit error flips the prob,
    # so pointwise prob comparison is meaningless here
    assert _rel_l2(rpn_q[0], rpn_f[0]) < 0.25  # objectness logits
    assert _rel_l2(rpn_q[2], rpn_f[2]) < 0.25  # box deltas

    rs = np.random.RandomState(5)
    # synthetic pooled inputs SCALED to the calibrated activation range —
    # the scales came from the real graph's (much larger) activations, and
    # unit-variance inputs would quantize to all-zeros
    s1 = scales["cls/conv1"] * 127.0
    pooled = (s1 * 0.5 * rs.uniform(
        -1, 1, (cfg.batch_size, 8, cfg.pool_size, cfg.pool_size,
                cfg.top_down_pyramid_size))).astype(np.float32)
    cls_f = f_stages["classifier"](vars_f, jnp.asarray(pooled))
    cls_q = q_stages["classifier"](vars_q, jnp.asarray(pooled))
    assert _rel_l2(cls_q[0], cls_f[0]) < 0.3  # class logits
    assert _rel_l2(cls_q[2], cls_f[2]) < 0.3  # box deltas

    sm = scales["mask/conv1"] * 127.0
    mpooled = (sm * 0.5 * rs.uniform(
        -1, 1, (cfg.batch_size, 8, cfg.mask_pool_size, cfg.mask_pool_size,
                cfg.top_down_pyramid_size))).astype(np.float32)
    m_f = f_stages["mask"](vars_f, jnp.asarray(mpooled))
    m_q = q_stages["mask"](vars_q, jnp.asarray(mpooled))
    assert float(jnp.mean(jnp.abs(m_q - m_f))) < 0.1  # sigmoid probabilities


def test_detector_autoquant_detect_and_tiles():
    """config.quant_mode='int8': first detect() calibrates + swaps the
    graph; tile fast path works; loading fresh weights resets to exact."""
    cfg = inference_config(_small_cfg(quant_mode="int8"))
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    variables = _jitter(variables, seed=13)
    det = Detector(cfg, model, variables)
    assert det._stages is None

    rs = np.random.RandomState(2)
    img = rs.uniform(0, 255, (132, 132, 3)).astype(np.float32)
    results = det.detect([img])
    assert det._stages is not None, "auto-quantization did not trigger"
    assert "quant" in det.variables
    r = results[0]
    n = len(r["class_ids"])
    assert r["rois"].shape == (n, 4)
    assert r["masks"].shape[:2] == img.shape[:2]

    # second call reuses the quantized graph (no recalibration)
    stages_before = det._stages
    det.detect([img])
    assert det._stages is stages_before

    # tiled fast path on the quantized graph
    h, w, _ = cfg.image_shape
    tiles = rs.uniform(0, 255, (1, h, w)).astype(np.uint8)
    out = det.detect_tiles(tiles)
    assert len(out) == 1 and "rois" in out[0]

    # loading unquantized weights resets the int8 graph
    det.variables = jax.device_get(
        {k: v for k, v in det.variables.items() if k != "quant"}
    )
    assert det._stages is None
