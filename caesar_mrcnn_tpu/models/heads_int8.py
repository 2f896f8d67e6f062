"""Full int8 post-training-quantized detect graph (serving path).

Extends the backbone quantization of ``models/backbone_int8.py`` to every
conv/matmul-heavy stage of the inference graph — FPN, RPN shared conv,
classifier fc1/fc2, mask-head 3x3 stack — the stages the int8 MXU probe
(``scripts/quant_probe.py``) measured at 1.4-2.7x over bf16 on v5e (394
int8 TOPS vs 197 bf16 TFLOPS). Small output layers (RPN 1x1 heads,
class-logits/bbox denses, mask deconv + per-class 1x1) stay in the model's
compute dtype: they are a rounding error of the FLOPs and keeping them
full-precision protects the box/score/mask numerics.

Design: ONE topology function per stage executed by both arithmetic modes —
``folded_stages`` (f32 convs on BN-folded weights; used for calibration and
for fold-exactness tests) and ``int8_stages`` (per-out-channel int8 weights,
per-tensor int8 activations, int32 MXU accumulation). The two modes can
never drift because they share the stage code; they plug into
``mask_rcnn.forward_inference(stages=...)`` so proposals/ROIAlign/refine/
mask-select orchestration stays the single source of truth.

Weight trees ride inside the ``variables`` dict under the extra collections
``"folded"`` / ``"quant"`` (flax ignores unknown collections), so jitted
functions take them as traced arguments rather than baked-in constants.

Calibration is max-abs over a representative batch, observed at every
quantized conv input while running the folded f32 graph — per-tensor
symmetric, matching ``backbone_int8.calibrate``. The RPN shared conv is
applied once per pyramid level; each level gets its own activation scale
(sites ``rpn/shared@p2``..``@p6``) over the same shared int8 weights.

reference: mrcnn/model.py:2134-2159 (inference graph being quantized);
speed evidence: scripts/quant_probe.py MEASURED table.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbone_int8 import _walk_resnet, fold_bn, fold_conv_bn, quantize_conv

_LEVELS = ("p2", "p3", "p4", "p5", "p6")
_DIMNUMS = ("NHWC", "HWIO", "NHWC")
_FPN_CONVS = (
    "fpn_c5p5", "fpn_c4p4", "fpn_c3p3", "fpn_c2p2",
    "fpn_p2", "fpn_p3", "fpn_p4", "fpn_p5",
)


def _dtype(cfg):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _pad_for(site: str):
    """Padding per conv site: the stem keeps the reference's explicit 3-pad
    (backbone.py:101); classifier fc1 is the VALID pool-window conv
    (heads.py:35); everything else is SAME."""
    if site == "bb/conv1":
        return [(3, 3), (3, 3)]
    if site == "cls/conv1":
        return "VALID"
    return "SAME"


# ------------------------------------------------------------------ folding


def fold_detect(variables: Dict, cfg) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """BN-fold every quantized conv of the detect graph.

    Returns {site: (w f32, b f32)}. Sites: ``bb/<conv>`` (backbone, see
    backbone_int8.fold_bn), ``fpn/<name>`` (plain conv+bias — the FPN has
    no BN, backbone.py:127-153), ``rpn/shared``, ``cls/conv{1,2}`` and
    ``mask/conv{1..4}`` (conv+frozen-BN pairs, heads.py).
    """
    folded = {f"bb/{k}": v for k, v in fold_bn(variables, cfg.backbone).items()}
    p = variables["params"]
    s = variables["batch_stats"]

    for name in _FPN_CONVS:
        cp = p["fpn"][name]
        folded[f"fpn/{name[4:]}"] = (
            np.asarray(cp["kernel"], np.float32),
            np.asarray(cp["bias"], np.float32),
        )

    rp = p["rpn_head"]["rpn_conv_shared"]
    folded["rpn/shared"] = (
        np.asarray(rp["kernel"], np.float32),
        np.asarray(rp["bias"], np.float32),
    )

    ch, chs = p["classifier_head"], s["classifier_head"]
    for i in (1, 2):
        folded[f"cls/conv{i}"] = fold_conv_bn(
            ch[f"mrcnn_class_conv{i}"],
            ch[f"mrcnn_class_bn{i}"]["BatchNorm_0"],
            chs[f"mrcnn_class_bn{i}"]["BatchNorm_0"],
        )

    mh, mhs = p["mask_head"], s["mask_head"]
    for i in range(1, 5):
        folded[f"mask/conv{i}"] = fold_conv_bn(
            mh[f"mrcnn_mask_conv{i}"],
            mh[f"mrcnn_mask_bn{i}"]["BatchNorm_0"],
            mhs[f"mrcnn_mask_bn{i}"]["BatchNorm_0"],
        )
    return folded


def quantize_detect(
    folded: Dict[str, Tuple[np.ndarray, np.ndarray]],
    act_scales: Dict[str, float],
) -> Dict[str, Dict[str, np.ndarray]]:
    """{site: int8 conv pack} for every calibrated site.

    Scale sites may carry an ``@level`` suffix (RPN shared conv applied per
    pyramid level): the int8 weights are shared, the activation scale is
    per level.
    """
    return {
        site: quantize_conv(*folded[site.split("@")[0]], s_in)
        for site, s_in in act_scales.items()
    }


# ------------------------------------------------------------------- stages


def _build_stages(cfg, make_conv: Callable, dt) -> Dict[str, Callable]:
    """The shared stage topology over a pluggable conv implementation.

    ``make_conv(variables)`` returns ``conv(site, x, strides=1)`` producing
    the POST-BN linear conv output in f32; relu/residual/merge arithmetic
    lives here. Non-quantized layers read their params from
    ``variables["params"]`` and run in ``dt``.
    """

    def features(variables, images):
        conv = make_conv(variables)
        c2, c3, c4, c5 = _walk_resnet(
            images, lambda n, x, strides: conv(f"bb/{n}", x, strides),
            cfg.backbone,
        )
        # FPN top-down merge (backbone.py:136-153)
        def up2(x):
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

        p5 = conv("fpn/c5p5", c5)
        p4 = up2(p5) + conv("fpn/c4p4", c4)
        p3 = up2(p4) + conv("fpn/c3p3", c3)
        p2 = up2(p3) + conv("fpn/c2p2", c2)
        p2 = conv("fpn/p2", p2)
        p3 = conv("fpn/p3", p3)
        p4 = conv("fpn/p4", p4)
        p5 = conv("fpn/p5", p5)
        p6 = p5[:, ::2, ::2, :]
        return tuple(x.astype(dt) for x in (p2, p3, p4, p5, p6))

    def rpn(variables, pyramid):
        conv = make_conv(variables)
        rp = variables["params"]["rpn_head"]
        kc = rp["rpn_class_raw"]["kernel"][0, 0].astype(dt)
        bc = rp["rpn_class_raw"]["bias"].astype(dt)
        kb = rp["rpn_bbox_pred"]["kernel"][0, 0].astype(dt)
        bb = rp["rpn_bbox_pred"]["bias"].astype(dt)
        logits_l, probs_l, bbox_l = [], [], []
        for lvl, p in zip(_LEVELS, pyramid):
            shared = jax.nn.relu(
                conv(f"rpn/shared@{lvl}", p, cfg.rpn_anchor_stride)
            ).astype(dt)
            b = p.shape[0]
            lg = (shared @ kc + bc).reshape(b, -1, 2).astype(jnp.float32)
            bx = (shared @ kb + bb).reshape(b, -1, 4).astype(jnp.float32)
            logits_l.append(lg)
            probs_l.append(jax.nn.softmax(lg, axis=-1))
            bbox_l.append(bx)
        return (
            jnp.concatenate(logits_l, axis=1),
            jnp.concatenate(probs_l, axis=1),
            jnp.concatenate(bbox_l, axis=1),
        )

    def classifier(variables, pooled):
        conv = make_conv(variables)
        ch = variables["params"]["classifier_head"]
        b, r = pooled.shape[:2]
        x = pooled.reshape((b * r,) + pooled.shape[2:])
        x = jax.nn.relu(conv("cls/conv1", x))   # VALID pool-window conv = fc1
        x = jax.nn.relu(conv("cls/conv2", x))
        shared = x.reshape(x.shape[0], -1).astype(dt)
        kl = ch["mrcnn_class_logits"]["kernel"].astype(dt)
        bl = ch["mrcnn_class_logits"]["bias"].astype(dt)
        logits = (shared @ kl + bl).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        kd = ch["mrcnn_bbox_fc"]["kernel"].astype(dt)
        bd = ch["mrcnn_bbox_fc"]["bias"].astype(dt)
        deltas = (shared @ kd + bd).reshape(-1, cfg.num_classes, 4)
        return (
            logits.reshape(b, r, -1),
            probs.reshape(b, r, -1),
            deltas.reshape(b, r, cfg.num_classes, 4).astype(jnp.float32),
        )

    def mask(variables, pooled):
        conv = make_conv(variables)
        mh = variables["params"]["mask_head"]
        b, r = pooled.shape[:2]
        x = pooled.reshape((b * r,) + pooled.shape[2:])
        for i in range(1, 5):
            x = jax.nn.relu(conv(f"mask/conv{i}", x))
        kd = mh["mrcnn_mask_deconv"]["kernel"].astype(dt)
        bd = mh["mrcnn_mask_deconv"]["bias"].astype(dt)
        x = jax.lax.conv_transpose(
            x.astype(dt), kd, (2, 2), "SAME", dimension_numbers=_DIMNUMS
        ) + bd
        x = jax.nn.relu(x)
        km = mh["mrcnn_mask"]["kernel"][0, 0].astype(dt)
        bm = mh["mrcnn_mask"]["bias"].astype(dt)
        m = jax.nn.sigmoid((x @ km + bm).astype(jnp.float32))
        return m.reshape((b, r) + m.shape[1:])

    return {
        "features": features, "rpn": rpn,
        "classifier": classifier, "mask": mask,
    }


def folded_stages(cfg, observe: "Callable | None" = None) -> Dict[str, Callable]:
    """f32 stages over BN-folded weights (``variables["folded"]``).

    ``observe(site, conv_input)`` is a trace-time hook on every quantized
    conv input — `calibrate_detect` uses it to record activation ranges.
    Matches the standard graph exactly for a float32-compute model (fold
    is exact for frozen BN), which is what the fold-exactness test asserts.
    """

    def make_conv(variables):
        folded = variables["folded"]

        def conv(site, x, strides=1):
            if observe is not None:
                observe(site, x)
            w, b = folded[site.split("@")[0]]
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.float32),
                jnp.asarray(w, jnp.float32),
                (strides, strides),
                _pad_for(site),
                dimension_numbers=_DIMNUMS,
            )
            return y + jnp.asarray(b, jnp.float32)

        return conv

    return _build_stages(cfg, make_conv, jnp.float32)


def int8_stages(cfg) -> Dict[str, Callable]:
    """int8 stages over a quantized tree (``variables["quant"]``).

    Each conv: per-tensor int8 input quantize -> int8 conv with int32
    accumulation (MXU int8 path) -> fused f32 dequant epilogue
    (per-channel scale + folded bias). Elementwise glue runs in f32/``dt``
    between convs; XLA fuses it into the conv epilogues.
    """
    dt = _dtype(cfg)

    def make_conv(variables):
        qtree = variables["quant"]

        def conv(site, x, strides=1):
            q = qtree[site]
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / q["s_in"]), -127, 127
            ).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xq,
                q["w"],
                (strides, strides),
                _pad_for(site),
                dimension_numbers=_DIMNUMS,
                preferred_element_type=jnp.int32,
            )
            return acc.astype(jnp.float32) * q["sw"] + q["b"]

        return conv

    return _build_stages(cfg, make_conv, dt)


# -------------------------------------------------------------- calibration


def calibrate_detect(
    model,
    variables: Dict,
    cfg,
    folded: Dict[str, Tuple[np.ndarray, np.ndarray]],
    molded: np.ndarray,
    image_metas: np.ndarray,
    anchors: np.ndarray,
    batch: "int | None" = None,
) -> Dict[str, float]:
    """Per-tensor activation scales from max-abs over a calibration batch.

    Runs the folded f32 detect graph (so every observed conv input is
    bit-identical to what the standard frozen-BN graph would feed that
    conv) and records ``max|x|`` at each quantized site. Returns
    {site: maxabs/127}. ``molded`` are MOLDED images — exactly the detect
    graph's input distribution.
    """
    from .mask_rcnn import forward_inference

    batch = int(batch or cfg.batch_size)
    reds: Dict[str, jnp.ndarray] = {}

    def observe(site, x):
        reds[site] = jnp.max(jnp.abs(x.astype(jnp.float32)))

    stages = folded_stages(cfg, observe=observe)

    @jax.jit
    def run(vars_f, im, me, an):
        reds.clear()
        forward_inference(model, vars_f, im, me, an, stages=stages)
        return dict(reds)

    vars_f = dict(variables)
    vars_f["folded"] = folded
    molded = np.asarray(molded, np.float32)
    image_metas = np.asarray(image_metas, np.float32)
    anchors = jnp.asarray(anchors)
    maxabs: Dict[str, float] = {}
    for i in range(0, len(molded), batch):
        im = molded[i : i + batch]
        me = image_metas[i : i + batch]
        if len(im) < batch:  # pad to the compiled batch to avoid a recompile
            k = batch - len(im)
            im = np.concatenate([im, im[:1].repeat(k, axis=0)], axis=0)
            me = np.concatenate([me, me[:1].repeat(k, axis=0)], axis=0)
        out = jax.device_get(run(vars_f, jnp.asarray(im), jnp.asarray(me), anchors))
        for k_, v in out.items():
            maxabs[k_] = max(maxabs.get(k_, 0.0), float(v))
    return {k_: max(v, 1e-12) / 127.0 for k_, v in maxabs.items()}


def build_detect_qtree(
    model, variables: Dict, cfg, molded, image_metas, anchors,
) -> Dict[str, Dict[str, np.ndarray]]:
    """fold + calibrate + quantize the full detect graph (host-side)."""
    folded = fold_detect(variables, cfg)
    scales = calibrate_detect(
        model, variables, cfg, folded, molded, image_metas, anchors
    )
    return quantize_detect(folded, scales)
