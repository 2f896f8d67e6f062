"""Configuration system.

A frozen-by-convention dataclass replacing the reference's class-attribute
``Config`` (reference: mrcnn/config.py:17-247). Derived values
(``batch_size``, ``image_shape``, ``image_meta_size``) are computed
properties, removing the reference's fragility where argparse overrides
bypassed ``__init__`` and required manual recomputation
(reference: scripts/run.py:1631,1675).

Radio-source defaults follow ``SDetectorConfig`` (reference:
scripts/run.py:93-239).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import numpy as np


@dataclass
class Config:
    """Model + pipeline configuration.

    Defaults are the base Mask R-CNN values (reference: mrcnn/config.py);
    use :func:`detector_config` for the radio-astronomy defaults.
    """

    name: str = "config"

    # --- parallelism -----------------------------------------------------
    # Number of devices used for data parallelism (reference GPU_COUNT,
    # mrcnn/config.py:28) and images per device (IMAGES_PER_GPU).
    num_devices: int = 1
    images_per_device: int = 2

    # --- schedule ---------------------------------------------------------
    steps_per_epoch: int = 1000
    validation_steps: int = 50

    # --- backbone ----------------------------------------------------------
    backbone: str = "resnet101"  # resnet50 | resnet101 | custom
    backbone_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    fpn_classif_fc_layers_size: int = 1024
    top_down_pyramid_size: int = 256

    # --- classes ------------------------------------------------------------
    num_classes: int = 1  # includes background
    class_names: Tuple[str, ...] = ("bkg",)

    # --- anchors ------------------------------------------------------------
    rpn_anchor_scales: Tuple[int, ...] = (32, 64, 128, 256, 512)
    rpn_anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    rpn_anchor_stride: int = 1

    # --- RPN / proposals ------------------------------------------------------
    rpn_nms_threshold: float = 0.7
    rpn_train_anchors_per_image: int = 256
    pre_nms_limit: int = 6000
    post_nms_rois_training: int = 2000
    post_nms_rois_inference: int = 1000

    # --- masks -----------------------------------------------------------
    use_mini_mask: bool = True
    mini_mask_shape: Tuple[int, int] = (56, 56)
    mask_shape: Tuple[int, int] = (28, 28)
    pool_size: int = 7
    mask_pool_size: int = 14

    # --- image geometry ----------------------------------------------------
    image_resize_mode: str = "square"  # none|square|pad64|crop
    image_min_dim: int = 800
    image_max_dim: int = 1024
    image_min_scale: float = 0.0
    image_channel_count: int = 3
    # Compile the network input for an explicit (possibly NON-square)
    # (h, w) instead of the square derived from min/max dim — used by the
    # tiled detect path so rectangular tiles take the thin-wire fast path
    # instead of square-molding through host resize (reference tile knobs:
    # scripts/run.py:235-239).
    input_shape_override: Tuple[int, int] | None = None
    mean_pixel: Tuple[float, ...] = (123.7, 116.8, 103.9)

    # --- ROI heads --------------------------------------------------------
    train_rois_per_image: int = 200
    roi_positive_ratio: float = 0.33
    max_gt_instances: int = 100

    # --- bbox normalization ------------------------------------------------
    rpn_bbox_std_dev: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    bbox_std_dev: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)

    # --- detection --------------------------------------------------------
    detection_max_instances: int = 100
    detection_min_confidence: float = 0.7
    detection_nms_threshold: float = 0.3

    # --- optimization -------------------------------------------------------
    # Unlike the reference where OPTIMIZER was dead config (the Keras
    # compile hard-coded SGD, reference: mrcnn/model.py:2260-2262 vs
    # scripts/run.py:193), this knob is honored by the trainer.
    optimizer: str = "sgd"  # sgd | adam
    learning_rate: float = 0.001
    learning_momentum: float = 0.9
    weight_decay: float = 0.0001
    gradient_clip_norm: float = 5.0
    loss_weights: Dict[str, float] = field(
        default_factory=lambda: {
            "rpn_class_loss": 1.0,
            "rpn_bbox_loss": 1.0,
            "mrcnn_class_loss": 1.0,
            "mrcnn_bbox_loss": 1.0,
            "mrcnn_mask_loss": 1.0,
        }
    )
    use_losses: Dict[str, bool] = field(
        default_factory=lambda: {
            "rpn_class_loss": True,
            "rpn_bbox_loss": True,
            "mrcnn_class_loss": True,
            "mrcnn_bbox_loss": True,
            "mrcnn_mask_loss": True,
        }
    )
    use_rpn_rois: bool = True
    train_bn: bool = False  # frozen BN by default (small batches)
    mask_loss_function: str = "binary_crossentropy"  # or dice_coef_loss

    # --- numerics (TPU) ------------------------------------------------------
    # bfloat16 conv/matmul compute with float32 params & box math.
    compute_dtype: str = "bfloat16"
    # Inference-only ROIAlign gather quantization ("none" = exact; e.g.
    # "float8_e4m3fn" halves the HBM bytes of the bytes-bound pyramid
    # gather). Training always gathers exact.
    roi_gather_dtype: str = "none"
    # Post-training quantization of the detect graph ("none" | "int8").
    # "int8" runs every conv/matmul-heavy inference stage (backbone, FPN,
    # RPN shared conv, classifier fc1/fc2, mask-head 3x3 stack) with int8
    # weights+activations on the TPU int8 MXU path (v5e: 394 TOPS vs 197
    # bf16 TFLOPS; measured 1.4-2.7x per stage, scripts/quant_probe.py).
    # The Detector calibrates activation scales on its first batch (or via
    # Detector.quantize(calib_images)). Inference-only; training and the
    # box/score numerics (RPN 1x1 heads, dense heads, deconv) stay exact.
    quant_mode: str = "none"
    # Run the RPN objectness+delta 1x1 convs as one fused matmul over
    # concatenated output channels (identical math and param tree; halves
    # shared-map reads). Perf lever, see CLAUDE.md ledger.
    rpn_fused_heads: bool = False
    # Optimizer accumulator dtype ("float32" exact; "bfloat16" halves the
    # HBM bytes of SGD momentum / Adam first moment — measured lever, see
    # CLAUDE.md train ledger).
    opt_state_dtype: str = "float32"
    # Training rematerialization policy: "none" stores all activations;
    # "backbone" wraps the backbone+FPN feature pass in jax.checkpoint
    # (recompute in the backward, ~1 extra feature pass of FLOPs for the
    # largest activation savings); "all" also remats the two heads.
    train_remat: str = "none"
    # Gradient accumulation (optax.MultiSteps): the optimizer averages
    # grads over k consecutive micro-batch steps and applies ONE update,
    # emulating an effective batch of k*batch_size on memory-limited
    # chips (complements train_remat; the reference's only lever was
    # shrinking IMAGES_PER_GPU, scripts/run.py:104-106). Steps-per-epoch
    # accounting still counts micro-batches.
    grad_accum_steps: int = 1
    # Host->device wire format for training batches. "compact" (default):
    # RPN targets ride as positive/negative anchor-index lists + per-
    # positive deltas (instead of dense [A] match / [A,4] f32 deltas that
    # are ~99% zeros), GT masks ride bit-packed, and replicated-channel
    # RGB images ride one channel; trainer.mold_batch reconstructs the
    # dense tensors on device (fused into the step by XLA). ~7x fewer
    # bytes per batch (6.3 -> 0.9 MB at 256^2 b8 mini-mask) — matters on
    # slow host links and scales down the per-upload host-memory leak of
    # the dev tunnel (CLAUDE.md). "dense" ships device-shaped arrays;
    # mold_batch auto-detects by key, so externally built dense batches
    # always work.
    train_wire: str = "compact"

    # --- FITS preprocessing (reference: scripts/run.py:219-228) ---------------
    zscale_stretch: bool = True
    zscale_contrasts: Tuple[float, ...] = (0.25, 0.25, 0.25)
    normalize_img: bool = True
    img_to_uint8: bool = True
    img_to_rgb: bool = True
    bias_contrast_stretch: bool = False
    img_bias: float = 0.5
    img_contrast: float = 1.0

    # --- detection post-processing (reference: scripts/run.py:231-232) -------
    iou_thr: float = 0.6
    score_thr: float = 0.7
    # Per-class score-threshold overrides ((class_name, thr), ...); classes
    # absent fall back to the global ``score_thr``. Default pins the
    # sidelobe class at its measured F1 knee (QUALITY_r04 operating-curve
    # sweep: at the global 0.7 point sidelobe reliability was 0.611; the
    # per-class sweep knee sits at 0.9). ``()`` restores the reference's
    # single global threshold (reference: mrcnn/analyze.py:1744).
    score_thr_per_class: Tuple[Tuple[str, float], ...] = (("sidelobe", 0.9),)

    # --- tiled inference (reference: scripts/run.py:235-239) ---------------
    split_img_in_tiles: bool = False
    tile_xsize: int = 512
    tile_ysize: int = 512
    tile_xstep: float = 1.0
    tile_ystep: float = 1.0
    # host->device wire format for full-size tiles (default knobs only):
    # "u8" = host-fused zscale -> uint8 wire (thin); "raw" = f32 raw pixels
    # + on-device preprocessing; "slow" = legacy full host chain.
    tile_wire: str = "u8"
    # device->host mask wire: "uint8" quantizes sigmoid masks to u8 on
    # device (4x thinner fetch, invisible after the 0.5 unmold threshold);
    # "float32" ships raw probabilities.
    mask_wire_dtype: str = "uint8"
    # tile batches kept in flight before the first collect (dispatch
    # pipelining in SFinder.run_tiled / bench e2e). Measured knee at 2 on
    # the dev tunnel: depth 0/1/2/3 -> 60/85/89.5/86 img/s (CLAUDE.md).
    tile_pipeline_depth: int = 2
    max_ntasks_per_worker: int = 100

    # ------------------------------------------------------------------ derived
    @property
    def batch_size(self) -> int:
        """Effective global batch (reference: mrcnn/config.py:227)."""
        return self.images_per_device * self.num_devices

    @property
    def image_shape(self) -> Tuple[int, int, int]:
        """Network input shape (reference: mrcnn/config.py:229-236)."""
        if self.input_shape_override is not None:
            h, w = self.input_shape_override
            return (int(h), int(w), self.image_channel_count)
        if self.image_resize_mode == "crop":
            return (self.image_min_dim, self.image_min_dim, self.image_channel_count)
        return (self.image_max_dim, self.image_max_dim, self.image_channel_count)

    @property
    def image_meta_size(self) -> int:
        """Length of the packed image-meta vector
        (reference: mrcnn/config.py:239)."""
        return 1 + 3 + 3 + 4 + 1 + self.num_classes

    def class_score_thr(self, class_name: str) -> float:
        """Operating score threshold for one class: the per-class override
        when present, else the global ``score_thr``."""
        return dict(self.score_thr_per_class).get(class_name, self.score_thr)

    @property
    def backbone_shapes(self) -> np.ndarray:
        """[N_levels, (h, w)] feature shapes per FPN level
        (reference: mrcnn/model.py:75-89)."""
        h, w = self.image_shape[:2]
        return np.array(
            [[int(np.ceil(h / s)), int(np.ceil(w / s))] for s in self.backbone_strides],
            dtype=np.int32,
        )

    @property
    def num_anchors(self) -> int:
        """Total anchor count over the pyramid."""
        n = 0
        for hw in self.backbone_shapes:
            per_loc = len(self.rpn_anchor_ratios)
            ny = int(np.ceil(hw[0] / self.rpn_anchor_stride))
            nx = int(np.ceil(hw[1] / self.rpn_anchor_stride))
            n += ny * nx * per_loc
        return n

    # ------------------------------------------------------------------ misc
    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["batch_size"] = self.batch_size
        d["image_shape"] = list(self.image_shape)
        d["image_meta_size"] = self.image_meta_size
        return d

    def display(self) -> str:
        """Readable dump (reference: mrcnn/config.py:241-247)."""
        lines = ["", "Configurations:"]
        for k, v in sorted(self.to_dict().items()):
            lines.append("{:30} {}".format(k, v))
        lines.append("")
        return "\n".join(lines)

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=str)


def detector_config(**overrides: Any) -> Config:
    """Radio-source detector defaults (reference: scripts/run.py:93-239)."""
    base = dict(
        name="rg-dataset",
        num_devices=1,
        images_per_device=2,
        num_classes=1,
        class_names=("bkg",),
        validation_steps=max(1, 200 // 2),
        steps_per_epoch=(16439 - 200) // 2,
        detection_min_confidence=0.0,
        detection_nms_threshold=0.3,
        rpn_anchor_scales=(4, 8, 16, 32, 64),
        max_gt_instances=300,
        backbone="resnet101",
        backbone_strides=(4, 8, 16, 32, 64),
        image_resize_mode="square",
        image_min_dim=256,
        image_max_dim=256,
        mean_pixel=(0.0, 0.0, 0.0),
        rpn_nms_threshold=0.9,
        rpn_train_anchors_per_image=512,
        train_rois_per_image=512,
        rpn_anchor_ratios=(0.5, 1.0, 2.0),
        learning_rate=0.0005,
        optimizer="adam",
        use_mini_mask=False,
    )
    base.update(overrides)
    return Config(**base)


def inference_config(cfg: Config, **overrides: Any) -> Config:
    """Batch-1 inference variant (reference: scripts/run.py:1641-1657)."""
    kw: Dict[str, Any] = dict(num_devices=1, images_per_device=1)
    kw.update(overrides)
    return cfg.replace(**kw)
