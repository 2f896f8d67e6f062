"""Main CLI: ``python -m caesar_mrcnn_tpu.cli.run [opts] {train,test,detect}``.

Flag-compatible re-design of the reference application script
(reference: scripts/run.py:1263-1766): the same ~60-flag surface, the same
three run modes, dataset factories for the three loader types, config
overrides, and weight loading with optional first-layer exclusion for
grayscale retraining (reference: scripts/run.py:1737-1740).

Differences by design:
* devices come from the jax runtime (``--ngpu`` maps to data-parallel
  device count on the mesh);
* the optimizer flag is real (reference's OPTIMIZER was dead config);
* multi-host tile-parallel detect uses jax.distributed instead of MPI.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional, Tuple

import numpy as np

from .. import logger
from ..config import Config, detector_config, inference_config

DEFAULT_LOGS_DIR = "logs"


# ----------------------------------------------------------------- parsing


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Train/evaluate/apply the TPU-native radio-source Mask R-CNN."
    )
    parser.add_argument(
        "command", metavar="<command>",
        help="'train', 'test', 'detect' or 'export' (AOT serving artifact)",
    )
    parser.add_argument(
        "--export_path", type=str, default=None,
        help="output path for the 'export' command (StableHLO artifact + "
        ".json sidecar)",
    )

    # COMMON OPTIONS (reference: scripts/run.py:1272-1304)
    parser.add_argument("--imgsize", type=int, default=256)
    parser.add_argument("--grayimg", action="store_true", default=False)
    parser.add_argument("--no_uint8", dest="to_uint8", action="store_false", default=True)
    parser.add_argument("--no_zscale", dest="zscale", action="store_false", default=True)
    parser.add_argument("--zscale_contrasts", type=str, default="0.25,0.25,0.25")
    parser.add_argument("--biascontrast", action="store_true", default=False)
    parser.add_argument("--bias", type=float, default=0.5)
    parser.add_argument("--contrast", type=float, default=1.0)
    parser.add_argument("--no_norm_img", dest="norm_img", action="store_false", default=True)

    parser.add_argument(
        "--classdict", type=str, default='{"sidelobe":1,"source":2,"galaxy":3}'
    )
    parser.add_argument("--classdict_model", type=str, default="")
    parser.add_argument("--remap_classids", action="store_true", default=False)
    parser.add_argument("--classid_remap_dict", type=str, default="")

    parser.add_argument("--dataloader", type=str, default="datalist",
                        choices=["datalist", "datalist_json", "datadir_json"])
    parser.add_argument("--datalist", default=None)
    parser.add_argument("--datalist_train", default=None)
    parser.add_argument("--datalist_val", default=None)
    parser.add_argument("--datadir", default=None)
    parser.add_argument("--validation_data_fract", type=float, default=0.1)
    parser.add_argument("--maxnimgs", type=int, default=-1)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--logs", default=DEFAULT_LOGS_DIR)
    parser.add_argument("--nthreads", type=int, default=1)
    # Cross-epoch cache of decoded+resized training samples (GB, 0 disables):
    # skips per-epoch FITS decode + zscale + resize, the dominant host cost
    # on few-CPU hosts. Auto-disabled under the random-crop resize mode.
    parser.add_argument("--data_cache_gb", type=float, default=4.0)

    # TRAIN OPTIONS (reference: scripts/run.py:1306-1352)
    parser.add_argument("--ngpu", type=int, default=1,
                        help="number of data-parallel devices on the mesh")
    parser.add_argument("--nimg_per_gpu", type=int, default=1)
    parser.add_argument("--nepochs", type=int, default=1)
    parser.add_argument("--epoch_length", type=int, default=None)
    parser.add_argument("--nvalidation_steps", type=int, default=None)
    parser.add_argument("--rpn_anchor_scales", type=str, default="4,8,16,32,64")
    parser.add_argument("--max_gt_instances", type=int, default=300)
    parser.add_argument("--backbone", type=str, default="resnet101")
    parser.add_argument("--backbone_strides", type=str, default="4,8,16,32,64")
    parser.add_argument("--rpn_nms_threshold", type=float, default=0.7)
    parser.add_argument("--rpn_train_anchors_per_image", type=int, default=512)
    parser.add_argument("--train_rois_per_image", type=int, default=512)
    parser.add_argument("--rpn_anchor_ratios", type=str, default="0.5,1,2")
    # capacity knobs (defaults = reference values; lower for small images)
    parser.add_argument(
        "--serving", action="store_true", default=False,
        help="measured serving preset for test/detect: int8 detect graph "
        "+ proposal budget pre_nms 3000 / post_nms_inference 512 — both "
        "quality-neutral by full mAP A/Bs (QUALITY_r04 int8, QUALITY_r05 "
        "trim) and +43%% device throughput combined (v5e: 211.6 bf16 -> "
        "303.0 img/s). Explicit --quant_mode/--pre_nms_limit/"
        "--post_nms_rois_inference flags override the preset.",
    )
    parser.add_argument("--pre_nms_limit", type=int, default=None)
    parser.add_argument("--post_nms_rois_training", type=int, default=2000)
    parser.add_argument("--post_nms_rois_inference", type=int, default=None)
    parser.add_argument("--detection_max_instances", type=int, default=100)
    parser.add_argument("--use_mini_mask", action="store_true", default=False)
    parser.add_argument("--rpn_class_loss_weight", type=float, default=1.0)
    parser.add_argument("--rpn_bbox_loss_weight", type=float, default=1.0)
    parser.add_argument("--mrcnn_class_loss_weight", type=float, default=1.0)
    parser.add_argument("--mrcnn_bbox_loss_weight", type=float, default=1.0)
    parser.add_argument("--mrcnn_mask_loss_weight", type=float, default=1.0)
    for name in ("rpn_class_loss", "rpn_bbox_loss", "mrcnn_class_loss",
                 "mrcnn_bbox_loss", "mrcnn_mask_loss"):
        parser.add_argument(f"--{name}", dest=name, action="store_true", default=True)
        parser.add_argument(f"--no_{name}", dest=name, action="store_false")
    parser.add_argument("--mask_loss_function", type=str, default="binary_crossentropy",
                        choices=["binary_crossentropy", "dice_coef_loss"])
    parser.add_argument("--roi_gather_dtype", type=str, default="none",
                        help="inference ROIAlign gather buffer dtype; "
                             "'float8_e4m3fn' halves the gather bytes")
    parser.add_argument("--quant_mode", type=str, default=None,
                        choices=["none", "int8"],
                        help="post-training quantization of the detect "
                             "graph: 'int8' runs the conv stages on the "
                             "TPU int8 MXU path, calibrated on the first "
                             "batch (inference commands only)")
    parser.add_argument("--train_wire", type=str, default="compact",
                        choices=["compact", "dense"],
                        help="host->device training batch format: 'compact' "
                             "ships sparse RPN targets, bit-packed masks and "
                             "mono images (~7x fewer bytes, reconstructed on "
                             "device); 'dense' ships device-shaped arrays")
    parser.add_argument("--optimizer", type=str, default="adam", choices=["adam", "sgd"])
    parser.add_argument(
        "--grad_accum_steps", type=int, default=1,
        help="average grads over k micro-batches per optimizer update "
             "(effective batch = k * nimg_per_gpu * ngpu)",
    )
    parser.add_argument("--learning_rate", type=float, default=0.0005)
    parser.add_argument("--trainable_layers", type=str, default="all",
                        choices=["heads", "3+", "4+", "5+", "all"])
    parser.add_argument("--weight_classes", action="store_true", default=False)
    parser.add_argument("--exclude_first_layer_weights", action="store_true", default=False)
    parser.add_argument(
        "--exclude_layers", type=str, default="",
        help="comma-separated layer-name patterns to skip when restoring "
        "--weights (reference load_weights exclude=[...], "
        "mrcnn/model.py:2197-2239 — e.g. the COCO head set "
        "'mrcnn_class_logits,mrcnn_bbox_fc,mrcnn_bbox,mrcnn_mask' used by "
        "scripts/train_all.py:475-488)",
    )
    parser.add_argument("--no_augmentation", dest="use_augmentation",
                        action="store_false", default=True)

    # TEST OPTIONS (reference: scripts/run.py:1355-1361)
    parser.add_argument("--scoreThr", type=float, default=0.7)
    parser.add_argument(
        "--scoreThrPerClass", default="sidelobe=0.9",
        help="per-class score-threshold overrides 'name=thr[,name=thr...]' "
        "(default: sidelobe at its measured F1 knee); 'none' restores the "
        "reference's single global --scoreThr",
    )
    parser.add_argument("--iouThr", type=float, default=0.6)
    # Parity-with-a-bug: the reference parses this flag and sets it on the
    # dataset but nothing ever reads it (reference: scripts/run.py:1022);
    # accepted here for CLI compatibility and equally inert.
    parser.add_argument("--consider_sources_near_mixed_sidelobes",
                        action="store_true", default=True)
    parser.add_argument("--no_consider_sources_near_mixed_sidelobes",
                        dest="consider_sources_near_mixed_sidelobes", action="store_false")

    # DETECT OPTIONS (reference: scripts/run.py:1363-1371)
    parser.add_argument("--image", type=str, default=None)
    parser.add_argument("--xmin", type=int, default=-1)
    parser.add_argument("--xmax", type=int, default=-1)
    parser.add_argument("--ymin", type=int, default=-1)
    parser.add_argument("--ymax", type=int, default=-1)
    parser.add_argument("--detect_outfile", type=str, default="")
    parser.add_argument("--detect_outfile_json", type=str, default="")

    # PARALLEL OPTIONS (reference: scripts/run.py:1373-1381)
    parser.add_argument("--split_img_in_tiles", action="store_true", default=False)
    parser.add_argument("--tile_xsize", type=int, default=512)
    parser.add_argument("--tile_ysize", type=int, default=512)
    parser.add_argument("--tile_xstep", type=float, default=1.0)
    parser.add_argument("--tile_ystep", type=float, default=1.0)
    parser.add_argument(
        "--tile_wire", choices=("u8", "raw", "slow"), default="u8",
        help="host->device wire for full-size tiles: fused-uint8 (default), "
             "raw f32 with on-device preprocessing, or the legacy host chain",
    )

    return parser.parse_args(argv)


def validate_args(args) -> int:
    """(reference: scripts/run.py:1387-1443)."""
    if args.command not in ("train", "test", "detect", "export"):
        logger.error("Unknown command %s", args.command)
        return -1
    if args.command == "export" and not args.export_path:
        logger.error("--export_path required for export")
        return -1
    if args.command in ("train", "test"):
        if args.dataloader in ("datalist", "datalist_json"):
            has_list = args.datalist or (args.datalist_train and args.datalist_val)
            if not has_list:
                logger.error("--datalist (or train+val lists) required for %s", args.command)
                return -1
        elif args.dataloader == "datadir_json" and not args.datadir:
            logger.error("--datadir required for datadir_json loader")
            return -1
    if args.command == "detect" and not args.image:
        logger.error("--image required for detect")
        return -1
    return 0


# ------------------------------------------------------------------ config


def _parse_score_thr_per_class(spec: str):
    """'name=thr[,name=thr...]' -> ((name, thr), ...); '', 'none' -> ()."""
    spec = (spec or "").strip()
    if not spec or spec.lower() == "none":
        return ()
    out = []
    for item in spec.split(","):
        name, _, thr = item.partition("=")
        if not _ or not name.strip():
            raise SystemExit(
                f"--scoreThrPerClass: bad item {item!r} (want name=thr)"
            )
        out.append((name.strip(), float(thr)))
    return tuple(out)


def build_config(args) -> Config:
    """argparse -> Config (replaces the reference's post-construction
    attribute mutation, scripts/run.py:1624-1708)."""
    class_dict = json.loads(args.classdict_model or args.classdict)
    names = ["bkg"] + [None] * len(class_dict)
    for name, cid in class_dict.items():
        names[cid] = name
    class_names = tuple(n or f"class{i}" for i, n in enumerate(names))

    cfg = detector_config(
        num_classes=len(class_names),
        class_names=class_names,
        image_min_dim=args.imgsize,
        image_max_dim=args.imgsize,
        num_devices=args.ngpu,
        images_per_device=args.nimg_per_gpu,
        rpn_anchor_scales=tuple(int(v) for v in args.rpn_anchor_scales.split(",")),
        rpn_anchor_ratios=tuple(float(v) for v in args.rpn_anchor_ratios.split(",")),
        backbone=args.backbone,
        backbone_strides=tuple(int(v) for v in args.backbone_strides.split(",")),
        rpn_nms_threshold=args.rpn_nms_threshold,
        rpn_train_anchors_per_image=args.rpn_train_anchors_per_image,
        train_rois_per_image=args.train_rois_per_image,
        max_gt_instances=args.max_gt_instances,
        # --serving preset (measured, quality-gated) supplies the defaults
        # for the serving-side knobs; explicit flags always win
        pre_nms_limit=(
            args.pre_nms_limit
            if args.pre_nms_limit is not None
            else (3000 if args.serving else 6000)),
        post_nms_rois_training=args.post_nms_rois_training,
        post_nms_rois_inference=(
            args.post_nms_rois_inference
            if args.post_nms_rois_inference is not None
            else (512 if args.serving else 1000)),
        detection_max_instances=args.detection_max_instances,
        use_mini_mask=args.use_mini_mask,
        image_channel_count=1 if args.grayimg else 3,
        mean_pixel=(0.0,) if args.grayimg else (0.0, 0.0, 0.0),
        optimizer=args.optimizer,
        grad_accum_steps=args.grad_accum_steps,
        learning_rate=args.learning_rate,
        roi_gather_dtype=args.roi_gather_dtype,
        quant_mode=(
            args.quant_mode
            if args.quant_mode is not None
            else ("int8" if args.serving else "none")),
        train_wire=args.train_wire,
        mask_loss_function=args.mask_loss_function,
        loss_weights={
            "rpn_class_loss": args.rpn_class_loss_weight,
            "rpn_bbox_loss": args.rpn_bbox_loss_weight,
            "mrcnn_class_loss": args.mrcnn_class_loss_weight,
            "mrcnn_bbox_loss": args.mrcnn_bbox_loss_weight,
            "mrcnn_mask_loss": args.mrcnn_mask_loss_weight,
        },
        use_losses={
            "rpn_class_loss": args.rpn_class_loss,
            "rpn_bbox_loss": args.rpn_bbox_loss,
            "mrcnn_class_loss": args.mrcnn_class_loss,
            "mrcnn_bbox_loss": args.mrcnn_bbox_loss,
            "mrcnn_mask_loss": args.mrcnn_mask_loss,
        },
        zscale_stretch=args.zscale,
        zscale_contrasts=tuple(float(v) for v in args.zscale_contrasts.split(",")),
        normalize_img=args.norm_img,
        img_to_uint8=args.to_uint8,
        img_to_rgb=not args.grayimg,
        bias_contrast_stretch=args.biascontrast,
        img_bias=args.bias,
        img_contrast=args.contrast,
        score_thr=args.scoreThr,
        score_thr_per_class=_parse_score_thr_per_class(args.scoreThrPerClass),
        iou_thr=args.iouThr,
        split_img_in_tiles=args.split_img_in_tiles,
        tile_xsize=args.tile_xsize,
        tile_ysize=args.tile_ysize,
        tile_xstep=args.tile_xstep,
        tile_ystep=args.tile_ystep,
        tile_wire=args.tile_wire,
    )
    return cfg


# ----------------------------------------------------------------- datasets


def _make_dataset(args, cfg: Config):
    from ..data.dataset import SourceDataset

    ds = SourceDataset()
    ds.set_class_dict(json.loads(args.classdict))
    ds.apply_zscale = args.zscale
    ds.zscale_contrasts = [float(v) for v in args.zscale_contrasts.split(",")]
    ds.convert_to_uint8 = args.to_uint8
    ds.convert_to_rgb = not args.grayimg
    ds.apply_biascontrast = args.biascontrast
    ds.bias = args.bias
    ds.contrast = args.contrast
    return ds


def create_train_val_datasets(args, cfg: Config):
    """(reference: scripts/run.py:893-987)."""
    from ..data.dataset import create_train_val_sets_from_list

    train_list, val_list = args.datalist_train, args.datalist_val
    if args.dataloader in ("datalist", "datalist_json") and args.datalist and not train_list:
        with open(args.datalist) as f:
            rows = [r for r in f.read().splitlines() if r.strip()]
        train_list, val_list = create_train_val_sets_from_list(
            rows, crossval_size=args.validation_data_fract
        )
    ds_train = _make_dataset(args, cfg)
    ds_val = _make_dataset(args, cfg)
    if args.dataloader == "datalist":
        ds_train.load_data_from_list(train_list, args.maxnimgs)
        ds_val.load_data_from_list(val_list, args.maxnimgs)
    elif args.dataloader == "datalist_json":
        ds_train.load_data_from_json_list(train_list, args.maxnimgs)
        ds_val.load_data_from_json_list(val_list, args.maxnimgs)
    elif args.dataloader == "datadir_json":
        ds_train.load_data_from_json_search(args.datadir, args.maxnimgs)
        ds_val.load_data_from_json_search(args.datadir, args.maxnimgs)
    for ds in (ds_train, ds_val):
        if args.weight_classes:
            ds.compute_class_weights()
        ds.prepare()
    return ds_train, ds_val


def create_test_dataset(args, cfg: Config):
    """(reference: scripts/run.py:992-1046)."""
    ds = _make_dataset(args, cfg)
    if args.dataloader == "datalist":
        ds.load_data_from_list(args.datalist, args.maxnimgs)
    elif args.dataloader == "datalist_json":
        ds.load_data_from_json_list(args.datalist, args.maxnimgs)
    elif args.dataloader == "datadir_json":
        ds.load_data_from_json_search(args.datadir, args.maxnimgs)
    ds.prepare()
    return ds


# --------------------------------------------------------------- run modes


def _exclude_patterns(args) -> Optional[List[str]]:
    """Layer-name exclusion list for --weights restore (reference
    load_weights exclude semantics, mrcnn/model.py:2197-2239)."""
    patterns = [p.strip() for p in args.exclude_layers.split(",") if p.strip()]
    if args.exclude_first_layer_weights:
        patterns.append("conv1")
    return patterns or None


def run_train(args, cfg: Config) -> int:
    """(reference: scripts/run.py:1052-1125 + model.train)."""
    import jax

    from ..data.generator import TrainingPipeline
    from ..models.mask_rcnn import init_model
    from ..parallel.mesh import make_mesh, replicate_tree
    from ..train import checkpoints as CKPT
    from ..train.trainer import (
        create_train_state,
        make_eval_step,
        make_train_step,
        train_loop,
    )

    ds_train, ds_val = create_train_val_datasets(args, cfg)
    n_train = ds_train.num_images
    steps_per_epoch = args.epoch_length or max(1, n_train // cfg.batch_size)
    # Validation cadence (reference: VALIDATION_STEPS, mrcnn/config.py:36 +
    # model.py:2487-2499): every epoch, nvalidation_steps forward-only
    # loss batches from the val split.
    val_steps = args.nvalidation_steps
    if val_steps is None:
        val_steps = max(1, ds_val.num_images // cfg.batch_size) if ds_val.num_images else 0
    logger.info(
        "training on %d images, %d steps/epoch (+%d val steps/epoch on %d images)",
        n_train, steps_per_epoch, val_steps, ds_val.num_images,
    )

    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    start_epoch = 0
    if args.weights:
        variables, _, _ = CKPT.restore_weights(
            variables, args.weights, exclude=_exclude_patterns(args)
        )
        start_epoch = CKPT.epoch_from_path(args.weights)

    state, tx = create_train_state(cfg, variables, layers=args.trainable_layers)
    cache_bytes = int(args.data_cache_gb * (1 << 30))
    pipeline = TrainingPipeline(
        ds_train, cfg, augmentation=args.use_augmentation, seed=0,
        num_workers=args.nthreads, cache_bytes=cache_bytes,
    )
    class_weights = None
    if args.weight_classes and ds_train.class_weights:
        class_weights = np.ones(cfg.num_classes, np.float32)
        for cid, w in ds_train.class_weights.items():
            if 0 <= int(cid) < cfg.num_classes:
                class_weights[int(cid)] = w
        logger.info("class weights: %s", class_weights.tolist())
    mesh = make_mesh(n_devices=cfg.num_devices) if cfg.num_devices > 1 else None
    step = make_train_step(
        model, tx, pipeline.anchors_normalized(), mesh=mesh,
        class_weights=class_weights,
    )
    if mesh is not None:
        state = replicate_tree(state, mesh)

    val_pipeline, val_step = None, None
    if val_steps:
        val_pipeline = TrainingPipeline(
            ds_val, cfg, augmentation=False, seed=1, num_workers=args.nthreads,
            cache_bytes=cache_bytes,
        )
        val_step = make_eval_step(
            model, pipeline.anchors_normalized(), mesh=mesh,
            class_weights=class_weights,
        )

    from ..train.observability import MetricsLogger

    batches = pipeline.prefetch()
    val_batches = val_pipeline.prefetch() if val_pipeline is not None else None
    rng = jax.random.PRNGKey(42)
    os.makedirs(args.logs, exist_ok=True)
    metrics = MetricsLogger(args.logs)
    for epoch in range(start_epoch, start_epoch + args.nepochs):
        state, losses = train_loop(
            model, state, step, batches, steps_per_epoch, rng,
            callback=lambda s, ls, e=epoch: metrics.log(e * steps_per_epoch + s, ls),
        )
        rng, _ = jax.random.split(rng)
        if val_steps:
            val_rng = jax.random.PRNGKey(7)  # fixed: same target sampling each epoch
            sums: dict = {}
            for _ in range(val_steps):
                vl = val_step(state, next(val_batches), val_rng)
                for k, v in vl.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
            val_losses = {f"val_{k}": v / val_steps for k, v in sums.items()}
            metrics.log((epoch + 1) * steps_per_epoch, val_losses)
            logger.info("epoch %d validation: %s",
                        epoch + 1, {k: round(v, 4) for k, v in val_losses.items()})
        ckpt_vars = {"params": jax.device_get(state.params)}
        if state.batch_stats:
            ckpt_vars["batch_stats"] = jax.device_get(state.batch_stats)
        path = CKPT.save_checkpoint(args.logs, cfg.name, epoch + 1, ckpt_vars)
        metrics.plot_losses(os.path.join(args.logs, "loss_curve.png"))
        logger.info("epoch %d done, checkpoint: %s (losses=%s)", epoch + 1, path, losses)
    return 0


def _build_detector(args, cfg: Config):
    from ..inference.detector import build_detector

    # The reference's InferenceConfig hardcodes batch 1 (scripts/run.py:
    # 1641-1657); here --nimg_per_gpu carries through so ModelTester's
    # batched evaluation loop and SFinder's batched tile inference
    # actually run device-batched, and --ngpu shards the batch over a
    # local device mesh (reference ParallelModel: mrcnn/model.py:2161-2165).
    icfg = inference_config(
        cfg,
        images_per_device=max(1, args.nimg_per_gpu),
        num_devices=max(1, args.ngpu),
    )
    return build_detector(
        icfg, weights_path=args.weights, exclude=_exclude_patterns(args)
    )


def run_test(args, cfg: Config) -> int:
    """(reference: scripts/run.py:1132-1166)."""
    from ..analysis.tester import ModelTester

    ds = create_test_dataset(args, cfg)
    detector = _build_detector(args, cfg)
    tester = ModelTester(detector, detector.config, ds)
    os.makedirs(args.logs, exist_ok=True)
    tester.outdir = args.logs  # CSVs + eval dumps go to the job dir
    tester.n_max_img = args.maxnimgs
    if args.remap_classids and args.classid_remap_dict:
        remap = json.loads(args.classid_remap_dict)
        tester.classid_remap_dict = {int(k): int(v) for k, v in remap.items()}
    return tester.test()


def run_export(args, cfg: Config) -> int:
    """Export the (optionally weight-restored) detect graph as a
    self-contained serving artifact (inference/export.py)."""
    from ..inference.export import export_detector

    detector = _build_detector(args, cfg)
    export_detector(detector, args.export_path)
    return 0


def run_detect(args, cfg: Config) -> int:
    """(reference: scripts/run.py:1172-1189)."""
    from ..analysis.sfinder import SFinder

    # Rectangular tiles compile the detect graph for the exact
    # (tile_ysize, tile_xsize) so they ride the thin-wire fast path
    # instead of square-molding through host resize
    # (reference tile knobs: scripts/run.py:235-239). Only when the fast
    # wire is eligible (same gate as SFinder.run_tiled) — with non-default
    # preprocessing knobs tiles go through the generic square-mold detect()
    # path, which needs the square graph.
    fast_wire = (
        cfg.zscale_stretch
        and not cfg.bias_contrast_stretch
        and cfg.img_to_rgb
        and cfg.img_to_uint8
        and len(set(cfg.zscale_contrasts)) == 1
        and cfg.tile_wire in ("u8", "raw")
    )
    if cfg.split_img_in_tiles and fast_wire:
        # The FPN top-down path 2x-upsamples P5..P2; every stride halving
        # down to stride 64 must be exact or trace-time shapes mismatch
        # (the reference asserts the same divisibility,
        # mrcnn/config.py IMAGE_MIN_DIM check). The square-mold fallback
        # pads to a valid size; the rect fast path uses the raw tile shape.
        for name, v in (("tile_xsize", cfg.tile_xsize),
                        ("tile_ysize", cfg.tile_ysize)):
            if v % 64 != 0:
                raise ValueError(
                    f"{name}={v} must be divisible by 64 for tiled detect "
                    "(FPN needs 6 exact stride halvings); pick e.g. "
                    f"{(v // 64 + 1) * 64}"
                )
    detector = _build_detector(
        args, cfg.replace(
            image_min_dim=min(cfg.tile_xsize, cfg.tile_ysize),
            image_max_dim=max(cfg.tile_xsize, cfg.tile_ysize),
            input_shape_override=(
                (cfg.tile_ysize, cfg.tile_xsize) if fast_wire else None
            ),
        )
        if cfg.split_img_in_tiles else cfg
    )
    sf = SFinder(detector, detector.config)
    sf.outfile_json = args.detect_outfile_json
    sf.outfile_img = args.detect_outfile
    if cfg.split_img_in_tiles:
        sf.run_tiled(args.image)
    else:
        sf.run(args.image, xmin=args.xmin, xmax=args.xmax,
               ymin=args.ymin, ymax=args.ymax)
    return 0


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: the flagship graphs take minutes to
    compile cold; repeat CLI invocations (train restarts, eval after
    train) hit the disk cache instead. Honors JAX_COMPILATION_CACHE_DIR
    if the user already set one."""
    import jax

    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "caesar_mrcnn_tpu_xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        logger.debug("could not enable the persistent compile cache")


def main(argv: Optional[List[str]] = None) -> int:
    args = parse_args(argv)
    if validate_args(args) < 0:
        return 1
    _enable_compile_cache()
    cfg = build_config(args)
    logger.info(cfg.display())
    if args.command == "train":
        return run_train(args, cfg)
    if args.command == "test":
        return run_test(args, cfg)
    if args.command == "detect":
        return run_detect(args, cfg)
    if args.command == "export":
        return run_export(args, cfg)
    return 1


if __name__ == "__main__":
    sys.exit(main())
