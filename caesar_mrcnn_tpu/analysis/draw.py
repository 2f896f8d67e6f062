"""Matplotlib overlay rendering of detections (and optional ground truth).

Fills the role of the reference's ``Analyzer.draw_results`` and the
``visualize`` display helpers (reference: mrcnn/analyze.py:2039-2136,
mrcnn/visualize.py:83-168).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import patches  # noqa: E402

CLASS_COLORS = {
    "sidelobe": (1.0, 0.65, 0.0),
    "spurious": (1.0, 0.65, 0.0),
    "source": (1.0, 0.0, 0.0),
    "compact": (1.0, 0.0, 0.0),
    "galaxy": (0.0, 0.8, 0.0),
    "extended": (0.0, 0.8, 0.0),
    "extended-multisland": (0.0, 0.8, 0.8),
    "flagged": (1.0, 0.0, 1.0),
}


def apply_mask(image: np.ndarray, mask: np.ndarray, color, alpha: float = 0.3):
    """Blend a color into masked pixels (reference: mrcnn/visualize.py:72-80)."""
    out = image.astype(np.float32).copy()
    for c in range(3):
        out[..., c] = np.where(
            mask.astype(bool),
            out[..., c] * (1 - alpha) + alpha * color[c] * 255,
            out[..., c],
        )
    return out


def draw_detections(
    image: np.ndarray,
    masks: Sequence[np.ndarray],
    class_names: Sequence[str],
    scores: Sequence[float],
    bboxes: Sequence,
    outfile: Optional[str] = None,
    gt_masks: Optional[Sequence[np.ndarray]] = None,
    gt_class_names: Optional[Sequence[str]] = None,
    title: str = "",
):
    """Render detection overlays; save PNG if outfile given."""
    img = image
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.dtype != np.uint8:
        m = img.max() or 1.0
        img = (255.0 * img / m).astype(np.uint8)

    fig, ax = plt.subplots(1, figsize=(8, 8))
    ax.axis("off")
    if title:
        ax.set_title(title)
    canvas = img.astype(np.float32)
    for i, mask in enumerate(masks):
        color = CLASS_COLORS.get(class_names[i], (1.0, 1.0, 0.0))
        canvas = apply_mask(canvas, mask, color)
        y1, x1, y2, x2 = [int(v) for v in bboxes[i]]
        ax.add_patch(
            patches.Rectangle(
                (x1, y1), x2 - x1, y2 - y1, fill=False, edgecolor=color, linewidth=1.5
            )
        )
        ax.text(
            x1,
            max(y1 - 2, 0),
            f"{class_names[i]} {scores[i]:.2f}",
            color=color,
            fontsize=8,
            backgroundcolor="none",
        )
    if gt_masks is not None:
        for i, gmask in enumerate(gt_masks):
            y_, x_ = np.nonzero(gmask)
            if y_.size == 0:
                continue
            ax.add_patch(
                patches.Rectangle(
                    (x_.min(), y_.min()),
                    x_.max() - x_.min(),
                    y_.max() - y_.min(),
                    fill=False,
                    edgecolor="white",
                    linestyle="--",
                    linewidth=1.0,
                )
            )
    ax.imshow(canvas.astype(np.uint8), origin="lower")
    if outfile:
        os.makedirs(os.path.dirname(os.path.abspath(outfile)), exist_ok=True)
        fig.savefig(outfile, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return None
    return fig
