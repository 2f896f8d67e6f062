"""Notebook/report display utilities.

API-level re-design of the reference ``mrcnn/visualize.py``:
``display_instances`` (reference: visualize.py:83-168), ``display_differences``
(171-206), ``draw_boxes`` (360-459), PR-curve / overlap-grid plots (306-357)
and the trainable-weight stats table (476-501).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import patches  # noqa: E402

from .draw import apply_mask


def random_colors(n: int, bright: bool = True, seed: Optional[int] = None):
    """Visually distinct colors via evenly spaced hues
    (reference: visualize.py:55-66)."""
    import colorsys

    brightness = 1.0 if bright else 0.7
    hsv = [(i / max(n, 1), 1, brightness) for i in range(n)]
    colors = [colorsys.hsv_to_rgb(*c) for c in hsv]
    rng = random.Random(seed)
    rng.shuffle(colors)
    return colors


def display_images(
    images: Sequence[np.ndarray],
    titles: Optional[Sequence[str]] = None,
    cols: int = 4,
    cmap=None,
    norm=None,
    interpolation=None,
    outfile: Optional[str] = None,
):
    """Grid display of a set of HWC (or HW) images with optional titles
    (reference: visualize.py:35-56). Saves to ``outfile`` instead of
    ``plt.show()`` when given (headless/report use)."""
    titles = titles if titles is not None else [""] * len(images)
    rows = len(images) // cols + 1
    fig = plt.figure(figsize=(14, 14 * rows // cols or 14))
    for i, (image, title) in enumerate(zip(images, titles), start=1):
        ax = fig.add_subplot(rows, cols, i)
        ax.set_title(title, fontsize=9)
        ax.axis("off")
        ax.imshow(
            np.asarray(image).astype(np.uint8), cmap=cmap, norm=norm,
            interpolation=interpolation,
        )
    if outfile:
        fig.savefig(outfile, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return None
    return fig


def draw_box(image: np.ndarray, box, color) -> np.ndarray:
    """Paint a 3-px-wide box directly into the pixel array
    (reference: visualize.py:271-280). ``box`` is (y1, x1, y2, x2) in
    pixel coords; ``color`` is an RGB triple (or scalar for 2D images)."""
    y1, x1, y2, x2 = [int(v) for v in box]
    image[y1 : y1 + 2, x1:x2] = color
    image[y2 : y2 + 2, x1:x2] = color
    image[y1:y2, x1 : x1 + 2] = color
    image[y1:y2, x2 : x2 + 2] = color
    return image


def display_top_masks(
    image: np.ndarray,
    mask: np.ndarray,
    class_ids: np.ndarray,
    class_names: Sequence[str],
    limit: int = 4,
    outfile: Optional[str] = None,
):
    """Image + the ``limit`` most prominent per-class mask stacks, each
    class's instances labelled 1..n (reference: visualize.py:283-303)."""
    to_display = [image]
    titles = [f"H x W={image.shape[0]}x{image.shape[1]}"]
    unique_class_ids = np.unique(class_ids)
    mask_area = [
        np.sum(mask[:, :, np.where(class_ids == i)[0]]) for i in unique_class_ids
    ]
    top_ids = [
        v[0]
        for v in sorted(zip(unique_class_ids, mask_area), key=lambda r: r[1],
                        reverse=True)
        if v[1] > 0
    ]
    for i in range(limit):
        class_id = top_ids[i] if i < len(top_ids) else -1
        m = mask[:, :, np.where(class_ids == class_id)[0]]
        m = np.sum(m * np.arange(1, m.shape[-1] + 1), -1)
        to_display.append(m)
        titles.append(class_names[class_id] if class_id != -1 else "-")
    return display_images(
        to_display, titles=titles, cols=limit + 1, cmap="Blues_r", outfile=outfile
    )


def display_table(table) -> str:
    """Render rows of values as an aligned plain-text table; also returns
    the string (reference: visualize.py:462-473, which emitted notebook
    HTML — here stdout/plain text so it works headless, with the same
    row/col iterable contract)."""
    rows = [[str(col) for col in row] for row in table]
    widths = [
        max(len(r[c]) for r in rows if c < len(r))
        for c in range(max((len(r) for r in rows), default=0))
    ]
    lines = [
        "  ".join(col.ljust(widths[c]) for c, col in enumerate(row)) for row in rows
    ]
    text = "\n".join(lines)
    print(text)
    return text


def display_instances(
    image: np.ndarray,
    boxes: np.ndarray,
    masks: np.ndarray,
    class_ids: np.ndarray,
    class_names: Sequence[str],
    scores: Optional[np.ndarray] = None,
    title: str = "",
    figsize=(12, 12),
    ax=None,
    show_mask: bool = True,
    show_bbox: bool = True,
    show_mask_polygon: bool = True,
    colors=None,
    captions=None,
    outfile: Optional[str] = None,
):
    """Overlay boxes/masks/labels, plus per-instance mask contour
    outlines when ``show_mask_polygon`` (reference draws contour Polygons
    from a 1px-padded mask, visualize.py:156-167; here cv2.findContours
    replaces skimage.find_contours)."""
    n = boxes.shape[0]
    if ax is None:
        fig, ax = plt.subplots(1, figsize=figsize)
    else:
        fig = ax.figure
    colors = colors or random_colors(n)
    img = image
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.dtype != np.uint8:
        m = img.max() or 1.0
        img = (255.0 * img / m).astype(np.uint8)
    canvas = img.astype(np.float32)
    ax.axis("off")
    ax.set_title(title)
    for i in range(n):
        color = colors[i % len(colors)]
        if not np.any(boxes[i]):
            continue
        y1, x1, y2, x2 = boxes[i]
        if show_bbox:
            ax.add_patch(
                patches.Rectangle(
                    (x1, y1), x2 - x1, y2 - y1, fill=False,
                    edgecolor=color, linewidth=2, alpha=0.7,
                )
            )
        if captions is None:
            class_id = class_ids[i]
            score = scores[i] if scores is not None else None
            label = class_names[class_id]
            caption = f"{label} {score:.3f}" if score is not None else label
        else:
            caption = captions[i]
        ax.text(x1, y1 + 8, caption, color="w", size=11, backgroundcolor="none")
        if show_mask and masks is not None and masks.shape[-1] > i:
            canvas = apply_mask(canvas, masks[:, :, i], color, alpha=0.5)
        if show_mask_polygon and masks is not None and masks.shape[-1] > i:
            import cv2

            # pad 1px so border-touching masks still close their contour
            # (reference: visualize.py:158-160)
            padded = np.zeros(
                (masks.shape[0] + 2, masks.shape[1] + 2), np.uint8
            )
            padded[1:-1, 1:-1] = masks[:, :, i].astype(np.uint8)
            contours, _ = cv2.findContours(
                padded, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE
            )
            for cnt in contours:
                verts = cnt.reshape(-1, 2).astype(np.float32) - 1  # unpad
                ax.add_patch(
                    patches.Polygon(
                        verts, fill=False, edgecolor=color, linewidth=1.2
                    )
                )
    ax.imshow(canvas.astype(np.uint8))
    if outfile:
        fig.savefig(outfile, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return None
    return ax


def display_differences(
    image,
    gt_box, gt_class_id, gt_mask,
    pred_box, pred_class_id, pred_score, pred_mask,
    class_names,
    title: str = "",
    ax=None,
    show_mask: bool = True,
    show_box: bool = True,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.5,
    outfile: Optional[str] = None,
):
    """GT (green) vs predictions (red, captioned with score/IoU)
    (reference: visualize.py:171-206)."""
    from ..evalmetrics.ap import compute_matches

    gt_match, pred_match, overlaps = compute_matches(
        gt_box, gt_class_id, gt_mask,
        pred_box, pred_class_id, pred_score, pred_mask,
        iou_threshold=iou_threshold, score_threshold=score_threshold,
    )
    colors = [(0, 1, 0, 0.8)] * len(gt_match) + [(1, 0, 0, 1)] * len(pred_match)
    class_ids = np.concatenate([gt_class_id, pred_class_id])
    scores = np.concatenate([np.zeros([len(gt_match)]), pred_score])
    boxes = np.concatenate([gt_box, pred_box])
    masks = np.concatenate([gt_mask, pred_mask], axis=-1)
    captions = ["" for _ in range(len(gt_match))] + [
        "{:.2f} / {:.2f}".format(
            pred_score[i],
            overlaps[i, int(pred_match[i])] if pred_match[i] > -1 else overlaps[i].max()
            if overlaps.shape[1] else 0,
        )
        for i in range(len(pred_match))
    ]
    return display_instances(
        image, boxes, masks, class_ids, class_names, scores,
        ax=ax, show_bbox=show_box, show_mask=show_mask,
        colors=colors, captions=captions,
        title=title or "GT (green) vs predictions (red)",
        outfile=outfile,
    )


def draw_rois(
    image,
    rois,
    refined_rois,
    mask,
    class_ids,
    class_names,
    limit: int = 10,
    outfile: Optional[str] = None,
    seed: Optional[int] = None,
):
    """Debug view of sampled training ROIs: dashed ROI box, solid refined
    box, corner connector, label, and the ROI's mask pasted onto the image
    (reference: visualize.py:209-267). Returns (n_pos, n_neg).

    ``mask`` is [N, mh, mw] per-ROI (class-selected) soft masks; negative
    ROIs (class 0) draw gray with no refinement/mask.
    """
    from matplotlib import lines

    from ..utils.image import unmold_mask

    rng = np.random.RandomState(seed)
    ids = np.arange(rois.shape[0], dtype=np.int32)
    if ids.shape[0] > limit:
        ids = rng.choice(ids, limit, replace=False)

    fig, ax = plt.subplots(1, figsize=(12, 12))
    if rois.shape[0] > limit:
        ax.set_title(f"Showing {len(ids)} random ROIs out of {rois.shape[0]}")
    else:
        ax.set_title(f"{len(ids)} ROIs")
    ax.set_ylim(image.shape[0] + 20, -20)
    ax.set_xlim(-50, image.shape[1] + 20)
    ax.axis("off")

    img = image
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.dtype != np.uint8:
        m = img.max() or 1.0
        img = (255.0 * img / m).astype(np.uint8)
    masked_image = img.astype(np.float32)

    for i in ids:
        color = tuple(rng.rand(3))
        class_id = int(class_ids[i])
        y1, x1, y2, x2 = rois[i]
        ax.add_patch(
            patches.Rectangle(
                (x1, y1), x2 - x1, y2 - y1, linewidth=2,
                edgecolor=color if class_id else "gray",
                facecolor="none", linestyle="dashed",
            )
        )
        if class_id:
            ry1, rx1, ry2, rx2 = refined_rois[i]
            ax.add_patch(
                patches.Rectangle(
                    (rx1, ry1), rx2 - rx1, ry2 - ry1, linewidth=2,
                    edgecolor=color, facecolor="none",
                )
            )
            ax.add_line(lines.Line2D([x1, rx1], [y1, ry1], color=color))
            ax.text(rx1, ry1 + 8, class_names[class_id], color="w", size=11,
                    backgroundcolor="none")
            m = unmold_mask(
                np.asarray(mask[i], dtype=np.float32),
                np.asarray(rois[i][:4], dtype=np.int32),
                img.shape,
            )
            masked_image = apply_mask(masked_image, m, color)

    ax.imshow(masked_image.astype(np.uint8))
    n_pos = int((np.asarray(class_ids) > 0).sum())
    n_neg = int((np.asarray(class_ids) == 0).sum())
    if outfile:
        fig.savefig(outfile, bbox_inches="tight")
        plt.close(fig)
    return n_pos, n_neg


def draw_boxes(
    image,
    boxes=None,
    refined_boxes=None,
    masks=None,
    captions=None,
    visibilities=None,
    title: str = "",
    ax=None,
    outfile: Optional[str] = None,
):
    """General-purpose box/mask drawing (reference: visualize.py:360-459)."""
    n = 0
    if boxes is not None:
        n = max(n, boxes.shape[0])
    if refined_boxes is not None:
        n = max(n, refined_boxes.shape[0])
    if ax is None:
        fig, ax = plt.subplots(1, figsize=(12, 12))
    else:
        fig = ax.figure
    colors = random_colors(n)
    img = image
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.dtype != np.uint8:
        m = img.max() or 1.0
        img = (255.0 * img / m).astype(np.uint8)
    canvas = img.astype(np.float32)
    ax.axis("off")
    ax.set_title(title)
    for i in range(n):
        visibility = visibilities[i] if visibilities is not None else 1
        if visibility == 0:
            continue
        color = colors[i]
        style = "dotted" if visibility == 1 else "solid"
        if boxes is not None and np.any(boxes[i]):
            y1, x1, y2, x2 = boxes[i]
            ax.add_patch(
                patches.Rectangle(
                    (x1, y1), x2 - x1, y2 - y1, fill=False,
                    edgecolor=color, linewidth=2, linestyle=style, alpha=0.7,
                )
            )
        if refined_boxes is not None and np.any(refined_boxes[i]):
            ry1, rx1, ry2, rx2 = refined_boxes[i].astype(np.int32)
            ax.add_patch(
                patches.Rectangle(
                    (rx1, ry1), rx2 - rx1, ry2 - ry1, fill=False,
                    edgecolor=color, linewidth=2,
                )
            )
        if captions is not None and i < len(captions):
            y1 = boxes[i][0] if boxes is not None else refined_boxes[i][0]
            x1 = boxes[i][1] if boxes is not None else refined_boxes[i][1]
            ax.text(x1, y1, captions[i], size=11, color="w", backgroundcolor="none")
        if masks is not None and masks.shape[-1] > i:
            canvas = apply_mask(canvas, masks[:, :, i], color)
    ax.imshow(canvas.astype(np.uint8))
    if outfile:
        fig.savefig(outfile, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return None
    return ax


def plot_precision_recall(AP, precisions, recalls, outfile: Optional[str] = None):
    """PR curve (reference: visualize.py:306-322)."""
    fig, ax = plt.subplots(1)
    ax.set_title(f"Precision-Recall Curve. AP@50 = {AP:.3f}")
    ax.set_ylim(0, 1.1)
    ax.set_xlim(0, 1.1)
    ax.plot(recalls, precisions)
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    if outfile:
        fig.savefig(outfile, bbox_inches="tight", dpi=120)
        plt.close(fig)


def plot_overlaps(
    gt_class_ids, pred_class_ids, pred_scores, overlaps, class_names,
    threshold: float = 0.5, outfile: Optional[str] = None,
):
    """Grid of prediction-vs-GT IoUs (reference: visualize.py:325-357)."""
    fig, ax = plt.subplots(1, figsize=(max(6, len(gt_class_ids)), max(6, len(pred_class_ids))))
    im = ax.imshow(overlaps, interpolation="nearest", cmap=plt.cm.Blues)
    fig.colorbar(im)
    ax.set_yticks(np.arange(len(pred_class_ids)))
    ax.set_yticklabels(
        [f"{class_names[c]} {s:.2f}" for c, s in zip(pred_class_ids, pred_scores)]
    )
    ax.set_xticks(np.arange(len(gt_class_ids)))
    ax.set_xticklabels([class_names[c] for c in gt_class_ids], rotation=90)
    ax.set_xlabel("Ground Truth")
    ax.set_ylabel("Predictions")
    if outfile:
        fig.savefig(outfile, bbox_inches="tight", dpi=120)
        plt.close(fig)


def display_weight_stats(params) -> List[Dict]:
    """Per-parameter stats table (reference: visualize.py:476-501)."""
    import jax

    rows = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        arr = np.asarray(leaf)
        rows.append(
            {
                "name": name,
                "shape": tuple(arr.shape),
                "min": float(arr.min()) if arr.size else 0.0,
                "max": float(arr.max()) if arr.size else 0.0,
                "std": float(arr.std()) if arr.size else 0.0,
            }
        )
    return rows
