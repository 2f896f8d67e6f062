"""Static-shape greedy NMS for TPU.

Replaces ``tf.image.non_max_suppression`` (used by the reference at
mrcnn/model.py:393-395 for proposals and mrcnn/model.py:822-826 for
per-class detections) with an XLA-native, fixed-shape algorithm:

* boxes are sorted by score and processed in blocks of ``TILE`` boxes;
* within-block suppression runs an edge-removal fixpoint (box i survives
  iff no surviving higher-scored box in the block suppresses it) — exact
  greedy semantics; see ``_self_suppress_bool`` for the measured
  comparison against fixed-count alternatives;
* each resolved block then suppresses every later box with one dense
  [TILE, N] IoU pass (suppressed boxes are zeroed, and IoU against a
  zeroed box is defined as 0) — every box pair is touched exactly once.

Everything is static-shape: output is ``max_output`` indices (padded) plus
a validity mask — the pad+mask convention used across the framework instead
of the reference's dynamic ``tf.where`` shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

TILE = 128


def _pairwise_iou(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix [n1, n2]; zero-area (zeroed/suppressed) boxes give 0."""
    y1 = jnp.maximum(b1[:, None, 0], b2[None, :, 0])
    x1 = jnp.maximum(b1[:, None, 1], b2[None, :, 1])
    y2 = jnp.minimum(b1[:, None, 2], b2[None, :, 2])
    x2 = jnp.minimum(b1[:, None, 3], b2[None, :, 3])
    inter = jnp.maximum(y2 - y1, 0.0) * jnp.maximum(x2 - x1, 0.0)
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(union > 0.0, inter / union, 0.0)


@functools.partial(jax.jit, static_argnames=("max_output",))
def nms_padded_global(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output: int,
    iou_threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS via a single global suppression-graph fixpoint.

    Builds the full [N, N] upper-triangular suppression adjacency once and
    runs the edge-removal fixpoint globally: each iteration finds
    undominated boxes, deletes the outgoing edges of every box they
    suppress, and at fixpoint survivors are exactly the greedy-NMS picks.
    Each iteration is O(N^2) *vectorized* work and the loop converges in
    O(log chain-length) steps, so for moderate N (<= ~8k proposals) this
    beats the tiled variant's O((N/T)^2) *sequential* tile passes by a wide
    margin on TPU. Same contract as :func:`nms_padded`.
    """
    n = boxes.shape[0]
    valid_in = scores > -jnp.inf
    order = jnp.argsort(-scores, stable=True)
    sboxes = jnp.where(valid_in[order][:, None], boxes[order], 0.0)
    svalid = valid_in[order]

    iou = _pairwise_iou(sboxes, sboxes)
    upper = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    adj = upper & (iou > iou_threshold)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        a, _ = state
        undominated = ~jnp.any(a, axis=0)
        suppressed = jnp.any(a & undominated[:, None], axis=0)
        new_a = a & ~suppressed[:, None]
        return new_a, jnp.any(new_a != a)

    adj, _ = jax.lax.while_loop(cond, body, (adj, jnp.array(True)))
    survive = svalid & ~jnp.any(adj, axis=0)

    rank = jnp.arange(n, dtype=jnp.float32)
    pick_score = jnp.where(survive, -rank, -jnp.inf)
    _, top = jax.lax.top_k(pick_score, max_output)
    top_valid = survive[top]
    idx = jnp.where(top_valid, order[top], 0)
    return idx.astype(jnp.int32), top_valid


@functools.partial(jax.jit, static_argnames=("max_output", "tile"))
def nms_padded_seq(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output: int,
    iou_threshold: float,
    tile: int = TILE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS via block-sequential forward suppression.

    Exact greedy like :func:`nms_padded_global`, but instead of a global
    [N, N] adjacency fixpoint (k sweeps over N^2), each score-sorted block
    of ``tile`` boxes is resolved internally (fixpoint on a tile^2 matrix,
    O(log tile) steps) and then suppresses every LATER box with one
    [tile, N] IoU pass — so every box pair is touched exactly once and the
    N^2 work happens in a single streaming pass. Wins over the global
    fixpoint whenever suppression chains force it past ~1 sweep.
    Same contract as :func:`nms_padded`.
    """
    n = boxes.shape[0]
    n_pad = -n % tile
    valid_in = scores > -jnp.inf
    order = jnp.argsort(-scores, stable=True)
    sboxes = jnp.where(valid_in[order][:, None], boxes[order], 0.0)
    survive = valid_in[order]
    if n_pad:
        sboxes = jnp.pad(sboxes, ((0, n_pad), (0, 0)))
        survive = jnp.pad(survive, (0, n_pad))
        order_p = jnp.pad(order, (0, n_pad))
    else:
        order_p = order
    total = sboxes.shape[0]
    num_tiles = total // tile
    pos = jnp.arange(total)

    def body(i, state):
        cur_boxes, survive = state  # suppressed boxes already zeroed
        tb = jax.lax.dynamic_slice(cur_boxes, (i * tile, 0), (tile, 4))
        ts = jax.lax.dynamic_slice(survive, (i * tile,), (tile,))
        # within-block greedy (earlier blocks' suppression already applied:
        # their victims were zeroed, and IoU vs a zero box is 0)
        iou_tt = _pairwise_iou(tb, tb)
        adj = jnp.triu(jnp.ones((tile, tile), dtype=bool), k=1) & (
            iou_tt > iou_threshold
        )
        keep = _self_suppress_bool(adj)
        ts = ts & keep
        tb = jnp.where(ts[:, None], tb, 0.0)
        cur_boxes = jax.lax.dynamic_update_slice(cur_boxes, tb, (i * tile, 0))
        survive = jax.lax.dynamic_update_slice(survive, ts, (i * tile,))
        # forward suppression: this block's survivors kill later boxes
        iou_fwd = _pairwise_iou(tb, cur_boxes)  # [tile, N]
        hit = jnp.any(iou_fwd > iou_threshold, axis=0) & (pos >= (i + 1) * tile)
        survive = survive & ~hit
        cur_boxes = jnp.where(hit[:, None], 0.0, cur_boxes)
        return cur_boxes, survive

    _, survive = jax.lax.fori_loop(0, num_tiles, body, (sboxes, survive))

    rank = jnp.arange(total, dtype=jnp.float32)
    pick_score = jnp.where(survive, -rank, -jnp.inf)
    _, top = jax.lax.top_k(pick_score, max_output)
    top_valid = survive[top]
    idx = jnp.where(top_valid, order_p[top], 0)
    return idx.astype(jnp.int32), top_valid


@functools.partial(jax.jit, static_argnames=("max_output", "tile"))
def nms_padded_seq_unrolled(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output: int,
    iou_threshold: float,
    tile: int = TILE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Block-sequential NMS with a trace-time-unrolled shrinking suffix.

    Same exact-greedy algorithm as :func:`nms_padded_seq`, but the tile
    loop is unrolled in Python so each step's forward-suppression pass
    runs against ONLY the remaining suffix (a static slice of shrinking
    length) instead of the full-width [tile, N] row with earlier
    positions masked out. Total IoU pairs drop from tiles*tile*N to the
    triangular N^2/2 — a 2x compute cut XLA's static shapes cannot
    express inside `fori_loop` (dynamic slice sizes are illegal; the
    unroll makes every suffix length a compile-time constant).
    Measured in the full 512^2 batch-8 detect graph (trained weights):
    ties the fori variant within run noise (212.7/213.0 vs 206.9-213.7
    img/s) — the halved forward IoU work is not on the fused graph's
    critical path, so the simpler fori form stays the default dispatch
    and this variant documents the measured negative result.
    """
    n = boxes.shape[0]
    n_pad = -n % tile
    valid_in = scores > -jnp.inf
    order = jnp.argsort(-scores, stable=True)
    sboxes = jnp.where(valid_in[order][:, None], boxes[order], 0.0)
    survive = valid_in[order]
    if n_pad:
        sboxes = jnp.pad(sboxes, ((0, n_pad), (0, 0)))
        survive = jnp.pad(survive, (0, n_pad))
        order_p = jnp.pad(order, (0, n_pad))
    else:
        order_p = order
    total = sboxes.shape[0]
    num_tiles = total // tile

    kept = []
    buf, sv = sboxes, survive
    for _ in range(num_tiles):
        tb, buf = buf[:tile], buf[tile:]
        ts, sv = sv[:tile], sv[tile:]
        iou_tt = _pairwise_iou(tb, tb)
        adj = jnp.triu(jnp.ones((tile, tile), dtype=bool), k=1) & (
            iou_tt > iou_threshold
        )
        ts = ts & _self_suppress_bool(adj)
        kept.append(ts)
        if buf.shape[0]:
            tb = jnp.where(ts[:, None], tb, 0.0)
            hit = jnp.any(_pairwise_iou(tb, buf) > iou_threshold, axis=0)
            sv = sv & ~hit
            buf = jnp.where(hit[:, None], 0.0, buf)
    survive = jnp.concatenate(kept)

    rank = jnp.arange(total, dtype=jnp.float32)
    pick_score = jnp.where(survive, -rank, -jnp.inf)
    _, top = jax.lax.top_k(pick_score, max_output)
    top_valid = survive[top]
    idx = jnp.where(top_valid, order_p[top], 0)
    return idx.astype(jnp.int32), top_valid


def _self_suppress_bool(adj: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy suppression inside one score-sorted block.

    ``adj[j, i]`` (strictly upper-triangular) = True when box j suppresses
    box i if j survives. Returns the survivor mask: box i survives iff no
    surviving j < i has an edge to i.

    Implemented as an edge-removal fixpoint (`while_loop`): each
    iteration finds boxes with no incoming suppression edges and deletes
    the outgoing edges of every box they suppress; at fixpoint the
    survivors are exactly the greedy picks.

    The trip count is data-dependent — O(longest alternating
    keep-suppress chain), worst-case O(T) — but measured on both random
    proposals (bench) and real trained-model proposals it converges fast
    and BEATS the data-independent alternatives (A/B at the
    6000-proposal shape, 30-iter min: while 6.01 ms vs fully-unrolled
    sequential scan 6.10 ms on trained proposals; 172.5 vs 165.7 img/s
    full-graph bench on random ones; a `fori_loop` scan was far worse at
    ~1.4 us/iteration loop overhead = +8.6 ms). Revisit only with
    evidence of adversarial chain lengths in production.
    """

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        a, _ = state
        undominated = ~jnp.any(a, axis=0)
        suppressed = jnp.any(a & undominated[:, None], axis=0)
        new_a = a & ~suppressed[:, None]
        return new_a, jnp.any(new_a != a)

    adj, _ = jax.lax.while_loop(cond, body, (adj, jnp.array(True)))
    return ~jnp.any(adj, axis=0)


def nms_padded_auto(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output: int,
    iou_threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # Measured on v5e (batch 8): seq beats or ties the global fixpoint at
    # every N from 512 to 6000 (4.3 vs 8.4 ms at the 6000-proposal shape),
    # so it is the single dispatch target.
    return nms_padded_seq(boxes, scores, max_output, iou_threshold)


def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output: int,
    iou_threshold: float,
    tile: int = TILE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with static shapes (public entry point).

    Args:
      boxes: [N, 4] (y1, x1, y2, x2); invalid entries should carry
        ``scores = -inf`` so they sort last and are excluded.
      scores: [N].
      max_output: number of kept indices to return.
      iou_threshold: suppress when IoU > threshold (matches the numpy
        oracle, reference: mrcnn/utils.py:188-222).

    Returns:
      (indices [max_output] int32 into the *input* order, valid [max_output]
      bool). Padded slots point at index 0 with valid=False.

    Delegates to :func:`nms_padded_seq` — the block-sequential variant
    replaced an earlier tile-by-tile formulation whose cross-tile pass
    re-scanned all earlier tiles per tile (O((N/T)^2) sequential steps);
    seq touches each box pair exactly once and measured faster at every N.
    """
    return nms_padded_seq(boxes, scores, max_output, iou_threshold, tile)


def nms_boxes_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output: int,
    iou_threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Convenience: return (kept boxes [max_output, 4] zero-padded, scores,
    valid mask) — the proposal-layer contract
    (reference: mrcnn/model.py:382-399 pads proposals with zeros)."""
    idx, valid = nms_padded(boxes, scores, max_output, iou_threshold)
    out_boxes = jnp.where(valid[:, None], boxes[idx], 0.0)
    out_scores = jnp.where(valid, scores[idx], 0.0)
    return out_boxes, out_scores, valid
