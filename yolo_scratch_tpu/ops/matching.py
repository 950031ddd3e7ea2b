"""On-device batched TP/FP marking for mAP evaluation.

The reference marks TP/FP on the host with a per-image, per-IoU-threshold
Python greedy loop (``utils/metrics.py:171-200`` + the second P/R pass
``:206-256``) — O(images x thresholds x dets) host iterations, which
dominates eval wall-clock at COCO scale (5k images x 300 dets x 10
thresholds). Here the greedy matching runs inside the jitted eval step:
one ``lax.fori_loop`` over the (score-sorted) detections carries a
(T, G) matched mask and marks all T thresholds simultaneously, vmapped
over the batch. The host keeps only the final AP accumulation
(``utils.metrics.metrics_from_marks``).

Semantics are exactly the reference's greedy matcher: predictions in
score-descending order each grab their best *unmatched* GT; TP iff that
best available IoU >= threshold; matching ignores class labels (reference
quirk, preserved).

Per-class AP (our extension; the reference evaluator is class-agnostic)
uses the same kernel with ``pred_labels``/``gt_labels`` supplied: IoU is
masked to same-class pairs, which computes the class-restricted greedy
marks for EVERY class in one pass — a class-c prediction can only claim a
class-c GT, and the score order of class-c predictions is a subsequence
of the global order, so the result per class equals running the greedy
matcher on that class alone. The host then accumulates nc small AP tails
(``utils.metrics.per_class_from_marks``) instead of re-running a full
matcher per class.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_scratch_tpu.ops.boxes import pairwise_iou

# reference threshold grid 0.50:0.95:0.05 (utils/metrics.py:132-137)
DEFAULT_THRESHOLDS = tuple(0.5 + 0.05 * i for i in range(10))


def tp_marks_single(
    pred_boxes: jnp.ndarray,   # (N, 4) xyxy, SCORE-DESCENDING order
    pred_valid: jnp.ndarray,   # (N,) bool
    gt_boxes: jnp.ndarray,     # (G, 4) xyxy (same coord space as preds)
    gt_mask: jnp.ndarray,      # (G,) bool
    thresholds: jnp.ndarray,   # (T,) f32
    pred_labels: Optional[jnp.ndarray] = None,  # (N,) int — class-restricted
    gt_labels: Optional[jnp.ndarray] = None,    # (G,) int    matching when set
) -> jnp.ndarray:
    """Greedy TP marks for one image -> (T, N) bool."""
    iou = pairwise_iou(pred_boxes, gt_boxes)  # (N, G)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    if pred_labels is not None and gt_labels is not None:
        iou = jnp.where(pred_labels[:, None] == gt_labels[None, :], iou, -1.0)
    n, g = iou.shape
    t = thresholds.shape[0]

    def body(i, carry):
        matched, tp = carry  # (T, G) bool, (T, N) bool
        row = jax.lax.dynamic_slice_in_dim(iou, i, 1, axis=0)  # (1, G)
        vals = jnp.where(~matched, row, -jnp.inf)  # (T, G)
        best = jnp.max(vals, axis=1)               # (T,)  -inf when none avail
        j = jnp.argmax(vals, axis=1)               # (T,)
        valid_i = jax.lax.dynamic_slice_in_dim(pred_valid, i, 1)[0]
        tp_i = valid_i & (best >= thresholds)      # (T,)
        take = jax.nn.one_hot(j, g, dtype=bool) & tp_i[:, None]
        matched = matched | take
        tp = jax.lax.dynamic_update_slice_in_dim(tp, tp_i[:, None], i, axis=1)
        return matched, tp

    _, tp = jax.lax.fori_loop(
        0, n, body,
        (jnp.zeros((t, g), bool), jnp.zeros((t, n), bool)),
    )
    return tp


@partial(jax.jit, static_argnames=("thresholds",))
def batched_tp_marks(
    pred_boxes: jnp.ndarray,   # (B, N, 4) xyxy, each row score-descending
    pred_valid: jnp.ndarray,   # (B, N) bool
    gt_boxes: jnp.ndarray,     # (B, G, 4) xyxy
    gt_mask: jnp.ndarray,      # (B, G) bool
    thresholds: tuple = DEFAULT_THRESHOLDS,
    pred_labels: Optional[jnp.ndarray] = None,  # (B, N) int
    gt_labels: Optional[jnp.ndarray] = None,    # (B, G) int
) -> jnp.ndarray:
    """Batched greedy TP marks -> (B, T, N) bool. With labels supplied the
    marks are class-restricted (see module docstring)."""
    th = jnp.asarray(thresholds, jnp.float32)
    if pred_labels is not None and gt_labels is not None:
        return jax.vmap(
            lambda pb, pv, gb, gm, pl, gl: tp_marks_single(pb, pv, gb, gm, th, pl, gl)
        )(pred_boxes, pred_valid, gt_boxes, gt_mask, pred_labels, gt_labels)
    return jax.vmap(lambda pb, pv, gb, gm: tp_marks_single(pb, pv, gb, gm, th))(
        pred_boxes, pred_valid, gt_boxes, gt_mask
    )

# -- COCO area-band matching (ignore semantics) ------------------------------
#
# The full COCO protocol scores AP/AR inside GT-area bands
# (small < 32^2 <= medium < 96^2 <= large, pixel^2). GTs outside the band
# are IGNORED, not removed: a detection may still claim an ignored GT, in
# which case it is neither TP nor FP — it vanishes from that band's
# precision/recall entirely. An unmatched detection whose own area is
# outside the band is likewise ignored. This mirrors pycocotools'
# computeIoU/evaluateImg dtIg logic (cocoeval.py): per detection in score
# order, the best still-unmatched NON-ignored GT with IoU >= t wins (TP);
# only if none qualifies may the best ignored GT be claimed (det ignored);
# otherwise FP unless the detection's area is out of band (ignored).
# Our matcher is class-agnostic like the rest of the evaluator (the
# reference quirk preserved everywhere else); pycocotools matches within
# class. Tie-breaks on exactly equal IoUs follow argmax order (lowest GT
# index), not pycocotools' iteration order — measure zero for real boxes.


def tp_ign_marks_single(
    pred_boxes: jnp.ndarray,   # (N, 4) xyxy px, SCORE-DESCENDING order
    pred_valid: jnp.ndarray,   # (N,) bool
    gt_boxes: jnp.ndarray,     # (G, 4) xyxy px
    gt_mask: jnp.ndarray,      # (G,) bool
    gt_ignore: jnp.ndarray,    # (G,) bool — in-band GTs False, out-of-band True
    pred_in_band: jnp.ndarray, # (N,) bool — detection's own area inside band
    thresholds: jnp.ndarray,   # (T,) f32
) -> tuple:
    """Greedy marks with ignore semantics -> (tp (T, N), ign (T, N))."""
    iou = pairwise_iou(pred_boxes, gt_boxes)  # (N, G)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    n, g = iou.shape
    t = thresholds.shape[0]

    def body(i, carry):
        matched, tp, ign = carry  # (T, G), (T, N), (T, N)
        row = jax.lax.dynamic_slice_in_dim(iou, i, 1, axis=0)  # (1, G)
        cand = jnp.where(~matched, row, -jnp.inf)              # (T, G)
        cn = jnp.where(~gt_ignore[None, :], cand, -jnp.inf)
        ci = jnp.where(gt_ignore[None, :], cand, -jnp.inf)
        bn, jn = jnp.max(cn, axis=1), jnp.argmax(cn, axis=1)   # (T,)
        bi, ji = jnp.max(ci, axis=1), jnp.argmax(ci, axis=1)
        valid_i = jax.lax.dynamic_slice_in_dim(pred_valid, i, 1)[0]
        in_band_i = jax.lax.dynamic_slice_in_dim(pred_in_band, i, 1)[0]
        tp_i = valid_i & (bn >= thresholds)                    # (T,)
        igm_i = valid_i & ~tp_i & (bi >= thresholds)           # matched-ignored
        j = jnp.where(tp_i, jn, ji)
        take = jax.nn.one_hot(j, g, dtype=bool) & (tp_i | igm_i)[:, None]
        matched = matched | take
        ign_i = igm_i | (valid_i & ~tp_i & ~igm_i & ~in_band_i)
        tp = jax.lax.dynamic_update_slice_in_dim(tp, tp_i[:, None], i, axis=1)
        ign = jax.lax.dynamic_update_slice_in_dim(ign, ign_i[:, None], i, axis=1)
        return matched, tp, ign

    _, tp, ign = jax.lax.fori_loop(
        0, n, body,
        (jnp.zeros((t, g), bool), jnp.zeros((t, n), bool), jnp.zeros((t, n), bool)),
    )
    return tp, ign


def _box_areas(boxes: jnp.ndarray) -> jnp.ndarray:
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


@partial(jax.jit, static_argnames=("thresholds",))
def _batched_tp_ign_marks(
    pred_boxes, pred_valid, gt_boxes, gt_mask, gt_ignore, pred_in_band,
    thresholds: tuple = DEFAULT_THRESHOLDS,
):
    """Jitted core: band membership comes in as TRACED mask arguments, so
    one compile serves every area band (and any other ignore policy)."""
    th = jnp.asarray(thresholds, jnp.float32)
    return jax.vmap(
        lambda pb, pv, gb, gm, gi, pi: tp_ign_marks_single(pb, pv, gb, gm, gi, pi, th)
    )(pred_boxes, pred_valid, gt_boxes, gt_mask, gt_ignore, pred_in_band)


def batched_tp_marks_area(
    pred_boxes,                # (B, N, 4) xyxy, each row score-descending
    pred_valid,                # (B, N) bool
    gt_boxes,                  # (B, G, 4) xyxy (same coord space as preds)
    gt_mask,                   # (B, G) bool
    area_lo: float,
    area_hi: float,
    thresholds: tuple = DEFAULT_THRESHOLDS,
) -> tuple:
    """Area-band greedy marks -> (tp (B, T, N), ign (B, T, N), n_gt_band).

    ``area_lo <= area < area_hi`` defines the band, in the squared units
    of the box coordinates (pass pixel-space boxes for COCO's 32^2/96^2
    bands). ``n_gt_band`` (int) is the band's recall denominator, counted
    from the SAME membership predicate the matcher uses (areas clamp
    negative extents to zero) so denominator and marks cannot drift.
    """
    g_area = _box_areas(jnp.asarray(gt_boxes))
    gt_in_band = (g_area >= area_lo) & (g_area < area_hi)     # (B, G)
    p_area = _box_areas(jnp.asarray(pred_boxes))
    pred_in_band = (p_area >= area_lo) & (p_area < area_hi)   # (B, N)
    tp, ign = _batched_tp_ign_marks(
        pred_boxes, pred_valid, gt_boxes, gt_mask, ~gt_in_band, pred_in_band,
        thresholds,
    )
    n_gt_band = int(np.asarray(jnp.asarray(gt_mask) & gt_in_band).sum())
    return tp, ign, n_gt_band
