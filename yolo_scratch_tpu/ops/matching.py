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
