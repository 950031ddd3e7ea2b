"""On-device, fixed-shape greedy NMS.

The reference runs a per-image Python ``while`` loop on the host
(``train_yolo11_cuda.py:361-399``). Here NMS is a jit-resident kernel with
static shapes: a top-k prefilter bounds the candidate count, then a
sequential greedy sweep (``lax.fori_loop`` over the candidate axis with
vectorized suppression) reproduces greedy-NMS semantics exactly. Outputs are
padded to ``max_det`` with a validity mask so downstream shapes stay static.

The reference NMS is class-agnostic (``nms_simple`` never looks at labels);
``class_aware=True`` adds the standard per-class box-offset trick.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from yolo_scratch_tpu.ops.boxes import pairwise_iou


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    valid: jnp.ndarray | None = None,
    class_ids: jnp.ndarray | None = None,
    class_aware: bool = False,
):
    """Greedy NMS over (N, 4) xyxy boxes with (N,) scores.

    Args:
        valid: optional (N,) bool — invalid boxes can neither suppress nor
            be kept (equivalent to the reference's pre-NMS confidence filter,
            ``train_yolo11_cuda.py:307``).
        class_ids: (N,) int labels, used only when ``class_aware``.

    Returns:
        keep: (N,) bool — surviving boxes (at most ``max_det`` of them, by
            descending score).
    """
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores)
    n = boxes.shape[0]
    valid = jnp.ones((n,), dtype=bool) if valid is None else jnp.asarray(valid)

    if class_aware and class_ids is not None:
        span = jnp.max(jnp.abs(boxes)) + 1.0
        boxes = boxes + (class_ids.astype(boxes.dtype) * span * 2.0)[:, None]

    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    valid_s = valid[order]

    iou = pairwise_iou(boxes_s, boxes_s)
    idx = jnp.arange(n)

    def body(i, suppressed):
        is_kept = valid_s[i] & ~suppressed[i]
        kill = is_kept & (iou[i] > iou_threshold) & (idx > i)
        return suppressed | kill

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), dtype=bool))
    keep_s = valid_s & ~suppressed

    # Cap at max_det by descending score: keep only the first max_det set bits.
    rank = jnp.cumsum(keep_s.astype(jnp.int32)) - 1
    keep_s = keep_s & (rank < max_det)

    # Un-sort back to the caller's order.
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_s)
    return keep


@partial(jax.jit, static_argnames=("iou_threshold", "max_det", "class_aware"))
def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    class_ids: jnp.ndarray | None = None,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    class_aware: bool = False,
):
    """vmap of :func:`nms` over a leading batch axis.

    boxes (B, N, 4), scores (B, N), valid (B, N) -> keep (B, N) bool.
    """
    fn = lambda b, s, v, c: nms(
        b, s, iou_threshold=iou_threshold, max_det=max_det, valid=v,
        class_ids=c, class_aware=class_aware,
    )
    if class_ids is None:
        class_ids = jnp.zeros(scores.shape, dtype=jnp.int32)
    return jax.vmap(fn)(boxes, scores, valid, class_ids)


def gather_topk_detections(boxes, scores, labels, keep, max_det: int):
    """Compact kept rows to fixed (max_det, ...) outputs, score-descending.

    Returns (boxes (max_det, 4), scores (max_det,), labels (max_det,),
    valid (max_det,)). Padding rows are zeros.
    """
    neg = jnp.where(keep, scores, -jnp.inf)
    order = jnp.argsort(-neg)[:max_det]
    v = keep[order]
    return (
        jnp.where(v[:, None], boxes[order], 0.0),
        jnp.where(v, scores[order], 0.0),
        jnp.where(v, labels[order], 0),
        v,
    )
