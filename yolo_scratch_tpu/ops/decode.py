"""Inference postprocess: decoded head output -> final detections, on device.

Parity target: ``decode_predictions_for_metrics`` + ``nms_simple``
(``train_yolo11_cuda.py:265-399``): per image take max class score, filter by
confidence, xywh->xyxy, greedy class-agnostic NMS, normalize by image size,
clamp to [0, 1]. All fixed-shape and jit-resident; a top-k prefilter bounds
the NMS candidate set (the reference's conf filter plays that role on host).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from yolo_scratch_tpu.ops.boxes import xywh2xyxy
from yolo_scratch_tpu.ops.nms import gather_topk_detections, nms


def _prefilter_single(pred: jnp.ndarray, conf_threshold: float, pre_nms_topk: int):
    """(A, 4+nc) -> score-sorted top-k candidates (boxes xyxy px, scores,
    labels, valid)."""
    boxes_xywh = pred[:, :4]
    cls_scores = pred[:, 4:]
    scores = jnp.max(cls_scores, axis=-1)
    labels = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32)
    conf_ok = scores > conf_threshold

    k = min(pre_nms_topk, pred.shape[0])
    top_scores, top_idx = jax.lax.top_k(jnp.where(conf_ok, scores, -jnp.inf), k)
    top_valid = jnp.isfinite(top_scores)
    top_boxes = xywh2xyxy(boxes_xywh[top_idx])
    top_labels = labels[top_idx]
    top_scores = jnp.where(top_valid, top_scores, 0.0)
    return top_boxes, top_scores, top_labels, top_valid


@partial(
    jax.jit,
    static_argnames=(
        "img_size", "conf_threshold", "iou_threshold", "max_det", "pre_nms_topk",
        "class_aware", "nms_impl",
    ),
)
def postprocess(
    decoded: jnp.ndarray,  # (B, A, 4+nc)
    img_size: int,
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    pre_nms_topk: int = 1000,
    class_aware: bool = False,
    nms_impl: str = "xla",
):
    """Batched postprocess. Returns (boxes (B, max_det, 4) normalized xyxy,
    scores (B, max_det), labels (B, max_det), valid (B, max_det)).

    ``nms_impl``: 'pallas' (whole batch suppressed in one VMEM kernel —
    measured 1.57 ms vs 2.32 ms XLA at B=32/N=512, and the single-image
    transposed kernel is the tracked 0.95 ms NMS-p50 path) or 'xla'
    (default). Both support ``class_aware`` — the per-class box-offset is
    applied before the sweep, so the kernel itself stays class-agnostic."""
    boxes, scores, labels, valid = jax.vmap(
        partial(_prefilter_single, conf_threshold=conf_threshold, pre_nms_topk=pre_nms_topk)
    )(decoded)

    if nms_impl == "pallas":
        from yolo_scratch_tpu.ops.pallas_nms import (
            _class_offset,
            nms_pallas_batched,
            nms_sweep_pallas,
        )

        if boxes.shape[0] == 1:
            # B=1: the transposed single-image kernel has the lowest latency;
            # candidates are already score-sorted from top_k.
            nms_boxes = _class_offset(boxes, labels) if class_aware else boxes
            keep = nms_sweep_pallas(nms_boxes[0], valid[0], iou_threshold)[None]
            rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
            keep = keep & (rank < max_det)
        else:
            keep = nms_pallas_batched(
                boxes, scores, valid, iou_threshold=iou_threshold, max_det=max_det,
                class_ids=labels, class_aware=class_aware,
            )
    else:
        keep = jax.vmap(
            lambda b, s, v, c: nms(
                b, s, iou_threshold=iou_threshold, max_det=max_det, valid=v,
                class_ids=c, class_aware=class_aware,
            )
        )(boxes, scores, valid, labels)

    out_b, out_s, out_l, out_v = jax.vmap(
        partial(gather_topk_detections, max_det=max_det)
    )(boxes, scores, labels, keep)
    out_b = jnp.clip(out_b / img_size, 0.0, 1.0)
    return out_b, out_s, out_l, out_v
