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


def _postprocess_single(
    pred: jnp.ndarray,  # (A, 4+nc): xywh pixels + sigmoided class scores
    img_size: int,
    conf_threshold: float,
    iou_threshold: float,
    max_det: int,
    pre_nms_topk: int,
    class_aware: bool,
    nms_impl: str = "xla",
):
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

    if nms_impl == "pallas" and not class_aware:
        from yolo_scratch_tpu.ops.pallas_nms import nms_pallas

        keep = nms_pallas(
            top_boxes, top_scores, iou_threshold=iou_threshold, max_det=max_det,
            valid=top_valid,
        )
    else:
        keep = nms(
            top_boxes,
            top_scores,
            iou_threshold=iou_threshold,
            max_det=max_det,
            valid=top_valid,
            class_ids=top_labels,
            class_aware=class_aware,
        )
    boxes, scores_o, labels_o, valid = gather_topk_detections(
        top_boxes, top_scores, top_labels, keep, max_det
    )
    boxes = jnp.clip(boxes / img_size, 0.0, 1.0)
    return boxes, scores_o, labels_o, valid


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

    ``nms_impl``: 'xla' (default — fastest batched: the suppression loop
    vectorizes across the batch) or 'pallas' (single-kernel VMEM sweep —
    ~1.5x lower single-image latency; the tracked NMS-p50 path)."""
    fn = partial(
        _postprocess_single,
        img_size=img_size,
        conf_threshold=conf_threshold,
        iou_threshold=iou_threshold,
        max_det=max_det,
        pre_nms_topk=pre_nms_topk,
        class_aware=class_aware,
        nms_impl=nms_impl,
    )
    return jax.vmap(fn)(decoded)
