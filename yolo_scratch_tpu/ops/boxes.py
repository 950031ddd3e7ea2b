"""Box geometry ops — pure jnp functions, broadcast-friendly, jit/vmap safe.

Numerics match the reference implementation exactly (same eps placement):
reference ``losses/yolo_v8_loss.py:12-61`` (bbox_iou with GIoU/DIoU/CIoU),
``:303-312``/``:555-564`` (dist2bbox), ``:327-330`` (bbox2dist).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xywh2xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) center-xywh -> corner-xyxy."""
    xy, wh = b[..., :2], b[..., 2:4]
    half = wh * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def xyxy2xywh(b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) corner-xyxy -> center-xywh."""
    lo, hi = b[..., :2], b[..., 2:4]
    return jnp.concatenate([(lo + hi) * 0.5, hi - lo], axis=-1)


def bbox_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Elementwise (broadcasting) IoU between box sets, last dim = 4.

    Matches reference ``losses/yolo_v8_loss.py:12-61`` including the quirk
    that in the xyxy branch eps is added to *heights only* (``:33-34``) and
    that CIoU's alpha term is treated as a constant (``:54-55`` uses
    ``torch.no_grad``; here ``lax.stop_gradient``).

    Returns IoU with the trailing size-1 axis kept (like the reference, which
    chunks the last dim and never squeezes).

    TPU layout note: all internal math runs on arrays with the coordinate
    axis REMOVED (``[..., k]``, not size-1 slices). Keeping the trailing
    size-1 axis would make the minor (lane) dimension 1 on every temporary —
    a 128x VPU-lane waste that dominated the assigner's runtime.
    """
    if xywh:
        x1, y1, w1, h1 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        x2, y2, w2, h2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
        b1_x1, b1_x2, b1_y1, b1_y2 = x1 - w1 / 2, x1 + w1 / 2, y1 - h1 / 2, y1 + h1 / 2
        b2_x1, b2_x2, b2_y1, b2_y2 = x2 - w2 / 2, x2 + w2 / 2, y2 - h2 / 2, y2 + h2 / 2
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        b2_x1, b2_y1, b2_x2, b2_y2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
        w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
        w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if CIoU or DIoU or GIoU:
        cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
        ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
        if CIoU or DIoU:
            c2 = cw**2 + ch**2 + eps
            rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
            if CIoU:
                v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
                alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
                return (iou - (rho2 / c2 + v * alpha))[..., None]
            return (iou - rho2 / c2)[..., None]
        c_area = cw * ch + eps
        return (iou - (c_area - union) / c_area)[..., None]

    return iou[..., None]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """All-pairs plain IoU, xyxy. (N, 4) x (M, 4) -> (N, M).

    Matches reference ``utils/metrics.py:49-81`` (eps added to the union).
    """
    b1 = boxes1[:, None, :]
    b2 = boxes2[None, :, :]
    x1 = jnp.maximum(b1[..., 0], b2[..., 0])
    y1 = jnp.maximum(b1[..., 1], b2[..., 1])
    x2 = jnp.minimum(b1[..., 2], b2[..., 2])
    y2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return inter / (a1 + a2 - inter + eps)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray, xywh: bool = True, axis: int = -1) -> jnp.ndarray:
    """ltrb distances -> boxes. Reference ``models/yolo11_modules.py:303-312``."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points: jnp.ndarray, bbox: jnp.ndarray, reg_max: float) -> jnp.ndarray:
    """xyxy boxes -> clamped ltrb distances. Reference ``losses/yolo_v8_loss.py:327-330``."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1), 0, reg_max - 0.01
    )
