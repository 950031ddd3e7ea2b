"""SimOTA label assignment + YOLOX training loss — fully vectorized.

Built from the published YOLOX recipe (arXiv 2107.08430; the reference's
``YOLOX/`` dir is empty — SURVEY.md §0.6). Per image:

1. candidates = anchors whose center is inside a GT box OR inside the
   2.5-stride center region of a GT;
2. cost(a, g) = BCE(sqrt(cls_sig * obj_sig), onehot_g)
   + 3 * (-log(IoU)) + big * not(in-box AND in-center);
3. dynamic-k per GT: k_g = clamp(int(sum of top-10 candidate IoUs), 1);
4. each GT takes its k_g lowest-cost anchors; anchors claimed by several
   GTs keep only their min-cost GT.

Everything is masked matrix math (double-argsort ranks replace the per-GT
topk loop), vmapped over the batch, and differentiable-safe (assignment is
computed under stop_gradient by the caller).

Loss (per YOLOX): 5 * IoU-loss(1 - iou^2) + obj BCE + cls BCE (targets
= onehot * matched IoU), all summed / num_fg across the batch; optional L1
on raw reg for the no-augmentation end phase.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from yolo_scratch_tpu.models.yolox import WH_LOGIT_CAP
from yolo_scratch_tpu.ops.anchors import make_anchors
from yolo_scratch_tpu.ops.boxes import pairwise_iou


class SimOTAResult(NamedTuple):
    fg_mask: jnp.ndarray  # (A,) bool
    matched_gt: jnp.ndarray  # (A,) int32
    matched_iou: jnp.ndarray  # (A,) float — IoU with assigned GT (0 on bg)


def _bce_prob(p: jnp.ndarray, t: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return -(t * jnp.log(p + eps) + (1.0 - t) * jnp.log(1.0 - p + eps))


def simota_assign(
    pred_boxes: jnp.ndarray,  # (A, 4) xyxy pixels (decoded)
    obj_logits: jnp.ndarray,  # (A,)
    cls_logits: jnp.ndarray,  # (A, nc)
    anchors: jnp.ndarray,  # (A, 2) grid-cell corners in grid units per level
    strides: jnp.ndarray,  # (A,)
    gt_boxes: jnp.ndarray,  # (G, 4) xyxy pixels, zero-padded
    gt_labels: jnp.ndarray,  # (G,)
    gt_mask: jnp.ndarray,  # (G,) bool
    center_radius: float = 2.5,
    topk: int = 10,
) -> SimOTAResult:
    A, nc = cls_logits.shape
    G = gt_boxes.shape[0]
    big = 1e6

    # anchor centers in pixels ((grid + 0.5) * stride, YOLOX convention)
    ax = (anchors[:, 0] + 0.5) * strides
    ay = (anchors[:, 1] + 0.5) * strides

    gx1, gy1, gx2, gy2 = gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2], gt_boxes[:, 3]
    gcx, gcy = (gx1 + gx2) / 2, (gy1 + gy2) / 2

    in_box = (
        (ax[:, None] > gx1[None]) & (ax[:, None] < gx2[None])
        & (ay[:, None] > gy1[None]) & (ay[:, None] < gy2[None])
    )  # (A, G)
    r = center_radius * strides[:, None]
    in_center = (
        (jnp.abs(ax[:, None] - gcx[None]) < r) & (jnp.abs(ay[:, None] - gcy[None]) < r)
    )
    valid_pair = (in_box | in_center) & gt_mask[None, :]
    fg_cand = valid_pair.any(axis=1)  # (A,)
    both = in_box & in_center & gt_mask[None, :]

    ious = pairwise_iou(pred_boxes, gt_boxes) * gt_mask[None, :]  # (A, G)
    iou_cost = -jnp.log(ious + 1e-8)

    joint = jnp.sqrt(
        jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits)[:, None]
    )  # (A, nc)
    onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0, nc - 1), nc)  # (G, nc)
    cls_cost = _bce_prob(joint[:, None, :], onehot[None, :, :]).sum(-1)  # (A, G)

    cost = (
        cls_cost
        + 3.0 * iou_cost
        + big * (~both)
        + big * (~fg_cand[:, None])
        + big * (~gt_mask[None, :])
    )

    # dynamic k per GT from top-k candidate IoUs
    cand_ious = jnp.where(valid_pair, ious, 0.0)
    k_eff = min(topk, A)
    top_ious = jax.lax.top_k(cand_ious.T, k_eff)[0]  # (G, k)
    dynamic_k = jnp.clip(top_ious.sum(-1).astype(jnp.int32), 1, A)  # (G,)

    # rank anchors per GT by ascending cost (double argsort)
    order = jnp.argsort(cost, axis=0)
    ranks = jnp.argsort(order, axis=0)  # (A, G)
    matching = (ranks < dynamic_k[None, :]) & valid_pair

    # resolve anchors claimed by multiple GTs: keep min-cost GT
    multi = matching.sum(axis=1) > 1
    best_g = jnp.argmin(cost, axis=1)
    only_best = jax.nn.one_hot(best_g, G, dtype=bool)
    matching = jnp.where(multi[:, None], matching & only_best, matching)

    fg = matching.any(axis=1)
    matched_gt = jnp.argmax(matching, axis=1).astype(jnp.int32)
    # matching is one-hot per fg anchor -> masked-sum replaces the gather
    matched_iou = (ious * matching).sum(axis=1) * fg
    return SimOTAResult(fg, matched_gt, matched_iou)


class YOLOXLossConfig(NamedTuple):
    nc: int
    strides: Sequence[float] = (8.0, 16.0, 32.0)
    iou_weight: float = 5.0
    use_l1: bool = False


def yolox_loss(
    outs: Sequence[jnp.ndarray],  # raw head maps, NHWC (B, Hi, Wi, 4+1+nc)
    gt_labels: jnp.ndarray,  # (B, G)
    gt_bboxes: jnp.ndarray,  # (B, G, 4) normalized xyxy
    gt_mask: jnp.ndarray,  # (B, G)
    cfg: YOLOXLossConfig,
):
    """Returns (total, dict(iou_loss, obj_loss, cls_loss, l1_loss, num_fg))."""
    nc = cfg.nc
    no = 5 + nc
    B = outs[0].shape[0]
    flat = jnp.concatenate([o.reshape(B, -1, no) for o in outs], axis=1)  # (B, A, no)
    A = flat.shape[1]

    anchor_points, stride_t = make_anchors(
        [(o.shape[1], o.shape[2], s) for o, s in zip(outs, cfg.strides)], 0.0, dtype=flat.dtype
    )
    strides1 = stride_t[:, 0]

    raw_reg = flat[..., :4]
    obj_logits = flat[..., 4]
    cls_logits = flat[..., 5:]

    xy = (raw_reg[..., :2] + anchor_points[None]) * stride_t[None]
    # capped exp (models/yolox.py WH_LOGIT_CAP): a transiently divergent wh
    # logit must yield a huge-but-finite box, not inf — inf areas make the
    # IoU NaN and an infinite gradient norm turns clip_by_global_norm into
    # a NaN factory (inf * 0), poisoning the params in one step.
    # Straight-through cap: exp sees the clipped value (stays finite) but an
    # out-of-range logit still receives unit gradient, so a saturated logit
    # keeps a restoring IoU-loss gradient instead of waiting on weight decay.
    # NaN-safe formulation: the naive STE ``l - stop_grad(l - clip(l))``
    # breaks the finiteness invariant above — l=inf gives inf-inf=NaN, and
    # a large finite l (>=~2.7e8 f32) cancels catastrophically to 0. Here
    # the forward value is EXACTLY clip(l) for any input (the pass-through
    # term is x - stop_grad(x) = 0 bit-exactly on finite x, and the where
    # zeroes it for non-finite), while the gradient is 1 both inside the
    # band (from clip) and outside it (from the pass-through).
    wh_logit = raw_reg[..., 2:4]
    capped = jnp.clip(wh_logit, -WH_LOGIT_CAP, WH_LOGIT_CAP)
    outside = jnp.isfinite(wh_logit) & (jnp.abs(wh_logit) > WH_LOGIT_CAP)
    passthru = jnp.where(outside, wh_logit, 0.0)
    wh_logit = capped + (passthru - jax.lax.stop_gradient(passthru))
    wh = jnp.exp(wh_logit) * stride_t[None]
    pred_boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)  # (B, A, 4) px

    img_h = outs[0].shape[1] * cfg.strides[0]
    img_w = outs[0].shape[2] * cfg.strides[0]
    scale = jnp.asarray([img_w, img_h, img_w, img_h], dtype=flat.dtype)
    gt_px = gt_bboxes * scale * gt_mask[..., None]

    assign = jax.vmap(
        lambda pb, ol, cl, gb, gl, gm: simota_assign(
            pb, ol, cl, anchor_points, strides1, gb, gl, gm
        )
    )(
        jax.lax.stop_gradient(pred_boxes),
        jax.lax.stop_gradient(obj_logits),
        jax.lax.stop_gradient(cls_logits),
        gt_px,
        gt_labels,
        gt_mask,
    )
    fg = assign.fg_mask  # (B, A)
    fg_f = fg.astype(flat.dtype)
    num_fg = jnp.maximum(fg_f.sum(), 1.0)

    # one-hot contraction instead of take_along_axis (gathers are scalar-
    # core bound on TPU; the einsum rides the MXU and is exact)
    G = gt_px.shape[1]
    match_oh = jax.nn.one_hot(assign.matched_gt, G, dtype=flat.dtype) * fg_f[..., None]
    tgt_boxes = jnp.einsum("bag,bgk->bak", match_oh, gt_px)  # (B, A, 4)
    safe_tgt = jnp.where(fg[..., None], tgt_boxes, pred_boxes)
    tgt_labels = jnp.einsum(
        "bag,bg->ba", match_oh, gt_labels.astype(flat.dtype)
    ).astype(jnp.int32)

    # IoU loss: 1 - iou^2 (YOLOX IOUloss default)
    x1 = jnp.maximum(pred_boxes[..., 0], safe_tgt[..., 0])
    y1 = jnp.maximum(pred_boxes[..., 1], safe_tgt[..., 1])
    x2 = jnp.minimum(pred_boxes[..., 2], safe_tgt[..., 2])
    y2 = jnp.minimum(pred_boxes[..., 3], safe_tgt[..., 3])
    inter = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)
    pa = jnp.clip(pred_boxes[..., 2] - pred_boxes[..., 0], 0, None) * jnp.clip(
        pred_boxes[..., 3] - pred_boxes[..., 1], 0, None
    )
    ta = (safe_tgt[..., 2] - safe_tgt[..., 0]) * (safe_tgt[..., 3] - safe_tgt[..., 1])
    iou = inter / (pa + ta - inter + 1e-16)
    loss_iou = ((1.0 - iou**2) * fg_f).sum() / num_fg

    def bce_logits(z, t):
        return jnp.clip(z, 0, None) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))

    loss_obj = bce_logits(obj_logits, fg_f).sum() / num_fg

    cls_target = jax.nn.one_hot(tgt_labels, nc) * assign.matched_iou[..., None]
    loss_cls = (bce_logits(cls_logits, cls_target) * fg_f[..., None]).sum() / num_fg

    loss_l1 = jnp.asarray(0.0, flat.dtype)
    if cfg.use_l1:
        # encode targets back to raw-reg space
        t_cx = (safe_tgt[..., 0] + safe_tgt[..., 2]) / 2
        t_cy = (safe_tgt[..., 1] + safe_tgt[..., 3]) / 2
        t_w = jnp.clip(safe_tgt[..., 2] - safe_tgt[..., 0], 1e-3, None)
        t_h = jnp.clip(safe_tgt[..., 3] - safe_tgt[..., 1], 1e-3, None)
        l1_t = jnp.stack(
            [
                t_cx / strides1[None] - anchor_points[None, :, 0],
                t_cy / strides1[None] - anchor_points[None, :, 1],
                jnp.log(t_w / strides1[None]),
                jnp.log(t_h / strides1[None]),
            ],
            axis=-1,
        )
        loss_l1 = (jnp.abs(raw_reg - l1_t).sum(-1) * fg_f).sum() / num_fg

    total = cfg.iou_weight * loss_iou + loss_obj + loss_cls + loss_l1
    aux = {
        "iou_loss": loss_iou,
        "obj_loss": loss_obj,
        "cls_loss": loss_cls,
        "l1_loss": loss_l1,
        "num_fg": fg_f.sum() / B,
    }
    return total, jax.lax.stop_gradient(aux)
