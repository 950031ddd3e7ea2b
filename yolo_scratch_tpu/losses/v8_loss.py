"""v8-style detection loss (CIoU + DFL + BCE) as one jit-resident function.

Parity target: reference ``losses/yolo_v8_loss.py:333-538`` (v8DetectionLoss
+ BboxLoss), with the exact constants — assigner alpha=0.5 / beta=4.0
(``:363``; note the reference *hardcodes* these and ignores its own
``tal_topk`` arg), loss weights box 7.5 / cls 0.5 / dfl 1.5 (``:368-370``),
reg_max=16, total scaled by batch size (``:499``).

The reference's emergency all-IoU fallback when the assigner returns zero
foreground (``:424-470``, two nested host loops) is reproduced as a
vectorized ``lax.cond`` branch with last-write-wins semantics matching the
sequential loop.

Targets arrive pre-padded to a static max-GT count (zero-padded boxes,
validity mask) — the jit equivalent of ``preprocess`` (``:501-527``).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from yolo_scratch_tpu.nn.modules import dfl_expectation
from yolo_scratch_tpu.ops.anchors import make_anchors
from yolo_scratch_tpu.ops.boxes import bbox2dist, bbox_iou, dist2bbox
from yolo_scratch_tpu.losses.tal import task_aligned_assign


class DetectionLossConfig(NamedTuple):
    nc: int
    strides: Sequence[float]
    reg_max: int = 16
    box_weight: float = 7.5
    cls_weight: float = 0.5
    dfl_weight: float = 1.5
    tal_alpha: float = 0.5
    tal_beta: float = 4.0


def _df_loss(pred_dist: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Distribution focal loss. pred (..., 4, reg_max) logits, target (..., 4).

    Reference ``BboxLoss._df_loss`` (``:312-324``): two-bin interpolated
    cross-entropy, mean over the 4 sides.
    """
    reg_max = pred_dist.shape[-1]
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = target.astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    # bin lookup as a one-hot contraction: take_along_axis over the
    # reg_max axis is a scalar-core gather and measured 36.6 ms PER CALL
    # at (64, 8400, 4, 16) — 44% of the whole train step; the masked sum
    # is exact (one nonzero term) and pure VPU (~0.2 ms)
    bins = jnp.arange(reg_max, dtype=jnp.int32)
    ce_l = -jnp.sum(jnp.where(tl[..., None] == bins, logp, 0.0), axis=-1)
    ce_r = -jnp.sum(jnp.where(tr[..., None] == bins, logp, 0.0), axis=-1)
    return (ce_l * wl + ce_r * wr).mean(axis=-1)  # (...,)


def _bce_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCE-with-logits (torch ``BCEWithLogitsLoss(reduction='none')``)."""
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _fallback_assign(pred_bboxes_px, gt_labels, gt_bboxes_px, mask_gt, nc):
    """Reference emergency fallback ``:430-470``: pure best-IoU per GT.

    The reference's sequential B x G loop lets later GTs overwrite earlier
    ones at the same anchor — i.e. last-write-wins per anchor. Vectorized:
    each anchor takes the *highest* valid GT index whose argmax-IoU anchor
    is that anchor.
    """
    B, A = pred_bboxes_px.shape[:2]
    G = gt_bboxes_px.shape[1]
    ious = bbox_iou(
        pred_bboxes_px[:, :, None, :], gt_bboxes_px[:, None, :, :], xywh=False, CIoU=False
    )[..., 0]  # (B, A, G)
    best = jnp.argmax(ious, axis=1)  # (B, G)
    match = (best[:, None, :] == jnp.arange(A)[None, :, None]) & mask_gt[:, None, :]  # (B, A, G)
    g_ids = jnp.arange(G)[None, None, :]
    g_sel = jnp.max(jnp.where(match, g_ids, -1), axis=-1)  # (B, A), -1 = background
    fg = g_sel >= 0
    g_safe = jnp.clip(g_sel, 0, None)
    # per-anchor GT lookup as a one-hot contraction (take_along_axis here
    # is a (B, A, 4)-sized scalar-core gather, same class as the DFL one)
    g_oh = jax.nn.one_hot(g_safe, G, dtype=gt_bboxes_px.dtype)  # (B, A, G)
    tb = jnp.einsum("bag,bgk->bak", g_oh, gt_bboxes_px)
    tb = jnp.where(fg[..., None], tb, 0.0)
    tl_gather = jnp.sum(g_oh * gt_labels[:, None, :].astype(g_oh.dtype), axis=-1)
    tl = jnp.where(fg, tl_gather.astype(jnp.int32), nc)
    ts = jax.nn.one_hot(tl, nc, dtype=jnp.float32) * fg[..., None]
    return tl, tb, ts, fg


def v8_detection_loss(
    feats: Sequence[jnp.ndarray],  # raw Detect maps, NHWC (B, Hi, Wi, 4*reg_max+nc)
    gt_labels: jnp.ndarray,  # (B, G) int, zero-padded
    gt_bboxes: jnp.ndarray,  # (B, G, 4) xyxy normalized [0, 1], zero-padded
    gt_mask: jnp.ndarray,  # (B, G) bool
    cfg: DetectionLossConfig,
):
    """Returns (total_loss scalar, loss_items (3,) = weighted box/cls/dfl).

    Mirrors reference ``v8DetectionLoss.__call__`` (``:372-499``); total is
    ``loss_items.sum() * batch_size`` (``:499``).
    """
    nc, reg_max = cfg.nc, cfg.reg_max
    no = nc + 4 * reg_max
    B = feats[0].shape[0]

    flat = jnp.concatenate([f.reshape(B, -1, no) for f in feats], axis=1)  # (B, A, no)
    pred_distri, pred_scores = flat[..., : 4 * reg_max], flat[..., 4 * reg_max :]

    anchor_points, stride_tensor = make_anchors(
        [(f.shape[1], f.shape[2], s) for f, s in zip(feats, cfg.strides)], 0.5, dtype=flat.dtype
    )
    # imgsz scaling of normalized targets (reference preprocess :512-516)
    img_h = feats[0].shape[1] * cfg.strides[0]
    img_w = feats[0].shape[2] * cfg.strides[0]
    scale = jnp.asarray([img_w, img_h, img_w, img_h], dtype=flat.dtype)
    gt_bboxes_px = gt_bboxes * scale * gt_mask[..., None]

    # decode (grid units, reference bbox_decode :529-538)
    pred_dist_exp = dfl_expectation(pred_distri, reg_max)  # (B, A, 4)
    pred_bboxes = dist2bbox(pred_dist_exp, anchor_points[None], xywh=False, axis=-1)
    pred_bboxes_px = pred_bboxes * stride_tensor[None]

    assign = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes_px),
        anchor_points * stride_tensor,
        gt_labels,
        gt_bboxes_px,
        gt_mask,
        num_classes=nc,
        alpha=cfg.tal_alpha,
        beta=cfg.tal_beta,
    )
    target_labels, target_bboxes, target_scores, fg_mask, _ = assign

    # emergency fallback (reference :424-470)
    num_fg = fg_mask.sum()
    num_gt = gt_mask.sum()

    def use_fallback(_):
        return _fallback_assign(
            jax.lax.stop_gradient(pred_bboxes_px), gt_labels, gt_bboxes_px, gt_mask, nc
        )

    def keep(_):
        return (target_labels, target_bboxes, target_scores, fg_mask)

    target_labels, target_bboxes, target_scores, fg_mask = jax.lax.cond(
        (num_fg == 0) & (num_gt > 0), use_fallback, keep, operand=None
    )

    fg_f = fg_mask.astype(flat.dtype)
    target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

    # cls (reference :475)
    loss_cls = _bce_logits(pred_scores, target_scores).sum() / target_scores_sum

    # box + dfl on foreground (reference :478-488 via BboxLoss :280-310)
    tb_grid = target_bboxes / stride_tensor[None]
    # safe substitute at masked positions: unit box around the anchor
    # (avoids 0/0 -> NaN inside CIoU that would poison the masked sum)
    safe_box = jnp.concatenate([anchor_points - 0.5, anchor_points + 0.5], axis=-1)[None]
    tb_safe = jnp.where(fg_mask[..., None], tb_grid, jnp.broadcast_to(safe_box, tb_grid.shape))

    weight = target_scores.sum(-1) * fg_f  # (B, A)
    ciou = bbox_iou(pred_bboxes, tb_safe, xywh=False, CIoU=True)[..., 0]
    loss_box = ((1.0 - ciou) * weight).sum() / target_scores_sum

    target_ltrb = bbox2dist(anchor_points[None], tb_safe, reg_max - 1)
    dfl = _df_loss(pred_distri.reshape(B, -1, 4, reg_max), target_ltrb)  # (B, A)
    loss_dfl = (dfl * weight).sum() / target_scores_sum

    loss_items = jnp.stack(
        [loss_box * cfg.box_weight, loss_cls * cfg.cls_weight, loss_dfl * cfg.dfl_weight]
    )
    total = loss_items.sum() * B
    return total, jax.lax.stop_gradient(loss_items)
