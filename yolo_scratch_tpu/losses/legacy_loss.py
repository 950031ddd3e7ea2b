"""Legacy combined loss for the YOLOScratch model family.

Reference ``losses/yolo_loss.py:19-172`` — which is *broken* in the
snapshot (``from config import loss_cfg`` at ``:16`` imports a module that
does not exist, so the file cannot even be imported; SURVEY.md §0.4). Here
the config is an explicit dataclass with the reference's documented intent
(center-weighted CIoU up-weighted, classification down-weighted) and the
loss is importable and jittable.

Semantics preserved: per-scale dict predictions; bbox loss on positive
cells only with the sigmoid/exp decode contract (``:111-132``); objectness
BCE with -1-ignore; CE classification masked to positive cells
(``:141-152``); per-scale averages then weighted sum (``:155-171``).
Also provides ``build_legacy_targets`` — center-cell responsibility
assignment (each GT marks exactly the grid cell containing its center, per
the loss file's header comment).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from yolo_scratch_tpu.losses.crater_aux import (
    center_weighted_ciou_loss,
    classification_loss,
    objectness_loss,
)
from yolo_scratch_tpu.models.legacy import decode_legacy_bbox


class LegacyLossConfig(NamedTuple):
    bbox_weight: float = 5.0
    objectness_weight: float = 1.0
    class_weight: float = 0.5
    center_weight: float = 2.0
    size_weight: float = 1.0


def build_legacy_targets(
    gt_labels: jnp.ndarray,  # (B, G)
    gt_bboxes: jnp.ndarray,  # (B, G, 4) normalized xyxy
    gt_mask: jnp.ndarray,  # (B, G)
    feat_hw: Sequence[tuple],  # [(H_s, W_s), ...] per scale
) -> List[Dict[str, jnp.ndarray]]:
    """Center-cell assignment per scale.

    For each valid GT, the grid cell containing its center gets
    objectness=1, the class id, and the normalized cx-cy-w-h box. Later GTs
    overwrite earlier ones at the same cell (last-write-wins, matching a
    sequential fill). All other cells are negatives (objectness 0,
    class -1)."""
    B, G = gt_mask.shape
    cx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) / 2
    cy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) / 2
    w = gt_bboxes[..., 2] - gt_bboxes[..., 0]
    h = gt_bboxes[..., 3] - gt_bboxes[..., 1]

    targets = []
    for (H, W) in feat_hw:
        gx = jnp.clip((cx * W).astype(jnp.int32), 0, W - 1)
        gy = jnp.clip((cy * H).astype(jnp.int32), 0, H - 1)
        cell = gy * W + gx  # (B, G)
        # last-write-wins: for each cell take the highest valid g index
        match = (cell[:, None, :] == jnp.arange(H * W)[None, :, None]) & gt_mask[:, None, :]
        g_sel = jnp.max(
            jnp.where(match, jnp.arange(G)[None, None, :], -1), axis=-1
        )  # (B, H*W)
        pos = g_sel >= 0
        gsafe = jnp.clip(g_sel, 0, None)

        def gather(src):
            return jnp.take_along_axis(src, gsafe, axis=1)

        obj = pos.astype(jnp.float32).reshape(B, H, W, 1)
        cls = jnp.where(pos, gather(gt_labels), -1).reshape(B, H, W)
        bb = jnp.stack(
            [gather(cx), gather(cy), jnp.clip(gather(w), 0.01, None), jnp.clip(gather(h), 0.01, None)],
            axis=-1,
        )
        bb = jnp.where(pos[..., None], bb, 0.0).reshape(B, H, W, 4)
        targets.append({"objectness": obj, "classes": cls, "bbox": bb})
    return targets


def legacy_yolo_loss(
    predictions: List[Dict[str, jnp.ndarray]],
    targets: List[Dict[str, jnp.ndarray]],
    cfg: LegacyLossConfig = LegacyLossConfig(),
) -> Dict[str, jnp.ndarray]:
    """Combined loss over per-scale dict predictions (NHWC layouts)."""
    n_scales = len(predictions)
    tb = to = tc = 0.0
    for pred, tgt in zip(predictions, targets):
        pos = tgt["objectness"][..., 0] > 0.5  # (B, H, W)

        pred_xyxy = decode_legacy_bbox(pred["bbox"])  # (B, H, W, 4)
        t = tgt["bbox"]
        tgt_xyxy = jnp.stack(
            [
                t[..., 0] - t[..., 2] / 2,
                t[..., 1] - t[..., 3] / 2,
                t[..., 0] + t[..., 2] / 2,
                t[..., 1] + t[..., 3] / 2,
            ],
            axis=-1,
        )
        # masked mean over positive cells (reference indexes pos_mask then .mean())
        safe_t = jnp.where(pos[..., None], tgt_xyxy, jnp.asarray([0.0, 0.0, 0.5, 0.5]))
        tb = tb + center_weighted_ciou_loss(
            pred_xyxy.reshape(-1, 4),
            safe_t.reshape(-1, 4),
            cfg.center_weight,
            cfg.size_weight,
            weights=pos.reshape(-1).astype(jnp.float32),
        )
        to = to + objectness_loss(pred["objectness"][..., 0], tgt["objectness"][..., 0])
        tc = tc + classification_loss(
            pred["classes"], tgt["classes"], valid_mask=pos
        )

    tb, to, tc = tb / n_scales, to / n_scales, tc / n_scales
    total = cfg.bbox_weight * tb + cfg.objectness_weight * to + cfg.class_weight * tc
    return {
        "total_loss": total,
        "bbox_loss": tb,
        "objectness_loss": to,
        "class_loss": tc,
    }
