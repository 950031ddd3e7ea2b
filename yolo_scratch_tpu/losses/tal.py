"""Task-Aligned Assigner — fully vectorized, jit-resident.

Semantic parity target: reference ``losses/yolo_v8_loss.py:64-270``
(TaskAlignedAssigner). That implementation has several quirks that we
preserve *exactly* (verified by golden tests against the torch code):

* ``topk`` is accepted but **never used** for candidate selection — the
  positive-candidate mask is just "anchor center strictly inside a valid GT
  box" (``get_pos_mask``, ``:182-194``; there is no select_topk_candidates).
* Force pass 1 (``:115-139``): any valid GT with zero candidates gets its
  best-IoU anchor among in-box anchors (or best-IoU overall if none in box).
  This pass is order-independent (each GT touches only its own column) and
  is vectorized here.
* Multi-GT anchors resolve to the max-IoU GT (``select_highest_overlaps``,
  ``:226-244``).
* Force pass 2 (``:144-163``): any valid GT no anchor maps to gets the
  best-IoU anchor *sequentially in GT order* (later GTs observe earlier
  forced updates) — reproduced with ``lax.scan`` over the GT axis.
* A final ``select_highest_overlaps`` recompute (``:165``), then target
  gathering and align-metric renormalization (``:167-178``).

The reference's three host Python loop nests (O(B*G) device syncs each) are
the single hottest host-bound spot in its training step (SURVEY.md §3.2);
here everything is masked argmax/scatter under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from yolo_scratch_tpu.ops.boxes import bbox_iou


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray  # (B, A) int32
    target_bboxes: jnp.ndarray  # (B, A, 4)
    target_scores: jnp.ndarray  # (B, A, nc)
    fg_mask: jnp.ndarray  # (B, A) bool
    target_gt_idx: jnp.ndarray  # (B, A) int32


def _candidates_in_gts(anc_points: jnp.ndarray, gt_bboxes: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """(A, 2) x (B, G, 4) -> (B, A, G) float: center strictly inside box.

    Layout: per-coordinate (B, A, G) arrays (minor dim G) rather than one
    (B, A, G, 4) tensor whose minor dim of 4 wastes VPU lanes."""
    ax = anc_points[None, :, None, 0]  # (1, A, 1)
    ay = anc_points[None, :, None, 1]
    x1 = gt_bboxes[:, None, :, 0]  # (B, 1, G)
    y1 = gt_bboxes[:, None, :, 1]
    x2 = gt_bboxes[:, None, :, 2]
    y2 = gt_bboxes[:, None, :, 3]
    m = jnp.minimum(jnp.minimum(ax - x1, ay - y1), jnp.minimum(x2 - ax, y2 - ay))
    return (m > eps).astype(jnp.float32)


def _select_highest_overlaps(mask_pos: jnp.ndarray, overlaps: jnp.ndarray):
    """Resolve anchors assigned to multiple GTs by max IoU.

    Reference ``yolo_v8_loss.py:226-244``. Returns (target_gt_idx (B, A),
    fg_mask (B, A) float, mask_pos (B, A, G) float).
    """
    G = mask_pos.shape[-1]
    fg = mask_pos.sum(-1)
    multi = (fg[..., None] > 1)
    is_max = jax.nn.one_hot(jnp.argmax(overlaps, axis=-1), G, dtype=mask_pos.dtype)
    mask_pos = jnp.where(multi, is_max, mask_pos)
    fg = mask_pos.sum(-1)
    tgi = jnp.argmax(mask_pos, axis=-1).astype(jnp.int32)
    return tgi, fg, mask_pos


def task_aligned_assign(
    pd_scores: jnp.ndarray,  # (B, A, nc) sigmoided
    pd_bboxes: jnp.ndarray,  # (B, A, 4) xyxy pixels
    anc_points: jnp.ndarray,  # (A, 2) pixels
    gt_labels: jnp.ndarray,  # (B, G) int
    gt_bboxes: jnp.ndarray,  # (B, G, 4) xyxy pixels, zero-padded
    mask_gt: jnp.ndarray,  # (B, G) bool
    num_classes: int,
    alpha: float = 0.5,
    beta: float = 4.0,
    eps: float = 1e-9,
) -> AssignResult:
    """Assign GTs to anchors; all inputs/outputs static-shaped.

    Callers should pass stop_gradient'ed predictions (the reference wraps the
    whole forward in ``@torch.no_grad``, ``:78``).
    """
    B, A, nc = pd_scores.shape
    G = gt_bboxes.shape[1]
    mask_gt_f = mask_gt.astype(jnp.float32)

    # --- metrics (reference get_box_metrics, :196-208) ---
    overlaps = bbox_iou(
        pd_bboxes[:, :, None, :], gt_bboxes[:, None, :, :], xywh=False, CIoU=False
    )[..., 0]
    overlaps = jnp.clip(overlaps, 0, None)  # (B, A, G)

    # class-score lookup as a one-hot matmul: a (B, A, G) take_along_axis
    # gather runs on the TPU scalar core (~50 ms at these shapes); the
    # equivalent einsum rides the MXU (~5x faster end-to-end) and is exact
    # (0/1 one-hot contraction).
    labels_idx = jnp.clip(gt_labels, 0, nc - 1).astype(jnp.int32)  # padded rows are 0
    labels_oh = jax.nn.one_hot(labels_idx, nc, dtype=pd_scores.dtype)  # (B, G, nc)
    cls_scores = jnp.einsum("ban,bgn->bag", pd_scores, labels_oh)  # (B, A, G)
    align_metric = cls_scores**alpha * overlaps**beta

    # --- candidate mask (reference get_pos_mask, :182-194) ---
    mask_in_gts = _candidates_in_gts(anc_points, gt_bboxes)
    mask_pos = mask_in_gts * mask_gt_f[:, None, :]  # (B, A, G)

    # --- force pass 1 (reference :115-139): per-GT, order-independent ---
    assigned_any = mask_pos.sum(axis=1) > 0  # (B, G)
    has_in = mask_in_gts.sum(axis=1) > 0  # (B, G)
    best_in = jnp.argmax(overlaps * mask_in_gts, axis=1)  # (B, G)
    best_all = jnp.argmax(overlaps, axis=1)  # (B, G)
    best = jnp.where(has_in, best_in, best_all)
    need1 = mask_gt & ~assigned_any  # (B, G)
    onehot1 = jax.nn.one_hot(best, A, dtype=mask_pos.dtype, axis=1)  # (B, A, G)
    mask_pos = jnp.where(need1[:, None, :], onehot1, mask_pos)

    # --- first conflict resolution (reference :142) ---
    tgi, fg, mask_pos = _select_highest_overlaps(mask_pos, overlaps)

    # --- force pass 2 (reference :146-163): sequential in GT order ---
    best2 = jnp.argmax(overlaps, axis=1)  # (B, G)

    def body(carry, xs):
        tgi_c, fg_c = carry
        g, valid_g, best_g = xs  # scalar, (B,), (B,)
        assigned = jnp.any((fg_c > 0) & (tgi_c == g), axis=1)  # (B,)
        need = valid_g & ~assigned
        forced = need[:, None] & (jnp.arange(A)[None, :] == best_g[:, None])  # (B, A)
        tgi_c = jnp.where(forced, g, tgi_c)
        fg_c = jnp.where(forced, 1.0, fg_c)
        return (tgi_c, fg_c), forced

    (_, _), forced_cols = jax.lax.scan(
        body, (tgi, fg), (jnp.arange(G), jnp.asarray(mask_gt).T, best2.T)
    )
    mask_pos = jnp.maximum(mask_pos, forced_cols.transpose(1, 2, 0).astype(mask_pos.dtype))

    # --- final recompute (reference :165) ---
    tgi, fg, mask_pos = _select_highest_overlaps(mask_pos, overlaps)

    # --- targets (reference get_targets, :246-270) ---
    # After conflict resolution mask_pos is one-hot per foreground anchor,
    # so gathering by tgi == contracting with mask_pos (MXU, no gather).
    # Background anchors have an all-zero mask row but the reference's
    # argmax gives tgi=0 there -> column-0 values; replicate via where.
    has_row = fg > 0
    target_labels = jnp.einsum(
        "bag,bg->ba", mask_pos, gt_labels.astype(jnp.float32)
    ).astype(jnp.int32)
    target_labels = jnp.where(has_row, target_labels, gt_labels[:, 0:1].astype(jnp.int32))
    target_bboxes = jnp.einsum("bag,bgk->bak", mask_pos, gt_bboxes)
    target_bboxes = jnp.where(has_row[..., None], target_bboxes, gt_bboxes[:, 0:1, :])
    target_labels = jnp.clip(target_labels, 0, num_classes)
    target_scores = jax.nn.one_hot(target_labels, num_classes, dtype=jnp.float32)
    target_scores = jnp.where(fg[..., None] > 0, target_scores, 0.0)

    # --- align-metric renormalization (reference :172-178) ---
    am = align_metric * mask_pos
    pos_align = jnp.max(am, axis=-1, keepdims=True)  # (B, A, 1)
    pos_overlaps = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
    norm = jnp.max(am * pos_overlaps / (pos_align + eps), axis=-1)  # (B, A)
    target_scores = target_scores * norm[..., None]

    return AssignResult(target_labels, target_bboxes, target_scores, fg > 0, tgi)
