"""Crater-specific auxiliary losses — host-free, jit-resident re-derivations.

The reference implements these with host loops and OpenCV round-trips; here
each is pure XLA (SURVEY.md §2.2 "TPU-native tier"):

* center-weighted CIoU   (reference ``losses/bbox_loss.py:79-117``)
* objectness BCE          (``losses/objectness_loss.py:10-56``)
* masked classification CE (``losses/class_loss.py:11-65``)
* angular coverage        (``losses/angular_coverage_loss.py:15-152``):
  the per-sample Python loop over 36 polar bins becomes a one-hot
  bin-matrix contraction.
* rim-weighted mask BCE+Dice (``losses/rim_weighted_mask_loss.py:16-179``):
  cv2 erode/dilate become min/max-pooling.
* ellipse consistency     (``losses/ellipse_consistency_loss.py:19-235``):
  cv2.moments become differentiable weighted sums; the covariance
  eigen-decomposition is closed-form 2x2.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


# ------------------------------------------------------- center-weighted CIoU


def center_weighted_ciou_loss(
    pred_boxes: jnp.ndarray,
    target_boxes: jnp.ndarray,
    center_weight: float = 2.0,
    size_weight: float = 1.0,
    eps: float = 1e-7,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Paired (N, 4) xyxy boxes -> scalar mean loss.

    loss_i = (1 - IoU_i) + cw * rho^2/c^2 + sw * ((dw/tw)^2 + (dh/th)^2)
    (reference computes the full NxN matrices then takes the diagonal —
    ``bbox_loss.py:100-116``; same math, elementwise here).
    """
    px1, py1, px2, py2 = jnp.split(pred_boxes, 4, -1)
    tx1, ty1, tx2, ty2 = jnp.split(target_boxes, 4, -1)

    ix1, iy1 = jnp.maximum(px1, tx1), jnp.maximum(py1, ty1)
    ix2, iy2 = jnp.minimum(px2, tx2), jnp.minimum(py2, ty2)
    inter = jnp.clip(ix2 - ix1, 0, None) * jnp.clip(iy2 - iy1, 0, None)
    pa = (px2 - px1) * (py2 - py1)
    ta = (tx2 - tx1) * (ty2 - ty1)
    iou = inter / (pa + ta - inter + eps)

    pcx, pcy = (px1 + px2) / 2, (py1 + py2) / 2
    tcx, tcy = (tx1 + tx2) / 2, (ty1 + ty2) / 2
    rho2 = (pcx - tcx) ** 2 + (pcy - tcy) ** 2
    cw_ = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
    ch_ = jnp.maximum(py2, ty2) - jnp.minimum(py1, ty1)
    c2 = cw_**2 + ch_**2 + eps

    pw, ph = px2 - px1, py2 - py1
    tw, th = tx2 - tx1, ty2 - ty1
    size_term = ((pw - tw) / (tw + eps)) ** 2 + ((ph - th) / (th + eps)) ** 2

    loss = (1.0 - iou) + center_weight * (rho2 / c2) + size_weight * size_term
    loss = loss[..., 0]
    if weights is not None:
        return (loss * weights).sum() / jnp.maximum(weights.sum(), 1.0)
    return loss.mean()


# ------------------------------------------------------------ objectness/cls


def objectness_loss(pred_logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Masked BCE; target -1 = ignore (reference ``objectness_loss.py:30-56``)."""
    valid = (target >= 0).astype(pred_logits.dtype)
    t = jnp.clip(target, 0.0, 1.0)
    bce = jnp.clip(pred_logits, 0, None) - pred_logits * t + jnp.log1p(
        jnp.exp(-jnp.abs(pred_logits))
    )
    num = jnp.maximum(valid.sum(), 1.0)
    return jnp.where(valid.sum() > 0, (bce * valid).sum() / num, 0.0)


def classification_loss(
    pred_logits: jnp.ndarray, target: jnp.ndarray, valid_mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Masked CE with ignore_index=-1 (reference ``class_loss.py:31-65``).

    pred (..., nc) logits; target (...,) int in [-1, nc)."""
    nc = pred_logits.shape[-1]
    valid = (target != -1).astype(pred_logits.dtype)
    if valid_mask is not None:
        valid = valid * valid_mask.astype(pred_logits.dtype)
    t = jnp.clip(target, 0, nc - 1)
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    # one-hot masked sum instead of take_along_axis (scalar-core gather)
    ce = -jnp.sum(
        jnp.where(t[..., None] == jnp.arange(nc, dtype=t.dtype), logp, 0.0), axis=-1)
    num = jnp.maximum(valid.sum(), 1.0)
    return jnp.where(valid.sum() > 0, (ce * valid).sum() / num, 0.0)


# --------------------------------------------------------- angular coverage


@partial(jax.jit, static_argnames=("num_bins", "min_activation", "penalty_weight"))
def angular_coverage_loss(
    mask: jnp.ndarray,  # (B, H, W) or (B, H, W, 1) probabilities
    centers: jnp.ndarray,  # (B, 2) normalized (cx, cy)
    valid: jnp.ndarray | None = None,  # (B,)
    num_bins: int = 36,
    min_activation: float = 0.1,
    penalty_weight: float = 1.0,
) -> jnp.ndarray:
    """Fraction of under-activated polar bins around each center.

    Reference semantics (``angular_coverage_loss.py:45-152``): bin index by
    atan2 around the center, per-bin MEAN activation, penalize bins whose
    mean < min_activation; loss = penalty * mean_over_batch(frac_bins).
    The reference's per-bin Python loop becomes a one-hot contraction.
    """
    if mask.ndim == 4:
        mask = mask[..., 0]
    B, H, W = mask.shape
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    cx = centers[:, 0, None, None] * W
    cy = centers[:, 1, None, None] * H
    ang = jnp.arctan2(ys[None] - cy, xs[None] - cx)  # (B, H, W)
    binf = (ang + math.pi) / (2 * math.pi) * num_bins
    bins = jnp.clip(binf.astype(jnp.int32), 0, num_bins - 1)
    onehot = jax.nn.one_hot(bins, num_bins, dtype=mask.dtype)  # (B, H, W, nb)
    sums = jnp.einsum("bhw,bhwk->bk", mask, onehot)
    counts = onehot.sum(axis=(1, 2))
    means = sums / jnp.maximum(counts, 1.0)
    # bins with zero pixels keep activation 0 (reference leaves them 0 too)
    under = (means < min_activation).astype(mask.dtype)
    per_sample = under.sum(-1) / num_bins
    if valid is not None:
        v = valid.astype(mask.dtype)
        return penalty_weight * (per_sample * v).sum() / jnp.maximum(v.sum(), 1.0)
    return penalty_weight * per_sample.mean()


# ------------------------------------------------------- rim-weighted mask


def _binary_erode(m: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """cv2.erode(3x3) equivalent via min-pool on {0,1} masks (B, H, W)."""
    p = k // 2
    return -jax.lax.reduce_window(
        -m, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1), [(0, 0), (p, p), (p, p)]
    )


def _binary_dilate(m: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    p = k // 2
    return jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1), [(0, 0), (p, p), (p, p)]
    )


@partial(jax.jit, static_argnames=("rim_weight", "bg_weight", "rim_kernel", "use_dice", "dice_weight"))
def rim_weighted_mask_loss(
    pred_logits: jnp.ndarray,  # (B, H, W) or (B, H, W, 1)
    target_mask: jnp.ndarray,  # same shape, {0, 1}
    rim_weight: float = 4.0,
    bg_weight: float = 0.5,
    rim_kernel: int = 3,
    use_dice: bool = True,
    dice_weight: float = 0.5,
) -> jnp.ndarray:
    """BCE weighted rim(x4)/interior(x1)/bg(x0.5) + Dice.

    Rim band = dilate(mask - erode(mask)) (reference
    ``rim_weighted_mask_loss.py:55-93`` via cv2; min/max-pool here).
    """
    if pred_logits.ndim == 4:
        pred_logits = pred_logits[..., 0]
        target_mask = target_mask[..., 0]
    tbin = (target_mask > 0.5).astype(pred_logits.dtype)
    eroded = _binary_erode(tbin, 3)
    boundary = jnp.clip(tbin - eroded, 0.0, 1.0)
    rim = (_binary_dilate(boundary, rim_kernel) > 0.5).astype(pred_logits.dtype)

    weights = jnp.full_like(tbin, bg_weight)
    weights = jnp.where((tbin > 0.5) & (rim < 0.5), 1.0, weights)
    weights = jnp.where(rim > 0.5, rim_weight, weights)

    bce = jnp.clip(pred_logits, 0, None) - pred_logits * tbin + jnp.log1p(
        jnp.exp(-jnp.abs(pred_logits))
    )
    weighted_bce = (bce * weights).mean()

    if not use_dice:
        return weighted_bce
    p = jax.nn.sigmoid(pred_logits)
    inter = (p * tbin).sum()
    union = p.sum() + tbin.sum()
    dice = (2.0 * inter + 1e-6) / (union + 1e-6)
    return (1.0 - dice_weight) * weighted_bce + dice_weight * (1.0 - dice)


# ---------------------------------------------------- ellipse consistency


def mask_to_ellipse(mask: jnp.ndarray):
    """Differentiable image moments -> ellipse params per mask (B, H, W).

    Returns (cx, cy, a, b, angle_rad, valid) with a >= b, pixel units.
    Replaces the reference's cv2.moments host round-trip
    (``ellipse_consistency_loss.py:55-150``): identical covariance math,
    axes = 2*sqrt(eigenvalue).
    """
    B, H, W = mask.shape
    m = (mask > 0.5).astype(jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    m00 = m.sum(axis=(1, 2))
    valid = m00 >= 10.0
    denom = jnp.maximum(m00, 1e-6)
    cx = (m * xs).sum(axis=(1, 2)) / denom
    cy = (m * ys).sum(axis=(1, 2)) / denom
    dx = xs - cx[:, None, None]
    dy = ys - cy[:, None, None]
    mu20 = (m * dx * dx).sum(axis=(1, 2)) / denom
    mu02 = (m * dy * dy).sum(axis=(1, 2)) / denom
    mu11 = (m * dx * dy).sum(axis=(1, 2)) / denom
    tr = mu20 + mu02
    det = mu20 * mu02 - mu11 * mu11
    disc = jnp.sqrt(jnp.clip(tr * tr - 4 * det, 0.0, None))
    l1 = 0.5 * (tr + disc)
    l2 = 0.5 * (tr - disc)
    valid = valid & (det >= 0) & (l2 >= 0)
    a = 2.0 * jnp.sqrt(jnp.clip(l1, 0.0, None))
    b = 2.0 * jnp.sqrt(jnp.clip(l2, 0.0, None))
    angle = jnp.where(
        jnp.abs(mu20 - mu02) < 1e-6, 0.0, 0.5 * jnp.arctan2(2 * mu11, mu20 - mu02)
    )
    return cx, cy, a, b, angle, valid


@partial(jax.jit, static_argnames=("center_weight", "axis_weight", "angle_weight"))
def ellipse_consistency_loss(
    mask: jnp.ndarray,  # (B, H, W) probabilities
    bbox: jnp.ndarray,  # (B, 4) normalized cx-cy-w-h
    center_weight: float = 1.0,
    axis_weight: float = 1.0,
    angle_weight: float = 0.5,
) -> jnp.ndarray:
    """Mask-derived vs bbox-implied ellipse mismatch (reference
    ``ellipse_consistency_loss.py:152-235``): normalized center L2 +
    axis-ratio absolute error + orientation penalty scaled by eccentricity.
    Invalid masks (too few pixels) contribute zero."""
    B, H, W = mask.shape
    mcx, mcy, ma, mb, mang, valid = mask_to_ellipse(mask)
    v = valid.astype(mask.dtype)

    bcx, bcy = bbox[:, 0] * W, bbox[:, 1] * H
    bw, bh = bbox[:, 2] * W, bbox[:, 3] * H
    ba = jnp.maximum(bw, bh) / 2.0
    bb_ = jnp.minimum(bw, bh) / 2.0

    diag = math.sqrt(H * H + W * W)
    center_term = jnp.sqrt((mcx - bcx) ** 2 + (mcy - bcy) ** 2 + 1e-12) / diag
    m_ratio = mb / jnp.maximum(ma, 1e-6)
    b_ratio = bb_ / jnp.maximum(ba, 1e-6)
    axis_term = jnp.abs(m_ratio - b_ratio)
    # orientation penalty weighted by how elongated the mask ellipse is
    ecc = 1.0 - m_ratio
    angle_term = ecc * jnp.abs(jnp.sin(mang))

    per = center_weight * center_term + axis_weight * axis_term + angle_weight * angle_term
    return (per * v).sum() / jnp.maximum(v.sum(), 1.0)
