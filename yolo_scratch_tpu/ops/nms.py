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
    presorted: bool = False,
):
    """Greedy NMS over (N, 4) xyxy boxes with (N,) scores.

    Args:
        valid: optional (N,) bool — invalid boxes can neither suppress nor
            be kept (equivalent to the reference's pre-NMS confidence filter,
            ``train_yolo11_cuda.py:307``).
        class_ids: (N,) int labels, used only when ``class_aware``.
        presorted: caller guarantees ``scores`` is already descending (the
            prefilter's top-k output is) — skips the internal argsort and,
            more importantly, the (N, 4) reorder gathers that run on the
            TPU scalar core.

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

    if presorted:
        boxes_s, valid_s = boxes, valid
    else:
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

    if presorted:
        return keep_s
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


def _batched_pairwise_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6):
    """(B, N, 4) x (B, M, 4) xyxy -> (B, N, M) plain IoU."""
    b1 = a[:, :, None, :]
    b2 = b[:, None, :, :]
    x1 = jnp.maximum(b1[..., 0], b2[..., 0])
    y1 = jnp.maximum(b1[..., 1], b2[..., 1])
    x2 = jnp.minimum(b1[..., 2], b2[..., 2])
    y2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return inter / (a1 + a2 - inter + eps)


def _self_suppress_tile(iou: jnp.ndarray, iou_threshold: float, tile: int):
    """Exact greedy suppression within one score-sorted tile, without an
    N-step sequential sweep.

    ``iou`` is (B, T, T) with [b, i, j] = IoU(box_i, box_j), pre-masked to
    the strict upper triangle (i < j, i.e. row = higher-scoring suppressor)
    and to valid boxes. Iterates the row-zeroing fixpoint: a box suppressed
    by a *currently unsuppressed* box has its outgoing row zeroed, so it can
    no longer suppress others; boxes it was wrongly suppressing revive on
    the next pass. Converges to exactly the greedy-NMS suppressed set in at
    most O(log chain-length) passes (bounded by T).

    Returns suppressed (B, T) bool.
    """

    def cond(state):
        iou_m, active, _ = state
        return active

    def body(state):
        iou_m, _, nonzero_rows = state
        # one-hop: boxes currently suppressed by anyone
        suppressed_1 = jnp.max(iou_m, axis=1) > iou_threshold  # (B, T)
        can_suppress = jnp.where(suppressed_1, 0.0, 1.0)[:, :, None]
        # two-hop: boxes suppressed by a currently-UNsuppressed box — only
        # these are definitely greedy-suppressed; zero their rows
        suppressed_2 = jnp.max(can_suppress * iou_m, axis=1) > iou_threshold
        iou_new = jnp.where(suppressed_2[:, :, None], 0.0, iou_m)
        # convergence via an INTEGER metric: the only mutation is zeroing
        # whole rows, so "did anything change" == "did a nonzero row go
        # zero". An f32 mass-sum can miss a small row's removal to rounding
        # at large B·T² (ulp ~0.06 near 1e6), terminating the fixpoint early.
        nz_new = jnp.sum(jnp.any(iou_new > 0.0, axis=2).astype(jnp.int32))
        return iou_new, nz_new < nonzero_rows, nz_new

    iou0 = iou
    nz0 = jnp.sum(jnp.any(iou0 > 0.0, axis=2).astype(jnp.int32))
    state = (iou0, jnp.asarray(True), nz0)
    iou_f, _, _ = jax.lax.while_loop(cond, body, state)
    return jnp.max(iou_f, axis=1) > iou_threshold


@partial(jax.jit, static_argnames=("iou_threshold", "max_det", "class_aware", "tile"))
def batched_nms_tiled(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    class_ids: jnp.ndarray | None = None,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    class_aware: bool = False,
    tile: int = 128,
):
    """Exact greedy NMS, tiled for TPU: ~N/tile large vectorized steps
    instead of N tiny sequential ones.

    Same contract as :func:`batched_nms` — boxes (B, N, 4), scores (B, N),
    valid (B, N) -> keep (B, N) bool, bit-identical keep sets (the greedy
    sweep has a unique solution; ties in IoU==threshold resolve the same
    ``>`` way). Score-sorts internally, processes score-descending tiles:
    each tile is first suppressed by kept boxes of earlier tiles (one
    batched (B, T, N) IoU), then resolved internally by the row-zeroing
    fixpoint of :func:`_self_suppress_tile`.
    """
    B, n0 = scores.shape
    if class_aware and class_ids is not None:
        span = jnp.max(jnp.abs(boxes)) + 1.0
        boxes = boxes + (class_ids.astype(boxes.dtype) * span * 2.0)[..., None]

    n = ((n0 + tile - 1) // tile) * tile
    pad = n - n0
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        valid = jnp.pad(valid, ((0, 0), (0, pad)))

    order = jnp.argsort(-scores, axis=1)
    boxes_s = jnp.take_along_axis(boxes, order[..., None], axis=1)
    valid_s = jnp.take_along_axis(valid, order, axis=1)
    vf = valid_s.astype(boxes_s.dtype)

    pos = jnp.arange(n)
    num_tiles = n // tile

    def tile_body(t, keep):
        start = t * tile
        tb = jax.lax.dynamic_slice(boxes_s, (0, start, 0), (B, tile, 4))
        tv = jax.lax.dynamic_slice(valid_s, (0, start), (B, tile))

        # suppression by kept boxes of earlier tiles (and earlier positions)
        iou_prev = _batched_pairwise_iou(boxes_s, tb)  # (B, N, T)
        prev_mask = (pos < start)[None, :, None] & keep[:, :, None]
        hit = jnp.max(jnp.where(prev_mask, iou_prev, 0.0), axis=1) > iou_threshold
        alive = tv & ~hit  # (B, T)

        # within-tile greedy resolve among still-alive candidates
        iou_tt = _batched_pairwise_iou(tb, tb)  # (B, T, T)
        tri = (jnp.arange(tile)[:, None] < jnp.arange(tile)[None, :])[None]
        af = alive.astype(iou_tt.dtype)
        iou_tt = jnp.where(tri, iou_tt, 0.0) * af[:, :, None] * af[:, None, :]
        suppressed = _self_suppress_tile(iou_tt, iou_threshold, tile)

        keep_tile = alive & ~suppressed
        return jax.lax.dynamic_update_slice(keep, keep_tile, (0, start))

    keep_s = jax.lax.fori_loop(
        0, num_tiles, tile_body, jnp.zeros((B, n), dtype=bool))

    # cap at max_det by descending score, then un-sort
    rank = jnp.cumsum(keep_s.astype(jnp.int32), axis=1) - 1
    keep_s = keep_s & (rank < max_det)
    out = jnp.zeros_like(keep_s)
    out = out.at[jnp.arange(B)[:, None], order].set(keep_s)
    return out[:, :n0]


def gather_topk_detections(boxes, scores, labels, keep, max_det: int):
    """Compact kept rows to fixed (max_det, ...) outputs, score-descending.

    Returns (boxes (max_det, 4), scores (max_det,), labels (max_det,),
    valid (max_det,)). Padding rows are zeros.
    """
    b, s, l, v = gather_topk_detections_batched(
        boxes[None], scores[None], labels[None], keep[None], max_det)
    return b[0], s[0], l[0], v[0]


def gather_topk_detections_batched(boxes, scores, labels, keep, max_det: int):
    """Batched :func:`gather_topk_detections` — (B, N, ...) -> (B, max_det, ...).

    Row selection uses a one-hot einsum instead of ``take_along_axis``
    (per-index gathers run on the TPU scalar core; at B=128 they cost
    milliseconds while the (B, max_det, N) one-hot contraction is ~0.1 ms
    of MXU work). Exact: every product is value*1 or value*0.
    """
    B, n = scores.shape
    masked = jnp.where(keep, scores, -jnp.inf)
    top_scores, order = jax.lax.top_k(masked, min(max_det, n))  # (B, K)
    v = jnp.isfinite(top_scores)

    onehot = (order[..., None] == jnp.arange(n)[None, None]).astype(jnp.float32)
    payload = jnp.concatenate(
        [boxes, labels[..., None].astype(jnp.float32)], axis=-1)  # (B, N, 5)
    sel = jnp.einsum("bkn,bnc->bkc", onehot, payload)  # (B, K, 5)

    k = order.shape[1]
    if k < max_det:  # n < max_det: pad out to the fixed shape
        pad = max_det - k
        sel = jnp.pad(sel, ((0, 0), (0, pad), (0, 0)))
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        v = jnp.pad(v, ((0, 0), (0, pad)))

    return (
        jnp.where(v[..., None], sel[..., :4], 0.0),
        jnp.where(v, top_scores, 0.0),
        jnp.where(v, sel[..., 4].astype(labels.dtype), 0),
        v,
    )
