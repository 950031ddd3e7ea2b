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
from yolo_scratch_tpu.ops.nms import (
    batched_nms_tiled,
    gather_topk_detections_batched,
    nms,
)


def _prefilter_single(pred: jnp.ndarray, conf_threshold: float, pre_nms_topk: int):
    """(A, 4+nc) -> score-sorted top-k candidates (boxes xyxy px, scores,
    labels, valid). Reference semantics; thin wrapper over the batched path."""
    b, s, l, v = _prefilter_batched(pred[None], conf_threshold, pre_nms_topk)
    return b[0], s[0], l[0], v[0]


def select_rows(payload: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """payload (B, A, C), idx (B, K) int -> payload[b, idx[b, k], :] (B, K, C),
    without gathers.

    A (B, K) gather from (B, A, C) runs on the TPU scalar core and measures
    ~8 ms at B=128/A=8400/C=5 — more than the whole NMS — so rows are
    selected with a factorized one-hot einsum instead: index = blk*128 +
    lane, contract lanes on the MXU, then blocks on the VPU (~0.5 ms). The
    direct (B, K, A) one-hot would be ~0.5 GB of HBM traffic; the split
    keeps both factors small. Exact in any dtype: every product is value*1
    or value*0.
    """
    B, A, C = payload.shape
    lanes = 128
    a_pad = ((A + lanes - 1) // lanes) * lanes
    nblk = a_pad // lanes
    payload = jnp.pad(payload, ((0, 0), (0, a_pad - A), (0, 0)))
    payload = payload.reshape(B, nblk, lanes, C)
    oh_lane = (
        (idx % lanes)[..., None] == jnp.arange(lanes)[None, None]
    ).astype(payload.dtype)  # (B, K, lanes)
    oh_blk = (
        (idx // lanes)[..., None] == jnp.arange(nblk)[None, None]
    ).astype(payload.dtype)  # (B, K, nblk)
    per_blk = jnp.einsum("bkl,bmlc->bkmc", oh_lane, payload)  # (B, K, nblk, C)
    return jnp.einsum("bkm,bkmc->bkc", oh_blk, per_blk)  # (B, K, C)


def topk_scores(scores: jnp.ndarray, k: int, blocked: int = 0):
    """(B, A) -> (top_scores (B, k), top_idx (B, k)), score-descending.

    ``blocked=0``: exact ``lax.top_k`` (sorts all A columns — ~3.3 ms at
    B=128/A=8400/k=512).

    ``blocked=kb>0``: two-stage variant — per-128-lane-block top-kb first
    (cheap lane-local sorts), then exact top-k over the ~A*kb/128
    survivors. Identical to exact UNLESS a single 128-anchor block (≈1.6
    rows of the densest FPN grid) holds more than kb of the global top-k.
    VALIDATION ON TRAINED WEIGHTS FAILED for kb=32: dense crater scenes
    put up to 68 of the global top-512 in one block and detections
    changed (scripts/validate_blocked_topk.py), so every shipped call
    site uses the exact path; ``blocked`` is opt-in for workloads whose
    block occupancy has been validated with that script. Worst-case
    inputs degrade *selection* only — shapes, cost and downstream
    semantics are unchanged.
    """
    B, A = scores.shape
    k = min(k, A)
    if not blocked:
        return jax.lax.top_k(scores, k)

    lanes = 128
    a_pad = ((A + lanes - 1) // lanes) * lanes
    nblk = a_pad // lanes
    kb = min(blocked, lanes)
    padded = jnp.pad(scores, ((0, 0), (0, a_pad - A)), constant_values=-jnp.inf)
    blocks = padded.reshape(B, nblk, lanes)
    loc_scores, loc_idx = jax.lax.top_k(blocks, kb)  # (B, nblk, kb)
    glob_idx = (jnp.arange(nblk)[None, :, None] * lanes + loc_idx).reshape(B, nblk * kb)
    flat_scores = loc_scores.reshape(B, nblk * kb)
    top_scores, pos = jax.lax.top_k(flat_scores, min(k, nblk * kb))
    # pos indexes the (nblk*kb)-wide survivor list — small, so the one-hot
    # contraction is cheap (survivors' global indices, not payloads)
    onehot = (pos[..., None] == jnp.arange(nblk * kb)[None, None]).astype(jnp.float32)
    top_idx = jnp.einsum("bks,bs->bk", onehot, glob_idx.astype(jnp.float32)).astype(jnp.int32)
    if top_scores.shape[1] < k:  # k > survivor count: pad (never in practice)
        pad = k - top_scores.shape[1]
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        top_idx = jnp.pad(top_idx, ((0, 0), (0, pad)))
    return top_scores, top_idx


def _prefilter_batched(decoded: jnp.ndarray, conf_threshold: float, pre_nms_topk: int):
    """(B, A, 4+nc) -> score-sorted top-k candidates per image."""
    B, A = decoded.shape[:2]
    boxes_xywh = decoded[..., :4]
    cls_scores = decoded[..., 4:]
    scores = jnp.max(cls_scores, axis=-1)
    labels = jnp.argmax(cls_scores, axis=-1)
    conf_ok = scores > conf_threshold

    k = min(pre_nms_topk, A)
    top_scores, top_idx = jax.lax.top_k(jnp.where(conf_ok, scores, -jnp.inf), k)
    top_valid = jnp.isfinite(top_scores)

    payload = jnp.concatenate(
        [boxes_xywh, labels[..., None].astype(jnp.float32)], axis=-1)  # (B, A, 5)
    sel = select_rows(payload, top_idx)

    top_boxes = xywh2xyxy(sel[..., :4])
    top_labels = sel[..., 4].astype(jnp.int32)
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
    boxes, scores, labels, valid = _prefilter_batched(
        decoded, conf_threshold=conf_threshold, pre_nms_topk=pre_nms_topk)

    if nms_impl == "tiled":
        keep = batched_nms_tiled(
            boxes, scores, valid, class_ids=labels,
            iou_threshold=iou_threshold, max_det=max_det, class_aware=class_aware,
        )
    elif nms_impl == "pallas":
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
                class_ids=labels, class_aware=class_aware, presorted=True,
            )
    else:
        # candidates come score-sorted from the top-k prefilter: presorted
        # skips the per-image argsort and its scalar-core reorder gathers
        keep = jax.vmap(
            lambda b, s, v, c: nms(
                b, s, iou_threshold=iou_threshold, max_det=max_det, valid=v,
                class_ids=c, class_aware=class_aware, presorted=True,
            )
        )(boxes, scores, valid, labels)

    out_b, out_s, out_l, out_v = gather_topk_detections_batched(
        boxes, scores, labels, keep, max_det=max_det)
    out_b = jnp.clip(out_b / img_size, 0.0, 1.0)
    return out_b, out_s, out_l, out_v


@partial(
    jax.jit,
    static_argnames=(
        "nc", "strides", "reg_max", "img_size", "conf_threshold", "iou_threshold",
        "max_det", "pre_nms_topk", "class_aware", "nms_impl", "blocked_topk",
        "with_cand_count",
    ),
)
def postprocess_from_feats(
    feats,  # list of raw Detect maps, (B, H, W, 4*reg_max+nc) each
    nc: int,
    strides,
    img_size: int,
    reg_max: int = 16,
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    pre_nms_topk: int = 1000,
    class_aware: bool = False,
    nms_impl: str = "xla",
    blocked_topk: int = 0,
    with_cand_count: bool = False,
):
    """Fused decode+postprocess from raw head maps: select first, decode 512.

    Same results as ``postprocess(detect_decode(feats), ...)`` (the
    candidate ranking depends only on class scores, never on boxes, so
    selecting top-k *before* the DFL integral is exact) — with one
    qualified exception: candidates are ranked on the raw max-logit, and
    f32 sigmoid COLLIDES on distinct bf16 logits once |logit| ≳ 14
    (saturating fully to 1.0 at ≥ 17.375). Among such score-colliding
    candidates the unfused path breaks the tie by anchor index while this
    path orders by the strictly finer true logit, so selection order (and,
    at the top-k boundary, membership among equal-f32-score candidates)
    can differ there. Returned f32 scores are identical either way; see
    ``test_logit_ranked_selection_semantics``. The DFL
    softmax-expectation and dist2bbox run on only ``pre_nms_topk``
    candidates instead of all ~8400 anchors, and the dense (B, A, 4+nc)
    decoded tensor is never materialized. At B=128 this removes ~3 ms of
    the deploy path. Reference semantics per ``Detect.inference`` +
    ``decode_predictions_for_metrics`` (``train_yolo11_cuda.py:265-399``).
    """
    from yolo_scratch_tpu.nn.modules import dfl_expectation
    from yolo_scratch_tpu.ops.anchors import make_anchors
    from yolo_scratch_tpu.ops.boxes import dist2bbox

    B = feats[0].shape[0]
    no = nc + 4 * reg_max
    flat = [f.reshape(B, -1, no) for f in feats]
    # Stay in the feats' native dtype (bf16 on the deploy path) until after
    # row selection: max/argmax/one-hot selection are value-exact in any
    # dtype, and the dense (B, A, no) tensor is the dominant HBM traffic
    # here. Only the K selected rows are cast to f32 for the DFL integral —
    # bit-identical to casting everything up front.
    A = sum(f.shape[1] for f in flat)
    pad_rows = (-A) % 128
    if pad_rows:
        # fold select_rows' 128-row alignment pad into the concat (a
        # separate jnp.pad materializes a second full (B, A, no) copy)
        flat = flat + [jnp.zeros((B, pad_rows, no), flat[0].dtype)]
    x = jnp.concatenate(flat, axis=1)  # (B, A_pad, no)
    anchor_points, stride_tensor = make_anchors(
        [(f.shape[1], f.shape[2], s) for f, s in zip(feats, strides)], 0.5,
        dtype=jnp.float32,
    )

    cls_logits = x[..., 4 * reg_max:]
    max_logit = jnp.max(cls_logits, axis=-1)  # (B, A_pad), feats' dtype
    # conf gate computed exactly as the unfused path does (f32 sigmoid >
    # conf) so the candidate SET is bit-identical to it
    conf_ok = jax.nn.sigmoid(max_logit.astype(jnp.float32)) > conf_threshold
    if pad_rows:  # padding rows (sigmoid(0)=0.5) must never be candidates
        conf_ok = conf_ok & (jnp.arange(A + pad_rows)[None] < A)

    k = min(pre_nms_topk, A)
    # Rank on the raw (bf16) max-logit, not the f32 sigmoid: sigmoid is
    # strictly monotone, so the ordering agrees with f32-score ranking
    # wherever f32 sigmoid is injective on the bf16 logits. It is NOT
    # injective everywhere — distinct bf16 logits collide in f32 once
    # |logit| ≳ 14 (full 1.0 saturation at ≥ 17.375) — and there the
    # logit key is strictly FINER (orders by true confidence where the
    # score key would tie arbitrarily by index; see docstring). XLA TopK
    # breaks remaining bf16-equal ties stably by index for both keys
    # (probed: scripts/probe_topk.py), and the 16-bit sort key is ~8%
    # faster while the dense f32 score tensor is never materialized.
    top_logits, top_idx = topk_scores(
        jnp.where(conf_ok, max_logit, -jnp.inf * jnp.ones((), max_logit.dtype)),
        k, blocked=blocked_topk)
    top_valid = jnp.isfinite(top_logits.astype(jnp.float32))
    top_scores = jnp.where(
        top_valid, jax.nn.sigmoid(top_logits.astype(jnp.float32)), 0.0)

    # row-select the raw head columns (box logits + cls logits together —
    # the label argmax runs on the K selected rows, not all A), and the
    # per-anchor constants from the small (A, 3) table (never broadcast to
    # (B, A, 3))
    sel = select_rows(x, top_idx).astype(jnp.float32)  # (B, K, no)
    box_logits = sel[..., : 4 * reg_max]
    top_labels = jnp.argmax(sel[..., 4 * reg_max:], axis=-1).astype(jnp.int32)

    anchor_payload = jnp.concatenate([anchor_points, stride_tensor], axis=-1)  # (A, 3)
    lanes = 128
    a_pad = ((A + lanes - 1) // lanes) * lanes
    anch = jnp.pad(anchor_payload, ((0, a_pad - A), (0, 0))).reshape(
        a_pad // lanes, lanes, 3)
    oh_lane = ((top_idx % lanes)[..., None] == jnp.arange(lanes)[None, None]
               ).astype(jnp.float32)
    oh_blk = ((top_idx // lanes)[..., None] == jnp.arange(a_pad // lanes)[None, None]
              ).astype(jnp.float32)
    sel_anch = jnp.einsum(
        "bkm,bkmc->bkc", oh_blk, jnp.einsum("bkl,mlc->bkmc", oh_lane, anch))
    sel_anchor = sel_anch[..., :2]
    sel_stride = sel_anch[..., 2:3]

    # same op order as detect_decode -> _prefilter (xywh then corner
    # conversion) so numerics match the unfused path bit-for-bit
    dist = dfl_expectation(box_logits, reg_max)  # (B, K, 4)
    boxes_xywh = dist2bbox(dist, sel_anchor, xywh=True, axis=-1) * sel_stride
    boxes = xywh2xyxy(boxes_xywh)

    if nms_impl == "tiled":
        keep = batched_nms_tiled(
            boxes, top_scores, top_valid, class_ids=top_labels,
            iou_threshold=iou_threshold, max_det=max_det, class_aware=class_aware,
        )
    elif nms_impl == "pallas":
        from yolo_scratch_tpu.ops.pallas_nms import nms_pallas_batched

        keep = nms_pallas_batched(
            boxes, top_scores, top_valid, iou_threshold=iou_threshold,
            max_det=max_det, class_ids=top_labels, class_aware=class_aware,
            presorted=True,
        )
    else:
        # candidates come score-sorted from the top-k prefilter: presorted
        # skips the per-image argsort and its scalar-core reorder gathers
        keep = jax.vmap(
            lambda b, s, v, c: nms(
                b, s, iou_threshold=iou_threshold, max_det=max_det, valid=v,
                class_ids=c, class_aware=class_aware, presorted=True,
            )
        )(boxes, top_scores, top_valid, top_labels)

    out_b, out_s, out_l, out_v = gather_topk_detections_batched(
        boxes, top_scores, top_labels, keep, max_det=max_det)
    out_b = jnp.clip(out_b / img_size, 0.0, 1.0)
    if with_cand_count:
        # (B,) int32 above-conf candidate count — the exact gate this path
        # selected from (pad rows already masked), so callers observing
        # prefilter-cap saturation (train/steps.py) don't re-reduce the
        # full (B, A, no) head maps a second time
        return out_b, out_s, out_l, out_v, jnp.sum(
            conf_ok.astype(jnp.int32), axis=-1)
    return out_b, out_s, out_l, out_v
