"""COCO-protocol summary: area-band marks (ignore semantics) + AR@K.

Device matcher (``ops.matching.batched_tp_marks_area``) is cross-checked
against an independent pure-numpy reimplementation of pycocotools'
evaluateImg dt/gt-ignore logic (cocoeval.py): per detection in score
order, best still-unmatched NON-ignored GT with IoU >= t wins (TP); only
if none qualifies may the best ignored GT be claimed (detection ignored);
otherwise FP unless the detection's own area is out of band (ignored).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from yolo_scratch_tpu.ops.matching import (
    DEFAULT_THRESHOLDS,
    batched_tp_marks,
    batched_tp_marks_area,
)
from yolo_scratch_tpu.utils.metrics import (
    COCO_AREA_BANDS,
    coco_summary_from_marks,
    iou_matrix,
    metrics_from_marks,
)


def _ref_marks_area(pred_boxes, pred_valid, gt_boxes, gt_mask, lo, hi, thresholds):
    """Independent host reference: pycocotools-style greedy with ignores.
    Returns (tp (T, N), ign (T, N))."""
    n, g = len(pred_boxes), len(gt_boxes)
    t = len(thresholds)
    areas_g = np.maximum(gt_boxes[:, 2] - gt_boxes[:, 0], 0) * np.maximum(
        gt_boxes[:, 3] - gt_boxes[:, 1], 0)
    areas_p = np.maximum(pred_boxes[:, 2] - pred_boxes[:, 0], 0) * np.maximum(
        pred_boxes[:, 3] - pred_boxes[:, 1], 0)
    gt_ign = ~((areas_g >= lo) & (areas_g < hi))
    p_in = (areas_p >= lo) & (areas_p < hi)
    ious = iou_matrix(pred_boxes, gt_boxes) if n and g else np.zeros((n, g))
    tp = np.zeros((t, n), bool)
    ign = np.zeros((t, n), bool)
    for ti, thr in enumerate(thresholds):
        matched = np.zeros(g, bool)
        for i in range(n):
            if not pred_valid[i]:
                continue
            best_n, jn = -1.0, -1
            best_i, ji = -1.0, -1
            for j in range(g):
                if not gt_mask[j] or matched[j]:
                    continue
                if gt_ign[j]:
                    if ious[i, j] > best_i:
                        best_i, ji = ious[i, j], j
                else:
                    if ious[i, j] > best_n:
                        best_n, jn = ious[i, j], j
            if best_n >= thr:
                tp[ti, i] = True
                matched[jn] = True
            elif best_i >= thr:
                ign[ti, i] = True
                matched[ji] = True
            elif not p_in[i]:
                ign[ti, i] = True
    return tp, ign


def _random_scene(rng, n=24, g=10, span=640.0):
    """Score-descending detections + GTs with a wide area spread."""
    def boxes(k):
        cx, cy = rng.rand(k) * span, rng.rand(k) * span
        # log-uniform sizes 4..300 px: populates all three COCO bands
        w = np.exp(rng.uniform(np.log(4), np.log(300), k))
        h = np.exp(rng.uniform(np.log(4), np.log(300), k))
        return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)

    pb = boxes(n).astype(np.float32)
    gb = boxes(g).astype(np.float32)
    # overlap half the preds with GTs so TPs exist in every band
    pb[:g // 2] = gb[:g // 2] + rng.randn(g // 2, 4).astype(np.float32) * 3
    scores = np.sort(rng.rand(n).astype(np.float32))[::-1].copy()
    pv = rng.rand(n) < 0.9
    gm = rng.rand(g) < 0.9
    return pb, scores, pv, gb, gm


@pytest.mark.parametrize("band", list(COCO_AREA_BANDS))
def test_area_marks_match_reference(band):
    lo, hi = COCO_AREA_BANDS[band]
    rng = np.random.RandomState(hash(band) % 2**31)
    B = 4
    scenes = [_random_scene(rng) for _ in range(B)]
    pb = jnp.asarray(np.stack([s[0] for s in scenes]))
    pv = jnp.asarray(np.stack([s[2] for s in scenes]))
    gb = jnp.asarray(np.stack([s[3] for s in scenes]))
    gm = jnp.asarray(np.stack([s[4] for s in scenes]))
    tp_d, ign_d, n_gt_b = batched_tp_marks_area(pb, pv, gb, gm, lo, hi)
    for b, (pbx, _, pvx, gbx, gmx) in enumerate(scenes):
        tp_r, ign_r = _ref_marks_area(
            pbx, pvx, gbx, gmx, lo, hi, DEFAULT_THRESHOLDS)
        np.testing.assert_array_equal(np.asarray(tp_d)[b], tp_r, err_msg=f"tp b={b}")
        np.testing.assert_array_equal(np.asarray(ign_d)[b], ign_r, err_msg=f"ign b={b}")


def test_full_band_reduces_to_plain_marks():
    """area band [0, 1e10): no GT ignored, no det out of band -> marks equal
    batched_tp_marks, ignore identically False."""
    rng = np.random.RandomState(0)
    scenes = [_random_scene(rng) for _ in range(3)]
    pb = jnp.asarray(np.stack([s[0] for s in scenes]))
    pv = jnp.asarray(np.stack([s[2] for s in scenes]))
    gb = jnp.asarray(np.stack([s[3] for s in scenes]))
    gm = jnp.asarray(np.stack([s[4] for s in scenes]))
    tp_band, ign, n_gt_b = batched_tp_marks_area(pb, pv, gb, gm, 0.0, 1e10)
    assert n_gt_b == int(np.asarray(gm).sum())  # full band counts every GT
    tp_plain = batched_tp_marks(pb, pv, gb, gm)
    np.testing.assert_array_equal(np.asarray(tp_band), np.asarray(tp_plain))
    assert not np.asarray(ign).any()


def test_matched_to_ignored_gt_is_neither_tp_nor_fp():
    """Hand case: one GT inside the band, one outside; two perfect dets.
    The det on the out-of-band GT must be ignored (not FP), the other TP."""
    gt = np.array([[0, 0, 16, 16],        # 256 px^2 -> small band
                   [100, 100, 300, 300]], np.float32)  # 40000 px^2 -> large
    det = gt.copy()  # perfect matches, det[0] higher score
    lo, hi = COCO_AREA_BANDS["small"]
    tp, ign, n_gt_b = batched_tp_marks_area(
        jnp.asarray(det[None]), jnp.ones((1, 2), bool),
        jnp.asarray(gt[None]), jnp.ones((1, 2), bool), lo, hi)
    assert n_gt_b == 1  # only the small GT is in band
    tp, ign = np.asarray(tp)[0], np.asarray(ign)[0]
    assert tp[:, 0].all() and not ign[:, 0].any()   # small det: TP at all T
    assert ign[:, 1].all() and not tp[:, 1].any()   # large det: ignored


def test_unmatched_out_of_band_det_is_ignored_not_fp():
    """A false-positive detection whose own area is outside the band must
    not count against the band's precision."""
    gt = np.array([[0, 0, 16, 16]], np.float32)
    det = np.array([[0, 0, 16, 16],          # TP (small)
                    [400, 400, 600, 600]], np.float32)  # unmatched, large
    lo, hi = COCO_AREA_BANDS["small"]
    tp, ign, _ = batched_tp_marks_area(
        jnp.asarray(det[None]), jnp.ones((1, 2), bool),
        jnp.asarray(gt[None]), jnp.ones((1, 1), bool), lo, hi)
    assert np.asarray(tp)[0, :, 0].all()
    assert np.asarray(ign)[0, :, 1].all()  # ignored, so not an FP


def test_coco_summary_consistency():
    """Summary overall AP equals metrics_from_marks; AR@K monotone in K;
    AR@N(=all dets) equals mean per-threshold recall."""
    rng = np.random.RandomState(42)
    B, N = 6, 24
    scenes = [_random_scene(rng, n=N) for _ in range(B)]
    pb = jnp.asarray(np.stack([s[0] for s in scenes]))
    scores = np.stack([s[1] for s in scenes])
    pv = jnp.asarray(np.stack([s[2] for s in scenes]))
    gb = jnp.asarray(np.stack([s[3] for s in scenes]))
    gm = jnp.asarray(np.stack([s[4] for s in scenes]))
    n_gt = int(np.asarray(gm).sum())

    tp_all = batched_tp_marks(pb, pv, gb, gm)
    bands = {
        name: batched_tp_marks_area(pb, pv, gb, gm, lo, hi)
        for name, (lo, hi) in COCO_AREA_BANDS.items()
    }

    out = coco_summary_from_marks(
        tp_all, scores, np.asarray(pv), n_gt, bands, max_dets=(1, 10, N))
    # max(max_dets) == N == all detections, so AP here equals the plain
    # accumulation (the CLI's maxDets=100 < max_det=300 slicing is a
    # deliberate pycocotools-protocol difference)
    ref = metrics_from_marks(np.asarray(tp_all), scores, np.asarray(pv), n_gt)
    assert out["AP"] == pytest.approx(ref["mAP50-95"])
    assert out["AP50"] == pytest.approx(ref["mAP50"])
    assert out["AP75"] > 0.0 or out["AP"] == 0.0
    assert 0.0 < out["AP"] <= 1.0

    assert out["AR@1"] <= out["AR@10"] <= out[f"AR@{N}"]
    # AR at maxDet=N == mean over thresholds of plain recall
    recalls = np.asarray(tp_all).sum(axis=(0, 2)) / n_gt
    assert out[f"AR@{N}"] == pytest.approx(float(recalls.mean()))
    for name in COCO_AREA_BANDS:
        assert f"AP_{name}" in out and f"AR@{N}_{name}" in out
        assert 0.0 <= out[f"AP_{name}"] <= 1.0


def test_val_cli_coco_summary():
    """val CLI --coco-summary end-to-end on synthetic data: all 12 COCO
    metrics present and internally consistent with the plain metrics."""
    from yolo_scratch_tpu import val as val_cli

    out = val_cli.main([
        "--data", "synthetic", "--imgsz", "160", "--batch", "4",
        "--max-batches", "2", "--coco-summary",
    ])
    for key in ["coco/AP", "coco/AP50", "coco/AP75",
                "coco/AP_small", "coco/AP_medium", "coco/AP_large",
                "coco/AR@1", "coco/AR@10", "coco/AR@100",
                "coco/AR@100_small", "coco/AR@100_medium", "coco/AR@100_large",
                "coco/AP_strict", "coco/AP50_strict", "coco/AP75_strict"]:
        assert key in out, key
    # coco/AP is scored at maxDets=100 (pycocotools protocol); the plain
    # mAP50-95 uses every max_det detection, so only ordering is asserted
    assert out["coco/AP"] <= out["mAP50-95"] + 1e-9
    assert out["coco/AR@1"] <= out["coco/AR@10"] <= out["coco/AR@100"]


def test_strict_ap_equals_mean_per_class():
    """coco_strict_ap_from_marks == mean over classes-with-GTs of the
    per-class AP table (same class-restricted marks, cap not binding)."""
    from yolo_scratch_tpu.utils.metrics import (
        coco_strict_ap_from_marks,
        per_class_from_marks,
    )

    rng = np.random.RandomState(3)
    B, N, G, NC = 4, 20, 8, 4
    scenes = [_random_scene(rng, n=N, g=G) for _ in range(B)]
    pb = jnp.asarray(np.stack([s[0] for s in scenes]))
    scores = np.stack([s[1] for s in scenes])
    pv = np.stack([s[2] for s in scenes])
    gb = jnp.asarray(np.stack([s[3] for s in scenes]))
    gm = np.stack([s[4] for s in scenes])
    pl = rng.randint(0, NC, (B, N)).astype(np.int32)
    gl = rng.randint(0, NC, (B, G)).astype(np.int32)
    # make the overlapped preds share their GT's class so TPs exist
    pl[:, :G // 2] = gl[:, :G // 2]

    marks_cls = batched_tp_marks(
        pb, jnp.asarray(pv), gb, jnp.asarray(gm),
        pred_labels=jnp.asarray(pl), gt_labels=jnp.asarray(gl))

    strict = coco_strict_ap_from_marks(marks_cls, scores, pl, pv, gl, gm, NC)
    per = per_class_from_marks(marks_cls, scores, pl, pv, gl, gm, NC)
    gt_flat = gl[gm.astype(bool)]
    want = [per[str(c)]["AP50-95"] for c in range(NC) if (gt_flat == c).sum()]
    assert strict["classes_evaluated"] == len(want)
    assert strict["AP_strict"] == pytest.approx(float(np.mean(want)))
    assert 0.0 < strict["AP_strict"] <= 1.0

    # maxDets cap binds: capping to 1 det/class/image can only lower AP
    capped = coco_strict_ap_from_marks(
        marks_cls, scores, pl, pv, gl, gm, NC, max_det=1)
    assert capped["AP_strict"] <= strict["AP_strict"] + 1e-9
